"""int8 quantized embedding tables (serving-time residency format).

Beyond-reference, TPU-idiomatic: a served embedding table rarely needs
f32 rows — per-row symmetric int8 keeps prediction drift at the
quantization noise floor while cutting table HBM residency and bundle
size ~4×. This is a CAPACITY win, not a latency one: the TPU row
gather is row-rate-bound (~20-30 ns/row regardless of row width;
``benchmarks/gather_probe.py`` measured the int8 narrow gather at
6.5 ms vs 4.2 ms for the f32 lane-packed table at the flagship shape),
so quantization buys 4× more vocabulary per chip at roughly unchanged
predict latency. The reference serves f32 tables only
(``/root/reference/hybridbackend/tensorflow/training/saved_model.py``);
its GPU-cache layer solves the same capacity problem dynamically
(``embedding/service.py:50-324``) — quantization is the static,
zero-infrastructure alternative for inference.

Format: ``QuantizedTable(q: int8 [V, D], scale: f32 [V])`` with
``row = q · scale[row]`` and ``scale = max|row| / 127`` (symmetric,
per-row — embedding row norms vary over orders of magnitude, so a
single per-table scale would crush small rows). A pytree, so it flows
through ``jax.export``/orbax like any parameter leaf.

Training always stays f32/bf16; quantize at export
(``SparseTrainer.export_saved_model(..., table_dtype='int8')``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedTable:
  """Per-row symmetric int8 table: ``row v = q[v] * scale[v]``."""
  q: jax.Array       # int8 [V, D]
  scale: jax.Array   # f32 [V]


def quantize_table(table) -> QuantizedTable:
  """Per-row symmetric int8 quantization of a [V, D] float table."""
  t = np.asarray(table, dtype=np.float32)
  if t.ndim != 2:
    raise ValueError(f'expected a [V, D] table, got shape {t.shape}')
  amax = np.abs(t).max(axis=1)
  scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
  q = np.clip(np.rint(t / scale[:, None]), -127, 127).astype(np.int8)
  return QuantizedTable(q=q, scale=scale)


def dequantize_table(qt: QuantizedTable) -> np.ndarray:
  return (np.asarray(qt.q, np.float32)
          * np.asarray(qt.scale, np.float32)[:, None])


def lookup_quantized(qt: QuantizedTable, ids: jax.Array, config,
                     ctx=None) -> jax.Array:
  """Replicated-table lookup with on-the-fly dequantization.

  Serving-time path (exports trace single-device with
  ``sharded=False``): gathers int8 rows and per-row scales, multiplies
  after the gather — int8 row bytes on the memory system, f32 out. The
  same validity contract as every float path: out-of-vocab/negative
  ids read zeros.
  """
  if config.should_shard(ctx):
    raise NotImplementedError(
        'int8 tables are a serving-time (replicated) format; train and '
        'shard in float, quantize at export')
  rows = config.row_index(ids, ctx)
  valid = (ids >= 0) & (ids < config.vocab_size)
  rows = jnp.where(valid, rows, -1)
  qe = jnp.take(qt.q, rows, axis=0, mode='fill', fill_value=0)
  v = qt.scale.shape[0]
  sc = jnp.take(qt.scale, jnp.clip(rows, 0, v - 1), axis=0)
  sc = jnp.where(valid, sc, 0.0)
  return qe.astype(jnp.float32) * sc[..., None]


__all__ = ['QuantizedTable', 'quantize_table', 'dequantize_table',
           'lookup_quantized']
