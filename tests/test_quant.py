"""int8 quantized serving tables (``embedding/quant.py``).

Beyond-reference: the reference serves f32 tables only; per-row
symmetric int8 cuts serving residency + gather bytes ~4× at the
quantization noise floor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import hybridbackend_tpu as hb
from hybridbackend_tpu.embedding import TableConfig
from hybridbackend_tpu.embedding.lookup import lookup, lookup_sparse
from hybridbackend_tpu.embedding.quant import (
    QuantizedTable, dequantize_table, lookup_quantized, quantize_table)
from hybridbackend_tpu.models import EmbeddingSpec, StackedFeatureExtractor
from hybridbackend_tpu.training.saved_model import Served

BATCH, DIM = 32, 8


def test_quantize_roundtrip_error_bound():
  rng = np.random.RandomState(0)
  # Rows spanning orders of magnitude — per-row scales must hold each
  # row's error to its OWN amax/254, not the table max.
  t = rng.randn(100, 16).astype(np.float32)
  t *= np.logspace(-3, 2, 100)[:, None].astype(np.float32)
  qt = quantize_table(t)
  assert qt.q.dtype == np.int8 and qt.scale.dtype == np.float32
  deq = dequantize_table(qt)
  amax = np.abs(t).max(axis=1)
  bound = amax / 254.0 + 1e-9          # half a quantization step
  assert np.all(np.abs(deq - t) <= bound[:, None] * 1.001)


def test_quantize_zero_row():
  qt = quantize_table(np.zeros((4, 8), np.float32))
  np.testing.assert_array_equal(dequantize_table(qt), 0)


def test_lookup_dispatch_matches_dequantized():
  rng = np.random.RandomState(1)
  t = (rng.randn(300, DIM) * 0.1).astype(np.float32)
  cfg = TableConfig('q', 300, DIM, sharded=False)
  qt = quantize_table(t)
  ids = np.array([[0, 5, 299, -1], [300, 7, 7, 2]], np.int32)
  got = np.asarray(lookup(qt, jnp.asarray(ids), cfg))
  want = np.asarray(lookup(jnp.asarray(dequantize_table(qt)),
                           jnp.asarray(ids), cfg))
  np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
  # Validity contract: negative / out-of-vocab ids read zeros.
  assert np.all(got[0, 3] == 0) and np.all(got[1, 0] == 0)


def test_lookup_sparse_combines_quantized():
  rng = np.random.RandomState(2)
  t = (rng.randn(50, DIM) * 0.1).astype(np.float32)
  cfg = TableConfig('qs', 50, DIM, sharded=False, combiner='mean')
  qt = quantize_table(t)
  ids = np.array([[1, 2, 3], [4, 4, 0]], np.int32)
  mask = np.array([[1, 1, 0], [1, 1, 1]], np.float32)
  got = np.asarray(lookup_sparse(qt, jnp.asarray(ids),
                                 jnp.asarray(mask), cfg))
  deq = dequantize_table(qt)
  want = np.stack([(deq[1] + deq[2]) / 2, (2 * deq[4] + deq[0]) / 3])
  np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sharded_quantized_lookup_requires_packed():
  """Round-4: sharded int8 serving EXISTS for the lane-packed residency
  (test_sharded_int8_lookup); the unpacked legacy form still guards."""
  cfg = TableConfig('shq', 4096, DIM)    # sharded by default (world 8)
  qt = quantize_table(np.zeros((4096, DIM), np.float32), pack=False)
  ctx = hb.Context.get()
  if not cfg.should_shard(ctx):
    pytest.skip('single-device context')
  with pytest.raises(NotImplementedError):
    lookup(qt, jnp.zeros((8,), jnp.int32), cfg, ctx=ctx)


def test_int8_export_cold_serve(tmp_path):
  """SparseTrainer → export(table_dtype='int8') → cold Served: bundle
  predictions track the f32 export within quantization noise, and the
  serialized table leaves are int8."""
  rng = np.random.RandomState(3)
  fx = StackedFeatureExtractor(
      [EmbeddingSpec(TableConfig(f'c{i}', 200, DIM)) for i in range(3)],
      dense_columns=['d0'])
  dense = {'w': jnp.asarray(rng.randn(3 * DIM + 1, 1).astype(np.float32)),
           'b': jnp.zeros((), jnp.float32)}

  def ml(dense_p, emb_f, dense_f, batch):
    x = jnp.concatenate(emb_f + dense_f, axis=-1)
    preds = jax.nn.sigmoid((x @ dense_p['w'])[:, 0] + dense_p['b'])
    y = batch['label']
    pel = (preds - y) ** 2
    return jnp.mean(pel), {'preds': preds, 'per_example_loss': pel}

  t = hb.estimator.SparseTrainer(fx, ml, dense,
                                 dense_optimizer=optax.sgd(0.1),
                                 table_lr=0.2, rng=jax.random.PRNGKey(1))

  def batches(n, seed):
    r = np.random.RandomState(seed)
    for _ in range(n):
      ids = {f'c{i}': r.randint(0, 200, BATCH).astype(np.int32)
             for i in range(3)}
      yield {**ids, 'd0': r.rand(BATCH).astype(np.float32),
             'label': (ids['c0'] % 2 == 0).astype(np.float32)}

  t.train(batches(15, seed=4), sync=False)
  b = next(batches(1, seed=5))
  p32 = t.export_saved_model(str(tmp_path / 'f32'), b)
  p8 = t.export_saved_model(str(tmp_path / 'int8'), b,
                            table_dtype='int8')

  want = Served(p32).predict(b)
  got = Served(p8).predict(b)
  # Per-element table error ≤ amax/254 with amax ≈ 0.2 post-training;
  # through a 25-dim linear+sigmoid that stays well under 2e-2.
  np.testing.assert_allclose(got, want, atol=2e-2)
  assert not np.allclose(got, want, atol=1e-7)  # actually quantized

  served = Served(p8)
  int8_leaves = [p for p in served._params
                 if getattr(p, 'dtype', None) == np.int8]
  assert len(int8_leaves) >= 1
  assert sum(p.size for p in int8_leaves) >= 3 * 200 * DIM


def test_packed_residency_and_fused_select():
  """Round-4: narrow int8 tables store lane-packed ([V/p, 128]) and the
  lookup fuses dequant + lane select — results identical to the
  unpacked form."""
  rng = np.random.RandomState(3)
  t = (rng.randn(1024, 16) * np.exp(rng.randn(1024))[:, None]
       ).astype(np.float32)
  qt = quantize_table(t)
  assert qt.pack == 8 and qt.q.shape == (128, 128)
  qtu = quantize_table(t, pack=False)
  assert qtu.pack == 1
  np.testing.assert_array_equal(dequantize_table(qt),
                                dequantize_table(qtu))
  cfg = TableConfig('q', 1024, 16, sharded=False)
  ids = np.r_[rng.randint(0, 1024, 200), [-1, 2000]].astype(np.int32)
  out_p = np.asarray(lookup_quantized(qt, jnp.asarray(ids), cfg))
  out_u = np.asarray(lookup_quantized(qtu, jnp.asarray(ids), cfg))
  np.testing.assert_allclose(out_p, out_u, rtol=1e-6, atol=1e-7)
  assert np.all(out_p[-2:] == 0)      # invalid ids read zeros


def test_sharded_int8_lookup():
  """Round-4: over-HBM int8 bundles serve SHARDED — shard_quantized +
  the allgather-exchange quantized lookup match the replicated path
  on the 8-device mesh (incl. invalid ids and a non-divisible vocab)."""
  from hybridbackend_tpu.embedding.quant import shard_quantized
  ctx = hb.Context.get()
  rng = np.random.RandomState(4)
  v = 1000 * 8   # packed rows 1000: pads to a world multiple
  t = (rng.randn(v, 16) * np.exp(rng.randn(v))[:, None]
       ).astype(np.float32)
  qt = quantize_table(t)
  sq = shard_quantized(qt, ctx)
  assert len(sq.q.sharding.device_set) == ctx.world_size
  cfg = TableConfig('qs', v, 16, sharded=True)
  ids = np.r_[rng.randint(0, v, 333), [-1, v + 7]].astype(np.int32)
  out = np.asarray(jax.jit(
      lambda q, i: lookup_quantized(q, i, cfg, ctx=ctx)
  )(sq, jnp.asarray(ids)))
  cfg_r = TableConfig('qs', v, 16, sharded=False)
  want = np.asarray(lookup_quantized(qt, jnp.asarray(ids), cfg_r))
  np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)
  assert np.all(out[-2:] == 0)
