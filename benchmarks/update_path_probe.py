"""A/B probe: where the sparse-update WRAPPER time goes (round-3 #3).

The fused kernel alone runs 5.98 ms at the packed flagship shape
([2.6M, 16] ≙ [327k, 128], 213k updates) but the full update path
measured ~11 ms resident — the gap is sort + expansion + padding
traffic. Probes:

  sortn    argsort + NARROW [N, 16] reorder gather (proposed order)
  sortw    argsort + WIDE [N, 128] reorder gather (round-3 pre-probe
           order: expansion before sort ⇒ the gather moves 8x bytes)
  segsort  [26, 8192] per-table batched argsort + narrow gather (the
           flagship's stacked update list is 26 concatenated segments
           with disjoint ascending vocab ranges)
  pathold  expand -> sort -> kernel (pre-restructure pipeline)
  pathnew  sort -> expand -> kernel (_stream_adagrad(pack_p=8))

Timing: axon-safe (lax.scan inside jit, carry-dependent ids, scalar
readback). Usage: python benchmarks/update_path_probe.py [--cases ...]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import json
import time


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--inner', type=int, default=10)
  p.add_argument('--repeats', type=int, default=2)
  p.add_argument('--cases', nargs='*', default=None)
  args = p.parse_args()

  import jax
  import jax.numpy as jnp
  import numpy as np
  from hybridbackend_tpu.embedding.sparse_update import _stream_adagrad
  from hybridbackend_tpu.framework.options import OPTIONS
  from hybridbackend_tpu.ops.pallas.scatter import _pack_expand

  OPTIONS['emb_update_matmul_precision'] = 'default'

  TABLES, B, SEG_V, D, P = 26, 8192, 100 * 1024, 16, 8
  N = TABLES * B
  V = TABLES * SEG_V            # 2,662,400 logical rows (p-divisible)
  rng = np.random.RandomState(0)
  # Per-table zipf ids offset into disjoint segment ranges — the
  # flagship's stacked update list layout.
  segs = [(t * SEG_V + rng.zipf(1.2, B).astype(np.int64) % SEG_V)
          for t in range(TABLES)]
  ids0 = jnp.asarray(np.concatenate(segs), jnp.int32)
  g0 = jnp.asarray(rng.randn(N, D).astype(np.float32) * 0.01)
  table0 = jnp.asarray(rng.randn(V // P, P * D).astype(np.float32) * .01)
  acc0 = jnp.full((V // P, P * D), 0.1, jnp.float32)

  def shift_ids(i):
    base = (ids0 % SEG_V + i.astype(jnp.int32)) % SEG_V
    return (ids0 // SEG_V) * SEG_V + base

  cases = {}

  def sort_probe(wide):
    def body(carry, _):
      s, i = carry
      ids = shift_ids(i)
      order = jnp.argsort(ids)
      g = g0 * (1.0 + 1e-6 * i)
      if wide:
        _, g = _pack_expand(ids, g, P)
      sg = g[order]
      return (s + sg[0, 0] + order[0].astype(jnp.float32), i + 1), ()
    return body

  cases['sortn'] = sort_probe(False)
  cases['sortw'] = sort_probe(True)

  def segsort_body(carry, _):
    s, i = carry
    ids = shift_ids(i).reshape(TABLES, B)
    order = jnp.argsort(ids, axis=-1)
    g = (g0 * (1.0 + 1e-6 * i)).reshape(TABLES, B, D)
    sg = jnp.take_along_axis(g, order[..., None], axis=1)
    return (s + sg[0, 0, 0] + order[0, 0].astype(jnp.float32), i + 1), ()

  cases['segsort'] = segsort_body

  def pathseg_body(carry, _):
    # Full update path with the landed segment-sort fast path: 26
    # batched argsorts of 8192 + presorted kernel (block_ids monotone).
    from hybridbackend_tpu.embedding.sparse_update import (
        _segment_sorted, _stream_adagrad_presorted)
    t, a, i = carry
    ids2d = shift_ids(i).reshape(TABLES, B).T          # [B, K]
    g = (g0 * (1.0 + 1e-6 * i)).reshape(TABLES, B, D).transpose(1, 0, 2)
    segments = tuple((k, k + 1, (k + 1) * SEG_V) for k in range(TABLES))
    rows, block_ids, gs = _segment_sorted(ids2d, g, segments)
    t, a = _stream_adagrad_presorted(t, a, rows, block_ids, gs,
                                     0.01, 1e-7, pack_p=P)
    return (t, a, i + 1), ()

  cases['pathseg'] = pathseg_body

  def path_body(new):
    def body(carry, _):
      t, a, i = carry
      ids = shift_ids(i)
      g = g0 * (1.0 + 1e-6 * i)
      if new:
        t, a = _stream_adagrad(t, a, ids, g, 0.01, 1e-7, pack_p=P)
      else:
        rows, gw = _pack_expand(ids, g, P)
        t, a = _stream_adagrad(t, a, rows, gw, 0.01, 1e-7)
      return (t, a, i + 1), ()
    return body

  results = []
  for name in (args.cases or ['sortn', 'sortw', 'segsort',
                              'pathnew', 'pathseg', 'pathold']):
    if name.startswith('path'):
      body = cases['pathseg'] if name == 'pathseg' else \
          path_body(name == 'pathnew')
      carry0 = (table0, acc0, jnp.float32(0.0))
      read = lambda c: c[0][0, 0] + c[1][0, 0]
    else:
      body = cases[name]
      carry0 = (jnp.float32(0.0), jnp.float32(0.0))
      read = lambda c: c[0]

    @jax.jit
    def run(c0, body=body, read=read):
      c, _ = jax.lax.scan(body, c0, None, length=args.inner)
      return read(c)

    try:
      t0 = time.time()
      float(run(carry0))
      compile_s = time.time() - t0
      times = []
      for _ in range(args.repeats):
        t0 = time.time()
        float(run(carry0))
        times.append((time.time() - t0) / args.inner)
      ms = 1000.0 * min(times)
      r = {'case': name, 'ms': round(ms, 3),
           'compile_s': round(compile_s, 1)}
      results.append(r)
      print(r, file=_sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001 — report and continue
      results.append({'case': name, 'error': str(e)[:300]})
      print(f'{name}: ERROR {e}', file=_sys.stderr, flush=True)

  print(json.dumps(results))


if __name__ == '__main__':
  main()
