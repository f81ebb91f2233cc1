"""Roofline probes for the stream-update kernel (round-3 order #3).

Separates the three cost hypotheses for the 17.6 ms flagship update
([2.6M, 16] table + acc, 213k updates → ~20 GB/s effective vs ~800 GB/s
HBM peak):

  1. per-grid-iteration overhead  → 'pass' mode: every block takes the
     empty fast path; sweep block_rows. Cost model: nblocks·c + bytes/BW.
  2. narrow-lane DMA inefficiency (D=16 uses 16 of 128 lanes per tile)
     → compare [V, 16] vs lane-packed [V/8, 128] at equal bytes.
  3. one-hot matmul / update work → 'upd' mode at the flagship shape.

Timing: axon-safe (loop inside jit via lax.scan, carry-dependent
payload, one scalar readback).

Usage: python benchmarks/stream_roofline.py [--inner 10] [--json]
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
  p.add_argument('--json', action='store_true')
  p.add_argument('--cases', nargs='*', default=None,
                 help='mode:vocab:dim:updates:block_rows tuples')
  args = p.parse_args()

  import jax
  import jax.numpy as jnp
  import numpy as np
  from hybridbackend_tpu.ops.pallas.scatter import adagrad_update_sorted

  interpret = jax.default_backend() != 'tpu'

  # (mode, vocab, dim, n_updates, block_rows)
  default_cases = [
      # 1. per-block overhead: pure pass-through, block size sweep.
      'pass:2621440:16:0:1024',
      'pass:2621440:16:0:4096',
      'pass:2621440:16:0:16384',
      # 2. lane packing: same bytes, 128-wide rows.
      'pass:327680:128:0:1024',
      'pass:327680:128:0:4096',
      # 3. flagship with updates at bigger blocks.
      'upd:2621440:16:213504:1024',
      'upd:2621440:16:213504:4096',
      'upd:2621440:16:213504:16384',
      # packed-lane equivalent with updates (update rows remapped to
      # packed space is future work; this probes update cost at d=128).
      'upd:327680:128:26688:1024',
  ]
  cases = args.cases or default_cases

  results = []
  for spec in cases:
    mode, v, d, n, br = spec.split(':')
    v, d, n, br = int(v), int(d), int(n), int(br)
    rng = np.random.RandomState(0)
    table0 = jnp.asarray(rng.randn(v, d).astype(np.float32) * 0.01)
    acc0 = jnp.full((v, d), 0.1, jnp.float32)
    if n:
      rows = jnp.sort(jnp.asarray(
          rng.zipf(1.2, n).astype(np.int64) % v, jnp.int32))
      upd = jnp.asarray(rng.randn(n, d).astype(np.float32))
    else:
      # All-sentinel rows: every block takes the empty fast path.
      rows = jnp.full((128,), 2**31 - 1, jnp.int32)
      upd = jnp.zeros((128, d), jnp.float32)

    def one_step(carry, _):
      table, acc, shift = carry
      g = upd * (1.0 + 1e-6 * shift)
      table, acc = adagrad_update_sorted(
          table, acc, rows, g, lr=0.1, block_rows=br, chunk=128,
          precision='default', interpret=interpret)
      return (table, acc, shift + 1.0), ()

    @jax.jit
    def run(table, acc):
      (table, acc, _), _ = jax.lax.scan(
          one_step, (table, acc, jnp.float32(0.0)), None,
          length=args.inner)
      return table[0, 0] + acc[0, 0]

    try:
      t0 = time.time()
      float(run(table0, acc0))
      compile_s = time.time() - t0
      times = []
      for _ in range(args.repeats):
        t0 = time.time()
        float(run(table0, acc0))
        times.append((time.time() - t0) / args.inner)
      ms = 1000.0 * min(times)
      gbps = 4.0 * v * d * 4 / (ms / 1e3) / 1e9  # table+acc, in+out
      r = {'case': spec, 'ms': round(ms, 3), 'GBps': round(gbps, 1),
           'nblocks': -(-v // br), 'compile_s': round(compile_s, 1)}
      results.append(r)
      print(r, file=_sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001 — report and continue sweep
      results.append({'case': spec, 'error': str(e)[:300]})
      print(f'{spec}: ERROR {e}', file=_sys.stderr, flush=True)

  print(json.dumps(results))


if __name__ == '__main__':
  main()
