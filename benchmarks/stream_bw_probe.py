"""Stream-bandwidth probes (round-4 update-phase residual).

Hypothesis tested: XLA's plain elementwise passes over the SAME arrays
run much faster than the Pallas block stream — if so, the bulk bytes
(table+acc read/write) should ride XLA and only the scatter
(irregular) part should stay in Pallas ("dense-split" update:
kernel -> dense gsum, then one fused XLA Adagrad apply).

MEASURED OUTCOME (one v5e chip, flagship packed shape): DISPROVEN.
Canonical run (docs/benchmarks.md table; run-to-run spread ~4% on
these cases): xla3 apply 2.49 ms @ 342 GB/s vs fused pass-through
2.29 ms @ 297 GB/s — XLA elementwise is only ~1.15x per byte, and the
gsum kernel alone costs ~3.0 ms (the one-hot scatter MXU work that the
fused kernel hides under the table stream; round-5 corrected — the
earlier 3.4 included an uncounted update-list pass). Dense-split total
~5.5 ms > fused in-step ~4.1 ms, so `emb_update_split_dense`
defaults off; full table in docs/benchmarks.md.

Cases:
  xla2     donated XLA elementwise pass over table+acc (the bulk-byte
           ceiling for the dense-split apply)
  xla3     table+acc+gsum read, table+acc write (the actual dense-split
           apply shape: 3 reads, 2 writes)
  pass:BR  current fused kernel pass-through at block_rows=BR (4
           streamed operands, in/out aliased)
  gsum:BR  output-only gsum kernel at block_rows=BR (added with the
           dense-split implementation; skipped if not present)

Timing: axon-safe (lax.scan inside jit, carry-dependent, scalar
readback). Usage: python benchmarks/stream_bw_probe.py [--inner 20]
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
  p.add_argument('--inner', type=int, default=20)
  p.add_argument('--repeats', type=int, default=3)
  p.add_argument('--cases', nargs='*', default=None)
  args = p.parse_args()

  import jax
  import jax.numpy as jnp
  import numpy as np
  from hybridbackend_tpu.ops.pallas.scatter import adagrad_update_sorted

  interpret = jax.default_backend() != 'tpu'

  # Packed flagship shape: [2.6M, 16] resident as [332800, 128].
  KV, KD = 332800, 128
  N = 213504  # padded 26*8192
  rng = np.random.RandomState(0)
  table0 = jnp.asarray(rng.randn(KV, KD).astype(np.float32) * 0.01)
  acc0 = jnp.full((KV, KD), 0.1, jnp.float32)
  bytes_tbl = KV * KD * 4

  results = []

  def timed(name, run_fn, carry0, nbytes):
    # float(...) forces a synchronous scalar readback — on the axon
    # backend block_until_ready is a NO-OP and an un-read dispatch
    # measures enqueue time only (xla2 "measured" 0.001 ms that way).
    try:
      t0 = time.time()
      float(run_fn(*carry0))
      compile_s = time.time() - t0
      times = []
      for _ in range(args.repeats):
        t0 = time.time()
        float(run_fn(*carry0))
        times.append((time.time() - t0) / args.inner)
      ms = 1000.0 * min(times)
      r = {'case': name, 'ms': round(ms, 3),
           'GBps': round(nbytes / (ms / 1e3) / 1e9, 1),
           'compile_s': round(compile_s, 1)}
    except Exception as e:  # noqa: BLE001 — report and continue sweep
      r = {'case': name, 'error': str(e)[:300]}
    results.append(r)
    print(r, file=_sys.stderr, flush=True)

  cases = args.cases or ['xla2', 'xla3', 'pass:1024', 'pass:2048',
                         'gsum:2048', 'gsum:4096', 'gsum:8192']

  for spec in cases:
    if spec == 'xla2':
      # table+acc in and out: 4 table-sized transfers = the fused
      # kernel's pass-through traffic, expressed as plain XLA.
      def one(carry, _):
        t, a, s = carry
        c = 1.0 + 1e-7 * s
        # Barrier: without it XLA fuses all `inner` multiplies into
        # ONE pass over t/a (measured 0.002 ms "per step") — the
        # barrier forces each iteration to materialize.
        t, a = jax.lax.optimization_barrier((t * c, a * c))
        return (t, a, s + 1.0), ()

      @jax.jit
      def run2(t, a):
        (t, a, _), _ = jax.lax.scan(one, (t, a, jnp.float32(0)), None,
                                    length=args.inner)
        return t[0, 0] + a[0, 0]

      timed('xla2', run2, (table0, acc0), 4 * bytes_tbl)
    elif spec == 'xla3':
      # The dense-split apply: reads table+acc+gsum, writes table+acc.
      g0 = jnp.asarray(rng.randn(KV, KD).astype(np.float32) * 1e-3)

      def one3(carry, _):
        t, a, s = carry
        g = g0 * (1.0 + 1e-7 * s)
        a2 = a + g * g
        t2 = t - 0.1 * g * jax.lax.rsqrt(a2 + 1e-8)
        t2, a2 = jax.lax.optimization_barrier((t2, a2))
        return (t2, a2, s + 1.0), ()

      @jax.jit
      def run3(t, a):
        (t, a, _), _ = jax.lax.scan(one3, (t, a, jnp.float32(0)), None,
                                    length=args.inner)
        return t[0, 0] + a[0, 0]

      timed('xla3', run3, (table0, acc0), 5 * bytes_tbl)
    elif spec.startswith('pass:'):
      br = int(spec.split(':')[1])
      rows = jnp.full((128,), 2**31 - 1, jnp.int32)
      upd = jnp.zeros((128, KD), jnp.float32)

      def onep(carry, _, br=br):
        t, a, s = carry
        t, a = adagrad_update_sorted(
            t, a, rows, upd * (1.0 + 1e-7 * s), lr=0.1,
            block_rows=br, chunk=128, precision='default',
            interpret=interpret)
        return (t, a, s + 1.0), ()

      @jax.jit
      def runp(t, a, onep=onep):
        (t, a, _), _ = jax.lax.scan(onep, (t, a, jnp.float32(0)), None,
                                    length=args.inner)
        return t[0, 0] + a[0, 0]

      timed(spec, runp, (table0, acc0), 4 * bytes_tbl)
    elif spec.startswith('gsum:'):
      br = int(spec.split(':')[1])
      try:
        from hybridbackend_tpu.ops.pallas.scatter import (
            gsum_dense_sorted)
      except ImportError:
        results.append({'case': spec, 'error': 'gsum kernel absent'})
        continue
      rows = jnp.sort(jnp.asarray(
          rng.zipf(1.2, N).astype(np.int64) % KV, jnp.int32))
      upd = jnp.asarray(rng.randn(N, KD).astype(np.float32))

      def oneg(carry, _, br=br):
        s, sh = carry
        # Carry dependence rides the CHEAP rows array ([N] int32,
        # ~0.9 MB), not a materialized pass over the 109 MB update
        # list: min(int(sh), 0) is 0 at runtime (sh >= 0) but not
        # foldable, so each iteration's kernel depends on the carry
        # without adding uncounted HBM traffic.
        rows_i = rows + jnp.minimum(sh.astype(jnp.int32), 0)
        g = gsum_dense_sorted(rows_i, upd, KV,
                              block_rows=br, chunk=128,
                              precision='default', interpret=interpret)
        return (s + g[0, 0], sh + 1.0), ()

      @jax.jit
      def rung(oneg=oneg):
        (s, _), _ = jax.lax.scan(oneg, (jnp.float32(0),
                                        jnp.float32(0)), None,
                                 length=args.inner)
        return s

      # gsum writes one table of bytes + reads the update list.
      timed(spec, rung, (), bytes_tbl + N * KD * 4)

  print(json.dumps(results))


if __name__ == '__main__':
  main()


__all__ = ['main']
