"""Stream-update kernel sweep: (block_rows, chunk, precision) on TPU.

Measures `adagrad_update_sorted` standalone at the DIN-ish flagship
shape (1M x 32 table, 133k sorted updates) using the axon-safe timing
recipe: the step loop runs INSIDE jit via lax.scan with carry-dependent
rows (XLA cannot hoist), one scalar readback at the end.

Usage: python benchmarks/update_kernel_sweep.py [--vocab 1048576]
    [--dim 32] [--updates 133120] [--inner 10] [--json]
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
  p.add_argument('--vocab', type=int, default=1 << 20)
  p.add_argument('--dim', type=int, default=32)
  p.add_argument('--updates', type=int, default=133_120)
  p.add_argument('--inner', type=int, default=10)
  p.add_argument('--repeats', type=int, default=2)
  p.add_argument('--json', action='store_true')
  p.add_argument('--variants', nargs='*', default=None,
                 help='block_rows:chunk:precision[:dma_chunk[:window]] '
                      'specs')
  args = p.parse_args()

  import jax
  import jax.numpy as jnp
  import numpy as np
  from hybridbackend_tpu.ops.pallas.scatter import adagrad_update_sorted

  interpret = jax.default_backend() != 'tpu'
  v, d, n = args.vocab, args.dim, args.updates
  rng = np.random.RandomState(0)
  table0 = jnp.asarray(rng.randn(v, d).astype(np.float32) * 0.01)
  acc0 = jnp.full((v, d), 0.1, jnp.float32)
  base_rows = jnp.sort(jnp.asarray(
      rng.zipf(1.2, n).astype(np.int64) % v, jnp.int32))
  upd = jnp.asarray(rng.randn(n, d).astype(np.float32))

  variants = args.variants or [
      '1024:128:highest', '1024:256:highest', '1024:512:highest',
      '2048:256:highest', '1024:128:default', '1024:256:default',
      '512:128:highest',
  ]

  results = []
  for spec in variants:
    parts = spec.split(':')
    br, ch, prec = int(parts[0]), int(parts[1]), parts[2]
    dmac = int(parts[3]) if len(parts) > 3 else 0
    win = int(parts[4]) if len(parts) > 4 else -1

    def one_step(carry, _):
      table, acc, shift = carry
      # Carry-dependent rows defeat hoisting; stay sorted by adding a
      # constant shift modulo vocab... shifting breaks sortedness, so
      # instead rotate the GRADIENTS (payload) by the carry — rows stay
      # fixed+sorted, the kernel still depends on the carry.
      g = upd * (1.0 + 1e-6 * shift)
      kw = {} if win < 0 else {'window_rows': win}
      table, acc = adagrad_update_sorted(
          table, acc, base_rows, g, lr=0.1, block_rows=br, chunk=ch,
          precision=prec, interpret=interpret, dma_chunk=dmac, **kw)
      return (table, acc, shift + 1.0), ()

    @jax.jit
    def run(table, acc):
      (table, acc, _), _ = jax.lax.scan(
          one_step, (table, acc, jnp.float32(0.0)), None,
          length=args.inner)
      return table[0, 0] + acc[0, 0]

    try:
      t_compile0 = time.time()
      float(run(table0, acc0))  # compile + warm
      compile_s = time.time() - t_compile0
      times = []
      for _ in range(args.repeats):
        t0 = time.time()
        float(run(table0, acc0))
        times.append((time.time() - t0) / args.inner)
      ms = 1000.0 * min(times)
      results.append({'variant': spec, 'ms_per_update': round(ms, 3),
                      'compile_s': round(compile_s, 1)})
      print(f'{spec}: {ms:.3f} ms/update (compile {compile_s:.0f}s)',
            file=_sys.stderr)
    except Exception as e:  # noqa: BLE001 — report and continue sweep
      results.append({'variant': spec, 'error': str(e)[:200]})
      print(f'{spec}: ERROR {e}', file=_sys.stderr)

  if args.json:
    print(json.dumps(results))
  else:
    for r in results:
      print(r)


if __name__ == '__main__':
  main()
