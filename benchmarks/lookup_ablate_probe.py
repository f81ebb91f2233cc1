"""Ablate fx.lookup_raw (7.7 ms) against the raw packed gather (4.8 ms).

Cases:
  full      fx.lookup_raw on the flagship extractor (reference point)
  lookup    embedding.lookup on precomputed stacked ids (skips pack_ids)
  hand      hand-rolled take(mode=fill) + lane one-hot select
  packonly  take(mode=fill) on packed rows, no lane select

Timing: axon-safe (lax.scan inside jit, carry-dependent ids, scalar
readback). Usage: python benchmarks/lookup_ablate_probe.py [--cases ...]
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
  p.add_argument('--batch', type=int, default=8192)
  p.add_argument('--tables', type=int, default=26)
  p.add_argument('--dim', type=int, default=16)
  p.add_argument('--vocab', type=int, default=100_000)
  p.add_argument('--cases', nargs='*', default=None)
  args = p.parse_args()

  import jax
  import jax.numpy as jnp
  import numpy as np
  import hybridbackend_tpu as hb
  from hybridbackend_tpu.embedding import TableConfig
  from hybridbackend_tpu.embedding.lookup import lookup
  from hybridbackend_tpu.embedding.stack import pack_ids
  from hybridbackend_tpu.models import EmbeddingSpec, StackedFeatureExtractor

  ctx = hb.Context.get()
  specs = [EmbeddingSpec(TableConfig(f'c{i}', args.vocab, args.dim))
           for i in range(args.tables)]
  key = jax.random.PRNGKey(0)
  fx = StackedFeatureExtractor(specs, dense_columns=[], ctx=ctx)
  tables = fx.init(key)
  (stack,) = fx.stacks
  name = stack.stacked.name
  table = tables[name]
  scfg = stack.stacked
  print('stacked config:', scfg.name, 'vocab', scfg.vocab_size,
        'dim', scfg.dim, 'shuffle', scfg.shuffle_ids,
        'physical', tuple(table.shape), 'pack', scfg.pack_of(table),
        file=_sys.stderr)

  rng = np.random.RandomState(0)
  B = args.batch
  base = {f'c{i}': jnp.asarray(rng.randint(0, args.vocab, B), jnp.int32)
          for i in range(args.tables)}

  def batch_at(i):
    b = {}
    for k, v in base.items():
      b[k] = (v + i.astype(jnp.int32)) % args.vocab
    return b

  member = fx.member_ids(base)[name]
  all_ids0, layout = pack_ids(stack, member)

  def ids_at(i):
    # Same id-churn as batch_at, applied post-stacking: keeps each id
    # within its member's vocab range (offsets are multiples of vocab).
    off = (all_ids0 // args.vocab) * args.vocab
    return off + (all_ids0 - off + i.astype(jnp.int32)) % args.vocab

  cases = {}

  def full_body(carry, _):
    s, i = carry
    raw, ids_by_stack, _ = fx.lookup_raw(tables, batch_at(i))
    out = sum(jnp.sum(r[0, 0]) for r in raw.values())
    out = out + sum(v[0, 0].astype(jnp.float32)
                    for v in ids_by_stack.values())
    return (s + out, i + 1), ()

  cases['full'] = full_body

  def lookup_body(carry, _):
    s, i = carry
    ids = ids_at(i)
    out = lookup(table, ids, scfg, ctx=ctx)
    return (s + out[0, 0].sum() + ids[0, 0].astype(jnp.float32), i + 1), ()

  cases['lookup'] = lookup_body

  v_phys, lanes = table.shape
  pk = scfg.pack_of(table)
  d = args.dim

  def hand_body(carry, _):
    s, i = carry
    rows = ids_at(i)
    prows = rows // pk
    wide = jnp.take(table, prows, axis=0, mode='fill', fill_value=0)
    lane = (rows % pk).astype(jnp.int32)
    oh = (lane[..., None] == jnp.arange(pk, dtype=jnp.int32)
          ).astype(wide.dtype)
    wide = wide.reshape(*rows.shape, pk, d)
    out = (wide * oh[..., None]).sum(-2)
    return (s + out[0, 0].sum() + rows[0, 0].astype(jnp.float32), i + 1), ()

  cases['hand'] = hand_body

  def packonly_body(carry, _):
    s, i = carry
    rows = ids_at(i)
    prows = rows // pk
    wide = jnp.take(table, prows, axis=0, mode='fill', fill_value=0)
    return (s + wide[0, 0].sum() + rows[0, 0].astype(jnp.float32), i + 1), ()

  cases['packonly'] = packonly_body

  wanted = args.cases or list(cases)
  results = []
  for cname in wanted:
    body = cases[cname]

    def run(x0):
      (s, _), _ = jax.lax.scan(body, (x0, jnp.int32(0)), None,
                               length=args.inner)
      return s

    runj = jax.jit(run)
    t0 = time.time()
    float(runj(jnp.float32(0.0)))
    compile_s = time.time() - t0
    best = None
    for _ in range(args.repeats):
      t0 = time.time()
      float(runj(jnp.float32(0.0)))
      dt = (time.time() - t0) / args.inner * 1000.0
      best = dt if best is None else min(best, dt)
    rec = {'case': cname, 'ms': round(best, 3),
           'compile_s': round(compile_s, 1)}
    print(rec, file=_sys.stderr)
    results.append(rec)
  print(json.dumps(results))


if __name__ == '__main__':
  main()
