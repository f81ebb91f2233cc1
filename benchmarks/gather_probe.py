"""Forward-gather micro-probe (the flagship step's dominant cost).

step_phase_probe measured fx.lookup_raw at 7.7 ms — more than the
table-update kernel. The payload is a 213k-row random gather from the
packed [325k, 128] f32 table (109 MB → ~14 GB/s effective). Variants:

  take       jnp.take, no masking (raw XLA gather)
  takefill   jnp.take(mode='fill') + validity where (the lookup's form)
  lane       full packed-lookup form: takefill + lane one-hot select
  sorted     argsort ids -> gather with indices_are_sorted=True
             (no unsort — upper bound for a sorted-access gather)
  unsort     the inverse-permutation gather alone ([N,128] by [N] perm)
  narrow     jnp.take from the UNPACKED [2.6M, 16] table (does XLA move
             padded 128-lane tiles per row, or 64 B?)
  dot       one-hot matmul gather of a 2048-id chunk vs take (MXU route)

Timing: axon-safe (lax.scan inside jit, carry-dependent ids, scalar
readback). Usage: python benchmarks/gather_probe.py [--cases ...]
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
  p.add_argument('--n', type=int, default=213 * 1024)
  p.add_argument('--vocab', type=int, default=2_662_400)
  p.add_argument('--dim', type=int, default=16)
  p.add_argument('--cases', nargs='*', default=None)
  args = p.parse_args()

  import jax
  import jax.numpy as jnp
  import numpy as np

  P = 128 // args.dim
  KV = args.vocab // P
  rng = np.random.RandomState(0)
  table = jnp.asarray(rng.randn(KV, 128).astype(np.float32) * 0.01)
  narrow_tab = jnp.asarray(
      rng.randn(args.vocab, args.dim).astype(np.float32) * 0.01)
  ids0 = jnp.asarray(rng.randint(0, args.vocab, args.n), jnp.int32)

  def shift(i):
    return (ids0 + i.astype(jnp.int32)) % args.vocab

  cases = {}

  def take_body(carry, _):
    s, i = carry
    prows = shift(i) // P
    out = jnp.take(table, prows, axis=0)
    return (s + out[0, 0], i + 1), ()

  cases['take'] = take_body

  def takefill_body(carry, _):
    s, i = carry
    ids = shift(i)
    prows = ids // P
    out = jnp.take(table, prows, axis=0, mode='fill', fill_value=0)
    out = jnp.where((ids >= 0)[:, None], out, 0)
    return (s + out[0, 0], i + 1), ()

  cases['takefill'] = takefill_body

  def lane_body(carry, _):
    s, i = carry
    ids = shift(i)
    prows = jnp.where(ids >= 0, ids // P, ids)
    wide = jnp.take(table, prows, axis=0, mode='fill', fill_value=0)
    wide = jnp.where((ids >= 0)[:, None], wide, 0)
    lane = jnp.where(ids >= 0, (ids % P).astype(jnp.int32), 0)
    oh = (lane[:, None] == jnp.arange(P, dtype=jnp.int32)).astype(
        wide.dtype)
    out = (wide.reshape(-1, P, args.dim) * oh[..., None]).sum(-2)
    return (s + out[0, 0], i + 1), ()

  cases['lane'] = lane_body

  def sorted_body(carry, _):
    s, i = carry
    prows = jnp.sort(shift(i) // P)
    out = jax.lax.gather(
        table, prows[:, None],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0,)),
        (1, 128), indices_are_sorted=True, mode='fill')
    return (s + out[0, 0], i + 1), ()

  cases['sorted'] = sorted_body

  def unsort_body(carry, _):
    s, i = carry
    # A permutation gather of the [N, 128] intermediate (models the
    # unsort an order-restoring sorted-gather pipeline would need).
    perm = jnp.argsort(shift(i))
    src = jnp.take(table, jnp.arange(args.n, dtype=jnp.int32) % KV,
                   axis=0)
    out = jnp.take(src + s, perm % args.n, axis=0)
    return (s + out[0, 0], i + 1), ()

  cases['unsort'] = unsort_body

  def narrow_body(carry, _):
    s, i = carry
    out = jnp.take(narrow_tab, shift(i), axis=0)
    return (s + out[0, 0], i + 1), ()

  cases['narrow'] = narrow_body

  qtab = jnp.asarray(
      (rng.randn(args.vocab, args.dim) * 20).astype(np.int8))
  qscale = jnp.asarray(rng.rand(args.vocab).astype(np.float32) * 0.01)

  def int8_body(carry, _):
    # Serving-time quantized lookup: int8 narrow rows + f32 scales,
    # dequant after the gather (embedding/quant.py form). Measures
    # whether the gather is byte-rate- or row-rate-bound.
    s, i = carry
    ids = shift(i)
    qe = jnp.take(qtab, ids, axis=0)
    sc = jnp.take(qscale, ids, axis=0)
    out = qe.astype(jnp.float32) * sc[:, None]
    return (s + out[0, 0], i + 1), ()

  cases['int8'] = int8_body

  q_packed = jnp.asarray(
      (rng.randn(args.vocab, args.dim) * 20).astype(np.int8)
      .reshape(KV, 128))

  def int8p_body(carry, _):
    # Round-4 packed int8 serving lookup (embedding/quant.py): packed
    # gather + ONE wide einsum fusing dequant and lane select (scale
    # rides the one-hot) — no narrow intermediates.
    s, i = carry
    ids = shift(i)
    prow = ids // P
    lane = (ids % P).astype(jnp.int32)
    qrows = jnp.take(q_packed, prow, axis=0)           # [n, 128] int8
    q3 = qrows.reshape(args.n, P, args.dim).astype(jnp.float32)
    sc = jnp.take(qscale, ids, axis=0)
    ohs = (lane[:, None] == jnp.arange(P, dtype=jnp.int32)[None, :]
           ).astype(jnp.float32) * sc[:, None]
    out = jnp.einsum('np,npd->nd', ohs, q3)
    return (s + out[0, 0], i + 1), ()

  cases['int8p'] = int8p_body

  def int8p2_body(carry, _):
    # Same data flow, f32-lane-select formulation: wide cast on the 2-D
    # [n, 128] form, then broadcast-multiply-reduce (VPU) instead of an
    # einsum (which lowers to a tiny batched dot).
    s, i = carry
    ids = shift(i)
    prow = ids // P
    lane = (ids % P).astype(jnp.int32)
    qrows = jnp.take(q_packed, prow, axis=0)           # [n, 128] int8
    wide = qrows.astype(jnp.float32)
    sc = jnp.take(qscale, ids, axis=0)
    ohs = (lane[:, None] == jnp.arange(P, dtype=jnp.int32)[None, :]
           ).astype(jnp.float32) * sc[:, None]
    out = (wide.reshape(args.n, P, args.dim)
           * ohs[..., None]).sum(-2)
    return (s + out[0, 0], i + 1), ()

  cases['int8p2'] = int8p2_body

  def int8p3_body(carry, _):
    # bf16 select (EXACT: int8 values and 0/1 one-hots are
    # bf16-representable, only one term per sum) + narrow f32 dequant.
    s, i = carry
    ids = shift(i)
    prow = ids // P
    lane = (ids % P).astype(jnp.int32)
    qrows = jnp.take(q_packed, prow, axis=0)
    q3 = qrows.reshape(args.n, P, args.dim).astype(jnp.bfloat16)
    oh = (lane[:, None] == jnp.arange(P, dtype=jnp.int32)[None, :]
          ).astype(jnp.bfloat16)
    sel = (q3 * oh[..., None]).sum(-2)               # [n, d] bf16 exact
    sc = jnp.take(qscale, ids, axis=0)
    out = sel.astype(jnp.float32) * sc[:, None]
    return (s + out[0, 0], i + 1), ()

  cases['int8p3'] = int8p3_body

  def int8p4_body(carry, _):
    # All-int8 select (VPU integer ops, 27 MB of traffic), then the
    # narrow cast+dequant.
    s, i = carry
    ids = shift(i)
    prow = ids // P
    lane = (ids % P).astype(jnp.int32)
    qrows = jnp.take(q_packed, prow, axis=0)
    q3 = qrows.reshape(args.n, P, args.dim)
    oh = (lane[:, None] == jnp.arange(P, dtype=jnp.int32)[None, :]
          ).astype(jnp.int8)
    sel = (q3 * oh[..., None]).sum(-2, dtype=jnp.int32)   # [n, d]
    sc = jnp.take(qscale, ids, axis=0)
    out = sel.astype(jnp.float32) * sc[:, None]
    return (s + out[0, 0], i + 1), ()

  cases['int8p4'] = int8p4_body

  def int8p5_body(carry, _):
    # Unrolled static-slice masked sum — no reshape, no reduction axis
    # (probes whether XLA loop-fuses the select when nothing forces a
    # materialized wide intermediate; measured: it does NOT — the wide
    # int8→f32 cast still splits the fusion).
    s, i = carry
    ids = shift(i)
    prow = ids // P
    lane = (ids % P).astype(jnp.int32)
    qrows = jnp.take(q_packed, prow, axis=0)
    sc = jnp.take(qscale, ids, axis=0)
    out = None
    for p in range(P):
      selp = jnp.where(lane == p, sc, 0.0)[:, None]
      term = qrows[:, p*args.dim:(p+1)*args.dim].astype(jnp.float32) * selp
      out = term if out is None else out + term
    return (s + out[0, 0], i + 1), ()

  cases['int8p5'] = int8p5_body

  def int8p6_body(carry, _):
    # NARROW-DOMAIN select: where-chain over int8 slices — nothing wide
    # is ever cast; the only f32 arrays are [n, d]. The round-4 winner
    # (see docs/benchmarks.md): the wide cast was the fusion breaker,
    # not the select shape.
    s, i = carry
    ids = shift(i)
    prow = ids // P
    lane = (ids % P).astype(jnp.int32)
    qrows = jnp.take(q_packed, prow, axis=0)
    sc = jnp.take(qscale, ids, axis=0)
    out8 = qrows[:, :args.dim]
    for p in range(1, P):
      out8 = jnp.where((lane == p)[:, None],
                       qrows[:, p*args.dim:(p+1)*args.dim], out8)
    out = out8.astype(jnp.float32) * sc[:, None]
    return (s + out[0, 0], i + 1), ()

  cases['int8p6'] = int8p6_body

  q32_packed = jax.lax.bitcast_convert_type(
      np.asarray(q_packed).reshape(KV, 32, 4), jnp.int32)

  def int8p7_body(carry, _):
    # int32-word select: bitcast the packed row to 32 int32 words,
    # masked-sum the logical row's 4 words (narrow [n, 4]), shift-unpack
    # the 16 bytes, then the narrow cast+dequant.
    s, i = carry
    ids = shift(i)
    prow = ids // P
    lane = (ids % P).astype(jnp.int32)
    rows32 = jnp.take(q32_packed, prow, axis=0)
    sc = jnp.take(qscale, ids, axis=0)
    w = None
    for p in range(P):
      term = jnp.where((lane == p)[:, None], rows32[:, p*4:(p+1)*4], 0)
      w = term if w is None else w + term
    cols = [(w << (24 - 8*b)) >> 24 for b in range(4)]
    b8 = jnp.stack(cols, axis=-1).reshape(w.shape[0], 16)
    out = b8.astype(jnp.float32) * sc[:, None]
    return (s + out[0, 0], i + 1), ()

  cases['int8p7'] = int8p7_body

  def dot_body(carry, _):
    # One-hot matmul gather, blocked: 128-id chunks against the table
    # restricted to each chunk's sorted id range (static 2048-row
    # window), all as MXU dots. Probes the matmul-route's ceiling.
    s, i = carry
    prows = jnp.sort(shift(i) // P)
    n, c = args.n, 2048
    nch = n // c
    base = prows[::c]  # window start per chunk (sorted → local window)
    win = 4096
    starts = jnp.minimum(base, KV - win)
    local = prows.reshape(nch, c) - starts[:, None]

    def chunk(acc, t):
      st, loc = t
      blk = jax.lax.dynamic_slice(table, (st, 0), (win, 128))
      oh = (loc[:, None] == jnp.arange(win, dtype=jnp.int32)[None, :]
            ).astype(jnp.float32)
      out = oh @ blk
      return acc + out[0, 0], ()

    acc, _ = jax.lax.scan(chunk, jnp.float32(0.0), (starts, local))
    return (s + acc, i + 1), ()

  cases['dot'] = dot_body

  results = []
  for name in (args.cases or ['take', 'takefill', 'lane', 'sorted',
                              'narrow', 'unsort']):
    body = cases[name]
    carry0 = (jnp.float32(0.0), jnp.float32(0.0))

    @jax.jit
    def run(c0, body=body):
      c, _ = jax.lax.scan(body, c0, None, length=args.inner)
      return c[0]

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
