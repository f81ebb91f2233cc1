"""Pallas TPU kernels: streaming scatter-add / sparse-Adagrad table update.

THE hot kernel of embedding training. XLA lowers ``table.at[rows].add(g)``
to a serialized per-row scatter (~117 ns/row measured on one chip: 25 ms
for 213k rows into a [2.6M, 16] table — the entire train-step budget).
This kernel re-states the update as a **table stream**: the table walks
through VMEM block by block (HBM-bandwidth bound, in-place via
input/output aliasing), and each block applies only its own slice of the
**row-sorted** update list (found by a precomputed per-block prefix) with
on-chip row read-modify-writes.

This is the TPU answer to the reference's CUDA scatter kernels
(``/root/reference/hybridbackend/tensorflow/embedding/lookup_functors.cu.cc:40-170``
warp-cooperative atomics): no atomics exist on TPU, so ordering comes
from the sort and block ownership instead.

Layout contract:
  * ``rows`` are int32, sorted ascending; invalid entries are ``-1``
    (skipped) or ``>= vocab`` (must sort to the end, consumed by no
    block). Duplicates allowed — combined into per-row TOTALS by the
    one-hot matmul (exact for add; exact-total Adagrad semantics: the
    accumulator sees the squared row total, not per-occurrence squares).
  * ``vocab % block_rows == 0`` and ``len(rows) % chunk == 0`` — callers
    pad (see :func:`pad_updates`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 2048   # table rows per grid step of the add/adagrad
                     # streams. Pre-window, the one-hot matmul scaled
                     # with block_rows and 1024 won; the round-4
                     # windowed one-hot decouples them, and 2048 halves
                     # the per-iteration fixed cost: flagship exact
                     # step 7.60 -> 7.19 ms on one v5e chip (2048+win
                     # 256 vs 1024+win 512). 4096 OOMs scoped VMEM
                     # (4 block operands double-buffered + gsum).
_BLOCK_ROWS_ADAM = 1024  # LazyAdam streams THREE state arrays (table,
                     # m, v, each in+out): 2048 blocks put 12 MB of
                     # double-buffered operands against the 16 MB VMEM
                     # budget at d=128 — stay at 1024.
_CHUNK = 128         # update rows DMA'd per inner iteration (smaller
                     # chunks waste less one-hot work on sparse blocks)
_WINDOW_ROWS = 256   # one-hot window (rows): sorted chunks span narrow
                     # row ranges, so the one-hot matmul runs against a
                     # dynamic-offset window instead of the whole block
                     # (block_rows/window fewer MXU ops; wider-spanning
                     # chunks take the exact full-block fallback). 0 =
                     # always full block.


def _split_dots(onehot_bf16, upd, precision):
  """One-hot × updates with ASYMMETRIC precision: the one-hot factor is
  exactly 0/1 (bf16-representable), so an f32-exact contract needs only
  the UPDATE operand split into bf16 limbs — 3 MXU passes instead of the
  6 a symmetric ``Precision.HIGHEST`` f32×f32 costs (XLA's precision API
  cannot express one-sided exactness; in-kernel we can).

  hi/mid/lo reconstruction is exact for every f32 input: ``r1 = u - hi``
  is exact (≤16 mantissa bits left), ``r2 = r1 - mid`` is exact (≤8
  bits), so ``hi + mid + lo == u`` in real arithmetic and each product
  against a 0/1 selector is the limb itself, accumulated in the MXU's
  f32 accumulator.
  """
  def dot(u16):
    return jax.lax.dot_general(
        onehot_bf16, u16,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

  if (precision != jax.lax.Precision.HIGHEST
      or upd.dtype == jnp.bfloat16):
    # One bf16 pass: 'default' contract semantics — or bf16 updates,
    # where a single pass is already exact.
    return dot(upd.astype(jnp.bfloat16))
  u = upd.astype(jnp.float32)
  hi = u.astype(jnp.bfloat16)
  r1 = u - hi.astype(jnp.float32)
  mid = r1.astype(jnp.bfloat16)
  lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
  return dot(hi) + dot(mid) + dot(lo)


def _accumulate_updates(rows_ref, upd_hbm, gsum_ref, upd_s, sems, b,
                        start, end, *, block_rows, chunk, precision,
                        window_rows, dma_chunk):
  """Walk one block's slice ``[start, end)`` of the row-sorted update
  list and accumulate one-hot-matmul per-row TOTALS into ``gsum_ref``
  (VMEM ``[block_rows, lanes]``, pre-zeroed by the caller). Shared by
  the fused update kernels (:func:`_scatter_kernel`) and the
  dense-split gsum kernel (:func:`_gsum_kernel`)."""
  win = window_rows if 0 < window_rows < block_rows else 0

  def accumulate(upd_view, c0):
    """One-hot matmul of chunk ``c0`` (update rows staged in
    ``upd_view`` [chunk, lanes]).

    With ``win`` set, the one-hot is computed against a ``win``-row
    WINDOW at a dynamic (8-aligned) offset instead of the whole
    block: the update list is row-sorted, so a chunk's valid rows
    span a narrow range, and the MXU work drops from
    ``block_rows × chunk`` to ``win × chunk`` per chunk. Chunks that
    span wider than the window (sparse regions, segment gaps) take
    the full-block path — exact either way.
    """
    ci = c0 // chunk
    # rows live in VMEM as [nchunks, chunk]; grab this chunk's row.
    raw = rows_ref[pl.ds(ci, 1), :]                     # [1, chunk]
    local = raw - b * block_rows

    def full_block():
      onehot_t = (jax.lax.broadcasted_iota(
          jnp.int32, (block_rows, chunk), 0) == local).astype(
              jnp.bfloat16)
      gsum_ref[...] += _split_dots(onehot_t, upd_view, precision
                                   ).astype(gsum_ref.dtype)

    if not win:
      full_block()
      return

    valid = (local >= 0) & (local < block_rows)
    vlo = jnp.min(jnp.where(valid, local, block_rows))
    vhi = jnp.max(jnp.where(valid, local, -1))
    w0 = jnp.minimum((vlo // 8) * 8, block_rows - win)
    w0 = pl.multiple_of(jnp.maximum(w0, 0), 8)

    @pl.when(vhi - w0 < win)
    def _():
      onehot_t = (jax.lax.broadcasted_iota(
          jnp.int32, (win, chunk), 0) + w0 == local).astype(
              jnp.bfloat16)
      gsum_ref[pl.ds(w0, win), :] += _split_dots(
          onehot_t, upd_view, precision).astype(gsum_ref.dtype)

    @pl.when(vhi - w0 >= win)
    def _():
      full_block()

  if not dma_chunk:
    def process_chunk(c0):
      c0 = pl.multiple_of(c0, chunk)
      upd_cp = pltpu.make_async_copy(
          upd_hbm.at[pl.ds(c0, chunk), :], upd_s,
          sems.at[0])
      upd_cp.start()
      upd_cp.wait()
      accumulate(upd_s[...], c0)
      return c0 + chunk

    # Walk this block's update range in CHUNK-ALIGNED pieces (DMA
    # starts must be tile-aligned; out-of-range rows a rounded-down
    # chunk drags in vanish in the one-hot).
    jax.lax.while_loop(lambda c: c < end, process_chunk,
                       (start // chunk) * chunk)
  else:
    # Decoupled transfer/compute granules: double-buffered
    # ``dma_chunk``-row super-chunk DMAs (amortizes per-transfer
    # fixed costs) with a STATIC inner loop of ``chunk``-row one-hot
    # matmuls from VMEM. upd_s is [2, dma_chunk, lanes].
    dmac = dma_chunk
    start_al = (start // dmac) * dmac
    nsup = (end - start_al + dmac - 1) // dmac

    def get_copy(slot, s0):
      return pltpu.make_async_copy(
          upd_hbm.at[pl.ds(s0, dmac), :], upd_s.at[slot],
          sems.at[slot])

    get_copy(0, pl.multiple_of(start_al, dmac)).start()

    def sup_body(i, _):
      s0 = pl.multiple_of(start_al + i * dmac, dmac)
      slot = jax.lax.rem(i, 2)

      @pl.when(i + 1 < nsup)
      def _():
        get_copy(jax.lax.rem(i + 1, 2),
                 pl.multiple_of(s0 + dmac, dmac)).start()

      get_copy(slot, s0).wait()
      for k in range(dmac // chunk):
        accumulate(upd_s[slot, pl.ds(k * chunk, chunk), :],
                   s0 + k * chunk)
      return 0

    jax.lax.fori_loop(0, nsup, sup_body, 0)


def _scatter_kernel(starts_ref, rows_ref, upd_hbm, tbl_ref, out_ref,
                    upd_s, gsum_s, sems, *, block_rows, chunk,
                    mode, eps, precision, window_rows=0,
                    lr_ref=None, acc_ref=None, acc_out_ref=None,
                    touched=False, dma_chunk=0):
  """Grid dim 0 walks table blocks.

  The per-block update is computed as a ONE-HOT MXU MATMUL, not a
  per-row loop: ``gsum[r] = Σ_j [rows[j] == r] · upd[j]`` — a
  [block, chunk] × [chunk, D] dot per chunk. Dynamic per-row VMEM
  read-modify-writes run at ~117 ns/row on the VPU (the same wall XLA's
  scatter hits); the matmul form moves the work to the MXU and sums
  duplicate rows exactly (= exact Adagrad row totals).

  Rows outside this block's range produce all-zero one-hot columns, so
  chunk-alignment slop, -1 invalids, and INT32_MAX padding all filter
  implicitly.

  starts_ref: SMEM [nblocks+1] — update index range of each block.
  rows_hbm/upd_hbm: full row-sorted update list, stays in HBM.
  tbl_ref/out_ref: the table block (aliased input/output) in VMEM.
  rows_ref: the full sorted row list, resident in VMEM as
  [nchunks, chunk] (a few hundred KB). upd_s: VMEM [chunk, 128·k]
  staging; gsum_s: VMEM [block_rows, lane-padded D] accumulator.
  """
  if touched:
    # Touched-block mode: the grid walks a scalar-prefetched LIST of
    # touched blocks instead of the whole table — iteration i handles
    # physical block meta[0, i] with update range [meta[1, i],
    # meta[2, i]). Untouched blocks are never DMA'd (input/output
    # aliasing leaves them in place); list padding repeats the last
    # touched block with an empty range (consecutive revisits, which
    # the pipeline allows).
    i = pl.program_id(0)
    b = starts_ref[0, i]
    start = starts_ref[1, i]
    end = starts_ref[2, i]
  else:
    b = pl.program_id(0)
    start = starts_ref[b]
    end = starts_ref[b + 1]

  # Fast path for blocks with no updates (zipf-skewed real workloads
  # leave most of the table untouched each step): pure pass-through,
  # no gsum zeroing, no matmul, no optimizer math. In touched mode an
  # empty range only occurs on PADDING revisits of the last touched
  # block — the out buffer already holds that block's updated content
  # (consecutive revisits stay resident), so writing the (stale) input
  # would clobber it: do nothing instead.
  if not touched:
    @pl.when(end <= start)
    def _():
      out_ref[...] = tbl_ref[...]
      if mode == 'adagrad':
        acc_out_ref[...] = acc_ref[...]
      elif mode == 'adam':
        acc_out_ref[0][...] = acc_ref[0][...]
        acc_out_ref[1][...] = acc_ref[1][...]

  @pl.when(end > start)
  def _():
    gsum_s[...] = jnp.zeros_like(gsum_s)
    _accumulate_updates(rows_ref, upd_hbm, gsum_s, upd_s, sems, b,
                        start, end, block_rows=block_rows, chunk=chunk,
                        precision=precision, window_rows=window_rows,
                        dma_chunk=dma_chunk)

    d = out_ref.shape[1]
    gsum = gsum_s[...][:, :d]
    if mode == 'add':
      out_ref[...] = (tbl_ref[...] + gsum).astype(out_ref.dtype)
    elif mode == 'adagrad':
      # Adagrad on per-row gradient totals (untouched rows: gsum=0).
      a = acc_ref[...].astype(jnp.float32) + gsum * gsum
      acc_out_ref[...] = a.astype(acc_out_ref.dtype)
      lr = lr_ref[0]  # scalar-prefetched: traced learning rates work
      out_ref[...] = (tbl_ref[...] - lr * gsum /
                      (jnp.sqrt(a) + eps)).astype(out_ref.dtype)
    else:  # lazy adam: moments decay only on touched rows
      lr = lr_ref[0]
      b1 = lr_ref[1]
      b2 = lr_ref[2]
      bc1 = lr_ref[3]   # 1 - b1**t (bias correction, computed outside)
      bc2 = lr_ref[4]
      # Presence rides the one-hot matmul: the wrapper sets lane ``d``
      # of every update row to 1, so gsum's lane d is the occurrence
      # count — rows present with an exactly-zero gradient total still
      # count as touched (TF LazyAdam updates every indexed row).
      touched = (gsum_s[...][:, d:d + 1] > 0).astype(gsum.dtype)
      m_ref, v_ref = acc_ref
      m_out, v_out = acc_out_ref
      m0 = m_ref[...].astype(jnp.float32)
      v0 = v_ref[...].astype(jnp.float32)
      m = jnp.where(touched > 0, b1 * m0 + (1 - b1) * gsum, m0)
      v = jnp.where(touched > 0, b2 * v0 + (1 - b2) * gsum * gsum, v0)
      m_out[...] = m.astype(m_out.dtype)
      v_out[...] = v.astype(v_out.dtype)
      out_ref[...] = (tbl_ref[...] - touched * (
          lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps))).astype(
              out_ref.dtype)


def _block_starts(rows: jax.Array, vocab: int, block_rows: int
                  ) -> jax.Array:
  """starts[b] = first update index belonging to block b (rows sorted;
  -1 padding sorts before block 0 and is skipped by the kernel)."""
  nblocks = -(-vocab // block_rows)
  bounds = jnp.arange(nblocks + 1, dtype=jnp.int32) * block_rows
  return jnp.searchsorted(rows, bounds, side='left').astype(jnp.int32)


def _touched_meta(sorted_ids: jax.Array, starts: jax.Array, vocab: int,
                  block_rows: int, g_max: int
                  ) -> Tuple[jax.Array, jax.Array]:
  """Touched-block list for the sparse-grid mode.

  Returns ``(meta [3, g_max] int32, overflow)``: ``meta[0]`` the
  touched block ids (padded by repeating the last, so revisits are
  consecutive), ``meta[1]/meta[2]`` each iteration's update range
  (empty for padding). ``overflow`` = more than ``g_max`` distinct
  touched blocks — the caller must fall back to the full stream (the
  touched grid would silently drop updates).
  """
  blocks = (sorted_ids // block_rows).astype(jnp.int32)
  valid = (sorted_ids >= 0) & (sorted_ids < vocab)
  vb = jnp.where(valid, blocks, -1)
  neq = jnp.concatenate([jnp.ones((1,), jnp.bool_), vb[1:] != vb[:-1]])
  is_first = valid & neq
  kcum = jnp.cumsum(is_first.astype(jnp.int32))
  count = kcum[-1]
  pos = jnp.where(is_first, kcum - 1, g_max)
  blist = jnp.zeros((g_max,), jnp.int32).at[pos].set(vb, mode='drop')
  last = blist[jnp.maximum(count - 1, 0)]
  inlist = jnp.arange(g_max) < count
  blist = jnp.where(inlist, blist, last)
  bstart = starts[blist]
  bend = jnp.where(inlist, starts[blist + 1], bstart)
  # count == 0 (no valid updates) must also take the full-stream path:
  # a touched grid with nothing to write would flush garbage.
  return jnp.stack([blist, bstart, bend]), (count > g_max) | (count == 0)


def _pack_factor(v: int, d: int) -> int:
  """Lane-packing factor ``p``: view a narrow ``[V, d]`` table as
  ``[V/p, p·d = 128]``.

  A d<128 f32 array occupies full 128-lane VMEM tiles anyway, so
  narrow-dim blocks waste ``128/d`` of every DMA, VMEM buffer, and grid
  iteration. Measured on one v5e chip (benchmarks/stream_roofline.py):
  a [2.6M, 16] pure table stream runs at 57 GB/s (4.6 us/block — fixed
  ~3.4 us/iteration overhead dominates), while the SAME bytes as
  [327k, 128] stream at 169 GB/s with 8x fewer iterations. Packing is
  exact for add/adagrad: logical rows sharing a packed row live in
  disjoint lane slices, and duplicates of one logical row sum in the
  one-hot matmul exactly as unpacked."""
  if d >= 128 or 128 % d != 0:
    return 1
  p = 128 // d
  return p if v % p == 0 else 1


def _pack_ids(ids: jax.Array, p: int) -> jax.Array:
  return jnp.where(ids >= 0, ids // p, ids)


def _pack_expand(rows: jax.Array, updates: jax.Array, p: int
                 ) -> Tuple[jax.Array, jax.Array]:
  """XLA-side packed expansion: packed row ``r//p`` plus the update
  placed in lane slice ``(r%p)·d`` of a [N, p·d=128] array.

  Kernel-side expansion would avoid materializing this, but Mosaic
  cannot view a [X, 128] VMEM value as [pX, d] ("unsupported shape
  cast"), and HBM→VMEM DMAs require 128-lane minor dims — so the
  expansion happens here (measured 2.7 ms at [213k, 16] on one v5e
  chip when fused into a consumer)."""
  n, d = updates.shape
  prow = jnp.where(rows >= 0, rows // p, rows)
  lane = jnp.where(rows >= 0, (rows % p).astype(jnp.int32), 0)
  oh = (lane[:, None] == jnp.arange(p, dtype=jnp.int32)[None, :]
        ).astype(updates.dtype)
  upd = (oh[:, :, None] * updates[:, None, :]).reshape(n, p * d)
  return prow, upd


def pad_updates(rows: jax.Array, updates: jax.Array, chunk: int = _CHUNK
                ) -> Tuple[jax.Array, jax.Array]:
  """Pad the update list with OOB sentinel rows to a chunk multiple,
  plus one extra chunk so a chunk DMA starting anywhere below the last
  valid index never reads past the buffer; update lanes pad to 128
  (DMA slices need 128-lane minor dims)."""
  n = rows.shape[0]
  pad = (-n) % chunk + chunk
  rows = jnp.pad(rows, (0, pad), constant_values=2**31 - 1)
  lanes = (-updates.shape[1]) % 128
  updates = jnp.pad(updates, ((0, pad), (0, lanes)))
  return rows, updates


def sorted_segment_totals(ids: jax.Array, g: jax.Array
                          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
  """Scatter-free duplicate combining for sorted-update kernels.

  Sorts ``(ids, g)`` and computes per-unique-id gradient totals with a
  segmented associative scan (numerically local — each segment sums its
  own values). Returns ``(sort_ids [N], rows [N], totals [N, D])`` where
  ``rows[i] = ids`` value at run ENDS and ``-1`` elsewhere; ``sort_ids``
  is the fully-sorted id list (for block-range computation). Everything
  is sort/gather/scan — no scatter anywhere.
  """
  order = jnp.argsort(ids)
  s_ids = ids[order].astype(jnp.int32)
  s_g = g[order]
  neq = s_ids[1:] != s_ids[:-1]
  is_first = jnp.concatenate([jnp.ones((1,), jnp.bool_), neq])
  is_last = jnp.concatenate([neq, jnp.ones((1,), jnp.bool_)])

  def combine(a, b):
    va, fa = a
    vb, fb = b
    return jnp.where(fb, vb, va + vb), fa | fb

  run_sum, _ = jax.lax.associative_scan(
      combine, (s_g, is_first[:, None]))
  rows = jnp.where(is_last, s_ids, jnp.int32(-1))
  totals = jnp.where(is_last[:, None], run_sum, 0).astype(g.dtype)
  return s_ids, rows, totals


@functools.partial(jax.jit, static_argnames=('block_rows', 'chunk',
                                             'precision', 'interpret',
                                             'touched_blocks', 'pack',
                                             'dma_chunk', 'window_rows'))
def scatter_add_sorted(table: jax.Array, rows: jax.Array,
                       updates: jax.Array,
                       block_ids: Optional[jax.Array] = None,
                       block_rows: int = _BLOCK_ROWS,
                       chunk: int = _CHUNK,
                       precision: str = 'highest',
                       interpret: bool = False,
                       touched_blocks: int = 0,
                       pack: bool = True,
                       dma_chunk: int = 0,
                       window_rows: int = _WINDOW_ROWS) -> jax.Array:
  """``table.at[rows].add(updates)`` for SORTED rows, as a table stream.

  rows: int32 [N] ascending; -1 or >= vocab entries are ignored.
  block_ids: optional fully-sorted ids used for block-range computation
    when ``rows`` contains -1 holes (see :func:`sorted_segment_totals`).
  Uneven ``table.shape[0]`` is handled (the tail block is masked).
  touched_blocks: > 0 enables the SPARSE grid — only the (at most
    ``touched_blocks``) blocks that actually have updates are streamed;
    the rest are never DMA'd. Wins when updates << vocab (huge tables,
    modest batches). More distinct touched blocks than the cap falls
    back to the full stream via ``lax.cond`` — never drops updates.
  pack: lane-pack narrow tables ([V, d<128] → [V/p, 128], exact; see
    :func:`_pack_factor`) — measured 3-4x on the full stream.
  """
  v, d = table.shape
  if block_ids is None:
    block_ids = rows
  p = _pack_factor(v, d) if pack else 1
  if p > 1:
    # Lane-packed execution: kernel sees a [v/p, 128] table; the
    # update expansion happens XLA-side (see _pack_expand).
    kv, kd = v // p, p * d
    ktable = table.reshape(kv, kd)
    block_ids = _pack_ids(block_ids, p)
    rows, updates = _pack_expand(rows, updates.astype(table.dtype), p)
  else:
    kv, kd = v, d
    ktable = table
  if dma_chunk and dma_chunk % chunk:
    raise ValueError('dma_chunk must be a multiple of chunk')
  pad_unit = max(chunk, dma_chunk)
  block_ids, _ = pad_updates(block_ids.astype(jnp.int32),
                             jnp.zeros((block_ids.shape[0], 1)), pad_unit)
  rows, updates = pad_updates(rows.astype(jnp.int32),
                              updates.astype(table.dtype), pad_unit)
  starts = _block_starts(block_ids, kv, block_rows)
  rows = rows.reshape(-1, chunk)
  nblocks = pl.cdiv(kv, block_rows)
  upd_lanes = updates.shape[1]
  upd_chunk_rows = chunk
  upd_dma_rows = dma_chunk

  def call(s0, grid, touched, tbl):
    kernel = functools.partial(
        _scatter_kernel, block_rows=block_rows, chunk=chunk, mode='add',
        eps=0.0, precision=jax.lax.Precision(precision.lower()),
        touched=touched, dma_chunk=dma_chunk, window_rows=window_rows)
    imap = (lambda b, s: (s[0, b], 0)) if touched else \
        (lambda b, s: (b, 0))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # rows (resident)
                pl.BlockSpec(memory_space=pl.ANY),   # updates (HBM)
                pl.BlockSpec((block_rows, kd), imap,
                             memory_space=pltpu.VMEM),  # table block in
            ],
            out_specs=pl.BlockSpec((block_rows, kd), imap,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, upd_dma_rows, upd_lanes), table.dtype)
                if dma_chunk else
                pltpu.VMEM((upd_chunk_rows, upd_lanes), table.dtype),
                pltpu.VMEM((block_rows, kd + (-kd) % 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((kv, kd), table.dtype),
        input_output_aliases={3: 0},  # table buffer updated in place
        interpret=interpret,
    )(s0, rows, updates, tbl)

  def run(tbl):
    if not touched_blocks or touched_blocks >= nblocks:
      return call(starts, nblocks, False, tbl)
    meta, overflow = _touched_meta(block_ids, starts, kv, block_rows,
                                   touched_blocks)
    return jax.lax.cond(
        overflow,
        lambda t: call(starts, nblocks, False, t),
        lambda t: call(meta, touched_blocks, True, t),
        tbl)

  return run(ktable).reshape(v, d)


@functools.partial(jax.jit, static_argnames=('eps', 'block_rows',
                                             'chunk', 'precision',
                                             'interpret',
                                             'touched_blocks', 'pack',
                                             'dma_chunk', 'window_rows'))
def adagrad_update_sorted(table: jax.Array, acc: jax.Array,
                          rows: jax.Array, updates: jax.Array,
                          lr, eps: float = 1e-7,
                          block_ids: Optional[jax.Array] = None,
                          block_rows: int = _BLOCK_ROWS,
                          chunk: int = _CHUNK,
                          precision: str = 'highest',
                          interpret: bool = False,
                          touched_blocks: int = 0,
                          pack: bool = True,
                          dma_chunk: int = 0,
                          window_rows: int = _WINDOW_ROWS
                          ) -> Tuple[jax.Array, jax.Array]:
  """Fused sparse Adagrad: one table stream updates accumulator AND
  table (``acc[r] += g²; table[r] -= lr·g/sqrt(acc[r]+eps)``), rows
  sorted. Duplicate rows are combined into per-row gradient TOTALS by
  the one-hot matmul before squaring — exact Adagrad semantics, no
  pre-deduplication needed. Returns (table, acc).

  ``touched_blocks > 0`` enables the sparse grid (see
  :func:`scatter_add_sorted`); ``pack`` lane-packs narrow tables (the
  adagrad math is lanewise-elementwise, so packing is exact: per-row
  gradient totals occupy disjoint lane slices before squaring)."""
  v, d = table.shape
  if block_ids is None:
    block_ids = rows
  p = _pack_factor(v, d) if pack else 1
  if p > 1:
    # See scatter_add_sorted / _pack_expand.
    kv, kd = v // p, p * d
    ktable = table.reshape(kv, kd)
    kacc = acc.reshape(kv, kd)
    block_ids = _pack_ids(block_ids, p)
    rows, updates = _pack_expand(rows, updates.astype(table.dtype), p)
  else:
    kv, kd = v, d
    ktable, kacc = table, acc
  if dma_chunk and dma_chunk % chunk:
    raise ValueError('dma_chunk must be a multiple of chunk')
  pad_unit = max(chunk, dma_chunk)
  block_ids, _ = pad_updates(block_ids.astype(jnp.int32),
                             jnp.zeros((block_ids.shape[0], 1)), pad_unit)
  rows, updates = pad_updates(rows.astype(jnp.int32),
                              updates.astype(table.dtype), pad_unit)
  starts = _block_starts(block_ids, kv, block_rows)
  rows = rows.reshape(-1, chunk)
  nblocks = pl.cdiv(kv, block_rows)
  upd_lanes = updates.shape[1]
  upd_chunk_rows = chunk
  upd_dma_rows = dma_chunk

  lr_arr = jnp.asarray(lr, jnp.float32).reshape(1)

  def call(s0, grid, touched, tbl, acc_in):
    def kernel(starts_ref, lr_ref, rows_hbm, upd_hbm, tbl_ref, acc_ref,
               tbl_out, acc_out, upd_s, gsum_s, sems):
      _scatter_kernel(starts_ref, rows_hbm, upd_hbm, tbl_ref, tbl_out,
                      upd_s, gsum_s, sems, block_rows=block_rows,
                      chunk=chunk, mode='adagrad', eps=eps,
                      precision=jax.lax.Precision(precision.lower()),
                      lr_ref=lr_ref, acc_ref=acc_ref,
                      acc_out_ref=acc_out, touched=touched,
                      dma_chunk=dma_chunk, window_rows=window_rows)

    imap = (lambda b, s, l: (s[0, b], 0)) if touched else \
        (lambda b, s, l: (b, 0))
    bspec = pl.BlockSpec((block_rows, kd), imap, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # starts/meta + lr
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # rows (resident)
                pl.BlockSpec(memory_space=pl.ANY),   # updates (HBM)
                bspec, bspec,
            ],
            out_specs=(bspec, bspec),
            scratch_shapes=[
                pltpu.VMEM((2, upd_dma_rows, upd_lanes), table.dtype)
                if dma_chunk else
                pltpu.VMEM((upd_chunk_rows, upd_lanes), table.dtype),
                pltpu.VMEM((block_rows, kd + (-kd) % 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(jax.ShapeDtypeStruct((kv, kd), table.dtype),
                   jax.ShapeDtypeStruct((kv, kd), acc.dtype)),
        input_output_aliases={4: 0, 5: 1},
        interpret=interpret,
    )(s0, lr_arr, rows, updates, tbl, acc_in)

  def run(tbl, acc_in):
    if not touched_blocks or touched_blocks >= nblocks:
      return call(starts, nblocks, False, tbl, acc_in)
    meta, overflow = _touched_meta(block_ids, starts, kv, block_rows,
                                   touched_blocks)
    return jax.lax.cond(
        overflow,
        lambda t, a: call(starts, nblocks, False, t, a),
        lambda t, a: call(meta, touched_blocks, True, t, a),
        tbl, acc_in)

  t2, a2 = run(ktable, kacc)
  return t2.reshape(v, d), a2.reshape(v, d)


def _gsum_kernel(starts_ref, rows_ref, upd_hbm, out_ref, upd_s, sems, *,
                 block_rows, chunk, precision, window_rows, dma_chunk):
  """Dense per-row gradient totals: the grid walks OUTPUT blocks only —
  no table/acc operands stream through VMEM. Untouched blocks write
  zeros; touched blocks accumulate their one-hot-matmul row totals
  directly into the output block. The optimizer apply then runs as a
  fused XLA elementwise pass over (table, acc, gsum) — the
  'dense-split' update (see ``sparse_update._stream_adagrad``).
  Measured SLOWER than the fused full-stream kernels on v5e at the
  flagship shape (stream_bw_probe: this kernel alone costs ~3.0 ms
  because the one-hot scatter MXU work no longer overlaps the table
  stream, and the XLA apply adds a 5-transfer pass) — kept as an
  opt-in for future chips and wide-slot-state regimes."""
  b = pl.program_id(0)
  start = starts_ref[b]
  end = starts_ref[b + 1]
  out_ref[...] = jnp.zeros_like(out_ref)

  @pl.when(end > start)
  def _():
    _accumulate_updates(rows_ref, upd_hbm, out_ref, upd_s, sems, b,
                        start, end, block_rows=block_rows, chunk=chunk,
                        precision=precision, window_rows=window_rows,
                        dma_chunk=dma_chunk)


_BLOCK_ROWS_GSUM = 8192  # gsum streams ONE output operand — 2 double-
                         # buffered 4 MB blocks fit VMEM easily and the
                         # per-grid-iteration fixed cost (~3.4 us)
                         # amortizes 4x vs the fused kernel's 2048.


@functools.partial(jax.jit, static_argnames=('vocab', 'block_rows',
                                             'chunk', 'precision',
                                             'interpret', 'dma_chunk',
                                             'window_rows'))
def gsum_dense_sorted(rows: jax.Array, updates: jax.Array, vocab: int,
                      block_rows: Optional[int] = None,
                      chunk: int = _CHUNK,
                      precision: str = 'highest',
                      interpret: bool = False,
                      dma_chunk: int = 0,
                      window_rows: int = _WINDOW_ROWS) -> jax.Array:
  """Dense ``[vocab, D]`` per-row TOTALS of a row-sorted update list.

  ``rows``: int32 ``[N]`` ascending in the PHYSICAL row space (-1 and
  ``>= vocab`` entries ignored); ``updates``: ``[N, D]`` with
  ``D % 128 == 0`` (lane-packed / wide rows — the caller expands narrow
  tables first). Duplicate rows sum exactly via the same
  :func:`_split_dots` contract as the fused kernels, so
  ``gsum = gsum_dense_sorted(...)`` followed by an XLA elementwise
  optimizer apply is bit-identical to the fused full-stream kernels.
  """
  if updates.shape[1] % 128:
    raise ValueError('gsum_dense_sorted needs 128-lane update rows; '
                     f'got D={updates.shape[1]}')
  if block_rows is None:
    # Default sized for kd=128 (4 MB out block); wider rows scale the
    # VMEM block linearly — shrink the DEFAULT to keep block_rows*kd*4
    # near 4 MB. An EXPLICIT block_rows (A/B sweeps) is always honored.
    block_rows = max(512, _BLOCK_ROWS_GSUM * 128 // max(updates.shape[1],
                                                        128))
  if dma_chunk and dma_chunk % chunk:
    raise ValueError('dma_chunk must be a multiple of chunk')
  pad_unit = max(chunk, dma_chunk)
  rows, updates = pad_updates(rows.astype(jnp.int32), updates, pad_unit)
  starts = _block_starts(rows, vocab, block_rows)
  rows2 = rows.reshape(-1, chunk)
  nblocks = pl.cdiv(vocab, block_rows)
  kd = updates.shape[1]

  kernel = functools.partial(
      _gsum_kernel, block_rows=block_rows, chunk=chunk,
      precision=jax.lax.Precision(precision.lower()),
      window_rows=window_rows, dma_chunk=dma_chunk)
  return pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=1,
          grid=(nblocks,),
          in_specs=[
              pl.BlockSpec(memory_space=pltpu.VMEM),  # rows (resident)
              pl.BlockSpec(memory_space=pl.ANY),   # updates (HBM)
          ],
          out_specs=pl.BlockSpec((block_rows, kd), lambda b, s: (b, 0),
                                 memory_space=pltpu.VMEM),
          scratch_shapes=[
              pltpu.VMEM((2, dma_chunk, kd), updates.dtype)
              if dma_chunk else
              pltpu.VMEM((chunk, kd), updates.dtype),
              pltpu.SemaphoreType.DMA((2,)),
          ],
      ),
      out_shape=jax.ShapeDtypeStruct((vocab, kd), jnp.float32),
      interpret=interpret,
  )(starts, rows2, updates)


__all__ = ['scatter_add_sorted', 'adagrad_update_sorted',
           'adam_update_sorted', 'gsum_dense_sorted',
           'sorted_segment_totals', 'pad_updates']


@functools.partial(jax.jit, static_argnames=('b1', 'b2', 'eps',
                                             'block_rows', 'chunk',
                                             'precision', 'interpret',
                                             'touched_blocks',
                                             'window_rows'))
def adam_update_sorted(table: jax.Array, m: jax.Array, v: jax.Array,
                       rows: jax.Array, updates: jax.Array,
                       lr, step, b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8,
                       block_ids: Optional[jax.Array] = None,
                       block_rows: int = _BLOCK_ROWS_ADAM,
                       chunk: int = _CHUNK,
                       precision: str = 'highest',
                       interpret: bool = False,
                       touched_blocks: int = 0,
                       window_rows: int = _WINDOW_ROWS
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
  """Fused sparse LazyAdam: one table stream updates both moments and
  the table on touched rows only (moments of untouched rows do NOT
  decay — TF ``LazyAdam`` semantics; rows whose gradient totals are
  exactly zero count as untouched). ``lr`` and ``step`` (1-based, for
  bias correction) may be traced. Returns (table, m, v)."""
  d = table.shape[1]
  if block_ids is None:
    block_ids = rows
  block_ids, _ = pad_updates(block_ids.astype(jnp.int32),
                             jnp.zeros((block_ids.shape[0], 1)), chunk)
  updates = updates.astype(table.dtype)
  if d % 128 == 0:
    # No spare lane for the presence count: add a lane group.
    updates = jnp.pad(updates, ((0, 0), (0, 1)))
  rows, updates = pad_updates(rows.astype(jnp.int32), updates, chunk)
  # Lane d carries presence: gsum lane d becomes the occurrence count
  # (sentinel/invalid rows never match a block, so they don't count).
  updates = updates.at[:, d].set(1.0)
  starts = _block_starts(block_ids, table.shape[0], block_rows)
  rows = rows.reshape(-1, chunk)
  nblocks = pl.cdiv(table.shape[0], block_rows)
  t = jnp.asarray(step, jnp.float32)
  scalars = jnp.stack([
      jnp.asarray(lr, jnp.float32),
      jnp.asarray(b1, jnp.float32),
      jnp.asarray(b2, jnp.float32),
      1.0 - jnp.asarray(b1, jnp.float32) ** t,
      1.0 - jnp.asarray(b2, jnp.float32) ** t,
  ])
  upd_w = updates.shape[1]

  def call(s0, grid, touched, tbl, m_in, v_in):
    def kernel(starts_ref, lr_ref, rows_hbm, upd_hbm, tbl_ref, m_ref,
               v_ref, tbl_out, m_out, v_out, upd_s, gsum_s, sems):
      _scatter_kernel(starts_ref, rows_hbm, upd_hbm, tbl_ref, tbl_out,
                      upd_s, gsum_s, sems, block_rows=block_rows,
                      chunk=chunk, mode='adam', eps=eps,
                      precision=jax.lax.Precision(precision.lower()),
                      lr_ref=lr_ref, acc_ref=(m_ref, v_ref),
                      acc_out_ref=(m_out, v_out), touched=touched,
                      window_rows=window_rows)

    blk = (lambda b, s, l: (s[0, b], 0)) if touched else \
        (lambda b, s, l: (b, 0))
    bspec = pl.BlockSpec((block_rows, d), blk, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # starts/meta + scalars
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # rows (resident)
                pl.BlockSpec(memory_space=pl.ANY),   # updates (HBM)
                bspec, bspec, bspec,                    # table, m, v
            ],
            out_specs=(bspec, bspec, bspec),
            scratch_shapes=[
                pltpu.VMEM((chunk, upd_w), table.dtype),
                pltpu.VMEM((block_rows, upd_w), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(jax.ShapeDtypeStruct(table.shape, table.dtype),
                   jax.ShapeDtypeStruct(m.shape, m.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        input_output_aliases={4: 0, 5: 1, 6: 2},
        interpret=interpret,
    )(s0, scalars, rows, updates, tbl, m_in, v_in)

  if not touched_blocks or touched_blocks >= nblocks:
    return call(starts, nblocks, False, table, m, v)
  meta, overflow = _touched_meta(block_ids, starts, table.shape[0],
                                 block_rows, touched_blocks)
  return jax.lax.cond(
      overflow,
      lambda t_, m_, v_: call(starts, nblocks, False, t_, m_, v_),
      lambda t_, m_, v_: call(meta, touched_blocks, True, t_, m_, v_),
      table, m, v)
