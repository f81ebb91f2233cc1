"""Streaming scatter/Adagrad Pallas kernels (interpret mode on CPU).

The kernels' contract (sorted rows, -1 invalids, sentinel padding,
duplicate summation, exact-Adagrad row totals) is verified against
NumPy references; real-chip parity is covered by the TPU benchmark
(docs/benchmarks.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridbackend_tpu.ops.pallas.scatter import (
    adagrad_update_sorted, scatter_add_sorted, sorted_segment_totals)

V, D = 16384, 16
KW = dict(block_rows=2048, chunk=256, interpret=True)


def _mk(n=3000, hi=V, dups=False, seed=0):
  rng = np.random.RandomState(seed)
  ids = np.sort(rng.randint(0, 400 if dups else hi, n)).astype(np.int32)
  g = rng.randn(n, D).astype(np.float32)
  table = jnp.asarray(rng.rand(V, D), jnp.float32)
  return table, ids, g


def _want_add(table, ids, g):
  want = np.asarray(table).copy()
  for i in range(len(ids)):
    if 0 <= ids[i] < V:
      want[ids[i]] += g[i]
  return want


def test_scatter_add_basic():
  table, ids, g = _mk()
  got = scatter_add_sorted(table, jnp.asarray(ids), jnp.asarray(g), **KW)
  np.testing.assert_allclose(np.asarray(got), _want_add(table, ids, g),
                             atol=2e-4)


def test_scatter_add_duplicates_and_invalids():
  table, ids, g = _mk(dups=True)
  ids[:17] = -1
  got = scatter_add_sorted(table, jnp.asarray(ids), jnp.asarray(g), **KW)
  np.testing.assert_allclose(np.asarray(got), _want_add(table, ids, g),
                             atol=2e-3)


def test_scatter_add_empty_and_full_block():
  table, ids, g = _mk(n=512)
  ids[:] = np.sort(np.r_[np.zeros(256), np.full(256, V - 1)]).astype(
      np.int32)  # everything in first and last block
  got = scatter_add_sorted(table, jnp.asarray(ids), jnp.asarray(g), **KW)
  np.testing.assert_allclose(np.asarray(got), _want_add(table, ids, g),
                             rtol=1e-4, atol=2e-3)


def test_adagrad_exact_row_totals():
  table, ids, g = _mk(dups=True, seed=3)
  acc = jnp.full((V, D), 0.1, jnp.float32)
  gt, ga = adagrad_update_sorted(table, acc, jnp.asarray(ids),
                                 jnp.asarray(g), lr=0.1, **KW)
  tot = {}
  for i in range(len(ids)):
    tot[ids[i]] = tot.get(ids[i], 0) + g[i]
  wt = np.asarray(table).copy()
  wa = np.full((V, D), 0.1, np.float32)
  for k, v in tot.items():
    wa[k] += v * v
    wt[k] -= 0.1 * v / (np.sqrt(wa[k]) + 1e-7)
  np.testing.assert_allclose(np.asarray(ga), wa, atol=2e-3)
  np.testing.assert_allclose(np.asarray(gt), wt, atol=2e-3)


def test_untouched_rows_bitwise_unchanged():
  table, ids, g = _mk(n=256, dups=True)
  acc = jnp.full((V, D), 0.1, jnp.float32)
  gt, ga = adagrad_update_sorted(table, acc, jnp.asarray(ids),
                                 jnp.asarray(g), lr=0.1, **KW)
  touched = set(ids.tolist())
  un = np.asarray([r for r in range(V) if r not in touched][:500])
  np.testing.assert_array_equal(np.asarray(gt)[un], np.asarray(table)[un])
  np.testing.assert_array_equal(np.asarray(ga)[un], np.float32(0.1))


def test_window_fallback_wide_span_chunk():
  """A chunk whose valid rows PROVABLY span wider than the one-hot
  window must take the exact full-block fallback (scatter.py
  _accumulate_updates: the ``vhi - w0 >= win`` branch). One 256-row
  chunk hits rows 0..1500 of a 2048-row block with window 64 — no
  64-row window can cover the span, so only the fallback path can
  produce the exact result."""
  table, _, g = _mk(n=256)
  span = np.linspace(0, 1500, 256).astype(np.int32)
  ids = np.sort(span)
  got = scatter_add_sorted(table, jnp.asarray(ids), jnp.asarray(g),
                           window_rows=64, **KW)
  np.testing.assert_allclose(np.asarray(got), _want_add(table, ids, g),
                             rtol=1e-4, atol=2e-3)
  # And through the fused Adagrad kernel on the same wide-span chunk.
  acc = jnp.full((V, D), 0.1, jnp.float32)
  gt, ga = adagrad_update_sorted(table, acc, jnp.asarray(ids),
                                 jnp.asarray(g), lr=0.1, window_rows=64,
                                 **KW)
  wa = np.full((V, D), 0.1, np.float32)
  wt = np.asarray(table).copy()
  for i in range(len(ids)):
    wa[ids[i]] += g[i] * g[i]
    wt[ids[i]] -= 0.1 * g[i] / (np.sqrt(wa[ids[i]]) + 1e-7)
  np.testing.assert_allclose(np.asarray(ga), wa, atol=2e-3)
  np.testing.assert_allclose(np.asarray(gt), wt, atol=2e-3)


def test_window_disabled_edges():
  """``window_rows >= block_rows`` (and 0) must disable the window —
  the ``0 < window_rows < block_rows`` gate — and still be exact."""
  table, ids, g = _mk(dups=True, seed=11)
  want = _want_add(table, ids, g)
  for win in (0, KW['block_rows'], KW['block_rows'] * 2):
    got = scatter_add_sorted(table, jnp.asarray(ids), jnp.asarray(g),
                             window_rows=win, **KW)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)


def test_sorted_segment_totals_feed():
  """Pre-combined totals through the kernel == direct duplicates."""
  table, ids_unsorted, g = _mk(dups=True, seed=5)
  rng = np.random.RandomState(6)
  perm = rng.permutation(len(ids_unsorted))
  ids_u = ids_unsorted[perm]
  g_u = g[perm]
  s_ids, rows, totals = sorted_segment_totals(jnp.asarray(ids_u),
                                              jnp.asarray(g_u))
  got = scatter_add_sorted(table, rows, totals, block_ids=s_ids, **KW)
  np.testing.assert_allclose(np.asarray(got),
                             _want_add(table, ids_u, g_u), atol=2e-3)


def test_dim_not_multiple_of_128():
  """D=16 exercises lane padding; also check D=40."""
  rng = np.random.RandomState(7)
  table = jnp.asarray(rng.rand(4096, 40), jnp.float32)
  ids = np.sort(rng.randint(0, 4096, 700)).astype(np.int32)
  g = rng.randn(700, 40).astype(np.float32)
  got = scatter_add_sorted(table, jnp.asarray(ids), jnp.asarray(g),
                           block_rows=1024, chunk=128, interpret=True)
  want = np.asarray(table).copy()
  np.add.at(want, ids, g)
  np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


class TestTouchedBlocks:
  """Sparse-grid mode: only blocks with updates are streamed; more
  touched blocks than the cap falls back losslessly."""

  def _data(self, v=4096, d=8, br=512, nblk=2, per=40, seed=0):
    rng = np.random.RandomState(seed)
    parts = [rng.randint(b * br, (b + 1) * br, per)
             for b in (0, 3)[:nblk]]
    rows = np.sort(np.concatenate(parts)).astype(np.int32)
    upd = rng.randn(len(rows), d).astype(np.float32)
    table = jnp.asarray(rng.randn(v, d).astype(np.float32))
    return table, rows, upd

  def test_adagrad_touched_matches_full(self):
    from hybridbackend_tpu.ops.pallas.scatter import adagrad_update_sorted
    table, rows, upd = self._data()
    acc = jnp.full(table.shape, 0.1, jnp.float32)
    t1, a1 = adagrad_update_sorted(table, acc, jnp.asarray(rows),
                                   jnp.asarray(upd), lr=0.1,
                                   block_rows=512, interpret=True)
    for cap in (4, 2, 1):   # cap 1 < 2 touched -> fallback
      t2, a2 = adagrad_update_sorted(table, acc, jnp.asarray(rows),
                                     jnp.asarray(upd), lr=0.1,
                                     block_rows=512, interpret=True,
                                     touched_blocks=cap)
      np.testing.assert_allclose(np.asarray(t2), np.asarray(t1),
                                 rtol=1e-5)
      np.testing.assert_allclose(np.asarray(a2), np.asarray(a1),
                                 rtol=1e-5)

  def test_adam_touched_matches_full(self):
    from hybridbackend_tpu.ops.pallas.scatter import adam_update_sorted
    table, rows, upd = self._data()
    m = jnp.zeros(table.shape, jnp.float32)
    v = jnp.zeros(table.shape, jnp.float32)
    outs = []
    for cap in (0, 4):
      outs.append(adam_update_sorted(table, m, v, jnp.asarray(rows),
                                     jnp.asarray(upd), lr=1e-2, step=1,
                                     block_rows=512, interpret=True,
                                     touched_blocks=cap))
    for x, y in zip(outs[0], outs[1]):
      np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                 rtol=1e-5)

  def test_option_plumbed_through_sparse_apply(self):
    import hybridbackend_tpu as hb
    from hybridbackend_tpu.embedding import TableConfig, create_table
    from hybridbackend_tpu.embedding.sparse_update import (
        init_adagrad_state, sparse_adagrad_apply)
    cfg = TableConfig('tb', 4096, 8, sharded=False)
    table = create_table(cfg, jax.random.PRNGKey(0))
    state = init_adagrad_state(table, 0.1)
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(0, 512, 64), jnp.int32)
    demb = jnp.asarray(rng.randn(64, 8).astype(np.float32))
    with hb.scope(emb_update_impl='stream'):
      t1, _ = sparse_adagrad_apply(table, state, ids, demb, cfg, 0.1)
      with hb.scope(emb_update_touched_blocks=8):
        t2, _ = sparse_adagrad_apply(table, state, ids, demb, cfg, 0.1)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1),
                               rtol=1e-5)

class TestGsumDense:
  """Dense per-row totals kernel (`gsum_dense_sorted`) — the
  dense-split update's scatter half. Measured slower than the fused
  kernels on v5e (stream_bw_probe; option defaults off) but must stay
  bit-correct for the opt-in path."""

  def _want(self, V, ids, g):
    want = np.zeros((V, 128), np.float32)
    ok = (ids >= 0) & (ids < V)
    np.add.at(want, ids[ok], g[ok])
    return want

  def test_totals_with_duplicates_and_invalids(self):
    from hybridbackend_tpu.ops.pallas.scatter import gsum_dense_sorted
    rng = np.random.RandomState(11)
    V = 4096
    ids = np.sort(rng.randint(0, 300, 900)).astype(np.int32)
    ids[:13] = -1
    g = rng.randn(900, 128).astype(np.float32)
    got = gsum_dense_sorted(jnp.asarray(ids), jnp.asarray(g), V,
                            block_rows=1024, chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), self._want(V, ids, g),
                               rtol=1e-5, atol=2e-4)

  def test_untouched_rows_exact_zero_and_dma_chunk(self):
    from hybridbackend_tpu.ops.pallas.scatter import gsum_dense_sorted
    rng = np.random.RandomState(12)
    V = 4096
    ids = np.sort(rng.randint(1024, 2048, 700)).astype(np.int32)
    g = rng.randn(700, 128).astype(np.float32)
    got = np.asarray(gsum_dense_sorted(
        jnp.asarray(ids), jnp.asarray(g), V, block_rows=1024,
        chunk=128, dma_chunk=256, interpret=True))
    np.testing.assert_allclose(got, self._want(V, ids, g),
                               rtol=1e-5, atol=2e-4)
    assert (got[:1024] == 0).all() and (got[2048:] == 0).all()

  def test_narrow_rows_rejected(self):
    from hybridbackend_tpu.ops.pallas.scatter import gsum_dense_sorted
    with pytest.raises(ValueError, match='128-lane'):
      gsum_dense_sorted(jnp.zeros((8,), jnp.int32),
                        jnp.zeros((8, 16), jnp.float32), 64,
                        interpret=True)
