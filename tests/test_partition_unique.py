"""Tests for partition ops and static unique (parity with the reference's
distribute/tests/partition_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from hybridbackend_tpu.distribute.partition import (
    partition_by_modulo, partition_by_fn, partition_by_dual_modulo,
    unpartition)
from hybridbackend_tpu.embedding.unique import unique


class TestPartitionByModulo:

  def test_roundtrip_random(self):
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 1000, size=64), dtype=jnp.int32)
    part = partition_by_modulo(ids, 8)
    # Every bucket entry within size belongs to that shard.
    buckets, sizes = np.asarray(part.buckets), np.asarray(part.sizes)
    for s in range(8):
      assert (buckets[s, :sizes[s]] % 8 == s).all()
    assert sizes.sum() == 64
    # restore maps flat bucket layout back to original order.
    flat = np.asarray(part.buckets).reshape(-1)
    np.testing.assert_array_equal(flat[np.asarray(part.restore)],
                                  np.asarray(ids))

  def test_stable_within_bucket(self):
    ids = jnp.asarray([8, 0, 16, 8, 24], dtype=jnp.int32)  # all shard 0
    part = partition_by_modulo(ids, 8)
    np.testing.assert_array_equal(np.asarray(part.buckets[0][:5]),
                                  [8, 0, 16, 8, 24])

  def test_payload_roundtrip(self):
    ids = jnp.asarray([3, 7, 3, 1, 0, 15], dtype=jnp.int32)
    part = partition_by_modulo(ids, 4)
    payload = part.buckets * 2  # any transform in bucket layout
    out = unpartition(payload.reshape(-1), part.restore)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ids) * 2)

  def test_under_jit(self):
    ids = jnp.arange(32, dtype=jnp.int32)
    part = jax.jit(lambda x: partition_by_modulo(x, 8))(ids)
    assert np.asarray(part.sizes).sum() == 32

  def test_custom_fn_block_owner(self):
    ids = jnp.asarray([0, 5, 9, 13], dtype=jnp.int32)
    part = partition_by_fn(ids, 4, lambda x: x // 4)
    sizes = np.asarray(part.sizes)
    np.testing.assert_array_equal(sizes, [1, 1, 1, 1])

  def test_capacity_truncation(self):
    ids = jnp.zeros((8,), jnp.int32)  # all to shard 0
    part = partition_by_modulo(ids, 4, capacity=4)
    assert np.asarray(part.sizes)[0] == 4


class TestDualModulo:

  def test_stage_keys(self):
    ids = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7], dtype=jnp.int32)
    part, s1 = partition_by_dual_modulo(ids, num_stage0=2, num_stage1=4)
    buckets, sizes = np.asarray(part.buckets), np.asarray(part.sizes)
    # stage0 owner = (id // 4) % 2 → ids 0-3 to group 0, 4-7 to group 1.
    np.testing.assert_array_equal(sorted(buckets[0, :sizes[0]]), [0, 1, 2, 3])
    np.testing.assert_array_equal(sorted(buckets[1, :sizes[1]]), [4, 5, 6, 7])
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(part.buckets) % 4)


class TestUnique:

  def test_exact(self):
    ids = jnp.asarray([5, 3, 5, 7, 3, 3], dtype=jnp.int32)
    res = unique(ids)
    vals, idx, count = (np.asarray(res.values), np.asarray(res.index),
                        int(res.count))
    assert count == 3
    np.testing.assert_array_equal(vals[idx], np.asarray(ids))

  def test_all_distinct(self):
    ids = jnp.arange(16, dtype=jnp.int32)[::-1]
    res = unique(ids)
    assert int(res.count) == 16
    np.testing.assert_array_equal(np.asarray(res.values)[np.asarray(res.index)],
                                  np.asarray(ids))

  def test_all_same(self):
    ids = jnp.full((8,), 42, jnp.int32)
    res = unique(ids)
    assert int(res.count) == 1
    assert np.asarray(res.values)[0] == 42
    np.testing.assert_array_equal(np.asarray(res.index), np.zeros(8))

  def test_under_jit(self):
    ids = jnp.asarray([1, 1, 2, 2], dtype=jnp.int32)
    res = jax.jit(unique)(ids)
    assert int(res.count) == 2

  def test_capacity_smaller(self):
    ids = jnp.asarray([1, 2, 3, 4], dtype=jnp.int32)
    res = unique(ids, capacity=2)
    # Approximate: overflow uniques alias the last slot; count clamped —
    # and the overflow is SIGNALLED so callers can fall back.
    assert int(res.count) == 2
    assert bool(res.overflowed)

  def test_overflow_flag_clear_when_exact(self):
    ids = jnp.asarray([1, 1, 2, 2], dtype=jnp.int32)
    assert not bool(unique(ids, capacity=2).overflowed)
    assert not bool(unique(ids).overflowed)


class TestPartitionValidMask:
  """Round-3 extension: valid-mask discard + overflow flag."""

  def test_invalid_lanes_consume_no_capacity(self):
    ids = jnp.asarray([4, -1, 8, -1, 0], jnp.int32)
    part = partition_by_fn(ids, 4, lambda x: jnp.clip(x, 0, 15) // 4,
                           capacity=2, valid=ids >= 0)
    sizes = np.asarray(part.sizes)
    np.testing.assert_array_equal(sizes, [1, 1, 1, 0])
    assert not bool(part.overflow)
    # Discarded lanes restore out-of-range.
    restore = np.asarray(part.restore)
    assert restore[1] >= 4 * 2 and restore[3] >= 4 * 2

  def test_overflow_flag(self):
    ids = jnp.zeros((8,), jnp.int32)
    part = partition_by_fn(ids, 4, lambda x: x, capacity=2)
    assert bool(part.overflow)
    ids2 = jnp.arange(8, dtype=jnp.int32)
    part2 = partition_by_fn(ids2, 4, lambda x: x % 4, capacity=2)
    assert not bool(part2.overflow)
