"""Tests for the native C++ host module: results must be bit-identical
to the NumPy fallbacks (which the data tests already pin to pandas)."""

import numpy as np
import pytest

from hybridbackend_tpu import native
from hybridbackend_tpu.data.dataframe import Value, take_rows


requires_native = pytest.mark.skipif(not native.available(),
                                     reason='no compiler')


@requires_native
class TestNative:

  def test_ragged_to_padded_matches_numpy(self):
    rng = np.random.RandomState(0)
    lengths = rng.randint(0, 7, 50)
    splits = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
    values = rng.randint(0, 100, splits[-1]).astype(np.int64)
    v = Value(values, [splits])
    import os
    os.environ['HB_NATIVE_DISABLED'] = '1'
    try:
      # NumPy reference path (native returns None when inputs unsupported;
      # force it by dtype detour): compute via the pure-python expander.
      want = v.to_list()
    finally:
      del os.environ['HB_NATIVE_DISABLED']
    padded, mask = native.ragged_to_padded(values, splits, 8, 0)
    assert padded.shape == (50, 8)
    for i, row in enumerate(want):
      np.testing.assert_array_equal(padded[i, :len(row)], row)
      assert mask[i].sum() == min(len(row), 8)
      assert (padded[i, len(row):] == 0).all()

  def test_ragged_to_padded_f32_inner_dims(self):
    values = np.arange(12, dtype=np.float32).reshape(6, 2)
    splits = np.asarray([0, 2, 2, 6], np.int64)
    padded, mask = native.ragged_to_padded(values, splits, 4, -1.0)
    assert padded.shape == (3, 4, 2)
    np.testing.assert_array_equal(padded[0, 0], [0, 1])
    np.testing.assert_array_equal(padded[1, 0], [-1, -1])
    np.testing.assert_array_equal(padded[2, 3], [10, 11])

  def test_truncation(self):
    values = np.arange(10, dtype=np.int64)
    splits = np.asarray([0, 10], np.int64)
    padded, mask = native.ragged_to_padded(values, splits, 4, 0)
    np.testing.assert_array_equal(padded[0], [0, 1, 2, 3])
    assert mask[0].sum() == 4

  def test_ragged_take_rows(self):
    values = np.arange(10, dtype=np.int64)
    splits = np.asarray([0, 3, 5, 6, 10], np.int64)
    out_v, out_s = native.ragged_take_rows(values, splits,
                                           np.asarray([3, 0, 0]))
    np.testing.assert_array_equal(out_s, [0, 4, 7, 10])
    np.testing.assert_array_equal(out_v, [6, 7, 8, 9, 0, 1, 2, 0, 1, 2])

  def test_take_rows_dense(self):
    values = np.arange(20, dtype=np.float32).reshape(5, 4)
    out = native.take_rows_dense(values, np.asarray([4, 1]))
    np.testing.assert_array_equal(out, values[[4, 1]])

  def test_murmur3_spreads(self):
    ids = np.arange(1000, dtype=np.int64)
    mixed = native.murmur3_mix64(ids, modulo=8)
    counts = np.bincount(mixed, minlength=8)
    assert counts.min() > 80  # roughly uniform over shards

  def test_murmur3_deterministic(self):
    ids = np.asarray([42, 42, 7], np.int64)
    a = native.murmur3_mix64(ids)
    b = native.murmur3_mix64(ids)
    np.testing.assert_array_equal(a, b)
    assert a[0] == a[1] != a[2]


class TestIntegration:

  def test_value_to_padded_uses_native_consistently(self):
    """Same result with native enabled and disabled."""
    import os
    rng = np.random.RandomState(1)
    lengths = rng.randint(0, 5, 20)
    splits = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
    v = Value(rng.randint(0, 9, splits[-1]).astype(np.int64), [splits])
    with_native = v.to_padded(max_len=4, pad_value=0)
    os.environ['HB_NATIVE_DISABLED'] = '1'
    try:
      import hybridbackend_tpu.native as nat
      old_lib, old_tried = nat._LIB, nat._TRIED
      nat._LIB, nat._TRIED = None, True
      without = v.to_padded(max_len=4, pad_value=0)
      nat._LIB, nat._TRIED = old_lib, old_tried
    finally:
      del os.environ['HB_NATIVE_DISABLED']
    np.testing.assert_array_equal(with_native[0], without[0])
    np.testing.assert_array_equal(with_native[1], without[1])

  def test_take_rows_object_dtype_falls_back(self):
    col = np.asarray(['a', 'bb', 'ccc'], object)
    out = take_rows(col, np.asarray([2, 0]))
    assert list(out) == ['ccc', 'a']
