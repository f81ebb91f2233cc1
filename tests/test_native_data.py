"""Native C++ data plane: parity with the Python path.

Mirrors the reference's data tests (pandas/pyarrow-generated fixtures,
``/root/reference/hybridbackend/tensorflow/data/tests/parquet_dataset_test.py``)
plus lifetime/fallback checks specific to the zero-copy C ABI.
"""

import gc
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hybridbackend_tpu.data import Dataset, ParquetDataset
from hybridbackend_tpu.data.dataframe import Field, Value
from hybridbackend_tpu.native import tabular as native_tabular

pytestmark = pytest.mark.skipif(
    not native_tabular.available(), reason='native data plane unavailable')


@pytest.fixture(scope='module')
def files():
  d = tempfile.mkdtemp()
  rng = np.random.RandomState(0)
  n = 1000
  lists = [rng.randint(0, 50, rng.randint(0, 7)).tolist() for _ in range(n)]
  paths = []
  for i, (rows, rg) in enumerate([(np.arange(n), 137),
                                  (np.arange(n, 2 * n), 71)]):
    tbl = pa.table({
        'a': rows,
        'b': rng.rand(n).astype(np.float32),
        'c': pa.array(lists if i == 0 else lists[::-1],
                      pa.list_(pa.int64())),
    })
    p = os.path.join(d, f'x{i}.parquet')
    pq.write_table(tbl, p, row_group_size=rg)
    paths.append(p)
  return paths


def _collect(ds):
  a, b, c = [], [], []
  for batch in ds:
    a.append(np.asarray(batch['a']))
    b.append(np.asarray(batch['b']))
    assert isinstance(batch['c'], Value)
    c.extend(batch['c'].to_list())
  return np.concatenate(a), np.concatenate(b), c


def _python_path(monkeypatch, ds):
  monkeypatch.setattr(native_tabular, 'available', lambda: False)
  out = _collect(ds)
  monkeypatch.undo()
  return out


@pytest.mark.parametrize('bs,drop', [(64, False), (64, True),
                                     (1000, False), (333, True)])
def test_parity_with_python_path(files, monkeypatch, bs, drop):
  ds = ParquetDataset(files, batch_size=bs, drop_remainder=drop)
  assert ds._native_iter() is not None
  a_n, b_n, c_n = _collect(ds)
  a_p, b_p, c_p = _python_path(monkeypatch, ds)
  assert np.array_equal(a_n, a_p)
  assert np.allclose(b_n, b_p)
  assert len(c_n) == len(c_p)
  assert all(list(x) == list(y) for x, y in zip(c_n, c_p))


def test_shuffle_is_permutation(files):
  ds = ParquetDataset(files[0], batch_size=100, drop_remainder=True,
                      shuffle=True, seed=3)
  assert ds._native_iter() is not None
  a = np.concatenate([np.asarray(b['a']) for b in ds])
  assert not np.array_equal(a, np.sort(a))
  assert np.array_equal(np.sort(a), np.arange(1000))


def test_rowgroup_partitioning_covers_all_rows(files):
  got = []
  for pi in range(3):
    ds = ParquetDataset(files, batch_size=100,
                        partition_index=pi, partition_count=3)
    got.extend(
        np.concatenate([np.asarray(b['a']) for b in ds]).tolist())
  assert sorted(got) == list(range(2000))


def test_orc_native():
  import pyarrow.orc as po
  d = tempfile.mkdtemp()
  n = 500
  tbl = pa.table({'a': np.arange(n), 'b': np.random.rand(n)})
  p = os.path.join(d, 'x.orc')
  po.write_table(tbl, p)
  ds = Dataset.from_orc(p, batch_size=128)
  assert ds._native_iter() is not None
  a = np.concatenate([np.asarray(b['a']) for b in ds])
  assert np.array_equal(a, np.arange(n))


def test_null_fill_with_defaults():
  d = tempfile.mkdtemp()
  t = pa.table({
      'x': pa.array([1, None, 3, None, 5], pa.int64()),
      'y': pa.array([[1, 2], None, [3, None], [], [4]],
                    pa.list_(pa.int64())),
  })
  p = os.path.join(d, 'nulls.parquet')
  pq.write_table(t, p)
  ds = ParquetDataset(
      p, fields=[Field('x', np.int64, default_value=-7),
                 Field('y', np.int64, ragged_rank=1, default_value=-9)],
      batch_size=5)
  assert ds._native_iter() is not None
  b = next(iter(ds))
  assert np.asarray(b['x']).tolist() == [1, -7, 3, -7, 5]
  assert b['y'].to_list() == [[1, 2], [], [3, -9], [], [4]]


def test_string_columns_native():
  d = tempfile.mkdtemp()
  strs = ['a', 'bb', 'ccc', 'unicode-é漢'] * 50
  t = pa.table({'s': pa.array(strs), 'i': np.arange(200),
                'sn': pa.array(['x', None] * 100)})
  p = os.path.join(d, 's.parquet')
  pq.write_table(t, p, row_group_size=64)
  ds = ParquetDataset(p, batch_size=32)
  assert ds._native_iter() is not None  # flat strings are native
  got, got_n = [], []
  for b in ds:
    got.extend(b['s'].tolist())
    got_n.extend(b['sn'].tolist())
  assert got == strs
  assert got_n == ['x', ''] * 100  # nulls -> empty strings


def test_list_of_string_falls_back_to_python_path():
  d = tempfile.mkdtemp()
  t = pa.table({'ls': pa.array([['a'], ['b', 'c'], []]),
                'i': np.arange(3)})
  p = os.path.join(d, 'ls.parquet')
  pq.write_table(t, p)
  ds = ParquetDataset(p, batch_size=2)
  assert ds._native_iter() is None  # list<string> not native
  batches = list(ds)
  assert sum(b['i'].shape[0] for b in batches) == 3


def test_buffers_outlive_iterator(files):
  ds = ParquetDataset(files[0], batch_size=256, drop_remainder=True)
  it = iter(ds)
  assert isinstance(it, native_tabular.NativeTabularIterator)
  kept = [next(it) for _ in range(3)]
  snapshot = [np.asarray(b['a']).copy() for b in kept]
  del it, ds
  gc.collect()
  for b, snap in zip(kept, snapshot):
    assert np.array_equal(np.asarray(b['a']), snap)
    assert np.asarray(b['c'].values).size == b['c'].row_splits[0][-1]


def test_zero_copy_arrays_are_readonly(files):
  ds = ParquetDataset(files[0], batch_size=1000, drop_remainder=True)
  b = next(iter(ds))
  arr = np.asarray(b['a'])
  with pytest.raises(ValueError):
    arr[0] = 42


def test_env_kill_switch(files, monkeypatch):
  monkeypatch.setenv('HB_NATIVE_DATA_DISABLED', '1')
  monkeypatch.setattr(native_tabular, '_LIB', None)
  monkeypatch.setattr(native_tabular, '_TRIED', False)
  ds = ParquetDataset(files[0], batch_size=100)
  assert ds._native_iter() is None
  monkeypatch.setattr(native_tabular, '_TRIED', False)


def test_orc_ragged_native():
  import pyarrow.orc as po
  d = tempfile.mkdtemp()
  rng = np.random.RandomState(3)
  lists = [rng.randint(0, 9, rng.randint(0, 5)).tolist() for _ in range(300)]
  tbl = pa.table({'a': np.arange(300),
                  'r': pa.array(lists, pa.list_(pa.int64()))})
  p = os.path.join(d, 'ragged.orc')
  po.write_table(tbl, p)
  ds = Dataset.from_orc(p, batch_size=64)
  assert ds._native_iter() is not None
  got = []
  for b in ds:
    assert isinstance(b['r'], Value)
    got.extend(b['r'].to_list())
  assert len(got) == 300
  assert all(list(x) == y for x, y in zip(got, lists))


def test_binary_column_falls_back():
  d = tempfile.mkdtemp()
  pq.write_table(pa.table({'b': pa.array([b'x', b'yy'], pa.binary()),
                           'i': np.arange(2)}),
                 os.path.join(d, 'b.parquet'))
  ds = ParquetDataset(os.path.join(d, 'b.parquet'), batch_size=2)
  assert ds._native_iter() is None
  assert sum(b['i'].shape[0] for b in ds) == 2


def test_string_type_drift_falls_back():
  d = tempfile.mkdtemp()
  pq.write_table(pa.table({'s': pa.array(['a', 'b'], pa.string())}),
                 os.path.join(d, 's1.parquet'))
  pq.write_table(pa.table({'s': pa.array(['c', 'd'], pa.large_string())}),
                 os.path.join(d, 's2.parquet'))
  ds = ParquetDataset([os.path.join(d, 's1.parquet'),
                       os.path.join(d, 's2.parquet')], batch_size=3)
  assert ds._native_iter() is None
  assert [s for b in ds for s in b['s']] == ['a', 'b', 'c', 'd']


def test_null_strings_consistent_across_paths(monkeypatch):
  d = tempfile.mkdtemp()
  p = os.path.join(d, 'n.parquet')
  pq.write_table(pa.table({'s': pa.array(['x', None, 'y'])}), p)
  ds = ParquetDataset(p, batch_size=3)
  native = [s for b in ds for s in b['s']]
  monkeypatch.setattr(native_tabular, 'available', lambda: False)
  python = [s for b in ParquetDataset(p, batch_size=3) for s in b['s']]
  assert native == python == ['x', '', 'y']


def test_shuffle_mixes_across_row_groups(tmp_path):
  """Window shuffling must mix rows ACROSS buffered row groups, not just
  permute within each emitted batch (ADVICE r1: shuffle_buffer was
  cosmetic)."""
  import pandas as pd
  p = str(tmp_path / 'o.parquet')
  pd.DataFrame({'x': np.arange(400, dtype=np.int64)}).to_parquet(
      p, row_group_size=50)
  ds = ParquetDataset(p, batch_size=50, shuffle=True, shuffle_buffer=200,
                      seed=3, num_parallel_reads=1)
  assert ds._native_iter() is not None
  first = next(iter(ds))['x']
  groups = set(np.asarray(first) // 50)
  assert len(groups) >= 2, groups
