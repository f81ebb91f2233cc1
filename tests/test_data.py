"""Data layer tests — parity with the reference's data/tests suite
(parquet_dataset_test.py, rebatch, ragged, string, dedup, sync):
pandas/pyarrow-generated fixtures, batch contents asserted against
pd.read_parquet slices."""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest

from hybridbackend_tpu.data import (
    Dataset, DeviceIterator, Field, ParquetDataset, SyncReplicasIterator,
    Value, deduplicate, parse, populate_defaults, restore_deduplicated)
from hybridbackend_tpu.data.rebatch import RebatchBuffer, rebatch
from hybridbackend_tpu.data.validate import validate


@pytest.fixture
def workdir():
  with tempfile.TemporaryDirectory() as d:
    yield d


def write_parquet(path, nrows=200, seed=0, ragged=False, row_group_size=50):
  rng = np.random.RandomState(seed)
  df = pd.DataFrame({
      'label': rng.randint(0, 2, nrows).astype(np.float32),
      'f0': rng.randint(0, 100, nrows).astype(np.int64),
      'f1': rng.randint(0, 100, nrows).astype(np.int64),
  })
  if ragged:
    df['seq'] = [
        rng.randint(0, 50, rng.randint(1, 6)).astype(np.int64).tolist()
        for _ in range(nrows)
    ]
  df.to_parquet(path, row_group_size=row_group_size)
  return df


class TestValue:

  def test_roundtrip_list(self):
    v = Value(np.array([1, 2, 3, 4, 5]), [np.array([0, 2, 2, 5])])
    lst = v.to_list()
    assert [list(x) for x in lst] == [[1, 2], [], [3, 4, 5]]
    assert v.batch_size == 3

  def test_to_padded(self):
    v = Value(np.array([1, 2, 3, 4, 5]), [np.array([0, 2, 2, 5])])
    padded, mask = v.to_padded(max_len=4, pad_value=-1)
    np.testing.assert_array_equal(padded, [[1, 2, -1, -1],
                                           [-1, -1, -1, -1],
                                           [3, 4, 5, -1]])
    np.testing.assert_array_equal(mask, [[1, 1, 0, 0],
                                         [0, 0, 0, 0],
                                         [1, 1, 1, 0]])

  def test_to_padded_pow2_default(self):
    v = Value(np.arange(5), [np.array([0, 5])])
    padded, _ = v.to_padded()
    assert padded.shape == (1, 8)  # 5 → pow2 bucket 8

  def test_to_coo(self):
    v = Value(np.array([7, 8, 9]), [np.array([0, 1, 3])])
    indices, values, shape = v.to_coo()
    np.testing.assert_array_equal(indices, [[0, 0], [1, 0], [1, 1]])
    np.testing.assert_array_equal(values, [7, 8, 9])
    assert shape == (2, 2)

  def test_slice_and_concat(self):
    v = Value(np.arange(10), [np.array([0, 3, 5, 6, 10])])
    a, b = v.slice_rows(0, 2), v.slice_rows(2, 4)
    back = Value.concat([a, b])
    np.testing.assert_array_equal(back.values, v.values)
    np.testing.assert_array_equal(back.row_splits[0], v.row_splits[0])

  def test_parse_and_defaults(self):
    batch = {'a': np.arange(4),
             's': Value(np.arange(6), [np.array([0, 1, 3, 3, 6])])}
    fields = [Field('a'), Field('s', ragged_rank=1, max_len=4),
              Field('missing', dtype=np.float32, default_value=9.0)]
    batch = populate_defaults(batch, fields)
    assert batch['missing'].shape == (4,)
    assert (batch['missing'] == 9.0).all()
    parsed = parse(batch, fields)
    assert parsed['s'].shape == (4, 4)
    assert parsed['s_mask'].sum() == 6


class TestParquetDataset:

  def test_batches_match_pandas(self, workdir):
    path = os.path.join(workdir, 'a.parquet')
    df = write_parquet(path)
    ds = ParquetDataset(path, batch_size=32)
    got = list(ds)
    total = sum(len(b['f0']) for b in got)
    assert total == 200
    assert all(len(b['f0']) == 32 for b in got[:-1])
    joined = np.concatenate([b['f0'] for b in got])
    np.testing.assert_array_equal(joined, df['f0'].values)

  def test_drop_remainder(self, workdir):
    path = os.path.join(workdir, 'a.parquet')
    write_parquet(path)
    got = list(ParquetDataset(path, batch_size=64, drop_remainder=True))
    assert len(got) == 3
    assert all(len(b['f0']) == 64 for b in got)

  def test_column_selection(self, workdir):
    path = os.path.join(workdir, 'a.parquet')
    write_parquet(path)
    got = next(iter(ParquetDataset(path, fields=['label'], batch_size=16)))
    assert set(got.keys()) == {'label'}

  def test_unknown_column_raises(self, workdir):
    path = os.path.join(workdir, 'a.parquet')
    write_parquet(path)
    with pytest.raises(ValueError):
      ParquetDataset(path, fields=['nope'])

  def test_ragged_column(self, workdir):
    path = os.path.join(workdir, 'a.parquet')
    df = write_parquet(path, ragged=True)
    got = next(iter(ParquetDataset(path, batch_size=50)))
    assert isinstance(got['seq'], Value)
    expected = df['seq'][:50].tolist()
    actual = [list(x) for x in got['seq'].to_list()]
    assert actual == expected

  def test_schema_inference(self, workdir):
    path = os.path.join(workdir, 'a.parquet')
    write_parquet(path, ragged=True)
    ds = ParquetDataset(path)
    by_name = {f.name: f for f in ds.fields}
    assert by_name['f0'].ragged_rank == 0
    assert by_name['seq'].ragged_rank == 1
    assert by_name['label'].dtype == np.float32

  def test_glob_and_multiple_files(self, workdir):
    df0 = write_parquet(os.path.join(workdir, 'p0.parquet'), seed=1)
    df1 = write_parquet(os.path.join(workdir, 'p1.parquet'), seed=2)
    ds = ParquetDataset(os.path.join(workdir, 'p*.parquet'), batch_size=100,
                        num_parallel_reads=1)
    got = np.concatenate([b['f0'] for b in ds])
    expected = np.concatenate([df0['f0'].values, df1['f0'].values])
    np.testing.assert_array_equal(got, expected)

  def test_parallel_reads_complete(self, workdir):
    for i in range(4):
      write_parquet(os.path.join(workdir, f'p{i}.parquet'), seed=i)
    ds = ParquetDataset(os.path.join(workdir, 'p*.parquet'), batch_size=64,
                        num_parallel_reads=4)
    total = sum(len(b['f0']) for b in ds)
    assert total == 800

  def test_file_partitioning(self, workdir):
    for i in range(4):
      write_parquet(os.path.join(workdir, f'p{i}.parquet'), seed=i)
    pattern = os.path.join(workdir, 'p*.parquet')
    rows = [sum(len(b['f0']) for b in
                ParquetDataset(pattern, batch_size=64, partition_index=i,
                               partition_count=2, num_parallel_reads=1))
            for i in range(2)]
    assert sum(rows) == 800
    assert rows == [400, 400]

  def test_rowgroup_partitioning_single_file(self, workdir):
    path = os.path.join(workdir, 'a.parquet')
    write_parquet(path, row_group_size=25)  # 8 row groups
    rows = [sum(len(b['f0']) for b in
                ParquetDataset(path, batch_size=16, partition_index=i,
                               partition_count=4, num_parallel_reads=1))
            for i in range(4)]
    assert sum(rows) == 200

  def test_shuffle_is_permutation(self, workdir):
    path = os.path.join(workdir, 'a.parquet')
    df = write_parquet(path)
    got = np.concatenate(
        [b['f0'] for b in ParquetDataset(path, batch_size=32, shuffle=True,
                                         seed=7)])
    assert not (got == df['f0'].values).all()
    np.testing.assert_array_equal(np.sort(got), np.sort(df['f0'].values))

  def test_dataset_namespace(self, workdir):
    path = os.path.join(workdir, 'a.parquet')
    write_parquet(path)
    ds = Dataset.from_parquet(path, batch_size=16)
    assert len(next(iter(ds))['f0']) == 16


class TestRebatch:

  def test_exact_batches_across_chunks(self):
    chunks = [{'x': np.arange(i * 10, i * 10 + 10)} for i in range(5)]
    out = list(rebatch(iter(chunks), 16))
    sizes = [len(b['x']) for b in out]
    assert sizes == [16, 16, 16, 2]
    np.testing.assert_array_equal(np.concatenate([b['x'] for b in out]),
                                  np.arange(50))

  def test_ragged_rebatch(self):
    def chunks():
      for i in range(3):
        yield {'s': Value(np.arange(6), [np.array([0, 1, 3, 6])])}
    out = list(rebatch(chunks(), 2))
    assert [b['s'].batch_size for b in out] == [2, 2, 2, 2, 1]

  def test_buffer_take_too_many(self):
    buf = RebatchBuffer()
    buf.put({'x': np.arange(3)})
    with pytest.raises(ValueError):
      buf.take(5)

  def test_mismatched_columns(self):
    buf = RebatchBuffer()
    with pytest.raises(ValueError):
      buf.put({'x': np.arange(3), 'y': np.arange(4)})


class TestDeduplicate:

  def test_roundtrip(self):
    batch = {'user': np.array([10, 10, 20, 10, 20]),
             'age': np.array([1.0, 1.0, 2.0, 1.0, 2.0], np.float32),
             'item': np.arange(5)}
    dd = deduplicate(batch, value_columns=['age'], key_column='user')
    assert len(dd['age']) == 2
    restored = restore_deduplicated(dd, ['age'], 'restore_idx')
    np.testing.assert_array_equal(restored['age'], batch['age'])
    np.testing.assert_array_equal(restored['item'], batch['item'])

  def test_ragged_value_column(self):
    batch = {'key': np.array([5, 5, 9]),
             'hist': Value(np.arange(4), [np.array([0, 2, 4, 4])])}
    dd = deduplicate(batch, ['hist'], 'key')
    restored = restore_deduplicated(dd, ['hist'], 'restore_idx')
    assert [list(x) for x in restored['hist'].to_list()] == [[0, 1], [0, 1], []]


class TestSyncReplicas:

  def test_drop_remainder_passthrough_single_host(self):
    batches = [{'x': np.arange(4)} for _ in range(3)]
    out = list(SyncReplicasIterator(iter(batches), drop_remainder=True))
    assert len(out) == 3
    assert '_sync_valid' not in out[0]  # drop mode: untouched batches

  def test_non_drop_attaches_valid_weights(self):
    batches = [{'x': np.arange(8)}, {'x': np.arange(8)}]
    out = list(SyncReplicasIterator(iter(batches), drop_remainder=False))
    assert len(out) == 2
    for b in out:
      np.testing.assert_array_equal(b['_sync_valid'], np.ones(8))

  def test_padded_partial_batch(self):
    """Padding a short batch extends dense columns with zero rows and
    ragged columns with empty rows; _sync_valid marks the real rows."""
    it = SyncReplicasIterator(iter(()), drop_remainder=False)
    batch = {
        'x': np.arange(3, dtype=np.float32),
        'm_mask': np.ones((3, 2), bool),
        'hist': Value(np.arange(4), [np.array([0, 2, 4, 4])]),
    }
    out = it._padded(batch, 5)
    np.testing.assert_array_equal(out['_sync_valid'], [1, 1, 1, 0, 0])
    assert out['x'].shape == (5,)
    assert out['x'][3] == 0 and out['x'][4] == 0
    assert out['m_mask'].shape == (5, 2)
    assert out['hist'].batch_size == 5
    assert out['hist'].to_list()[3] == [] and out['hist'].to_list()[4] == []
    # real ragged rows untouched
    assert [list(r) for r in out['hist'].to_list()[:3]] == [[0, 1], [2, 3], []]

  def test_empty_like_schema(self):
    """A dried replica synthesizes a full-shape batch with zero valid
    rows — ragged columns get N empty rows (nested splits consistent)."""
    it = SyncReplicasIterator(iter(()), drop_remainder=False)
    template = {
        'x': np.ones((4, 3), np.float32),
        'm_mask': np.ones((4, 2), np.float32),  # masks re-typed to bool
        'hist': Value(np.arange(6),
                      [np.array([0, 2, 4, 6]), np.array([0, 1, 2, 3, 4, 5, 6])]),
        '_sync_valid': np.ones(4, np.float32),
    }
    out = it._empty_like(template, 6)
    np.testing.assert_array_equal(out['_sync_valid'], np.zeros(6))
    assert out['x'].shape == (6, 3)
    assert out['m_mask'].dtype == np.bool_
    assert out['hist'].batch_size == 6
    assert len(out['hist'].row_splits) == 2
    assert out['hist'].row_splits[1].tolist() == [0]
    assert out['hist'].values.shape[0] == 0

  def test_non_drop_single_host_partial_batch_pads_to_devices(self):
    """The partial tail is padded up to a multiple of the per-process
    device count (8 on the test mesh) so the global batch divides the
    mesh's data axis; padding rows carry zero weight."""
    batches = [{'x': np.arange(8)}, {'x': np.arange(2)}]
    out = list(SyncReplicasIterator(iter(batches), drop_remainder=False))
    assert out[1]['x'].shape == (8,)
    np.testing.assert_array_equal(
        out[1]['_sync_valid'], [1, 1, 0, 0, 0, 0, 0, 0])


class TestDeviceIterator:

  def test_prefetch_to_device(self):
    import jax
    batches = ({'x': np.full((16,), i, np.float32)} for i in range(5))
    it = DeviceIterator(batches)
    got = list(it)
    assert len(got) == 5
    assert isinstance(got[0]['x'], jax.Array)
    assert float(got[2]['x'][0]) == 2.0

  def test_producer_error_propagates(self):
    def bad():
      yield {'x': np.arange(8)}
      raise RuntimeError('reader exploded')
    it = DeviceIterator(bad())
    next(it)
    with pytest.raises(RuntimeError, match='reader exploded'):
      next(it)

  def test_close_cancels(self):
    batches = ({'x': np.arange(8)} for _ in range(100))
    it = DeviceIterator(batches)
    next(it)
    it.close()

  def test_stall_stats_and_sentinel_rollback(self):
    """Round-5: queue-empty waits are counted (stall attribution), and
    the end-of-stream sentinel get must NOT count as a stall or a
    get."""
    import time as _t

    def slow():
      for i in range(4):
        if i >= 2:
          _t.sleep(0.15)           # drain the 1-deep queue -> stalls
        yield {'x': np.full((8,), i, np.float32)}

    it = DeviceIterator(slow(), capacity=1)
    n = sum(1 for _ in it)
    st = it.stall_stats
    assert n == 4
    assert st['gets'] == 4          # sentinel rolled back
    assert st['stalls'] >= 1
    assert st['stall_s'] > 0
    assert 0 < st['stall_fraction'] <= 1

  def test_multiprocess_rejects_batchless_column(self):
    """A column with ndim <= shard_dim in a MULTI-process job cannot be
    'replicated' (each host would contribute different data — silent
    divergence); _put_batch must refuse with a clear error."""
    from hybridbackend_tpu.data.prefetch import _put_batch
    from hybridbackend_tpu.framework.context import Context

    class _Ctx:
      num_processes = 2
      batch_sharding = None
      data_axes = Context.get().data_axes

    with pytest.raises(ValueError, match='no batch axis'):
      _put_batch({'meta': np.arange(4)}, _Ctx(), sharded=True,
                 shard_dim=1)
    # Single process: replication of host data is sound — no error.
    out = _put_batch({'meta': np.arange(4)}, Context.get(),
                     sharded=True, shard_dim=1)
    assert out['meta'].shape == (4,)

  def test_shard_dim_for_grouped_batches(self):
    """Round-5: shard_dim=1 shards the SECOND axis (multi-batch [G, B]
    groups) — dim 0 stays whole even when it doesn't divide the mesh."""
    import jax
    from hybridbackend_tpu.framework.context import Context
    ctx = Context.get()
    w = ctx.world_size
    batches = [{'g': np.arange(3 * 2 * w, dtype=np.float32)
                .reshape(3, 2 * w)}]
    it = DeviceIterator(iter(batches), shard_dim=1)
    (got,) = list(it)
    assert got['g'].shape == (3, 2 * w)
    # Sharded over the mesh on dim 1: every device holds dim0 whole.
    db = got['g'].sharding.shard_shape(got['g'].shape)
    assert db[0] == 3 and db[1] == 2 * w // w


class TestValidate:

  def test_consistent(self, workdir):
    write_parquet(os.path.join(workdir, 'a.parquet'))
    write_parquet(os.path.join(workdir, 'b.parquet'), seed=3)
    assert validate([os.path.join(workdir, '*.parquet')]) == []

  def test_inconsistent_dtype(self, workdir):
    write_parquet(os.path.join(workdir, 'a.parquet'))
    pd.DataFrame({'label': [1, 2], 'f0': [1.5, 2.5],
                  'f1': [1, 2]}).to_parquet(
        os.path.join(workdir, 'b.parquet'))
    problems = validate([os.path.join(workdir, '*.parquet')])
    assert problems and any('dtype' in p for p in problems)


class TestORC:

  def test_orc_roundtrip(self, workdir):
    import pyarrow as pa
    import pyarrow.orc as po
    rng = np.random.RandomState(0)
    tbl = pa.table({'a': rng.randint(0, 100, 150).astype(np.int64),
                    's': [rng.randint(0, 9, rng.randint(1, 4)).tolist()
                          for _ in range(150)]})
    path = os.path.join(workdir, 'x.orc')
    po.write_table(tbl, path)
    ds = Dataset.from_orc(path, batch_size=64)
    by_name = {f.name: f for f in ds.fields}
    assert by_name['s'].ragged_rank == 1
    got = list(ds)
    assert sum(len(b['a']) for b in got) == 150
    np.testing.assert_array_equal(
        np.concatenate([b['a'] for b in got]),
        tbl.column('a').to_numpy())


def test_dataset_combinators(tmp_path):
  """tf.data-style map/repeat/take/prefetch chains (adoption parity)."""
  import pandas as pd
  import hybridbackend_tpu as hb
  p = str(tmp_path / 'c.parquet')
  pd.DataFrame({'a': np.arange(100, dtype=np.int64)}).to_parquet(p)
  ds = hb.data.ParquetDataset(p, batch_size=16, drop_remainder=True)
  out = list(ds.map(lambda b: {'a2': np.asarray(b['a']) * 2})
               .repeat(2).take(8))
  assert len(out) == 8
  assert np.array_equal(np.asarray(out[0]['a2']), np.arange(16) * 2)
  assert np.array_equal(np.asarray(out[6]['a2']), np.arange(16) * 2)
  # prefetch chains to a DeviceIterator yielding jax arrays
  dev = list(ds.take(2).prefetch())
  assert len(dev) == 2
  import jax
  assert isinstance(dev[0]['a'], jax.Array)


class TestInPipelineDedup:
  """Dedup as dataset stages (reference applies deduplicate inside
  .batch(), tabular/table.py:218-223)."""

  def _write(self, path, n=64):
    import pandas as pd
    rng = np.random.RandomState(0)
    user = np.repeat(np.arange(n // 4), 4)     # 4 rows per user
    df = pd.DataFrame({
        'user': user,
        'profile': (user * 10).astype(np.float64),  # user-level dup col
        'click': rng.randint(0, 2, n).astype(np.int64),
    })
    df.to_parquet(path)
    return df

  def test_dedup_restore_roundtrip(self, tmp_path):
    p = str(tmp_path / 'd.parquet')
    df = self._write(p)
    ds = ParquetDataset([p], batch_size=16)
    chained = ds.dedup(['profile'], key_column='user').restore(['profile'])
    got = list(chained)
    orig = list(ParquetDataset([p], batch_size=16))
    assert len(got) == len(orig)
    for a, b in zip(got, orig):
      np.testing.assert_array_equal(a['profile'], b['profile'])
      np.testing.assert_array_equal(a['click'], b['click'])

  def test_dedup_shrinks_transport(self, tmp_path):
    p = str(tmp_path / 'd.parquet')
    self._write(p)
    ds = ParquetDataset([p], batch_size=16).dedup(['profile'],
                                                  key_column='user')
    b = next(iter(ds))
    assert b['profile'].shape[0] == 4    # 4 unique users per 16 rows
    assert b['restore_idx'].shape[0] == 16

  def test_constructor_restore_of_stored_dedup(self, tmp_path):
    """Files stored with row-group-local deduplicated value columns
    (unique rows first, padding after) + a restore_idx column."""
    import pandas as pd
    p = str(tmp_path / 's.parquet')
    n = 32
    uniq_vals = np.arange(8, dtype=np.float64) * 100
    restore_idx = np.tile(np.arange(8), 4)
    feat_col = np.concatenate([uniq_vals, np.zeros(n - 8)])  # padded
    pd.DataFrame({'feat': feat_col,
                  'restore_idx': restore_idx.astype(np.int64),
                  'y': np.arange(n, dtype=np.int64)}).to_parquet(p)
    ds = ParquetDataset([p], batch_size=8,
                        restore_columns=['feat'])
    batches = list(ds)
    all_feat = np.concatenate([b['feat'] for b in batches])
    np.testing.assert_array_equal(all_feat, uniq_vals[restore_idx])
    assert all(('restore_idx' not in b) for b in batches)


def test_python_shuffle_samples_whole_window(workdir):
  """Python rebatch path: rows sampled uniformly from the whole buffered
  window (row-exact), still a permutation overall."""
  path = os.path.join(workdir, 's.parquet')
  pd.DataFrame({'x': np.arange(400, dtype=np.int64)}).to_parquet(
      path, row_group_size=50)
  ds = ParquetDataset(path, batch_size=50, shuffle=True,
                      shuffle_buffer=200, seed=3, num_parallel_reads=1)
  import hybridbackend_tpu.native.tabular as nt
  orig = nt.available
  nt.available = lambda: False
  try:
    batches = [b['x'] for b in ds]
  finally:
    nt.available = orig
  first = batches[0]
  groups = set(np.asarray(first) // 50)
  assert len(groups) >= 3, groups   # drawn row-exact from a 200-row window
  allx = np.concatenate(batches)
  np.testing.assert_array_equal(np.sort(allx), np.arange(400))
