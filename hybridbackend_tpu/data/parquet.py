"""Columnar Parquet/ORC ingest for TPU hosts.

TPU-native re-design of the reference's tabular dataset
(``/root/reference/hybridbackend/tensorflow/data/tabular/``): the
reference implements a C++ TF dataset op over Arrow with zero-copy
string buffers (``dataset.cc:40-303``, ``parquet.cc``, ``orc.cc``). On a
TPU host the input pipeline runs on CPU next to Python, and Arrow's own
C++ readers (via pyarrow, which releases the GIL) fill the same role;
what this module adds is the framework semantics:

* schema inference from file footers (reference
  ``parquet_file_get_fields``, ``common/pybind11.cc:131-140``),
* file/row-group partitioning across hosts (reference
  ``partition_count/partition_index``, ``dataset_v2.py:49-50``),
* streamed micro-batch reads (row-group granularity) feeding the
  rebatcher,
* multi-threaded parallel reads (reference AUTOTUNE thread budgeting,
  ``table.py:94-117``).
"""

from __future__ import annotations

import concurrent.futures
import glob as _glob
import queue as _queue
import threading
from typing import Dict, Iterable, Iterator, List, Optional, Sequence, Union

import numpy as np

from hybridbackend_tpu.data.dataframe import (
    Batch, Field, Value, from_arrow)
from hybridbackend_tpu.framework.options import OPTIONS

OPTIONS.register('data_num_parallel_reads', 0,
                 env='HB_DATA_NUM_PARALLEL_READS',
                 doc='Reader threads per host (0 = auto).')


def _expand_files(filenames: Union[str, Sequence[str]]) -> List[str]:
  if isinstance(filenames, str):
    filenames = [filenames]
  out: List[str] = []
  for f in filenames:
    if any(c in f for c in '*?['):
      out.extend(sorted(_glob.glob(f)))
    else:
      out.append(f)
  if not out:
    raise ValueError(f'No files matched: {filenames}')
  return out


def _arrow_field_to_field(af) -> Field:
  import pyarrow as pa
  t = af.type
  rank = 0
  while pa.types.is_list(t) or pa.types.is_large_list(t):
    rank += 1
    t = t.value_type
  if pa.types.is_string(t) or pa.types.is_large_string(t):
    dtype = np.dtype(object)
  else:
    dtype = np.dtype(t.to_pandas_dtype())
  return Field(af.name, dtype=dtype, ragged_rank=rank)


def infer_fields(filename: str, format: str = 'parquet') -> List[Field]:
  """Read the schema from a file footer (no data IO)."""
  if format == 'parquet':
    import pyarrow.parquet as pq
    schema = pq.read_schema(filename)
  elif format == 'orc':
    import pyarrow.orc as po
    schema = po.ORCFile(filename).schema
  else:
    raise ValueError(f'Unknown format: {format}')
  return [_arrow_field_to_field(f) for f in schema]


class ParquetDataset:
  """Streams batches from Parquet (or ORC) files.

  Python-level parity with ``hb.data.ParquetDataset``
  (``tabular/dataset_v2.py:44-230``): iterating yields dict batches
  ``{name: ndarray | Value}`` of exactly ``batch_size`` rows (except a
  final partial batch unless ``drop_remainder``).

  Args:
    filenames: file paths or glob patterns.
    fields: columns to read; None = infer all from the first file.
    batch_size: rows per emitted batch.
    drop_remainder: drop the final short batch.
    partition_index/partition_count: this host reads files (and, within a
      single shared file, row groups) ``i ≡ partition_index (mod
      partition_count)``.
    shuffle: shuffle rows within a window of ``shuffle_buffer`` rows.
    num_parallel_reads: reader threads (0 = auto: min(files, cpu//2)).
    format: 'parquet' or 'orc'.
  """

  def __init__(self,
               filenames: Union[str, Sequence[str]],
               fields: Optional[Sequence[Union[Field, str]]] = None,
               batch_size: int = 1024,
               drop_remainder: bool = False,
               partition_index: int = 0,
               partition_count: int = 1,
               shuffle: bool = False,
               shuffle_buffer: Optional[int] = None,
               seed: int = 0,
               num_parallel_reads: Optional[int] = None,
               format: str = 'parquet'):
    self._files = _expand_files(filenames)
    self._format = format
    inferred = {f.name: f for f in infer_fields(self._files[0], format)}
    if fields is None:
      self._fields = list(inferred.values())
    else:
      self._fields = []
      for f in fields:
        if isinstance(f, str):
          if f not in inferred:
            raise ValueError(f'Unknown column {f!r}; file has '
                             f'{sorted(inferred)}')
          self._fields.append(inferred[f])
        else:
          if f.name in inferred:
            got = inferred[f.name]
            if got.ragged_rank != f.ragged_rank:
              raise ValueError(
                  f'Field {f.name!r}: declared ragged_rank '
                  f'{f.ragged_rank} but file has {got.ragged_rank}')
          self._fields.append(f)
    self._batch_size = int(batch_size)
    self._drop_remainder = drop_remainder
    self._partition_index = partition_index
    self._partition_count = partition_count
    self._shuffle = shuffle
    self._shuffle_buffer = shuffle_buffer or (4 * self._batch_size)
    self._seed = seed
    if num_parallel_reads is None:
      num_parallel_reads = int(OPTIONS['data_num_parallel_reads'])
    self._threads = num_parallel_reads

  @property
  def fields(self) -> List[Field]:
    return list(self._fields)

  @property
  def batch_size(self) -> int:
    return self._batch_size

  # -- reading -------------------------------------------------------------

  def _my_files(self) -> List[str]:
    if self._partition_count <= 1:
      return self._files
    if len(self._files) >= self._partition_count:
      return self._files[self._partition_index::self._partition_count]
    return self._files  # fall through to row-group partitioning

  def _iter_micro_batches(self) -> Iterator[Batch]:
    """Yield raw micro-batches (one per row group) as column dicts."""
    names = [f.name for f in self._fields]
    partition_groups = (self._partition_count > 1
                        and len(self._files) < self._partition_count)
    threads = self._threads
    if threads == 0:
      import os as _os
      threads = max(1, min(len(self._my_files()),
                           (_os.cpu_count() or 2) // 2, 8))
    if threads <= 1:
      for fname in self._my_files():
        yield from self._read_file(fname, names, partition_groups)
      return
    # Pipelined parallel reads: N worker threads each own a file and
    # push micro-batches into a bounded queue (reference: parallel
    # interleave, ``table.py:159-178``).
    q: _queue.Queue = _queue.Queue(maxsize=threads * 2)
    stop = threading.Event()
    files = list(self._my_files())
    file_iter = iter(files)
    lock = threading.Lock()

    def worker():
      try:
        while not stop.is_set():
          with lock:
            fname = next(file_iter, None)
          if fname is None:
            break
          for mb in self._read_file(fname, names, partition_groups):
            if stop.is_set():
              return
            q.put(mb)
      except BaseException as e:  # propagate to consumer
        q.put(e)
      finally:
        q.put(None)

    workers = [threading.Thread(target=worker, daemon=True)
               for _ in range(threads)]
    for w in workers:
      w.start()
    done = 0
    try:
      while done < len(workers):
        item = q.get()
        if item is None:
          done += 1
          continue
        if isinstance(item, BaseException):
          raise item
        yield item
    finally:
      stop.set()
      # Drain so producers unblock.
      while any(w.is_alive() for w in workers):
        try:
          q.get_nowait()
        except _queue.Empty:
          break

  def _read_file(self, fname: str, names: List[str],
                 partition_groups: bool) -> Iterator[Batch]:
    if self._format == 'orc':
      import pyarrow.orc as po
      f = po.ORCFile(fname)
      for s in range(f.nstripes):
        if partition_groups and (
            s % self._partition_count != self._partition_index):
          continue
        tbl = f.read_stripe(s, columns=names)
        yield {n: from_arrow(tbl.column(n)) for n in names}
      return
    import pyarrow.parquet as pq
    pf = pq.ParquetFile(fname)
    groups = range(pf.num_row_groups)
    if partition_groups:
      groups = [g for g in groups
                if g % self._partition_count == self._partition_index]
    for g in groups:
      tbl = pf.read_row_group(g, columns=names)
      yield {n: from_arrow(tbl.column(n)) for n in names}

  def __iter__(self) -> Iterator[Batch]:
    from hybridbackend_tpu.data.rebatch import rebatch
    it = self._iter_micro_batches()
    return rebatch(it, self._batch_size,
                   drop_remainder=self._drop_remainder,
                   shuffle=self._shuffle,
                   shuffle_buffer=self._shuffle_buffer,
                   seed=self._seed)


class Dataset:
  """Namespace mirroring ``hb.data.Dataset.from_parquet/from_orc``
  (``data/__init__.py:30-46``)."""

  @staticmethod
  def from_parquet(filenames, **kwargs) -> ParquetDataset:
    return ParquetDataset(filenames, format='parquet', **kwargs)

  @staticmethod
  def from_orc(filenames, **kwargs) -> ParquetDataset:
    return ParquetDataset(filenames, format='orc', **kwargs)


__all__ = ['ParquetDataset', 'Dataset', 'infer_fields']
