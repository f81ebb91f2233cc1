from hybridbackend_tpu.data.dataframe import (
    Field, Value, parse, populate_defaults, from_arrow)
from hybridbackend_tpu.data.parquet import ParquetDataset, Dataset, infer_fields
from hybridbackend_tpu.data.rebatch import RebatchBuffer, rebatch
from hybridbackend_tpu.data.sync import SyncReplicasIterator
from hybridbackend_tpu.data.prefetch import DeviceIterator
from hybridbackend_tpu.data.deduplicate import deduplicate, restore_deduplicated


class DataFrame:
  """Namespace alias matching the reference's spelling
  (``hb.data.DataFrame.Field`` / ``.Value``, ``dataframe.py:52-396``)."""
  Field = Field
  Value = Value
