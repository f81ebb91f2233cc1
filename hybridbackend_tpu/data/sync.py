"""Cross-replica out-of-range synchronization.

TPU-native re-design of the reference's ``SyncReplicasDataset``
(``/root/reference/hybridbackend/tensorflow/data/sync/sync_replicas_dataset.cc:34-213``
+ ``hook.py:35-152``): every step, workers agree whether anyone (or
everyone) has exhausted their data partition so all replicas stop
*together* — otherwise collectives in the training step would deadlock.

The reference allreduces an exhaustion count through a session hook. In
JAX the same contract is a psum of a local ``has_data`` flag across
processes each step (SURVEY §7: "SyncReplicas out-of-range → psum of a
local has_data flag").
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import numpy as np

from hybridbackend_tpu.data.dataframe import Batch, Value
from hybridbackend_tpu.framework.context import Context
from hybridbackend_tpu.framework.options import OPTIONS

OPTIONS.register('data_sync_drop_remainder', True,
                 env='HB_DATA_SYNC_DROP_REMAINDER',
                 doc='Stop all replicas when ANY runs out (True) or only '
                     'when ALL run out (False).')


def _global_flags(local_has_data: bool, ctx: Context) -> Tuple[bool, bool]:
  """Returns (any_has_data, all_have_data) across processes."""
  if ctx.num_processes <= 1:
    return local_has_data, local_has_data
  import jax
  from jax.experimental import multihost_utils
  flags = multihost_utils.process_allgather(
      np.asarray([local_has_data], np.int32))
  return bool(flags.max()), bool(flags.min())


class SyncReplicasIterator:
  """Wraps a per-host batch iterator with replica-synchronized stopping.

  In ``drop_remainder`` mode (train default) iteration stops as soon as
  any replica is exhausted. Otherwise (eval) it continues until every
  replica is exhausted; dried-up replicas emit zero-filled batches with
  all-False masks so globally-exact metrics ignore them (reference
  semantics: ``sync_replicas_dataset.cc:109-213``).
  """

  def __init__(self, iterator: Iterator[Batch],
               drop_remainder: Optional[bool] = None,
               ctx: Optional[Context] = None):
    self._it = iter(iterator)
    self._ctx = ctx or Context.get()
    if drop_remainder is None:
      drop_remainder = bool(OPTIONS['data_sync_drop_remainder'])
    self._drop_remainder = drop_remainder
    self._template: Optional[Batch] = None

  def __iter__(self):
    return self

  def _empty_like(self, template: Batch) -> Batch:
    out: Batch = {}
    for k, v in template.items():
      if isinstance(v, Value):
        n = v.batch_size
        out[k] = Value(np.zeros((0,) + v.values.shape[1:], v.values.dtype),
                       [np.zeros(n + 1, np.int64)
                        for _ in range(v.ragged_rank)])
      else:
        arr = np.asarray(v)
        out[k] = np.zeros_like(arr)
        if k.endswith('_mask'):
          out[k] = np.zeros_like(arr, dtype=bool)
    return out

  def __next__(self) -> Batch:
    try:
      batch = next(self._it)
      has_data = True
    except StopIteration:
      batch = None
      has_data = False
    any_data, all_data = _global_flags(has_data, self._ctx)
    if self._drop_remainder:
      if not all_data:
        raise StopIteration
      return batch  # type: ignore[return-value]
    if not any_data:
      raise StopIteration
    if batch is None:
      if self._template is None:
        raise StopIteration  # never saw a batch; nothing to synthesize
      return self._empty_like(self._template)
    self._template = batch
    return batch


__all__ = ['SyncReplicasIterator']
