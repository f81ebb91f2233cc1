"""HBM-cached embeddings over host-DRAM tables (EmbeddingService parity).

TPU-native re-design of the reference's GPU-cached ``EmbeddingService``
(``/root/reference/hybridbackend/tensorflow/embedding/service.py:50-324``
+ WCWS slab-hash probe kernel ``lookup_functors.cu.cc:40-170``): tables
too large for device memory live in host DRAM; the device holds a
fixed-capacity row cache. The reference probes a GPU hash table with a
warp-cooperative kernel and evicts by staleness top-k in the gradient
pass; on TPU the id→slot map is a host-side hash map (the input pipeline
already touches every id on the host), so the device only ever sees
dense slot indices — no device-side probing needed, and the training
step stays a pure jitted function over the cache array.

Per step: ``prepare(ids)`` assigns cache slots (LRU eviction with
write-back of dirty rows), uploads missing rows HBM←DRAM, and returns
slot ids; the cache array is the trainable parameter for resident rows.
``flush()`` writes all resident rows back before checkpoints (reference
``before_save_checkpoints``). Optimizer slot state (e.g. Adagrad
accumulators) is cached under the same slot mapping (reference
``before_apply_gradients`` slot sync).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hybridbackend_tpu.embedding.table import TableConfig
from hybridbackend_tpu.framework.context import Context


class Storage:
  """Abstract row storage behind the cache (reference
  ``EmbeddingService.pull/push``, ``service.py:143-149``): implement
  against any KV store / parameter service. Rows are keyed by table row
  index; a storage serves one logical table (+ aligned aux tables via
  separate instances or the ``name`` argument)."""

  def pull(self, name: str, keys: np.ndarray) -> np.ndarray:
    """Fetch rows ``keys`` of table ``name`` → ``[len(keys), ...]``."""
    raise NotImplementedError

  def push(self, name: str, keys: np.ndarray,
           values: np.ndarray) -> None:
    """Write rows ``keys`` of table ``name``."""
    raise NotImplementedError


class InMemoryStorage(Storage):
  """Default storage: plain host-DRAM arrays."""

  def __init__(self, tables: Dict[str, np.ndarray]):
    self.tables = tables

  def pull(self, name, keys):
    return self.tables[name][keys]

  def push(self, name, keys, values):
    self.tables[name][keys] = values


class EmbeddingCache:
  """Fixed-capacity device cache over one host-DRAM table (plus aligned
  auxiliary tables, e.g. optimizer accumulators)."""

  def __init__(self, config: TableConfig, capacity: int,
               host_tables: Optional[Dict[str, np.ndarray]] = None,
               storage: Optional[Storage] = None,
               table_shapes: Optional[Dict[str, tuple]] = None,
               table_dtypes: Optional[Dict[str, np.dtype]] = None,
               ctx: Optional[Context] = None):
    self.config = config
    self._ctx = ctx or Context.get()
    if host_tables is None and storage is None:
      raise ValueError('pass host_tables or a Storage')
    if host_tables is not None and storage is not None:
      raise ValueError('pass host_tables OR storage, not both (seed a '
                       'custom Storage with the initial rows instead)')
    if host_tables is not None:
      if 'value' not in host_tables:
        raise ValueError("host_tables must include a 'value' table")
      vocab = host_tables['value'].shape[0]
      for name, t in host_tables.items():
        if t.shape[0] != vocab:
          raise ValueError(
              f'host table {name!r} rows {t.shape[0]} != {vocab}')
      storage = InMemoryStorage(host_tables)
      table_shapes = {n: t.shape[1:] for n, t in host_tables.items()}
      table_dtypes = {n: t.dtype for n, t in host_tables.items()}
    else:
      if not table_shapes or 'value' not in table_shapes:
        raise ValueError("storage mode needs table_shapes with 'value'")
      table_dtypes = {**{n: np.dtype(np.float32) for n in table_shapes},
                      **(table_dtypes or {})}
    self.storage = storage
    self.capacity = int(capacity)
    self.host: Dict[str, np.ndarray] = host_tables or {}
    # Device-resident caches, one per table, same slot mapping.
    self.device: Dict[str, jax.Array] = {
        name: jnp.zeros((self.capacity,) + tuple(shape),
                        table_dtypes[name])
        for name, shape in table_shapes.items()
    }
    self._id_to_slot: Dict[int, int] = {}
    self._slot_to_id = np.full(self.capacity, -1, np.int64)
    self._last_used = np.zeros(self.capacity, np.int64)
    self._free: List[int] = list(range(self.capacity - 1, -1, -1))
    self._step = 0

  @property
  def resident(self) -> int:
    return len(self._id_to_slot)

  def prepare(self, ids: np.ndarray) -> np.ndarray:
    """Assign slots for ``ids`` (uploading misses), return slot indices.

    Call once per step BEFORE the jitted step; pass the returned slots
    as the lookup indices into ``cache.device['value']``.
    """
    ids = np.asarray(ids).reshape(-1)
    uniq = np.unique(ids)
    if len(uniq) > self.capacity:
      raise ValueError(
          f'batch touches {len(uniq)} unique ids > capacity '
          f'{self.capacity}; raise the cache capacity')
    self._step += 1
    misses = [i for i in uniq.tolist() if i not in self._id_to_slot]
    if misses:
      slots = self._allocate(len(misses), protect=set(uniq.tolist()))
      for name in self.device:
        rows = jnp.asarray(self.storage.pull(name, np.asarray(misses)))
        self.device[name] = self.device[name].at[
            jnp.asarray(slots)].set(rows)
      for i, s in zip(misses, slots):
        self._id_to_slot[i] = s
        self._slot_to_id[s] = i
    slot_arr = np.fromiter((self._id_to_slot[i] for i in ids.tolist()),
                           np.int32, len(ids))
    for i in uniq.tolist():
      self._last_used[self._id_to_slot[i]] = self._step
    return slot_arr

  def _allocate(self, n: int, protect: set) -> List[int]:
    slots: List[int] = []
    while self._free and len(slots) < n:
      slots.append(self._free.pop())
    if len(slots) < n:
      # Evict stalest resident rows not needed this step (reference:
      # staleness top_k, service.py:253-283), writing values back.
      order = np.argsort(self._last_used)
      evict = []
      for s in order:
        if len(slots) + len(evict) >= n:
          break
        owner = self._slot_to_id[s]
        if owner >= 0 and owner not in protect:
          evict.append(int(s))
      if len(slots) + len(evict) < n:
        raise ValueError('cache thrash: cannot evict enough rows')
      self._writeback(evict)
      for s in evict:
        del self._id_to_slot[int(self._slot_to_id[s])]
        self._slot_to_id[s] = -1
      slots.extend(evict)
    return slots

  def _writeback(self, slots: List[int]) -> None:
    if not slots:
      return
    idx = np.asarray(slots)
    owners = self._slot_to_id[idx]
    for name in self.device:
      rows = np.asarray(self.device[name][jnp.asarray(idx)])
      self.storage.push(name, owners, rows)

  def flush(self) -> None:
    """Write every resident row back to the host tables (reference:
    ``before_save_checkpoints``, service.py:306-324)."""
    slots = [s for s in range(self.capacity) if self._slot_to_id[s] >= 0]
    self._writeback(slots)

  def lookup_embeddings(self, slots: np.ndarray) -> jax.Array:
    """Convenience: gather cached value rows for prepared slots."""
    return jnp.take(self.device['value'], jnp.asarray(slots), axis=0)


__all__ = ['EmbeddingCache', 'Storage', 'InMemoryStorage']
