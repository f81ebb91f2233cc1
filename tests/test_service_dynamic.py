"""Tests for EmbeddingCache (EmbeddingService parity) and
DynamicEmbedding (DeepRec EV parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hybridbackend_tpu.embedding import TableConfig, create_table, lookup
from hybridbackend_tpu.embedding.dynamic import DynamicEmbedding, IdMapper
from hybridbackend_tpu.embedding.service import EmbeddingCache

DIM = 8


def make_cache(vocab=100, capacity=16, with_acc=False):
  rng = np.random.RandomState(0)
  host = {'value': rng.rand(vocab, DIM).astype(np.float32)}
  if with_acc:
    host['acc'] = np.zeros((vocab, DIM), np.float32)
  cfg = TableConfig('svc', vocab, DIM)
  return EmbeddingCache(cfg, capacity, host), host


class TestEmbeddingCache:

  def test_miss_then_hit(self):
    cache, host = make_cache()
    ids = np.asarray([3, 7, 3, 9])
    slots = cache.prepare(ids)
    assert cache.resident == 3
    emb = cache.lookup_embeddings(slots)
    np.testing.assert_allclose(np.asarray(emb), host['value'][ids])
    # Second step, same ids: no new residents.
    slots2 = cache.prepare(ids)
    assert cache.resident == 3
    np.testing.assert_array_equal(slots, slots2)

  def test_eviction_lru_and_writeback(self):
    cache, host = make_cache(vocab=100, capacity=4)
    cache.prepare(np.asarray([0, 1, 2, 3]))
    # Mutate a cached row on device (simulating a training update).
    s0 = cache.prepare(np.asarray([0]))[0]
    cache.device['value'] = cache.device['value'].at[s0].set(42.0)
    # Touch new ids → evicts stalest (1, 2, 3 tie; 0 was just used).
    cache.prepare(np.asarray([50, 51, 52]))
    assert cache.resident == 4
    # Evicted rows were written back; row 0 still cached with value 42.
    slots = cache.prepare(np.asarray([0]))
    assert float(cache.lookup_embeddings(slots)[0, 0]) == 42.0

  def test_flush_writes_back_updates(self):
    cache, host = make_cache(capacity=8)
    slots = cache.prepare(np.asarray([5]))
    cache.device['value'] = cache.device['value'].at[slots[0]].set(7.0)
    cache.flush()
    np.testing.assert_allclose(host['value'][5], 7.0)

  def test_capacity_exceeded_raises(self):
    cache, _ = make_cache(capacity=4)
    with pytest.raises(ValueError, match='capacity'):
      cache.prepare(np.arange(5))

  def test_aux_table_same_slots(self):
    cache, host = make_cache(capacity=8, with_acc=True)
    slots = cache.prepare(np.asarray([2]))
    cache.device['acc'] = cache.device['acc'].at[slots[0]].set(1.5)
    cache.flush()
    np.testing.assert_allclose(host['acc'][2], 1.5)

  def test_training_through_cache(self):
    """End-to-end: SGD on cached rows, flush, verify host table learned."""
    cache, host = make_cache(vocab=50, capacity=16)
    before = host['value'].copy()
    ids = np.asarray([1, 2, 3, 4] * 8)

    @jax.jit
    def step(table, slots):
      def loss(t):
        return jnp.sum(jnp.take(t, slots, axis=0) ** 2)
      g = jax.grad(loss)(table)
      return table - 0.1 * g

    for _ in range(3):
      slots = jnp.asarray(cache.prepare(ids))
      cache.device['value'] = step(cache.device['value'], slots)
    cache.flush()
    touched = np.unique(ids)
    assert (np.abs(host['value'][touched] - before[touched]) > 1e-6).any()
    untouched = np.setdiff1d(np.arange(50), touched)
    np.testing.assert_allclose(host['value'][untouched],
                               before[untouched])


class TestIdMapper:

  def test_assignment_and_stability(self):
    m = IdMapper(capacity=10)
    rows = m.map_ids(np.asarray([1000, 42, 1000, 7]))
    assert rows[0] == rows[2]
    assert m.size == 3
    rows2 = m.map_ids(np.asarray([42]))
    assert rows2[0] == rows[1]

  def test_eval_does_not_grow(self):
    m = IdMapper(capacity=10)
    rows = m.map_ids(np.asarray([5, 6]), train=False)
    np.testing.assert_array_equal(rows, [-1, -1])
    assert m.size == 0

  def test_min_count_admission(self):
    m = IdMapper(capacity=10, min_count=3)
    assert m.map_ids(np.asarray([9]))[0] == -1
    assert m.map_ids(np.asarray([9]))[0] == -1
    assert m.map_ids(np.asarray([9]))[0] == 0  # third sighting admits

  def test_capacity_full_maps_cold(self):
    m = IdMapper(capacity=2)
    m.map_ids(np.asarray([1, 2]))
    assert m.map_ids(np.asarray([3]))[0] == -1

  def test_state_roundtrip(self):
    m = IdMapper(capacity=10)
    m.map_ids(np.asarray([100, 200]))
    m2 = IdMapper.from_state_dict(10, m.state_dict())
    assert m2.map_ids(np.asarray([200]))[0] == 1
    assert m2.size == 2


class TestDynamicEmbedding:

  def test_lookup_with_cold_ids(self):
    dyn = DynamicEmbedding('uid', capacity=64, dim=DIM)
    table = create_table(dyn.config, jax.random.PRNGKey(0))
    raw = np.asarray([10**12, 5, 10**12, 99999999] * 2)
    rows = dyn.mapper.map_ids(raw)
    emb = lookup(table, jnp.asarray(rows), dyn.config)
    ht = np.asarray(table)
    np.testing.assert_allclose(np.asarray(emb)[0], ht[rows[0]])
    # Same raw id → same embedding.
    np.testing.assert_allclose(np.asarray(emb)[0], np.asarray(emb)[2])

  def test_transform_for_iterator(self):
    dyn = DynamicEmbedding('uid', capacity=8, dim=DIM)
    t = dyn.transform('uid')
    out = t({'uid': np.asarray([123456789, 42]), 'x': np.ones(2)})
    assert out['uid'].max() < 8
    np.testing.assert_array_equal(out['x'], np.ones(2))


def test_embedding_cache_custom_storage():
  """Reference pull/push abstract I/O (service.py:143-149): the cache
  works against any Storage implementation, not just host arrays."""
  from hybridbackend_tpu.embedding.service import EmbeddingCache, Storage
  from hybridbackend_tpu.embedding import TableConfig

  class CountingStorage(Storage):
    def __init__(self, vocab, dim):
      self.backing = {'value': np.arange(vocab * dim, dtype=np.float32)
                      .reshape(vocab, dim)}
      self.pulls = 0
      self.pushes = 0

    def pull(self, name, keys):
      self.pulls += 1
      return self.backing[name][keys]

    def push(self, name, keys, values):
      self.pushes += 1
      self.backing[name][keys] = values

  store = CountingStorage(100, 4)
  cache = EmbeddingCache(TableConfig('s', 100, 4), capacity=8,
                         storage=store, table_shapes={'value': (4,)})
  slots = cache.prepare(np.asarray([1, 2, 3]))
  emb = np.asarray(cache.lookup_embeddings(slots))
  np.testing.assert_allclose(emb, store.backing['value'][[1, 2, 3]])
  assert store.pulls == 1
  # force evictions to trigger pushes
  for base in range(0, 96, 8):
    cache.prepare(np.arange(base, base + 8))
  cache.flush()
  assert store.pushes > 0
