"""Tests for table stacking (PICASSO packing parity): fused lookups must
equal per-table lookups exactly, including gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hybridbackend_tpu.embedding import TableConfig, create_table, lookup
from hybridbackend_tpu.embedding.stack import (
    build_stacks, create_stacked_tables, stacked_lookup)
from hybridbackend_tpu.models import EmbeddingSpec, StackedFeatureExtractor
from hybridbackend_tpu.training import TrainState, make_train_step

DIM = 8

CONFIGS = [
    TableConfig('a', 100, DIM),
    TableConfig('b', 77, DIM),      # not divisible by 8 → aligned rows
    TableConfig('c', 300, DIM),
    TableConfig('d', 50, 4),        # different dim → separate stack
    TableConfig('e', 6, DIM),       # small → replicated stack
]


class TestBuildStacks:

  def test_grouping(self):
    stacks = build_stacks(CONFIGS)
    by_members = {tuple(c.name for c in s.configs): s for s in stacks}
    assert ('a', 'b', 'c') in by_members       # same dim, sharded
    assert ('d',) in by_members                # dim 4
    assert ('e',) in by_members                # replicated
    abc = by_members[('a', 'b', 'c')]
    assert abc.offsets == (0, 104, 184)        # 100→104, 77→80 aligned
    assert abc.stacked.vocab_size == 104 + 80 + 304

  def test_shuffled_tables_not_stacked(self):
    stacks = build_stacks([TableConfig('x', 100, DIM, shuffle_ids=True),
                           TableConfig('y', 100, DIM)])
    assert len(stacks) == 2


class TestStackedLookup:

  def _setup(self):
    stacks = build_stacks(CONFIGS[:3])
    (stack,) = stacks
    tables = create_stacked_tables(stacks, jax.random.PRNGKey(0))
    table = tables[stack.stacked.name]
    return stack, table

  def test_matches_manual_gather(self):
    stack, table = self._setup()
    rng = np.random.RandomState(0)
    ids = {
        'a': jnp.asarray(rng.randint(0, 100, 32), jnp.int32),
        'b': jnp.asarray(rng.randint(0, 77, 32), jnp.int32),
        'c': jnp.asarray(rng.randint(0, 300, (32, 2)), jnp.int32),
    }
    out = stacked_lookup(stack, table, ids)
    ht = np.asarray(table)
    for name, off in zip(('a', 'b', 'c'), stack.offsets):
      want = ht[np.asarray(ids[name]) + off]
      np.testing.assert_allclose(np.asarray(out[name]), want, rtol=1e-6)
    assert out['c'].shape == (32, 2, DIM)

  def test_out_of_range_zeroed_per_member(self):
    stack, table = self._setup()
    # id 100 is out of range for table 'a' (vocab 100) even though row
    # 100+0 physically exists (it's table a's alignment padding).
    ids = {'a': jnp.asarray([100] * 8, jnp.int32)}
    out = stacked_lookup(stack, table, ids)
    np.testing.assert_allclose(np.asarray(out['a']), 0.0)

  def test_gradients_flow_per_member(self):
    stack, table = self._setup()
    ids = {'a': jnp.asarray([3] * 8, jnp.int32),
           'b': jnp.asarray([5] * 8, jnp.int32)}

    def loss(t):
      out = stacked_lookup(stack, t, ids)
      return jnp.sum(out['a'] ** 2) + jnp.sum(out['b'])

    g = np.asarray(jax.grad(loss)(table))
    nz = set(np.where(np.abs(g).sum(1) > 0)[0].tolist())
    assert nz == {3, stack.offsets[1] + 5}

  def test_single_exchange(self):
    """The whole point: one collective for N tables. Count all-gathers
    in the compiled HLO."""
    stack, table = self._setup()
    ids = {'a': jnp.zeros(8, jnp.int32), 'b': jnp.zeros(8, jnp.int32),
           'c': jnp.zeros(8, jnp.int32)}
    fn = jax.jit(lambda t: stacked_lookup(stack, t, ids))
    hlo = fn.lower(table).compile().as_text()
    n_ag = hlo.count('all-gather(')
    n_rs = hlo.count('reduce-scatter(')
    assert n_ag <= 1 and n_rs <= 1, (n_ag, n_rs)


class TestStackedFeatureExtractor:

  def test_end_to_end_training(self):
    specs = [EmbeddingSpec(TableConfig('cat0', 100, DIM)),
             EmbeddingSpec(TableConfig('cat1', 200, DIM, combiner='mean'))]
    fx = StackedFeatureExtractor(specs, dense_columns=['dense0'])
    params = {'tables': fx.init(jax.random.PRNGKey(0))}
    assert len(params['tables']) == 1  # one stacked physical table

    import hybridbackend_tpu.models as m
    params['net'] = m.stacked_dcn_v2_init(
        jax.random.PRNGKey(1), [DIM, DIM, 1], [16, 1])

    def loss_fn(params, batch):
      emb, dense = fx(params['tables'], batch)
      preds = jnp.clip(m.stacked_dcn_v2_apply(params['net'], emb + dense),
                       1e-6, 1 - 1e-6)
      y = batch['label']
      return -jnp.mean(y * jnp.log(preds)
                       + (1 - y) * jnp.log(1 - preds)), {}

    rng = np.random.RandomState(0)
    batch = {
        'cat0': jnp.asarray(rng.randint(0, 100, 64), jnp.int32),
        'cat1': jnp.asarray(rng.randint(0, 200, (64, 3)), jnp.int32),
        'cat1_mask': jnp.asarray(rng.rand(64, 3) > 0.3),
        'dense0': jnp.asarray(rng.rand(64), jnp.float32),
        'label': jnp.asarray(rng.randint(0, 2, 64), jnp.float32),
    }
    opt = optax.adagrad(0.1)
    state = TrainState.create(params, opt)
    step = make_train_step(loss_fn, opt)
    state, m0 = step(state, batch)
    l0 = float(m0['loss'])
    for _ in range(20):
      state, mm = step(state, batch)
    assert float(mm['loss']) < l0

  def test_matches_unstacked_extract(self):
    from hybridbackend_tpu.models import extract_features, init_tables
    specs = [EmbeddingSpec(TableConfig('u', 64, DIM)),
             EmbeddingSpec(TableConfig('v', 48, DIM))]
    fx = StackedFeatureExtractor(specs)
    stacked_tables = fx.init(jax.random.PRNGKey(3))
    rng = np.random.RandomState(1)
    batch = {'u': jnp.asarray(rng.randint(0, 64, 32), jnp.int32),
             'v': jnp.asarray(rng.randint(0, 48, 32), jnp.int32)}
    emb_s, _ = fx(stacked_tables, batch)
    # Build equivalent unstacked tables from the stacked rows.
    (stack,) = fx.stacks
    ht = np.asarray(stacked_tables[stack.stacked.name])
    for spec, emb, off in zip(specs, emb_s, stack.offsets):
      want = ht[np.asarray(batch[spec.key]) + off]
      np.testing.assert_allclose(np.asarray(emb), want, rtol=1e-6)


def test_solo_stack_inherits_shuffle_and_member_extraction():
  """Solo stacks keep the member's shuffle_ids hot-id spreading (lost
  before round 3), and member_tables inverts the mix so serving export
  reconstructs the logical table."""
  import jax.numpy as jnp
  from hybridbackend_tpu.embedding.stack import (
      build_stacks, create_stacked_tables, member_tables, stacked_lookup)
  cfg = TableConfig('hot', 300, 8, shuffle_ids=True)
  stacks = build_stacks([cfg])
  assert len(stacks) == 1 and len(stacks[0].configs) == 1
  st = stacks[0]
  assert st.stacked.shuffle_ids
  tables = create_stacked_tables(stacks, jax.random.PRNGKey(0))
  name = st.stacked.name
  host = np.asarray(tables[name])
  ids_np = np.random.RandomState(0).randint(0, 300, 64).astype(np.int32)
  out = stacked_lookup(st, tables[name], {'hot': jnp.asarray(ids_np)})
  rows = np.asarray(st.stacked.row_index(jnp.asarray(ids_np)))
  assert not np.array_equal(rows, ids_np)  # the mix actually engaged
  np.testing.assert_allclose(np.asarray(out['hot']), host[rows],
                             atol=1e-6)
  member = member_tables(st, tables[name])['hot']
  assert member.shape[0] == 300
  # member[id] == the stacked lookup of id (mix inverted).
  np.testing.assert_allclose(np.asarray(out['hot']), member[ids_np],
                             atol=1e-6)


def test_lane_pack_survives_stacking():
  """An explicit lane_pack on member configs must group stacks by it
  and survive into the stacked config — otherwise the planner's
  forced-pack HBM accounting and the physical layout disagree (r3
  review round 2)."""
  from hybridbackend_tpu.embedding.stack import build_stacks
  cfgs = [TableConfig('fp', 128, 16, lane_pack=True),
          TableConfig('fp2', 64, 16, lane_pack=True),
          TableConfig('np', 64, 16)]
  stacks = build_stacks(cfgs)
  by_members = {tuple(c.name for c in s.configs): s for s in stacks}
  assert ('fp', 'fp2') in by_members and ('np',) in by_members
  assert by_members[('fp', 'fp2')].stacked.lane_pack is True
  assert by_members[('np',)].stacked.lane_pack is None
  # The stacked array is physically packed on any world size.
  import jax
  from hybridbackend_tpu.embedding.stack import create_stacked_tables
  tables = create_stacked_tables([by_members[('fp', 'fp2')]],
                                 jax.random.PRNGKey(0))
  (tbl,) = tables.values()
  assert tbl.shape[1] == 128, tbl.shape
