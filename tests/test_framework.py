"""Tests for Options and Context (framework core)."""

import os

import jax
import pytest

from hybridbackend_tpu.framework.context import (
    Context, build_mesh, context_scope, scope)
from hybridbackend_tpu.framework.options import Options


class TestOptions:

  def test_register_get_set(self):
    opts = Options()
    opts.register('alpha', 3)
    assert opts['alpha'] == 3
    opts['alpha'] = 7
    assert opts['alpha'] == 7

  def test_duplicate_register_keeps_first(self):
    opts = Options()
    opts.register('k', 1)
    opts.register('k', 2)
    assert opts['k'] == 1

  def test_unknown_raises(self):
    opts = Options()
    with pytest.raises(KeyError):
      opts.get('missing')
    with pytest.raises(KeyError):
      opts.set('missing', 1)

  def test_env_override(self):
    opts = Options()
    os.environ['HB_TEST_OPT_X'] = '42'
    try:
      opts.register('x', 7, env='HB_TEST_OPT_X')
      assert opts['x'] == 42
    finally:
      del os.environ['HB_TEST_OPT_X']

  def test_env_bool_parsing(self):
    opts = Options()
    os.environ['HB_TEST_OPT_B'] = 'true'
    try:
      opts.register('b', False, env='HB_TEST_OPT_B')
      assert opts['b'] is True
    finally:
      del os.environ['HB_TEST_OPT_B']

  def test_scoped_override(self):
    opts = Options()
    opts.register('y', 1)
    with opts.override(y=5):
      assert opts['y'] == 5
      with opts.override(y=9):
        assert opts['y'] == 9
      assert opts['y'] == 5
    assert opts['y'] == 1

  def test_override_unknown_raises(self):
    opts = Options()
    with pytest.raises(KeyError):
      with opts.override(nope=1):
        pass


class TestContext:

  def test_world_size_is_device_count(self):
    ctx = Context.get()
    assert ctx.world_size == jax.device_count() == 8

  def test_mesh_axes(self):
    ctx = Context.get()
    assert set(ctx.mesh.axis_names) == {'dcn', 'ici'}
    assert ctx.num_hosts == 1
    assert ctx.local_world_size == 8

  def test_rank_and_chief(self):
    ctx = Context.get()
    assert ctx.rank == 0
    assert ctx.is_chief

  def test_build_mesh_hierarchical_flag(self):
    mesh = build_mesh(hierarchical=False)
    assert mesh.shape['dcn'] == 1
    assert mesh.shape['ici'] == 8

  def test_context_scope(self):
    outer = Context.get()
    inner = Context(build_mesh(devices=jax.devices()[:4]))
    with context_scope(inner):
      assert Context.get() is inner
      assert Context.get().world_size == 4
    assert Context.get() is outer

  def test_scope_sets_options(self):
    from hybridbackend_tpu.framework.options import OPTIONS
    with scope(batch_size=128) as ctx:
      assert OPTIONS['batch_size'] == 128
      assert ctx.world_size == 8
    assert OPTIONS['batch_size'] == -1

  def test_shardings(self):
    ctx = Context.get()
    s = ctx.batch_sharding
    assert s.mesh.shape == ctx.mesh.shape


def test_embedding_scope_controls_sharding():
  """hb.embedding_scope parity (reference tensorflow/__init__.py:58-64):
  tables built in the scope follow its shard policy."""
  import hybridbackend_tpu as hb
  from hybridbackend_tpu.embedding import TableConfig
  cfg = TableConfig('scoped', 4096, 8)
  with hb.embedding_scope(sharded=False):
    assert not cfg.should_shard()
  with hb.embedding_scope():
    assert cfg.should_shard()
    assert hb.OPTIONS['emb_sharded'] is True
  with hb.embedding_scope(emb_lookup_strategy='alltoall'):
    assert hb.OPTIONS['emb_lookup_strategy'] == 'alltoall'


def test_wraps_dispatch():
  """hb.wraps parity (reference tensorflow/wraps.py:30-37)."""
  import optax
  import hybridbackend_tpu as hb
  import jax.numpy as jnp
  opt_factory = hb.wraps(optax.adagrad(0.1))
  opt = opt_factory({'tables': {}, 'net': {'w': jnp.ones(2)}})
  assert hasattr(opt, 'init') and hasattr(opt, 'update')
  assert hb.wraps(42) == 42  # pass-through
  import flax.linen as nn

  class M(nn.Module):
    @nn.compact
    def __call__(self, x):
      return nn.Dense(1)(x)

  wrapped = hb.wraps(M())
  assert callable(wrapped)


def test_lr_schedule():
  from hybridbackend_tpu.training import (
      lr_with_linear_warmup_and_polynomial_decay as lr)
  s = lr(initial_value=24.0, warmup_steps=100, decay_steps=1000,
         decay_start_step=200)
  assert float(s(0)) < 1e-3
  assert abs(float(s(100)) - 24.0) < 1e-5
  assert abs(float(s(150)) - 24.0) < 1e-5   # plateau between phases
  assert 0 < float(s(700)) < 24.0
  assert float(s(10_000)) <= float(s(700))  # monotone decay


def test_table_config_resolve_captures_scope_policy():
  import hybridbackend_tpu as hb
  from hybridbackend_tpu.embedding import TableConfig
  cfg = TableConfig('r', 4096, 8)
  with hb.embedding_scope(sharded=False):
    baked = cfg.resolve()
  assert baked.sharded is False
  assert not baked.should_shard()  # holds outside the scope too
  with hb.embedding_scope():
    assert cfg.resolve().sharded is True


class TestDictOptions:
  """Per-key scoped option values (reference DictOption with '*'
  wildcard, options.py:183-225)."""

  def test_get_for_wildcard(self):
    from hybridbackend_tpu.framework.options import OPTIONS
    with OPTIONS.override(
        emb_lookup_strategy={'user_id': 'alltoall', '*': 'gspmd'}):
      assert OPTIONS.get_for('emb_lookup_strategy', 'user_id') == 'alltoall'
      assert OPTIONS.get_for('emb_lookup_strategy', 'item_id') == 'gspmd'

  def test_get_for_no_wildcard_falls_to_default(self):
    from hybridbackend_tpu.framework.options import OPTIONS
    default = OPTIONS.get_for('emb_lookup_strategy', 'zzz')
    with OPTIONS.override(emb_lookup_strategy={'user_id': 'alltoall'}):
      assert OPTIONS.get_for('emb_lookup_strategy', 'zzz') == default

  def test_scalar_value_unchanged(self):
    from hybridbackend_tpu.framework.options import OPTIONS
    with OPTIONS.override(emb_lookup_strategy='alltoall'):
      assert OPTIONS.get_for('emb_lookup_strategy', 'any') == 'alltoall'

  def test_per_table_strategy_in_lookup_hlo(self):
    """Two tables under one dict scope take different exchange paths:
    the alltoall table's HLO has an all-to-all, the gspmd one's none."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    import hybridbackend_tpu as hb
    from hybridbackend_tpu.embedding import TableConfig, create_table, lookup
    ctx = hb.Context.get()
    cfg_a = TableConfig('ta', 512, 8)
    cfg_b = TableConfig('tb', 512, 8)
    ta = create_table(cfg_a, jax.random.PRNGKey(0), ctx)
    tb = create_table(cfg_b, jax.random.PRNGKey(1), ctx)
    ids = jnp.asarray(np.arange(64), jnp.int32)
    with hb.scope(emb_lookup_strategy={'ta': 'alltoall', '*': 'gspmd'}):
      hlo_a = jax.jit(lambda t, i: lookup(t, i, cfg_a, ctx=ctx)
                      ).lower(ta, ids).compile().as_text()
      hlo_b = jax.jit(lambda t, i: lookup(t, i, cfg_b, ctx=ctx)
                      ).lower(tb, ids).compile().as_text()
      out_a = np.asarray(lookup(ta, ids, cfg_a, ctx=ctx))
      out_b = np.asarray(lookup(tb, ids, cfg_b, ctx=ctx))
    assert 'all-to-all' in hlo_a
    assert 'all-to-all' not in hlo_b
    np.testing.assert_allclose(out_a, np.asarray(ta)[np.arange(64)],
                               atol=1e-5)
    np.testing.assert_allclose(out_b, np.asarray(tb)[np.arange(64)],
                               atol=1e-5)

  def test_per_table_sharding_policy(self):
    from hybridbackend_tpu.embedding import TableConfig
    import hybridbackend_tpu as hb
    cfg = TableConfig('solo_small', 512, 8)
    assert cfg.should_shard()
    with hb.scope(emb_sharded={'solo_small': False, '*': True}):
      assert not cfg.should_shard()
      assert TableConfig('other', 512, 8).should_shard()
