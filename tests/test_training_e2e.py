"""End-to-end training tests: the SURVEY §7 minimum slice — DCNv2/DLRM
with sharded embedding tables + data-parallel dense, hybrid-parallel
train step, metrics, checkpoint save/restore (parity with the
reference's training/tests/optimizer_test.py cross-rank equality)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import hybridbackend_tpu as hb
import hybridbackend_tpu.metrics as hbm
from hybridbackend_tpu.embedding import TableConfig
from hybridbackend_tpu.models import (
    EmbeddingSpec, dlrm_apply, dlrm_init, extract_features, init_tables,
    stacked_dcn_v2_apply, stacked_dcn_v2_init)
from hybridbackend_tpu.training import (
    TrainState, make_train_step, multi_optimizer)
from hybridbackend_tpu.training.checkpoint import CheckpointManager

BATCH, DIM = 64, 8

SPECS = [
    EmbeddingSpec(TableConfig('cat0', 1000, DIM)),
    EmbeddingSpec(TableConfig('cat1', 200, DIM)),
    EmbeddingSpec(TableConfig('small', 4, DIM)),  # stays replicated
]


def synth_batch(rng, batch=BATCH):
  return {
      'cat0': jnp.asarray(rng.randint(0, 1000, batch), jnp.int32),
      'cat1': jnp.asarray(rng.randint(0, 200, batch), jnp.int32),
      'small': jnp.asarray(rng.randint(0, 4, batch), jnp.int32),
      'dense0': jnp.asarray(rng.rand(batch), jnp.float32),
      'label': jnp.asarray(rng.randint(0, 2, batch), jnp.float32),
  }


def make_dcn_params(rng_key=0):
  key = jax.random.PRNGKey(rng_key)
  k_tab, k_net = jax.random.split(key)
  tables = init_tables(SPECS, k_tab)
  net = stacked_dcn_v2_init(k_net, [DIM, DIM, DIM, 1], [32, 16, 1])
  return {'tables': tables, 'net': net}


def dcn_loss(params, batch):
  emb, dense = extract_features(params['tables'], batch, SPECS, ['dense0'])
  preds = stacked_dcn_v2_apply(params['net'], emb + dense)
  preds = jnp.clip(preds, 1e-6, 1 - 1e-6)
  labels = batch['label']
  loss = -jnp.mean(labels * jnp.log(preds)
                   + (1 - labels) * jnp.log(1 - preds))
  return loss, {'preds': preds}


class TestTrainStepDCN:

  def test_loss_decreases(self):
    params = make_dcn_params()
    opt = optax.adagrad(0.1)
    state = TrainState.create(params, opt)
    step = make_train_step(dcn_loss, opt)
    rng = np.random.RandomState(0)
    fixed = synth_batch(rng)
    losses = []
    for _ in range(30):
      state, m = step(state, fixed)
      losses.append(float(m['loss']))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]

  def test_table_sharding_preserved(self):
    params = make_dcn_params()
    opt = optax.adagrad(0.1)
    state = TrainState.create(params, opt)
    step = make_train_step(dcn_loss, opt)
    state, _ = step(state, synth_batch(np.random.RandomState(1)))
    big = state.params['tables']['cat0']
    assert len(big.sharding.device_set) == 8
    # Adagrad accumulator of the sharded table must be sharded too.
    def find_acc(tree):
      found = []
      def visit(x):
        if isinstance(x, jax.Array) and x.shape == big.shape:
          found.append(x)
      jax.tree_util.tree_map(visit, tree)
      return found
    accs = find_acc(state.opt_state)
    assert accs, 'no accumulator matching table shape'
    for a in accs:
      assert len(a.sharding.device_set) == 8
      # Not fully replicated: addressable shard is 1/8 of rows.
      shard_rows = a.addressable_shards[0].data.shape[0]
      assert shard_rows == big.shape[0] // 8

  def test_multi_optimizer(self):
    params = make_dcn_params()
    build = multi_optimizer(optax.adagrad(0.1), optax.adam(1e-3))
    opt = build(params)
    state = TrainState.create(params, opt)
    step = make_train_step(dcn_loss, opt)
    rng = np.random.RandomState(2)
    fixed = synth_batch(rng)
    state, m = step(state, fixed)  # state is donated: must rebind
    l0 = float(m['loss'])
    for _ in range(20):
      state, m = step(state, fixed)
    assert float(m['loss']) < l0

  def test_training_with_auc(self):
    params = make_dcn_params()
    opt = optax.adagrad(0.2)
    state = TrainState.create(params, opt)
    step = make_train_step(dcn_loss, opt)
    rng = np.random.RandomState(3)
    batch = synth_batch(rng)
    for _ in range(60):
      state, m = step(state, batch)
    auc_state = hbm.auc_update(hbm.auc_init(), batch['label'], m['preds'])
    # Memorizing a fixed batch must give near-perfect AUC.
    assert float(hbm.auc_result(auc_state)) > 0.95


class TestTrainStepDLRM:

  def test_loss_decreases(self):
    key = jax.random.PRNGKey(1)
    k_tab, k_net = jax.random.split(key)
    specs = SPECS[:2]
    tables = init_tables(specs, k_tab)
    net = dlrm_init(k_net, num_wide=1, num_deep=2,
                    bottom_mlp_dims=[16, 8], dot_interact_dim=DIM,
                    top_mlp_dims=[16, 1])
    params = {'tables': tables, 'net': net}

    def loss_fn(params, batch):
      emb, dense = extract_features(params['tables'], batch, specs,
                                    ['dense0'])
      preds = dlrm_apply(params['net'], dense, emb)
      preds = jnp.clip(preds, 1e-6, 1 - 1e-6)
      labels = batch['label']
      loss = -jnp.mean(labels * jnp.log(preds)
                       + (1 - labels) * jnp.log(1 - preds))
      return loss, {}

    opt = optax.adagrad(0.1)
    state = TrainState.create(params, opt)
    step = make_train_step(loss_fn, opt)
    batch = synth_batch(np.random.RandomState(4))
    losses = []
    for _ in range(30):
      state, m = step(state, batch)
      losses.append(float(m['loss']))
    assert losses[-1] < losses[0] * 0.8


class TestCheckpoint:

  def test_save_restore_roundtrip(self):
    params = make_dcn_params()
    opt = optax.adagrad(0.1)
    state = TrainState.create(params, opt)
    step = make_train_step(dcn_loss, opt)
    state, _ = step(state, synth_batch(np.random.RandomState(5)))
    with tempfile.TemporaryDirectory() as d:
      mgr = CheckpointManager(d, max_to_keep=2)
      mgr.save(1, state)
      assert mgr.latest_step() == 1
      template = TrainState.create(make_dcn_params(rng_key=9), opt)
      restored = mgr.restore(template)
      np.testing.assert_allclose(
          np.asarray(restored.params['tables']['cat0']),
          np.asarray(state.params['tables']['cat0']))
      # Restored table keeps its sharding.
      assert len(restored.params['tables']['cat0'].sharding.device_set) == 8
      mgr.close()

  def test_restore_across_lane_pack_layouts(self):
    # A lane-packed table saved as [V/p, 128] restores into an
    # unpacked [V, d] template (and vice versa): the auto pack policy
    # depends on world size, but the row-major bytes are identical.
    rng = np.random.RandomState(7)
    packed = jnp.asarray(rng.randn(32, 128).astype(np.float32))
    with tempfile.TemporaryDirectory() as d:
      mgr = CheckpointManager(d)
      mgr.save(1, {'t': packed, 'x': jnp.ones((4,))})
      template = {'t': jnp.zeros((256, 16)), 'x': jnp.zeros((4,))}
      out = mgr.restore(template)
      assert out['t'].shape == (256, 16)
      np.testing.assert_array_equal(
          np.asarray(out['t']), np.asarray(packed).reshape(256, 16))
      mgr.close()
    # Reverse direction: unpacked save, packed template.
    with tempfile.TemporaryDirectory() as d:
      mgr = CheckpointManager(d)
      mgr.save(1, {'t': packed.reshape(256, 16)})
      out = mgr.restore({'t': jnp.zeros((32, 128))})
      np.testing.assert_array_equal(np.asarray(out['t']),
                                    np.asarray(packed))
      mgr.close()

  def test_grow_vocab_warm_start(self):
    # Vocabulary expansion between runs (HB_CKPT_GROW_VOCAB): a stored
    # [V1, d] table fills the row prefix of a grown [V2, d] template;
    # the template's freshly-initialized tail provides the new rows.
    from hybridbackend_tpu.framework.options import OPTIONS
    rng = np.random.RandomState(8)
    old = jnp.asarray(rng.randn(100, 8).astype(np.float32))
    old_acc = jnp.full((100, 8), 0.7, jnp.float32)
    with tempfile.TemporaryDirectory() as d:
      mgr = CheckpointManager(d)
      mgr.save(1, {'t': old, 'acc': old_acc, 'x': jnp.ones((4,))})
      fresh = jnp.asarray(rng.randn(150, 8).astype(np.float32))
      template = {'t': fresh, 'acc': jnp.full((150, 8), 0.1),
                  'x': jnp.zeros((4,))}
      # Default off: a smaller stored leaf is a hard error.
      with pytest.raises(Exception):
        mgr.restore(template)
      with OPTIONS.override(ckpt_grow_vocab=True):
        out = mgr.restore(template)
      np.testing.assert_array_equal(np.asarray(out['t'][:100]),
                                    np.asarray(old))
      np.testing.assert_array_equal(np.asarray(out['t'][100:]),
                                    np.asarray(fresh[100:]))
      np.testing.assert_array_equal(np.asarray(out['acc'][:100]),
                                    np.float32(0.7))
      np.testing.assert_array_equal(np.asarray(out['acc'][100:]),
                                    np.float32(0.1))
      np.testing.assert_array_equal(np.asarray(out['x']), 1.0)
      mgr.close()
    # Lane-packed grown template: [V1, d] stored rows fill
    # V1*d // 128 packed rows of a [V2/p, 128] template.
    with tempfile.TemporaryDirectory() as d:
      mgr = CheckpointManager(d)
      old2 = jnp.asarray(rng.randn(128, 16).astype(np.float32))
      mgr.save(1, {'t': old2})
      tmpl = jnp.zeros((32, 128), jnp.float32)     # 256 logical rows
      with OPTIONS.override(ckpt_grow_vocab=True):
        out = mgr.restore({'t': tmpl})
      np.testing.assert_array_equal(np.asarray(out['t'][:16]),
                                    np.asarray(old2).reshape(16, 128))
      np.testing.assert_array_equal(np.asarray(out['t'][16:]), 0)
      mgr.close()

  def test_restore_without_checkpoint_returns_template(self):
    with tempfile.TemporaryDirectory() as d:
      mgr = CheckpointManager(d)
      t = {'x': jnp.ones((3,))}
      out = mgr.restore(t)
      assert out is t
      mgr.close()

  def test_max_to_keep(self):
    params = make_dcn_params()
    opt = optax.sgd(0.1)
    state = TrainState.create(params, opt)
    with tempfile.TemporaryDirectory() as d:
      mgr = CheckpointManager(d, max_to_keep=2)
      for s in (1, 2, 3):
        mgr.save(s, state)
      assert set(mgr.all_steps()) == {2, 3}
      mgr.close()


class TestCrossReplicaParity:

  def test_replicated_params_stay_identical(self):
    """Reference optimizer_test.py asserts identical vars across ranks;
    here: dense params must remain fully replicated after updates."""
    params = make_dcn_params()
    opt = optax.adagrad(0.1)
    state = TrainState.create(params, opt)
    step = make_train_step(dcn_loss, opt)
    for i in range(3):
      state, _ = step(state, synth_batch(np.random.RandomState(i)))
    w = state.params['net']['mlp'][0]['w']
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
      np.testing.assert_allclose(s, shards[0])
