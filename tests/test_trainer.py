"""Tests for the high-level Trainer, hooks, pipeline, and export."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import hybridbackend_tpu as hb
from hybridbackend_tpu.embedding import TableConfig
from hybridbackend_tpu.models import (
    EmbeddingSpec, extract_features, init_tables,
    stacked_dcn_v2_apply, stacked_dcn_v2_init)
from hybridbackend_tpu.pipeline import (
    accumulate_gradients, make_pipelined_train_step)
from hybridbackend_tpu.training import (
    LoggingHook, Policy, StepStatHook, TrainState, make_train_step)

DIM, BATCH = 8, 64
SPECS = [EmbeddingSpec(TableConfig('cat0', 300, DIM))]


def make_params(seed=0):
  key = jax.random.PRNGKey(seed)
  kt, kn = jax.random.split(key)
  return {'tables': init_tables(SPECS, kt),
          'net': stacked_dcn_v2_init(kn, [DIM, 1], [16, 1])}


def loss_fn(params, batch):
  emb, dense = extract_features(params['tables'], batch, SPECS, ['dense0'])
  preds = jnp.clip(stacked_dcn_v2_apply(params['net'], emb + dense),
                   1e-6, 1 - 1e-6)
  y = batch['label']
  loss = -jnp.mean(y * jnp.log(preds) + (1 - y) * jnp.log(1 - preds))
  return loss, {'preds': preds}


def batches(n, seed=0, batch=BATCH):
  rng = np.random.RandomState(seed)
  for _ in range(n):
    cat0 = rng.randint(0, 300, batch)
    yield {
        'cat0': cat0.astype(np.int32),
        'dense0': rng.rand(batch).astype(np.float32),
        'label': (cat0 % 3 == 0).astype(np.float32),
    }


class TestTrainer:

  def test_train_reduces_loss(self):
    t = hb.Trainer(loss_fn, make_params())
    m0 = t.train(batches(1, seed=42), sync=False)
    m = t.train(batches(100, seed=1), sync=False)
    assert t.global_step == 101
    assert m['loss'] < m0['loss']

  def test_evaluate_metrics(self):
    t = hb.Trainer(loss_fn, make_params())
    t.train(batches(300, seed=2), sync=False)
    res = t.evaluate(batches(10, seed=3))
    assert set(res) >= {'auc', 'loss', 'batches'}
    assert res["auc"] > 0.9  # cat0 % 3 signal is learnable

  def test_evaluate_with_gauc(self):
    t = hb.Trainer(loss_fn, make_params(), group_key='cat0')
    res = t.evaluate(batches(4, seed=4))
    assert 'gauc' in res

  def test_checkpoint_roundtrip_via_model_dir(self):
    with tempfile.TemporaryDirectory() as d:
      t = hb.Trainer(loss_fn, make_params(), model_dir=d)
      t.train(batches(5, seed=5), sync=False)
      assert t.global_step == 5
      t2 = hb.Trainer(loss_fn, make_params(seed=9), model_dir=d)
      assert t2.global_step == 5
      b = next(batches(1, seed=6))
      l1 = float(loss_fn(t.params, b)[0])
      l2 = float(loss_fn(t2.params, b)[0])
      assert abs(l1 - l2) < 1e-6

  def test_train_and_evaluate(self):
    t = hb.Trainer(loss_fn, make_params())
    res = t.train_and_evaluate(lambda: batches(30, seed=7),
                               lambda: batches(5, seed=8), epochs=2)
    assert 'auc' in res
    assert t.global_step == 60

  def test_predict(self):
    t = hb.Trainer(loss_fn, make_params())
    preds = list(t.predict(batches(3, seed=9)))
    assert len(preds) == 3
    assert preds[0].shape == (BATCH,)
    assert ((preds[0] >= 0) & (preds[0] <= 1)).all()

  def test_max_steps(self):
    t = hb.Trainer(loss_fn, make_params())
    t.train(batches(100, seed=10), max_steps=7, sync=False)
    assert t.global_step == 7


class TestHooks:

  def test_step_stat_hook_percentiles(self):
    logs = []
    h = StepStatHook(batch_size=BATCH, every_n_steps=5, log=logs.append)
    t = hb.Trainer(loss_fn, make_params())
    t.train(batches(12, seed=11), hooks=[h], sync=False)
    assert logs and 'secs/step' in logs[0] and 'samples/sec' in logs[0]
    assert len(h.durations) == 11  # 12 steps - 1 warmup

  def test_policy_every_n_steps(self):
    fired = []
    p = Policy(lambda step, m: fired.append(step), every_n_steps=4)
    t = hb.Trainer(loss_fn, make_params())
    t.train(batches(10, seed=12), hooks=[p], sync=False)
    assert fired == [4, 8]

  def test_logging_hook(self):
    logs = []
    h = LoggingHook(every_n_steps=3, log=logs.append)
    t = hb.Trainer(loss_fn, make_params())
    t.train(batches(6, seed=13), hooks=[h], sync=False)
    assert logs and 'loss=' in logs[0]

  def test_policy_requires_trigger(self):
    with pytest.raises(ValueError):
      Policy(lambda s, m: None)


class TestPipeline:

  def test_accumulated_equals_fullbatch_grads(self):
    params = make_params()
    b = next(batches(1, seed=14))
    b = {k: jnp.asarray(v) for k, v in b.items()}
    (l_full, _), g_full = jax.value_and_grad(loss_fn, has_aux=True)(
        params, b)
    (l_acc, _), g_acc = accumulate_gradients(loss_fn, 4)(params, b)
    assert abs(float(l_full) - float(l_acc)) < 1e-5
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-6),
        g_full, g_acc)

  def test_pipelined_step_trains(self):
    params = make_params()
    opt = optax.adagrad(0.1)
    state = TrainState.create(params, opt)
    step = make_pipelined_train_step(loss_fn, opt, num_microbatches=4)
    b = {k: jnp.asarray(v) for k, v in next(batches(1, seed=15)).items()}
    state, m = step(state, b)
    l0 = float(m['loss'])
    for _ in range(20):
      state, m = step(state, b)
    assert float(m['loss']) < l0


class TestExport:

  def test_export_load_roundtrip(self):
    from hybridbackend_tpu.training.saved_model import export, load
    t = hb.Trainer(loss_fn, make_params())
    t.train(batches(5, seed=16), sync=False)
    b = next(batches(1, seed=17))
    with tempfile.TemporaryDirectory() as d:
      path = t.export_saved_model(os.path.join(d, 'sm'), b)
      assert os.path.exists(os.path.join(path, 'serving_fn.bin'))
      call, params = load(path)
      got = np.asarray(call(params, {k: np.asarray(v)
                                     for k, v in b.items()}))
      _, aux = loss_fn(t.params, b)
      np.testing.assert_allclose(got, np.asarray(aux['preds']), rtol=1e-5)


class TestSparseTrainer:

  def test_full_lifecycle(self):
    from hybridbackend_tpu.models import StackedFeatureExtractor
    fx = StackedFeatureExtractor(SPECS, dense_columns=['dense0'])

    def model_loss(dense_params, emb_f, dense_f, batch):
      preds = jnp.clip(
          stacked_dcn_v2_apply(dense_params, emb_f + dense_f),
          1e-6, 1 - 1e-6)
      y = batch['label']
      loss = -jnp.mean(y * jnp.log(preds) + (1 - y) * jnp.log(1 - preds))
      return loss, {'preds': preds}

    dense = stacked_dcn_v2_init(jax.random.PRNGKey(1), [DIM, 1], [16, 1])
    with tempfile.TemporaryDirectory() as d:
      t = hb.estimator.SparseTrainer(fx, model_loss, dense,
                                     table_lr=0.2, model_dir=d)
      m0 = t.train(batches(1, seed=20), sync=False)
      m = t.train(batches(150, seed=21), sync=False)
      assert m['loss'] < m0['loss']
      res = t.evaluate(batches(10, seed=22))
      assert res['auc'] > 0.85
      # restart from checkpoint
      t2 = hb.estimator.SparseTrainer(
          fx, model_loss,
          stacked_dcn_v2_init(jax.random.PRNGKey(5), [DIM, 1], [16, 1]),
          table_lr=0.2, model_dir=d)
      assert t2.global_step == t.global_step
      res2 = t2.evaluate(batches(10, seed=22))
      assert abs(res2['auc'] - res['auc']) < 1e-6


def test_interleaved_step_matches_sparse_step():
  """PICASSO interleaving must be numerically exact vs the plain sparse
  step (accumulate-then-apply over the same table version)."""
  from hybridbackend_tpu.models import StackedFeatureExtractor
  from hybridbackend_tpu.pipeline.interleave import (
      make_interleaved_train_step)
  from hybridbackend_tpu.training.sparse_step import (
      SparseTrainState, make_sparse_train_step)
  import optax

  fx = StackedFeatureExtractor(SPECS, dense_columns=['dense0'])

  def model_loss(dense_params, emb_f, dense_f, batch):
    preds = jnp.clip(stacked_dcn_v2_apply(dense_params, emb_f + dense_f),
                     1e-6, 1 - 1e-6)
    y = batch['label']
    return -jnp.mean(y * jnp.log(preds) + (1 - y) * jnp.log(1 - preds)), {}

  kt, kn = jax.random.split(jax.random.PRNGKey(0))
  opt = optax.sgd(1e-2)

  def fresh():
    return SparseTrainState.create(
        stacked_dcn_v2_init(kn, [DIM, 1], [16, 1]), fx.init(kt), opt)

  b = next(batches(1, seed=30))
  plain = make_sparse_train_step(fx, model_loss, opt, table_lr=0.1,
                                 donate_state=False)
  inter = make_interleaved_train_step(fx, model_loss, opt,
                                      num_microbatches=4, table_lr=0.1,
                                      donate_state=False)
  s1, m1 = plain(fresh(), b)
  s2, m2 = inter(fresh(), b)
  np.testing.assert_allclose(float(m1['loss']), float(m2['loss']),
                             rtol=1e-5)
  for name in s1.tables:
    np.testing.assert_allclose(np.asarray(s1.tables[name]),
                               np.asarray(s2.tables[name]),
                               rtol=1e-4, atol=1e-6)
  jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                              np.asarray(b),
                                              rtol=1e-4, atol=1e-6),
      s1.dense, s2.dense)


def test_sparse_trainer_export_load_roundtrip():
  from hybridbackend_tpu.models import StackedFeatureExtractor
  from hybridbackend_tpu.training.saved_model import load
  import tempfile, os

  fx = StackedFeatureExtractor(SPECS, dense_columns=['dense0'])

  def model_loss(dense_params, emb_f, dense_f, batch):
    preds = jnp.clip(stacked_dcn_v2_apply(dense_params, emb_f + dense_f),
                     1e-6, 1 - 1e-6)
    y = batch['label']
    return -jnp.mean(y * jnp.log(preds) + (1 - y) * jnp.log(1 - preds)), \
        {'preds': preds}

  dense = stacked_dcn_v2_init(jax.random.PRNGKey(1), [DIM, 1], [16, 1])
  t = hb.estimator.SparseTrainer(fx, model_loss, dense, table_lr=0.2)
  t.train(batches(5, seed=40), sync=False)
  b = next(batches(1, seed=41))
  b_host = {k: np.asarray(v) for k, v in b.items()}
  with tempfile.TemporaryDirectory() as d:
    path = t.export_saved_model(os.path.join(d, 'sm'), b_host)
    call, params = load(path)
    preds = np.asarray(call(params, b_host))
    # parity with in-process eval
    _, aux = t._eval_fn(t.params, b)
    np.testing.assert_allclose(preds, np.asarray(aux['preds']),
                               rtol=1e-4, atol=1e-5)


def test_checkpoint_world_size_independence(tmp_path):
  """The headline sharded-checkpoint claim (reference SaveSliceInfo
  parity): a table saved under an 8-device mesh restores bit-exactly
  under a 4-device mesh (different shard boundaries)."""
  from jax.sharding import Mesh
  from hybridbackend_tpu.framework.context import (
      Context, context_scope, DCN_AXIS, ICI_AXIS)
  from hybridbackend_tpu.embedding import TableConfig, create_table
  from hybridbackend_tpu.training.checkpoint import CheckpointManager

  cfg = TableConfig('w', 4096, 8, sharded=True)
  devices = jax.devices()

  ctx8 = Context(Mesh(np.array(devices).reshape(1, 8),
                      (DCN_AXIS, ICI_AXIS)))
  with context_scope(ctx8):
    t8 = create_table(cfg, jax.random.PRNGKey(0), ctx8)
    host8 = np.asarray(t8)
    assert len(t8.sharding.device_set) == 8
    mgr = CheckpointManager(str(tmp_path / 'ck'))
    mgr.save(1, {'w': t8})
    mgr.close()

  ctx4 = Context(Mesh(np.array(devices[:4]).reshape(1, 4),
                      (DCN_AXIS, ICI_AXIS)))
  with context_scope(ctx4):
    template = {'w': create_table(cfg, jax.random.PRNGKey(9), ctx4)}
    assert len(template['w'].sharding.device_set) == 4
    mgr = CheckpointManager(str(tmp_path / 'ck'))
    restored = mgr.restore(template)
    mgr.close()
    t4 = restored['w']
    assert len(t4.sharding.device_set) == 4  # re-sharded to new mesh
    np.testing.assert_array_equal(np.asarray(t4), host8)


def test_sparse_trainer_raw_mode_trains_and_evaluates():
  """SparseTrainer(raw_model_loss=): DIN-style attention over the raw
  [B, L, D] sequence through the full Trainer lifecycle (train +
  evaluate use the same raw hook)."""
  from hybridbackend_tpu.models import (
      StackedFeatureExtractor, din_apply, din_init)

  L = 4
  fx = StackedFeatureExtractor(
      [EmbeddingSpec(TableConfig('item', 300, DIM), column='cand_hist')])
  net = din_init(jax.random.PRNGKey(3), DIM, num_profile_features=0,
                 num_dense=0, dnn_hidden_units=(16, 8),
                 att_hidden_size=(8,))

  def raw_loss(net_params, members, batch):
    emb = members['item']                                 # [B, 1+L, D]
    preds = jnp.clip(
        din_apply(net_params, emb[:, 0], emb[:, 1:],
                  batch['hist_mask'], []),
        1e-6, 1 - 1e-6)
    y = batch['label']
    return -jnp.mean(y * jnp.log(preds)
                     + (1 - y) * jnp.log(1 - preds)), {'preds': preds}

  def seq_batches(n, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(n):
      cand = rng.randint(0, 300, BATCH)
      hist = rng.randint(0, 300, (BATCH, L))
      yield {
          'cand_hist': np.concatenate([cand[:, None], hist],
                                      axis=1).astype(np.int32),
          'hist_mask': np.ones((BATCH, L), np.float32),
          'label': (cand % 2 == 0).astype(np.float32),
      }

  t = hb.SparseTrainer(fx, None, net, raw_model_loss=raw_loss,
                       table_lr=0.2)
  m0 = t.evaluate(seq_batches(4, seed=8))
  t.train(seq_batches(300, seed=9), sync=False)
  m1 = t.evaluate(seq_batches(4, seed=8))
  assert m1['loss'] < m0['loss'] - 0.02, (m0, m1)
  assert m1['auc'] > 0.7, m1
