"""Tests for the flax-wrapping adapter (keras parity)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

import hybridbackend_tpu as hb
from hybridbackend_tpu.embedding import TableConfig
from hybridbackend_tpu.flax_support import wraps_flax_module
from hybridbackend_tpu.models import EmbeddingSpec


class Tower(nn.Module):

  @nn.compact
  def __call__(self, x):
    x = nn.relu(nn.Dense(32)(x))
    return nn.sigmoid(nn.Dense(1)(x))[..., 0]


def make_batch(rng, n=64):
  cat0 = rng.randint(0, 200, n)
  return {
      'cat0': jnp.asarray(cat0, jnp.int32),
      'dense0': jnp.asarray(rng.rand(n), jnp.float32),
      'label': jnp.asarray((cat0 % 4 == 0).astype(np.float32)),
  }


class TestFlaxWrapping:

  def test_trains_hybrid_parallel(self):
    specs = [EmbeddingSpec(TableConfig('cat0', 200, 8))]
    wrapped = wraps_flax_module(Tower(), specs, dense_columns=['dense0'])
    rng = np.random.RandomState(0)
    example = make_batch(rng)
    params = wrapped.init(jax.random.PRNGKey(0), example)
    # Table sharded over the mesh; flax net params present.
    table = list(params['tables'].values())[0]
    assert len(table.sharding.device_set) == 8
    assert 'params' in params['net']

    trainer = hb.Trainer(wrapped.loss_fn, params, optax.adagrad(0.1))
    batches = [make_batch(rng) for _ in range(60)]
    m0 = trainer.train(iter(batches[:1]), sync=False)
    m = trainer.train(iter(batches[1:]), sync=False)
    assert m['loss'] < m0['loss']

  def test_predictions_shape(self):
    specs = [EmbeddingSpec(TableConfig('cat0', 200, 8))]
    wrapped = wraps_flax_module(Tower(), specs, dense_columns=['dense0'])
    example = make_batch(np.random.RandomState(1))
    params = wrapped.init(jax.random.PRNGKey(0), example)
    preds = wrapped.apply(params, example)
    assert preds.shape == (64,)
    assert bool(jnp.all((preds >= 0) & (preds <= 1)))


class MultiInputTower(nn.Module):
  """Routes features individually ('features' convention)."""

  @nn.compact
  def __call__(self, emb, dense):
    x = jnp.concatenate(
        [emb['cat0'], emb['cat1'] * 2.0, dense['dense0']], axis=-1)
    x = nn.relu(nn.Dense(16)(x))
    return nn.sigmoid(nn.Dense(1)(x))[..., 0]


class FlaxDIN(nn.Module):
  """DIN-style attention pooling over the raw [B, L, D] history — only
  expressible with the 'raw' inputs convention (VERDICT weak #7)."""

  @nn.compact
  def __call__(self, members, batch):
    hist = members['seq']                       # [B, L, D]
    target = members['cat']                     # [B, D]
    mask = batch['seq_mask'].astype(jnp.float32)
    att_in = jnp.concatenate(
        [hist, jnp.broadcast_to(target[:, None, :], hist.shape),
         hist * target[:, None, :]], axis=-1)
    scores = nn.Dense(1)(nn.relu(nn.Dense(8)(att_in)))[..., 0]
    scores = jnp.where(mask > 0, scores, -1e9)
    att = jax.nn.softmax(scores, axis=-1) * mask
    pooled = jnp.einsum('bl,bld->bd', att, hist)
    x = jnp.concatenate([pooled, target, batch['d0'][:, None]], axis=-1)
    x = nn.relu(nn.Dense(16)(x))
    return nn.sigmoid(nn.Dense(1)(x))[..., 0]


def make_seq_batch(rng, n=64, L=8):
  seq = rng.randint(0, 120, (n, L)).astype(np.int32)
  mask = rng.rand(n, L) < 0.8
  cat = rng.randint(0, 60, n).astype(np.int32)
  label = ((cat % 3 == 0) & (seq[:, 0] % 2 == 0)).astype(np.float32)
  return {'seq': jnp.asarray(seq), 'seq_mask': jnp.asarray(mask),
          'cat': jnp.asarray(cat),
          'd0': jnp.asarray(rng.rand(n), jnp.float32),
          'label': jnp.asarray(label)}


class TestMultiInputConventions:

  def test_features_convention_trains(self):
    specs = [EmbeddingSpec(TableConfig('cat0', 200, 8)),
             EmbeddingSpec(TableConfig('cat1', 100, 8))]
    wrapped = wraps_flax_module(MultiInputTower(), specs,
                                dense_columns=['dense0'],
                                inputs='features')
    rng = np.random.RandomState(0)

    def batch():
      c0 = rng.randint(0, 200, 64)
      c1 = rng.randint(0, 100, 64)
      return {'cat0': jnp.asarray(c0, jnp.int32),
              'cat1': jnp.asarray(c1, jnp.int32),
              'dense0': jnp.asarray(rng.rand(64), jnp.float32),
              'label': jnp.asarray(((c0 + c1) % 4 == 0)
                                   .astype(np.float32))}
    example = batch()
    params = wrapped.init(jax.random.PRNGKey(0), example)
    trainer = wrapped.compile(params, optax.adagrad(0.1))
    m0 = trainer.train(iter([batch()]), sync=False)
    m = trainer.train(iter([batch() for _ in range(50)]), sync=False)
    assert m['loss'] < m0['loss']

  def test_din_via_flax_raw_inputs(self):
    """DIN trains through the flax adapter: sequence member stays
    [B, L, D] with its mask, attention pooled inside the module."""
    specs = [EmbeddingSpec(TableConfig('seq', 120, 8, combiner='sum'),
                           column='seq'),
             EmbeddingSpec(TableConfig('cat', 60, 8))]
    wrapped = wraps_flax_module(FlaxDIN(), specs, inputs='raw')
    rng = np.random.RandomState(1)
    example = make_seq_batch(rng)
    params = wrapped.init(jax.random.PRNGKey(0), example)
    wrapped.compile(params, optax.adam(3e-3))
    b = make_seq_batch(rng)
    m0 = wrapped.fit(iter([b]), sync=False)
    m = wrapped.fit(iter([b] * 60), sync=False)
    assert m['loss'] < m0['loss'] * 0.8, (m0['loss'], m['loss'])

  def test_lifecycle_save_load_evaluate_predict(self, tmp_path):
    specs = [EmbeddingSpec(TableConfig('cat0', 200, 8))]
    wrapped = wraps_flax_module(Tower(), specs, dense_columns=['dense0'])
    rng = np.random.RandomState(2)
    example = make_batch(rng)
    params = wrapped.init(jax.random.PRNGKey(0), example)
    wrapped.compile(params, optax.adagrad(0.1))
    wrapped.fit(iter([make_batch(rng) for _ in range(5)]), sync=False)
    res = wrapped.evaluate(iter([make_batch(rng)]))
    assert 0 <= res['auc'] <= 1
    preds = list(wrapped.predict(iter([example])))
    assert preds[0].shape == (64,)
    wrapped.save_weights(str(tmp_path / 'w'))

    wrapped2 = wraps_flax_module(Tower(), specs,
                                 dense_columns=['dense0'])
    params2 = wrapped2.init(jax.random.PRNGKey(1), example)
    wrapped2.compile(params2, optax.adagrad(0.1))
    wrapped2.load_weights(str(tmp_path / 'w'))
    p1 = next(iter(wrapped.predict(iter([example]))))
    p2 = next(iter(wrapped2.predict(iter([example]))))
    np.testing.assert_allclose(p1, p2, atol=1e-6)
