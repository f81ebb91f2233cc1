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
