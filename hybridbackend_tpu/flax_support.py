"""Flax (linen) integration: the reference's Keras-wrapping parity.

The reference wraps ``tf.keras.Model`` so stock Keras code becomes
hybrid-parallel (``/root/reference/hybridbackend/tensorflow/keras/model.py:462``).
The JAX-ecosystem analogue of Keras is Flax linen; this module makes a
stock flax module train hybrid-parallel under the Trainer: embedding
tables (sharded, stacked, exchanged by this framework) feed the flax
dense tower, whose params stay replicated.

```python
import flax.linen as nn

class Tower(nn.Module):
  @nn.compact
  def __call__(self, x):
    x = nn.Dense(256)(x); x = nn.relu(x)
    return nn.sigmoid(nn.Dense(1)(x))[..., 0]

wrapped = wraps_flax_module(Tower(), specs, dense_columns=['i0'])
params = wrapped.init(jax.random.PRNGKey(0), example_batch)
trainer = hb.Trainer(wrapped.loss_fn, params, optimizer)
```
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from hybridbackend_tpu.framework.context import Context
from hybridbackend_tpu.models.feature import (
    EmbeddingSpec, StackedFeatureExtractor)


def binary_cross_entropy(preds: jax.Array, labels: jax.Array) -> jax.Array:
  preds = jnp.clip(preds, 1e-6, 1 - 1e-6)
  return -jnp.mean(labels * jnp.log(preds)
                   + (1 - labels) * jnp.log(1 - preds))


@dataclasses.dataclass
class WrappedFlaxModel:
  """A flax module + embedding specs fused into the Trainer contract."""
  module: Any
  extractor: StackedFeatureExtractor
  label_key: str = 'label'
  loss: Callable[[jax.Array, jax.Array], jax.Array] = binary_cross_entropy

  def init(self, rng: jax.Array, example_batch: Dict[str, Any]) -> Dict:
    k_tab, k_net = jax.random.split(rng)
    tables = self.extractor.init(k_tab)
    feats = self._features(tables, example_batch)
    net = self.module.init(k_net, feats)
    return {'tables': tables, 'net': net}

  def _features(self, tables, batch) -> jax.Array:
    emb, dense = self.extractor(tables, batch)
    return jnp.concatenate([jnp.asarray(f, jnp.float32)
                            for f in list(emb) + list(dense)], axis=-1)

  def apply(self, params: Dict, batch: Dict[str, Any]) -> jax.Array:
    feats = self._features(params['tables'], batch)
    return self.module.apply(params['net'], feats)

  def loss_fn(self, params: Dict, batch: Dict[str, Any]):
    preds = self.apply(params, batch)
    return self.loss(preds, batch[self.label_key]), {'preds': preds}


def wraps_flax_module(module: Any, specs: Sequence[EmbeddingSpec],
                      dense_columns: Sequence[str] = (),
                      label_key: str = 'label',
                      loss: Optional[Callable] = None,
                      ctx: Optional[Context] = None) -> WrappedFlaxModel:
  """Make a stock flax module hybrid-parallel (keras-wrapping parity)."""
  extractor = StackedFeatureExtractor(specs, dense_columns, ctx)
  return WrappedFlaxModel(module, extractor, label_key=label_key,
                          loss=loss or binary_cross_entropy)


__all__ = ['wraps_flax_module', 'WrappedFlaxModel', 'binary_cross_entropy']
