"""Flax (linen) integration: the reference's Keras-wrapping parity.

The reference wraps ``tf.keras.Model`` so stock Keras code becomes
hybrid-parallel, with the full compile/fit/evaluate/predict/
save_weights lifecycle
(``/root/reference/hybridbackend/tensorflow/keras/model.py:462-850``).
The JAX-ecosystem analogue of Keras is Flax linen; this module makes a
stock flax module train hybrid-parallel under the Trainer: embedding
tables (sharded, stacked, exchanged by this framework) feed the flax
tower, whose params stay replicated.

Three module input conventions (``inputs=``):

* ``'concat'`` — the module takes ONE ``[B, F]`` tensor of all
  embedding + dense features concatenated (simple ranking towers).
* ``'features'`` — the module takes ``(emb: Dict[name, [B, D]],
  dense: Dict[col, [B, k]])`` — multi-input towers that route features
  individually.
* ``'raw'`` — the module takes ``(members: Dict[name, [B, ..., D]],
  batch)`` with UNCOMBINED per-column embeddings: sequence columns keep
  their ``[B, L, D]`` history (mask under ``batch[col + '_mask']``) —
  DIN-style attention models are fully expressible.

```python
import flax.linen as nn

class DIN(nn.Module):
  @nn.compact
  def __call__(self, members, batch):
    hist = members['hist']                    # [B, L, D]
    target = members['item']                  # [B, D]
    mask = batch['hist_mask']
    ...

wrapped = wraps_flax_module(DIN(), specs, inputs='raw')
params = wrapped.init(jax.random.PRNGKey(0), example_batch)
wrapped.compile(params, optax.adagrad(0.1), model_dir='/tmp/m')
wrapped.fit(train_batches, max_steps=1000)
wrapped.evaluate(eval_batches)
wrapped.save_weights('/tmp/w')
```
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterable, Optional, Sequence

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
  """A flax module + embedding specs fused into the Trainer contract,
  with a Keras-like lifecycle (compile/fit/evaluate/predict/
  save_weights — reference ``keras/model.py:462-850``)."""
  module: Any
  extractor: StackedFeatureExtractor
  label_key: str = 'label'
  loss: Callable[[jax.Array, jax.Array], jax.Array] = binary_cross_entropy
  inputs: str = 'concat'
  _trainer: Any = dataclasses.field(default=None, repr=False)

  # -- module plumbing -----------------------------------------------------

  def _module_inputs(self, tables, batch) -> tuple:
    fx = self.extractor
    if self.inputs == 'concat':
      emb, dense = fx(tables, batch)
      feats = jnp.concatenate([jnp.asarray(f, jnp.float32)
                               for f in list(emb) + list(dense)], axis=-1)
      return (feats,)
    if self.inputs == 'features':
      emb, dense = fx(tables, batch)
      emb_d = {s.name: e for s, e in zip(fx.specs, emb)}
      dense_d = {c: d for c, d in zip(fx.dense_columns, dense)}
      return (emb_d, dense_d)
    if self.inputs == 'raw':
      from hybridbackend_tpu.embedding.stack import unpack_embeddings
      raw, _, layouts = fx.lookup_raw(tables, batch)
      members: Dict[str, jax.Array] = {}
      stacks_by_name = {s.stacked.name: s for s in fx.stacks}
      for name, emb in raw.items():
        members.update(unpack_embeddings(
            stacks_by_name[name], emb, layouts[name]))
      return (members, batch)
    raise ValueError(f'Unknown inputs convention: {self.inputs!r}')

  def init(self, rng: jax.Array, example_batch: Dict[str, Any]) -> Dict:
    k_tab, k_net = jax.random.split(rng)
    tables = self.extractor.init(k_tab)
    net = self.module.init(k_net,
                           *self._module_inputs(tables, example_batch))
    return {'tables': tables, 'net': net}

  def apply(self, params: Dict, batch: Dict[str, Any]) -> jax.Array:
    return self.module.apply(
        params['net'], *self._module_inputs(params['tables'], batch))

  def loss_fn(self, params: Dict, batch: Dict[str, Any]):
    preds = self.apply(params, batch)
    labels = batch[self.label_key]
    aux = {'preds': preds}
    if self.loss is not binary_cross_entropy:
      # Custom losses are ALWAYS honored; exact eval under uneven
      # tails then relies on the evaluate() valid-count weighting (or
      # the loss itself consuming batch['_sync_valid']).
      return self.loss(preds, labels), aux
    pc = jnp.clip(preds, 1e-6, 1 - 1e-6)
    pel = -(labels * jnp.log(pc) + (1 - labels) * jnp.log(1 - pc))
    valid = batch.get('_sync_valid')
    if valid is None:
      loss = jnp.mean(pel)
    else:
      # Per-example weighting for exact eval under uneven tails; the
      # [B] array is only surfaced here (eval) so train metrics stay
      # scalar.
      w = valid.astype(pel.dtype)
      loss = jnp.sum(pel * w) / jnp.maximum(jnp.sum(w), 1e-6)
      aux['per_example_loss'] = pel
    return loss, aux

  # -- keras-like lifecycle ------------------------------------------------

  def compile(self, params: Dict, optimizer=None,
              model_dir: Optional[str] = None,
              group_key: Optional[str] = None,
              ctx: Optional[Context] = None):
    """Bind params + optimizer into an internal Trainer (reference
    ``Model.compile``)."""
    from hybridbackend_tpu.estimator import Trainer
    self._trainer = Trainer(self.loss_fn, params, optimizer,
                            model_dir=model_dir, ctx=ctx,
                            label_key=self.label_key,
                            group_key=group_key)
    return self._trainer

  @property
  def trainer(self):
    if self._trainer is None:
      raise RuntimeError('call compile(params, optimizer) first')
    return self._trainer

  @property
  def params(self) -> Dict:
    return self.trainer.params

  def fit(self, batches: Iterable, **train_kwargs) -> Dict[str, float]:
    """Train (reference ``Model.fit``); accepts every Trainer.train
    kwarg (max_steps, hooks, eval_every_n_steps, ...)."""
    return self.trainer.train(batches, **train_kwargs)

  def evaluate(self, batches: Iterable, **kwargs) -> Dict[str, float]:
    return self.trainer.evaluate(batches, **kwargs)

  def predict(self, batches: Iterable, **kwargs):
    return self.trainer.predict(batches, **kwargs)

  def save_weights(self, path: str) -> None:
    """Persist params (reference ``Model.save_weights``); world-size
    independent via the sharded checkpoint machinery."""
    from hybridbackend_tpu.training.checkpoint import CheckpointManager
    mgr = CheckpointManager(path)
    mgr.save(int(jax.numpy.asarray(self.trainer.state.step)),
             self.trainer.state)
    mgr.close()

  def load_weights(self, path: str) -> None:
    """Restore params saved by :meth:`save_weights` (any world size)."""
    from hybridbackend_tpu.training.checkpoint import CheckpointManager
    mgr = CheckpointManager(path)
    self.trainer.state = mgr.restore(self.trainer.state)
    mgr.close()

  def export_saved_model(self, path: str, example_batch) -> str:
    return self.trainer.export_saved_model(path, example_batch)


def wraps_flax_module(module: Any, specs: Sequence[EmbeddingSpec],
                      dense_columns: Sequence[str] = (),
                      label_key: str = 'label',
                      loss: Optional[Callable] = None,
                      inputs: str = 'concat',
                      ctx: Optional[Context] = None) -> WrappedFlaxModel:
  """Make a stock flax module hybrid-parallel (keras-wrapping parity,
  reference ``keras/model.py:462-850``). See module docstring for the
  ``inputs`` conventions ('concat' | 'features' | 'raw')."""
  extractor = StackedFeatureExtractor(specs, dense_columns, ctx)
  return WrappedFlaxModel(module, extractor, label_key=label_key,
                          loss=loss or binary_cross_entropy,
                          inputs=inputs)


__all__ = ['wraps_flax_module', 'WrappedFlaxModel', 'binary_cross_entropy']
