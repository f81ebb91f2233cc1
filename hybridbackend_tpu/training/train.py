"""Train/eval step construction over the context mesh.

TPU-native replacement for the reference's ``MonitoredTrainingSession``
graph machinery (``/root/reference/hybridbackend/tensorflow/training/session.py:43-164``):
in JAX a training step is a pure jitted function of ``(state, batch)``.
The reference's per-step concerns map as:

* hybrid parallelism — batch sharded over the mesh, dense params
  replicated (GSPMD inserts grad allreduce = reference
  ``aggregate_gradients``), tables row-sharded (grads stay local);
* variable init broadcast (reference ``optimizer.py:220-290``) —
  parameters are initialized once with a seeded PRNG and placed with
  explicit shardings, so every replica is identical by construction;
* loss scaling by world size — ``loss = mean over global batch``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from hybridbackend_tpu.framework.context import Context
from hybridbackend_tpu.training.optimizer import sharding_aware_init


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
  """Carried training state (params + optimizer state + step)."""
  step: jax.Array
  params: Any
  opt_state: Any

  @classmethod
  def create(cls, params, optimizer: optax.GradientTransformation,
             ctx: Optional[Context] = None) -> 'TrainState':
    ctx = ctx or Context.get()
    params = replicate_over_mesh(params, ctx)
    opt_state = sharding_aware_init(optimizer, params, ctx)
    step = jax.device_put(jnp.zeros((), jnp.int32),
                          ctx.replicated_sharding)
    return cls(step=step, params=params, opt_state=opt_state)


def replicate_over_mesh(tree, ctx: Optional[Context] = None):
  """Commit every array without a mesh sharding to a replicated placement
  on the context mesh. Sharded arrays (embedding tables) pass through.

  This is the reference's "replica variables initialized identically"
  guarantee (``optimizer.py:220-290``) — and it keeps checkpoint
  restores mesh-committed instead of single-device."""
  ctx = ctx or Context.get()

  def place(p):
    if isinstance(p, jax.Array) and len(p.sharding.device_set) > 1:
      return p
    if isinstance(p, (jax.Array, jnp.ndarray)) or hasattr(p, 'shape'):
      return jax.device_put(p, ctx.replicated_sharding)
    return p

  return jax.tree_util.tree_map(place, tree)


def make_train_step(loss_fn: Callable[[Any, Dict[str, jax.Array]],
                                      Tuple[jax.Array, Dict[str, jax.Array]]],
                    optimizer: optax.GradientTransformation,
                    ctx: Optional[Context] = None,
                    donate_state: bool = True) -> Callable:
  """Build the jitted hybrid-parallel train step.

  Args:
    loss_fn: ``(params, batch) -> (scalar_loss, aux_metrics)``. The loss
      must be a mean over the **global** batch.
    optimizer: optax transformation (possibly from ``multi_optimizer``).

  Returns:
    ``step(state, batch) -> (state, metrics)`` jitted over the context
    mesh with state donation.
  """
  ctx = ctx or Context.get()

  def step(state: TrainState, batch):
    (loss, aux), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params, batch)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state)
    metrics = dict(aux)
    metrics['loss'] = loss
    return new_state, metrics

  donate = (0,) if donate_state else ()
  return jax.jit(step, donate_argnums=donate)


def make_eval_step(eval_fn: Callable[[Any, Dict[str, jax.Array]],
                                     Dict[str, jax.Array]],
                   ctx: Optional[Context] = None) -> Callable:
  """Build the jitted eval step: ``(params, batch) -> metrics updates``.

  Mirrors the reference's separate-eval-graph-in-same-session
  (``evaluation.py:111-327``) — in JAX simply a second jitted function
  over the same params.
  """
  ctx = ctx or Context.get()
  return jax.jit(eval_fn)


__all__ = ['TrainState', 'make_train_step', 'make_eval_step']
