"""Serving export via jax.export (SavedModel parity).

TPU-native replacement for the reference's SavedModel export
(``/root/reference/hybridbackend/tensorflow/training/saved_model.py:54-192``):
rank0 builds a serving graph from the checkpoint and writes a
signature'd SavedModel. Here the serving function is serialized with
``jax.export`` (StableHLO, runnable by any XLA runtime) next to an
orbax checkpoint of the parameters.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict

import jax
import numpy as np


def export(serving_fn: Callable[[Any, Dict[str, jax.Array]], jax.Array],
           params: Any, example_batch: Dict[str, Any], path: str) -> str:
  """Serialize ``serving_fn(params, batch)`` + params under ``path``.

  Layout: ``<path>/serving_fn.bin`` (StableHLO via jax.export),
  ``<path>/params/`` (orbax), ``<path>/signature.json``.
  """
  from jax import export as jax_export
  import orbax.checkpoint as ocp
  from hybridbackend_tpu.framework.context import (
      Context, build_mesh, context_scope)

  os.makedirs(path, exist_ok=True)
  # Flatten params for the serialized signature: checkpoint formats do
  # not preserve tuple-vs-list pytree nodes, so the exported function
  # takes the flat leaf list and rebuilds the structure internally.
  host_params = jax.tree_util.tree_map(np.asarray, params)
  leaves, treedef = jax.tree_util.tree_flatten(host_params)

  def flat_fn(leaf_list, batch):
    return serving_fn(jax.tree_util.tree_unflatten(treedef, leaf_list),
                      batch)

  # Serving is single-device: trace under a 1-device context so sharded
  # lookup paths degrade to local gathers (reference parity: rank0 builds
  # the serving graph from the merged checkpoint, ``saved_model.py:54``).
  one_dev = Context(build_mesh(devices=[jax.devices()[0]]))
  with context_scope(one_dev):
    exported = jax_export.export(jax.jit(flat_fn))(
        leaves, {k: np.asarray(v) for k, v in example_batch.items()})
  with open(os.path.join(path, 'serving_fn.bin'), 'wb') as f:
    f.write(exported.serialize())

  ckptr = ocp.StandardCheckpointer()
  ckptr.save(os.path.join(os.path.abspath(path), 'params', 'state'),
             leaves)
  ckptr.wait_until_finished()

  signature = {
      'inputs': {k: {'shape': list(np.asarray(v).shape),
                     'dtype': str(np.asarray(v).dtype)}
                 for k, v in example_batch.items()},
  }
  with open(os.path.join(path, 'signature.json'), 'w') as f:
    json.dump(signature, f, indent=2)
  return path


def load(path: str):
  """Load an exported model: returns ``(call(params, batch), params)``
  where ``params`` is the flat leaf list the export serialized."""
  from jax import export as jax_export
  import orbax.checkpoint as ocp

  with open(os.path.join(path, 'serving_fn.bin'), 'rb') as f:
    exported = jax_export.deserialize(f.read())
  ckptr = ocp.StandardCheckpointer()
  params = ckptr.restore(os.path.join(os.path.abspath(path), 'params',
                                      'state'))
  return exported.call, params


__all__ = ['export', 'load']
