"""World-size-independent sharded checkpointing.

TPU-native replacement for the reference's sharded Saver protocol
(``/root/reference/hybridbackend/tensorflow/training/saver.py:57-341``):
the reference has every rank write its variable shards to temp files,
rendezvous on a Barrier, and rank0 merge checkpoints; shard metadata
(``SaveSliceInfo``) makes restores world-size independent.

On TPU all of that collapses into Orbax + global-shape arrays: each
embedding table is ONE logical array whose NamedSharding determines
which host writes which rows; Orbax writes shards in parallel per host
and restores under *any* new mesh/world size (reference parity:
``embedding/variables.py:126-141``). Restore of missing variables falls
back to the caller's freshly-initialized values (reference
``saver.py:207-214``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from hybridbackend_tpu.framework.options import OPTIONS

OPTIONS.register('keep_checkpoint_max', 5, env='HB_KEEP_CHECKPOINT_MAX',
                 doc='Maximum number of recent checkpoints to retain.')


class CheckpointManager:
  """Thin wrapper over orbax CheckpointManager with reference semantics."""

  def __init__(self, directory: str, max_to_keep: Optional[int] = None):
    if max_to_keep is None:
      max_to_keep = int(OPTIONS['keep_checkpoint_max'])
    self._dir = os.path.abspath(directory)
    self._mgr = ocp.CheckpointManager(
        self._dir,
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False))

  @property
  def directory(self) -> str:
    return self._dir

  def save(self, step: int, state: Any, wait: bool = True) -> None:
    self._mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
      self._mgr.wait_until_finished()

  def latest_step(self) -> Optional[int]:
    return self._mgr.latest_step()

  def restore(self, state_template: Any,
              step: Optional[int] = None) -> Any:
    """Restore into the template's shardings (possibly a different world
    size than the save — global shapes make this transparent). Missing
    keys keep the template's (freshly initialized) values."""
    if step is None:
      step = self._mgr.latest_step()
    if step is None:
      return state_template
    restored = self._mgr.restore(
        step, args=ocp.args.StandardRestore(state_template))
    # Re-commit to the context mesh: restoring through a template whose
    # leaves were never mesh-placed yields single-device arrays that
    # clash with mesh-sharded batches under jit.
    from hybridbackend_tpu.training.train import replicate_over_mesh
    return replicate_over_mesh(restored)

  def all_steps(self):
    return self._mgr.all_steps()

  def close(self):
    self._mgr.close()


__all__ = ['CheckpointManager']
