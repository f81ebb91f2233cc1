"""Platform selection helpers.

Some environments register an accelerator platform plugin that wins
device selection even when ``JAX_PLATFORMS=cpu`` is exported; the
``jax.config`` update is honored regardless. This is the one shared
implementation of the force-CPU dance used by the launcher's simulate
mode, benchmarks' ``--cpu N``, and the driver entry points.
"""

from __future__ import annotations

import os


def force_host_devices(n: int) -> None:
  """Force the CPU platform with ``n`` virtual devices.

  Must run before any backend-initializing JAX call; silently keeps the
  current backend if one is already initialized.
  """
  flags = os.environ.get('XLA_FLAGS', '')
  if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + f' --xla_force_host_platform_device_count={n}').strip()
  os.environ.setdefault('JAX_PLATFORMS', 'cpu')
  import jax
  try:
    jax.config.update('jax_platforms', 'cpu')
  except RuntimeError:
    pass  # backend already initialized


__all__ = ['force_host_devices']
