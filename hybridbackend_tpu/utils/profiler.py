"""Profiling/tracing utilities.

TPU-native parity with the reference's NVTX profiler ranges
(``/root/reference/hybridbackend/common/profiler.h:28-41`` —
``ProfilerRange::forSynch/forLookup``) and graph dumps: ``jax.profiler``
traces capture the XLA timeline (viewable in TensorBoard/Perfetto) and
``named_scope`` annotates regions the way NVTX ranges do.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax

from hybridbackend_tpu.framework.options import OPTIONS

OPTIONS.register('profile_dir', '', env='HB_PROFILE_DIR',
                 doc='Write jax.profiler traces here when set.')

# Reference: HB_UNOPTIMIZED/OPTIMIZED_GRAPH_PATH graph dumps. JAX
# equivalent: fn.lower(...).as_text() / .compile().as_text(); exposed
# here for discoverability.
def dump_hlo(jitted_fn, *example_args, optimized: bool = True) -> str:
  """Return the (optionally compiled/optimized) HLO of a jitted fn."""
  lowered = jitted_fn.lower(*example_args)
  if optimized:
    return lowered.compile().as_text()
  return lowered.as_text()


@contextlib.contextmanager
def profile_trace(logdir: Optional[str] = None) -> Iterator[None]:
  """Capture a device trace for the duration of the scope."""
  logdir = logdir or OPTIONS['profile_dir']
  if not logdir:
    yield
    return
  jax.profiler.start_trace(logdir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


named_scope = jax.named_scope  # NVTX-range analogue inside jit
