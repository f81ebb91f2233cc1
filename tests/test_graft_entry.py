"""Driver-contract regression: __graft_entry__ must stay importable and
runnable (entry compiles; dryrun executes a full multichip step)."""

import jax
import pytest


def test_entry_compiles_and_runs():
  import __graft_entry__ as g
  fn, args = g.entry()
  out = jax.jit(fn)(*args)
  assert out.shape == (64,)


def test_dryrun_multichip_8():
  import __graft_entry__ as g
  g.dryrun_multichip(8)


def test_profiler_utils():
  from hybridbackend_tpu.utils import profile_trace, named_scope
  from hybridbackend_tpu.utils.profiler import dump_hlo
  import jax.numpy as jnp
  f = jax.jit(lambda x: x * 2)
  hlo = dump_hlo(f, jnp.ones(4))
  assert 'multiply' in hlo
  with profile_trace(None):  # no-op without logdir
    with named_scope('test'):
      f(jnp.ones(4))
