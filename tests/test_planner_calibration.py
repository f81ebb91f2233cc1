"""Planner byte-model calibration against compiled HLO (round-3 #4).

The planner's per-strategy comm formulas must track what XLA actually
emits: count collective wire bytes in the compiled module
(utils/hlo_bytes.py) for the forward+backward lookup AND the sparse
update exchange, and require the planner's ``comm_bytes_per_step`` to
agree within a small factor (reference protocol: published measured
collective tables, ``docs/data.md:265-285``).
"""

import jax
import jax.numpy as jnp
import numpy as np

import hybridbackend_tpu as hb
from hybridbackend_tpu.embedding import TableConfig, create_table, lookup
from hybridbackend_tpu.embedding.planner import plan_sharding
from hybridbackend_tpu.embedding.sparse_update import (
    init_adagrad_state, sparse_adagrad_apply)
from hybridbackend_tpu.utils.hlo_bytes import collective_bytes

W, V, D, B = 8, 8192, 16, 1024


def _measured_step_bytes(strategy):
  """HLO-counted collective bytes of one training step's exchanges for
  a [V, D] table at global batch B: lookup fwd+bwd + sparse update."""
  cfg = TableConfig('cal', V, D)
  tbl = create_table(cfg, jax.random.PRNGKey(0))
  rng = np.random.RandomState(0)
  ids = jnp.asarray(rng.randint(0, V, B), jnp.int32)
  cot = jnp.asarray(rng.randn(B, D).astype(np.float32))

  # Non-trivial cotangent so the backward all-gather cannot constant-fold.
  def fwd(t):
    return jnp.sum(lookup(t, ids, cfg, strategy=strategy) * cot)

  with hb.scope(emb_lookup_overflow_fallback=False,
                emb_update_overflow_fallback=False):
    txt = jax.jit(jax.value_and_grad(fwd)).lower(tbl).compile().as_text()
    lk, lk_kinds = collective_bytes(txt, W)

    state = init_adagrad_state(tbl, 0.1)
    demb = jnp.asarray(rng.randn(B, D).astype(np.float32))
    txt2 = jax.jit(
        lambda t, s, i, g: sparse_adagrad_apply(t, s, i, g, cfg, 0.1)
    ).lower(tbl, state, ids, demb).compile().as_text()
    up, up_kinds = collective_bytes(txt2, W)
  return lk + up, {'lookup': lk_kinds, 'update': up_kinds}


def test_planner_bytes_match_hlo():
  for strategy in ('allgather', 'alltoall'):
    with hb.scope(emb_lookup_strategy=strategy):
      plans = plan_sharding([TableConfig('cal', V, D)], {'cal': B})
    measured, detail = _measured_step_bytes(strategy)
    # Compare the MODELED strategy (force it through the candidate
    # formula by scoping the strategy) against the measurement.
    from hybridbackend_tpu.embedding.planner import (
        _cost_row_allgather, _cost_row_alltoall)
    if strategy == 'allgather':
      _, predicted = _cost_row_allgather(V, D, B, W, 1.0, 2.0)
    else:
      _, predicted = _cost_row_alltoall(V, D, B, W, 1.0, 2.0)
    ratio = measured / max(predicted, 1)
    assert 1 / 3 < ratio < 3, (strategy, predicted, measured, detail)


def test_planner_prefers_alltoall_at_scale():
  """With the calibrated formulas, the wire-proportional alltoall wins
  for a big sharded table at meaningful world size (the reference's
  headline protocol choice)."""
  cfg = TableConfig('big', 10_000_000, 64)
  plans = plan_sharding([cfg], {'big': 8192},
                        unique_fraction={'big': 0.5})
  assert plans['big'].sharded
  assert plans['big'].strategy == 'alltoall'


def test_planner_replicates_tiny_hot_table():
  cfg = TableConfig('tiny', 512, 8)
  plans = plan_sharding([cfg], {'tiny': 65536})
  assert not plans['tiny'].sharded
