"""Fixed-capacity unique for jit-compiled lookup paths.

The reference deduplicates lookup ids with ``tf.unique`` before the local
gather (``/root/reference/hybridbackend/tensorflow/embedding/sharding.py:186-189``).
``tf.unique`` has a data-dependent output shape; under XLA everything must
be static, so this module provides a sort-based unique with a fixed
``capacity`` (default: the input length, which is always sufficient).

A deduplicated exchange sends ``capacity`` ids instead of ``n`` — setting
``capacity < n`` (safe for skewed id distributions where the unique count
is bounded) directly shrinks collective payloads.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class UniqueResult(NamedTuple):
  """Static-shape unique.

  Attributes:
    values: ``[capacity]`` unique ids, padded with ``fill_value``.
    index: ``[n]`` int32 such that ``values[index] == ids``
      (same contract as ``tf.unique``'s ``idx``).
    count: scalar int32 number of valid entries in ``values``.
    overflowed: scalar bool — the TRUE unique count exceeded
      ``capacity`` (surplus uniques alias slot ``capacity - 1``, so
      ``values[index]`` is NOT exact). Callers with a reduced capacity
      must branch on this (see ``lookup``'s exact fallback) — the
      reference's ``tf.unique`` is always exact
      (``sharding.py:186-189``), so silent aliasing is never acceptable.
  """
  values: jax.Array
  index: jax.Array
  count: jax.Array
  overflowed: jax.Array


def unique(ids: jax.Array, capacity: Optional[int] = None,
           fill_value: int = 0) -> UniqueResult:
  """Sort-based unique with static output shape.

  When the true unique count exceeds ``capacity``, surplus uniques alias
  slot ``capacity - 1`` and ``overflowed`` is set; callers that cannot
  bound the unique count must use ``capacity = n`` (always exact) or
  consume ``overflowed`` and fall back.
  """
  n = ids.shape[0]
  if capacity is None:
    capacity = n
  order = jnp.argsort(ids, stable=True)
  sorted_ids = ids[order]
  is_first = jnp.concatenate([
      jnp.ones((1,), jnp.bool_),
      sorted_ids[1:] != sorted_ids[:-1],
  ])
  uidx = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # unique slot per elem
  count = uidx[-1] + 1
  uidx_c = jnp.minimum(uidx, capacity - 1)
  values = jnp.full((capacity,), fill_value, ids.dtype)
  values = values.at[uidx_c].set(sorted_ids, mode='drop')
  index = jnp.zeros((n,), jnp.int32).at[order].set(uidx_c)
  return UniqueResult(values, index, jnp.minimum(count, capacity),
                      count > capacity)


__all__ = ['UniqueResult', 'unique']
