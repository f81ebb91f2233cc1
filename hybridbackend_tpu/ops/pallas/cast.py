"""Pallas TPU kernels: wire-dtype casts with stochastic rounding.

TPU-native equivalent of the reference's fp32↔fp16 wire-compression
kernels (``/root/reference/hybridbackend/tensorflow/common/cast.cu.cc:37-488``):
gradients cast to bf16 before a collective and back after. Deterministic
round-to-nearest is free on TPU (XLA convert); what a kernel adds is
**stochastic rounding**, which removes the gradient bias of bf16 wire
compression — the reason the reference defaults gradient wire dtype to
fp32 while we can afford bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sr_kernel(seed_ref, x_ref, out_ref):
  pltpu.prng_seed(seed_ref[0])
  bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
  out_ref[...] = pltpu.stochastic_round(x_ref[...], bits,
                                        target_dtype=jnp.bfloat16)


def stochastic_round_bf16_pallas(x: jax.Array, seed: jax.Array,
                                 interpret: bool = False) -> jax.Array:
  """fp32 → bf16 with stochastic rounding (Pallas, TPU only)."""
  assert x.dtype == jnp.float32
  return pl.pallas_call(
      _sr_kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=1,
          grid=(),
          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
      ),
      out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
      interpret=interpret,
  )(seed.reshape(1).astype(jnp.int32), x)


def stochastic_round_bf16(x: jax.Array, key: jax.Array) -> jax.Array:
  """Backend-dispatching stochastic bf16 round.

  TPU: Pallas PRNG kernel. Elsewhere: jnp reference implementation
  (perturb the low mantissa bits with uniform noise before truncation).
  """
  if x.dtype != jnp.float32:
    return x.astype(jnp.bfloat16)
  if jax.default_backend() == 'tpu' and x.ndim >= 2:
    seed = jax.random.randint(key, (), 0, 2**31 - 1)
    return stochastic_round_bf16_pallas(x, seed)
  # Reference implementation: add uniform [0, ulp) noise below the bf16
  # mantissa boundary, then truncate toward zero.
  bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
  noise = jax.random.randint(key, x.shape, 0, 1 << 16,
                             dtype=jnp.uint32).astype(jnp.uint32)
  rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
  return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(
      jnp.bfloat16)


__all__ = ['stochastic_round_bf16', 'stochastic_round_bf16_pallas']
