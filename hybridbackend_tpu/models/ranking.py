"""Ranking model zoo: stacked DCNv2, DLRM, DIN.

Functional JAX re-implementations of the reference tutorial models
(``/root/reference/docs/tutorial/ranking/model.py:34-240``), structured
as ``init(rng, ...) -> params`` / ``apply(params, features...) -> preds``
pairs so the whole forward fits in one jitted, GSPMD-sharded train step.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from hybridbackend_tpu.models.layers import (
    attention_sequence_pooling, dense_apply, dense_init,
    local_activation_unit_init, mlp_apply, mlp_init)


# ---------------------------------------------------------------------------
# Stacked DCNv2 (reference model.py:34-81)
# ---------------------------------------------------------------------------

def stacked_dcn_v2_init(rng: jax.Array, feature_dims: Sequence[int],
                        mlp_dims: Sequence[int]) -> Dict[str, Any]:
  total = sum(feature_dims)
  k_cross, k_mlp = jax.random.split(rng)
  return {
      'cross': dense_init(k_cross, total, total,
                          w_stddev=1.0, b_stddev=0.0),
      'mlp': mlp_init(k_mlp, total, list(mlp_dims)),
  }


def stacked_dcn_v2_apply(params: Dict[str, Any],
                         features: Sequence[jax.Array]) -> jax.Array:
  """Cross layer ``x * dense(x) + x`` then an MLP with sigmoid head."""
  x = jnp.concatenate(list(features), axis=-1)
  x_sq = dense_apply(params['cross'], x, jax.nn.relu)
  cross = x * x_sq + x
  return mlp_apply(params['mlp'], cross,
                   final_activation=jax.nn.sigmoid)[..., 0]


# ---------------------------------------------------------------------------
# DLRM (reference model.py:82-153)
# ---------------------------------------------------------------------------

def dlrm_init(rng: jax.Array, num_wide: int, num_deep: int,
              bottom_mlp_dims: Sequence[int], dot_interact_dim: int,
              top_mlp_dims: Sequence[int]) -> Dict[str, Any]:
  k_bottom, k_out, k_top = jax.random.split(rng, 3)
  n = num_deep + 1
  dot_out = n * (n - 1) // 2
  return {
      'bottom_mlp': mlp_init(k_bottom, num_wide, list(bottom_mlp_dims)),
      'bottom_out': dense_init(k_out, bottom_mlp_dims[-1],
                               dot_interact_dim),
      'top_mlp': mlp_init(k_top, dot_interact_dim + dot_out,
                          list(top_mlp_dims)),
  }


def dlrm_apply(params: Dict[str, Any], wide_features: Sequence[jax.Array],
               deep_features: Sequence[jax.Array]) -> jax.Array:
  """Bottom MLP over log1p'd dense → pairwise dot interaction (upper
  triangle) with the embedding features → top MLP with sigmoid head."""
  wide = jnp.concatenate(list(wide_features), axis=-1)
  wide = jnp.log1p(jnp.maximum(wide.astype(jnp.float32), 0.0))
  h = mlp_apply(params['bottom_mlp'], wide,
                final_activation=jax.nn.relu)
  bottom = dense_apply(params['bottom_out'], h, jax.nn.relu)

  stack = jnp.stack([bottom] + list(deep_features), axis=1)  # [B, n, d]
  x2 = jnp.einsum('bnd,bmd->bnm', stack, stack,
                  preferred_element_type=jnp.float32)
  n = stack.shape[1]
  iu, ju = jnp.triu_indices(n, k=1)
  interactions = x2[:, iu, ju]                               # [B, n(n-1)/2]

  top_in = jnp.concatenate([bottom, interactions], axis=-1)
  return mlp_apply(params['top_mlp'], top_in,
                   final_activation=jax.nn.sigmoid)[..., 0]


# ---------------------------------------------------------------------------
# DIN (reference model.py:154-193 + din_layers.py)
# ---------------------------------------------------------------------------

def din_init(rng: jax.Array, emb_dim: int, num_profile_features: int,
             num_dense: int,
             dnn_hidden_units: Sequence[int] = (256, 128, 64),
             att_hidden_size: Sequence[int] = (80, 40)) -> Dict[str, Any]:
  """DIN over one behavior sequence: attention pooling of history keyed
  by the candidate-item query, concatenated with profile embeddings and
  dense features into a DNN with a linear 1-unit head."""
  k_att, k_dnn, k_head = jax.random.split(rng, 3)
  dnn_in = emb_dim * (num_profile_features + 2) + num_dense
  return {
      'attention': local_activation_unit_init(k_att, emb_dim,
                                              att_hidden_size),
      'dnn': mlp_init(k_dnn, dnn_in, list(dnn_hidden_units)),
      'head': dense_init(k_head, dnn_hidden_units[-1], 1, b_stddev=0.0),
  }


def din_apply(params: Dict[str, Any], query_emb: jax.Array,
              keys_emb: jax.Array, keys_mask: jax.Array,
              profile_embs: Sequence[jax.Array],
              dense_features: Sequence[jax.Array] = (),
              att_weight_normalization: bool = False) -> jax.Array:
  """query [B,D] candidate item; keys [B,L,D] behavior history."""
  hist = attention_sequence_pooling(
      params['attention'], query_emb, keys_emb, keys_mask,
      weight_normalization=att_weight_normalization)
  parts = [query_emb, hist] + list(profile_embs) + [
      f.astype(jnp.float32) for f in dense_features]
  x = jnp.concatenate(parts, axis=-1)
  x = mlp_apply(params['dnn'], x, final_activation=jax.nn.relu)
  logit = dense_apply(params['head'], x)
  return jax.nn.sigmoid(logit)[..., 0]


def din_session_init(rng: jax.Array, emb_dim: int,
                     num_profile_features: int, num_dense: int,
                     dnn_hidden_units: Sequence[int] = (256, 128, 64),
                     att_hidden_size: Sequence[int] = (80, 40)
                     ) -> Dict[str, Any]:
  """Session-grouped DIN (nested-ragged consumer): behavior history
  arrives as ``[B, S, L]`` sessions of events (the device layout of a
  ``ragged_rank=2`` column, ``data/dataframe.py:to_padded``). Same
  parameter shapes as :func:`din_init` — attention runs over SESSION
  vectors instead of raw events."""
  return din_init(rng, emb_dim, num_profile_features, num_dense,
                  dnn_hidden_units, att_hidden_size)


def din_session_apply(params: Dict[str, Any], query_emb: jax.Array,
                      sess_keys_emb: jax.Array, sess_mask: jax.Array,
                      profile_embs: Sequence[jax.Array],
                      dense_features: Sequence[jax.Array] = (),
                      att_weight_normalization: bool = False) -> jax.Array:
  """query [B,D]; sess_keys_emb [B,S,L,D] embedded session events;
  sess_mask [B,S,L] (the 2-level mask from ``to_padded``). Events pool
  to a session vector by masked mean; candidate-keyed attention then
  pools sessions (reference DIN doctrine, ``model.py:154-193``, lifted
  one nesting level — the reference's nested-ragged data path feeds
  exactly this grouping)."""
  m = sess_mask.astype(jnp.float32)
  denom = jnp.maximum(m.sum(axis=-1, keepdims=True), 1.0)
  sess_vec = (sess_keys_emb * m[..., None]).sum(axis=-2) / denom  # [B,S,D]
  sess_valid = sess_mask.any(axis=-1)                             # [B,S]
  hist = attention_sequence_pooling(
      params['attention'], query_emb, sess_vec, sess_valid,
      weight_normalization=att_weight_normalization)
  parts = [query_emb, hist] + list(profile_embs) + [
      f.astype(jnp.float32) for f in dense_features]
  x = jnp.concatenate(parts, axis=-1)
  x = mlp_apply(params['dnn'], x, final_activation=jax.nn.relu)
  logit = dense_apply(params['head'], x)
  return jax.nn.sigmoid(logit)[..., 0]


__all__ = ['stacked_dcn_v2_init', 'stacked_dcn_v2_apply',
           'dlrm_init', 'dlrm_apply', 'din_init', 'din_apply',
           'din_session_init', 'din_session_apply']
