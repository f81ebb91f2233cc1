"""Feature extraction: batch columns → embedding/dense feature vectors.

TPU-native analogue of the reference tutorial's ``extract_features``
(``/root/reference/docs/tutorial/ranking/taobao/train.py:36-160``), which
wraps each categorical column in ``hb.embedding_scope`` so its table is
sharded. Here the same declaration is explicit: an
:class:`EmbeddingSpec` per categorical column (dense columns pass
through), table params created under the context mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from hybridbackend_tpu.embedding.lookup import lookup, lookup_sparse
from hybridbackend_tpu.embedding.table import TableConfig, create_table
from hybridbackend_tpu.framework.context import Context


@dataclasses.dataclass(frozen=True)
class EmbeddingSpec:
  """One categorical feature backed by an embedding table.

  ``column`` is the batch key holding ids; ragged (multi-valent) columns
  use ``column`` for the padded ids and ``column + '_mask'`` for
  validity, combined by ``config.combiner``.
  """
  config: TableConfig
  column: Optional[str] = None

  @property
  def name(self) -> str:
    return self.config.name

  @property
  def key(self) -> str:
    return self.column or self.config.name


def init_tables(specs: Sequence[EmbeddingSpec], rng: jax.Array,
                ctx: Optional[Context] = None) -> Dict[str, jax.Array]:
  """Create all embedding tables as a params subtree keyed by name."""
  tables = {}
  for spec in specs:
    rng, sub = jax.random.split(rng)
    tables[spec.name] = create_table(spec.config, sub, ctx)
  return tables


def extract_features(tables: Dict[str, jax.Array],
                     batch: Dict[str, jax.Array],
                     specs: Sequence[EmbeddingSpec],
                     dense_columns: Sequence[str] = (),
                     ctx: Optional[Context] = None
                     ) -> Tuple[List[jax.Array], List[jax.Array]]:
  """Returns (embedding feature list [B, dim] each, dense feature list).

  Ragged columns (padded + mask present in batch) are combined via
  ``lookup_sparse``; scalar id columns via ``lookup``.
  """
  emb_features = []
  for spec in specs:
    ids = batch[spec.key]
    table = tables[spec.name]
    mask_key = spec.key + '_mask'
    if ids.ndim >= 2 and mask_key in batch:
      emb = lookup_sparse(table, ids, batch[mask_key], spec.config, ctx=ctx)
    else:
      emb = lookup(table, ids, spec.config, ctx=ctx)
      if emb.ndim > 2:  # fixed-width multivalent: combine by config
        emb = jnp.mean(emb, axis=-2)
    emb_features.append(emb)
  dense_features = []
  for col in dense_columns:
    v = batch[col]
    if v.ndim == 1:
      v = v[:, None]
    dense_features.append(v.astype(jnp.float32))
  return emb_features, dense_features


__all__ = ['EmbeddingSpec', 'init_tables', 'extract_features']
