"""Serving-export depth (round-3 order #6): ragged/sequence signatures,
cached tables, and dynamic-table id mappers all export into a bundle a
COLD process can serve, reproducing training-time predictions
(reference ``export_all`` rebuilds a full serving graph from checkpoint,
``/root/reference/hybridbackend/tensorflow/training/saved_model.py:54-192``).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import hybridbackend_tpu as hb
from hybridbackend_tpu.embedding import TableConfig
from hybridbackend_tpu.models import EmbeddingSpec, StackedFeatureExtractor
from hybridbackend_tpu.training.saved_model import Served

BATCH, DIM = 32, 8


def test_din_ragged_export_and_cold_serve(tmp_path):
  """Raw/ragged (DIN) model: padded ids + mask signature exports; a
  Served bundle reproduces the trainer's predictions."""
  from hybridbackend_tpu.models import din_apply, din_init

  L = 4
  fx = StackedFeatureExtractor(
      [EmbeddingSpec(TableConfig('item', 300, DIM), column='cand_hist')])
  net = din_init(jax.random.PRNGKey(3), DIM, num_profile_features=0,
                 num_dense=0, dnn_hidden_units=(16, 8),
                 att_hidden_size=(8,))

  def raw_loss(net_params, members, batch):
    emb = members['item']                                 # [B, 1+L, D]
    preds = jnp.clip(
        din_apply(net_params, emb[:, 0], emb[:, 1:],
                  batch['hist_mask'], []),
        1e-6, 1 - 1e-6)
    y = batch['label']
    return -jnp.mean(y * jnp.log(preds)
                     + (1 - y) * jnp.log(1 - preds)), {'preds': preds}

  def seq_batches(n, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(n):
      cand = rng.randint(0, 300, BATCH)
      hist = rng.randint(0, 300, (BATCH, L))
      yield {
          'cand_hist': np.concatenate([cand[:, None], hist],
                                      axis=1).astype(np.int32),
          'hist_mask': np.ones((BATCH, L), np.float32),
          'label': (cand % 2 == 0).astype(np.float32),
      }

  t = hb.SparseTrainer(fx, None, net, raw_model_loss=raw_loss,
                       table_lr=0.2)
  t.train(seq_batches(20, seed=9), sync=False)
  b = next(seq_batches(1, seed=11))
  path = t.export_saved_model(str(tmp_path / 'din'), b)
  _, aux = t._eval_fn(t.params, {k: jnp.asarray(v) for k, v in b.items()})

  served = Served(path)
  # The mask column ships in the exported signature (padded+mask
  # contract; 'ragged' pairs are detected for col/col_mask naming).
  assert 'hist_mask' in served.signature['inputs']
  preds = served.predict(b)
  np.testing.assert_allclose(preds, np.asarray(aux['preds']),
                             rtol=1e-4, atol=1e-5)


def test_cached_table_export_serves_full_vocab(tmp_path):
  """Cache-backed table: export flushes the cache and serves from the
  FULL host table — cold-process predictions match the trainer for
  resident ids AND are real (non-zero-embedding) for ids the cache
  never held."""
  from hybridbackend_tpu.embedding.service import EmbeddingCache
  VOCAB, CAP = 64, 16
  rng = np.random.RandomState(0)
  host_value = rng.randn(VOCAB, DIM).astype(np.float32) * 0.1
  cache = EmbeddingCache(
      TableConfig('big', VOCAB, DIM), CAP,
      host_tables={'value': host_value.copy(),
                   'slot0': np.full((VOCAB, DIM), 0.1, np.float32)})
  fx = StackedFeatureExtractor(
      [EmbeddingSpec(cache.slot_config(), column='big')],
      dense_columns=['d0'])
  dense = {'w': jnp.asarray(rng.randn(DIM + 1, 1).astype(np.float32)),
           'b': jnp.zeros((), jnp.float32)}

  def ml(dense_p, emb_f, dense_f, batch):
    x = jnp.concatenate(emb_f + dense_f, axis=-1)
    logits = (x @ dense_p['w'])[:, 0] + dense_p['b']
    preds = jax.nn.sigmoid(logits)
    y = batch['label']
    pel = (preds - y) ** 2
    return jnp.mean(pel), {'preds': preds, 'per_example_loss': pel}

  t = hb.estimator.SparseTrainer(fx, ml, dense,
                                 dense_optimizer=optax.sgd(0.1),
                                 table_lr=0.1, rng=jax.random.PRNGKey(0),
                                 caches={'big': cache})

  def batches(n, lo, hi, seed):
    r = np.random.RandomState(seed)
    for _ in range(n):
      ids = r.randint(lo, hi, BATCH).astype(np.int64)
      yield {'big': ids, 'd0': r.rand(BATCH).astype(np.float32),
             'label': (ids % 2 == 0).astype(np.float32)}

  t.train(batches(10, 0, CAP, seed=1), sync=False)  # trains rows 0..15

  b = next(batches(1, 0, VOCAB, seed=2))            # ids incl. never-cached
  path = t.export_saved_model(str(tmp_path / 'cached'), b)
  served = Served(path)
  preds = served.predict(b)

  # Reference: full-table lookup + the trained dense tower.
  full = np.asarray(cache.storage.tables['value'])
  x = np.concatenate([full[b['big']],
                      b['d0'][:, None].astype(np.float32)], axis=1)
  w = np.asarray(t.state.dense['w'])
  bb = float(np.asarray(t.state.dense['b']))
  want = 1.0 / (1.0 + np.exp(-(x @ w)[:, 0] - bb))
  np.testing.assert_allclose(preds, want, rtol=1e-4, atol=1e-5)
  # Trained rows differ from their initial values in the export.
  assert not np.allclose(full[:CAP], host_value[:CAP])


def test_dynamic_table_export_bundles_id_mapper(tmp_path):
  """Dynamic-vocab table: the IdMapper state ships with the export; a
  cold Served process maps raw (unbounded) ids exactly as training."""
  from hybridbackend_tpu.embedding.dynamic import DynamicEmbedding

  dyn = DynamicEmbedding('uid', capacity=64, dim=DIM)
  fx = StackedFeatureExtractor(
      [EmbeddingSpec(dyn.config, column='uid')], dense_columns=['d0'])
  dense = {'w': jnp.zeros((DIM + 1, 1), jnp.float32),
           'b': jnp.zeros((), jnp.float32)}

  def ml(dense_p, emb_f, dense_f, batch):
    x = jnp.concatenate(emb_f + dense_f, axis=-1)
    preds = jax.nn.sigmoid((x @ dense_p['w'])[:, 0] + dense_p['b'])
    y = batch['label']
    pel = (preds - y) ** 2
    return jnp.mean(pel), {'preds': preds, 'per_example_loss': pel}

  t = hb.estimator.SparseTrainer(fx, ml, dense,
                                 dense_optimizer=optax.sgd(0.3),
                                 table_lr=0.2, rng=jax.random.PRNGKey(1))

  raw_ids = (np.arange(BATCH, dtype=np.int64) * 10**10 + 7)

  def batches(n, seed):
    r = np.random.RandomState(seed)
    for _ in range(n):
      yield {'uid': dyn.mapper.map_ids(raw_ids).astype(np.int32),
             'd0': r.rand(BATCH).astype(np.float32),
             'label': (raw_ids % 2 == 0).astype(np.float32)}

  t.train(batches(10, seed=3), sync=False)

  r = np.random.RandomState(4)
  d0 = r.rand(BATCH).astype(np.float32)
  label = (raw_ids % 2 == 0).astype(np.float32)
  mapped = dyn.mapper.map_ids(raw_ids, train=False).astype(np.int32)
  example = {'uid': mapped, 'd0': d0, 'label': label}
  path = t.export_saved_model(str(tmp_path / 'dyn'), example,
                              id_mappers={'uid': dyn.mapper})
  _, aux = t._eval_fn(t.params, {k: jnp.asarray(v)
                                 for k, v in example.items()})

  served = Served(path)
  assert served.signature['id_mapped'] == ['uid']
  # The cold process receives RAW ids; the bundled mapper resolves them.
  preds = served.predict({'uid': raw_ids, 'd0': d0, 'label': label})
  np.testing.assert_allclose(preds, np.asarray(aux['preds']),
                             rtol=1e-4, atol=1e-5)
  # An id never admitted during training maps cold (-1 → zero row).
  unseen = np.full((BATCH,), 10**15 + 3, np.int64)
  preds_unseen = served.predict({'uid': unseen, 'd0': d0, 'label': label})
  x = np.concatenate([np.zeros((BATCH, DIM), np.float32), d0[:, None]], 1)
  w = np.asarray(t.state.dense['w'])
  bb = float(np.asarray(t.state.dense['b']))
  want = 1.0 / (1.0 + np.exp(-(x @ w)[:, 0] - bb))
  np.testing.assert_allclose(preds_unseen, want, rtol=1e-4, atol=1e-5)


def test_poly_batch_export_serves_any_batch(tmp_path):
  """``poly_batch=True`` (round-5): one bundle with a symbolic leading
  dim serves multiple batch sizes — the reference SavedModel's
  dynamic-batch contract — for both the plain Trainer export and the
  SparseTrainer stacked path, ragged inputs included."""
  import jax
  import jax.numpy as jnp
  import optax

  from hybridbackend_tpu.embedding import TableConfig
  from hybridbackend_tpu.estimator import SparseTrainer
  from hybridbackend_tpu.models import (EmbeddingSpec,
                                        StackedFeatureExtractor)

  cfgs = [TableConfig('p0', 256, 8), TableConfig('p1', 128, 8)]
  fx = StackedFeatureExtractor([EmbeddingSpec(c) for c in cfgs],
                               dense_columns=['d0'])

  def mloss(net, emb_f, dense_f, batch):
    x = jnp.concatenate(emb_f + dense_f, axis=-1)
    p = jnp.clip(jax.nn.sigmoid((x @ net['w'])[:, 0]), 1e-6, 1 - 1e-6)
    y = batch['label']
    pel = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
    return jnp.mean(pel), {'preds': p, 'per_example_loss': pel}

  tr = SparseTrainer(fx, mloss, {'w': jnp.ones((17, 1), jnp.float32) * .1},
                     rng=jax.random.PRNGKey(0), model_dir=None)
  rng = np.random.RandomState(0)

  def mk(b):
    return {'p0': rng.randint(0, 256, b).astype(np.int32),
            'p1': rng.randint(0, 128, b).astype(np.int32),
            'd0': rng.rand(b).astype(np.float32),
            'label': rng.randint(0, 2, b).astype(np.float32)}

  tr.train(iter([mk(64)]), sync=False, prefetch=False)
  path = tr.export_saved_model(str(tmp_path / 'poly'), mk(64),
                               poly_batch=True)
  served = Served(path)
  assert served.signature['poly_batch'] is True
  for b in (16, 64, 100):
    out = served.predict(mk(b))
    assert out.shape == (b,)
    assert np.isfinite(out).all()
  # Exact parity with the trainer's own predictions at a NEW size.
  batch = mk(48)
  (want,) = list(tr.predict([batch], prefetch=False))
  got = served.predict(batch)
  np.testing.assert_allclose(got, want, atol=1e-5)
