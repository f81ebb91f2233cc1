"""Real-dataset schema compatibility (round-5 order #7): a hand-written
Criteo-format TSV fixture flows convert -> ParquetDataset -> sparse
train step. Reference data prep:
``/root/reference/docs/tutorial/ranking/criteo/data/prep.py`` (TSV with
label + 13 ints + 26 hex cats, empties allowed).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

_CONVERT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'examples', 'criteo', 'convert.py')
spec = importlib.util.spec_from_file_location('criteo_convert', _CONVERT)
criteo_convert = importlib.util.module_from_spec(spec)
spec.loader.exec_module(criteo_convert)

ROWS = 100
VOCAB = 1000


def _write_fixture(path: str) -> list:
  """100 Criteo-format TSV rows incl. empty ints and empty cats."""
  rng = np.random.RandomState(0)
  lines = []
  rows = []
  for r in range(ROWS):
    label = int(rng.rand() < 0.3)
    ints = []
    for i in range(13):
      if rng.rand() < 0.15:
        ints.append('')                       # missing integer feature
      else:
        ints.append(str(int(rng.randint(-2, 1000))))
    cats = []
    for c in range(26):
      if rng.rand() < 0.1:
        cats.append('')                       # missing categorical
      else:
        cats.append(f'{rng.randint(0, 1 << 32):08x}')
    lines.append('\t'.join([str(label)] + ints + cats))
    rows.append((label, ints, cats))
  with open(path, 'w') as f:
    f.write('\n'.join(lines) + '\n')
  return rows


def test_convert_schema_and_values(tmp_path):
  tsv = str(tmp_path / 'day_0.tsv')
  rows = _write_fixture(tsv)
  out = str(tmp_path / 'day_0.parquet')
  n = criteo_convert.convert(tsv, out, vocab=VOCAB)
  assert n == ROWS

  import pyarrow.parquet as pq
  tbl = pq.read_table(out)
  cols = set(tbl.column_names)
  assert cols == ({'label'} | {f'i{i}' for i in range(13)}
                  | {f'c{c}' for c in range(26)})
  df = tbl.to_pandas()
  assert df['label'].dtype == np.float32
  assert df['i0'].dtype == np.float32
  assert df['c0'].dtype == np.int32   # vocab fits int32
  # Value semantics: hex -> int(x,16) % vocab; empty -> -1; ints ->
  # log1p(max(x, 0)); labels exact.
  for r, (label, ints, cats) in enumerate(rows):
    assert df['label'][r] == float(label)
    for c in (0, 13, 25):
      want = -1 if cats[c] == '' else int(cats[c], 16) % VOCAB
      assert df[f'c{c}'][r] == want, (r, c)
    for i in (0, 7, 12):
      raw = 0.0 if ints[i] == '' else max(float(ints[i]), 0.0)
      np.testing.assert_allclose(df[f'i{i}'][r], np.log1p(raw),
                                 rtol=1e-6)
  assert (df[[f'c{c}' for c in range(26)]].to_numpy() < VOCAB).all()


def test_converted_file_trains(tmp_path):
  """convert -> ParquetDataset -> StackedFeatureExtractor sparse step:
  the full pipeline accepts the real-dataset schema (missing cats ride
  the -1 validity contract)."""
  tsv = str(tmp_path / 'day_0.tsv')
  _write_fixture(tsv)
  out = str(tmp_path / 'day_0.parquet')
  criteo_convert.convert(tsv, out, vocab=VOCAB)

  import jax
  import jax.numpy as jnp
  import optax

  import hybridbackend_tpu as hb
  from hybridbackend_tpu.data import ParquetDataset
  from hybridbackend_tpu.embedding import TableConfig
  from hybridbackend_tpu.models import (EmbeddingSpec,
                                        StackedFeatureExtractor,
                                        stacked_dcn_v2_init,
                                        stacked_dcn_v2_apply)
  from hybridbackend_tpu.training import (SparseTrainState,
                                          make_sparse_train_step)

  specs = [EmbeddingSpec(TableConfig(f'c{c}', VOCAB, 8))
           for c in range(26)]
  dense = [f'i{d}' for d in range(13)]
  fx = StackedFeatureExtractor(specs, dense_columns=dense)
  tables = fx.init(jax.random.PRNGKey(0))
  net = stacked_dcn_v2_init(jax.random.PRNGKey(1),
                            [8] * 26 + [1] * 13, [32, 16, 1])

  def model_loss(net_params, emb_f, dense_f, batch):
    preds = stacked_dcn_v2_apply(net_params, emb_f + dense_f)
    preds = jnp.clip(preds, 1e-6, 1 - 1e-6)
    y = batch['label']
    return -jnp.mean(y * jnp.log(preds) + (1 - y) * jnp.log(1 - preds)), {}

  state = SparseTrainState.create(net, tables, optax.adam(1e-3),
                                  adagrad_init=0.1)
  step = make_sparse_train_step(fx, model_loss, optax.adam(1e-3),
                                table_lr=0.1, donate_state=False)
  ds = ParquetDataset(out, batch_size=32, drop_remainder=True)
  n = 0
  for batch in ds:
    b = {k: jnp.asarray(np.asarray(v)) for k, v in batch.items()}
    state, m = step(state, b)
    assert np.isfinite(float(m['loss']))
    n += 1
  assert n == 3   # 100 rows / 32
