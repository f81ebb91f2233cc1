"""Training-quality (AUC-convergence) parity of the fast path (r4 #4).

Step-level exactness is asserted elsewhere; this trains the exact
dense-update baseline and the FULL fast path (stream kernel + lane
packing + bucketed exchanges + bf16 wire + bf16 one-hot contracts) to
completion on a planted-nonlinear-signal CTR set and requires the final
eval AUCs to agree — including a run whose bucket/unique capacities are
set far below the realized occupancies so the exact overflow fallbacks
carry every step. Reference doctrine: tutorials train to reference AUC
(``/root/reference/docs/tutorial/ranking/taobao/train.py:36-160``).

On the 8-device CPU mesh the fast path exercises the real multi-chip
machinery (bucketed alltoall exchanges, bf16 wire, shard_map update
routing) with the stream kernel in interpret mode.
"""

import os
import sys

import numpy as np
import pytest

_BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'benchmarks')
sys.path.insert(0, _BENCH)

import auc_parity  # noqa: E402


@pytest.fixture(scope='module')
def ctr_files(tmp_path_factory):
  d = tmp_path_factory.mktemp('auc')
  train = str(d / 'train.parquet')
  ev = str(d / 'eval.parquet')
  auc_parity.synthesize(train, 16384, tables=4, vocab=2048, seed=11)
  auc_parity.synthesize(ev, 4096, tables=4, vocab=2048, seed=999)
  return train, ev


KW = dict(tables=4, vocab=2048, dim=8, batch=512, epochs=2, steps=None,
          table_lr=0.05, dense_lr=1e-3)
BAND = 0.01


@pytest.fixture(scope='module')
def exact_auc(ctr_files):
  train, ev = ctr_files
  auc, curve = auc_parity.run_variant('exact', train, ev, seed=0,
                                      options={}, **KW)
  assert curve[-1]['eval_auc'] >= curve[0]['eval_auc'] - 0.005
  assert auc > 0.55    # the planted signal is learnable
  return auc


def test_fast_path_auc_parity(ctr_files, exact_auc):
  train, ev = ctr_files
  auc, _ = auc_parity.run_variant('fast', train, ev, seed=0,
                                  options=auc_parity.FAST_OPTIONS, **KW)
  assert abs(auc - exact_auc) <= BAND, (auc, exact_auc)


def test_fast_path_with_overflow_fallbacks_firing(ctr_files, exact_auc):
  import hybridbackend_tpu as hb
  train, ev = ctr_files
  world = hb.Context.get().world_size
  fired, caps = auc_parity._overflow_expected(
      train, KW['tables'], KW['batch'], world,
      auc_parity.OVERFLOW_OPTIONS['emb_lookup_bucket_ratio'],
      auc_parity.OVERFLOW_OPTIONS['emb_update_bucket_ratio'])
  # The point of the variant: capacities are provably below occupancy.
  assert fired, caps
  auc, _ = auc_parity.run_variant(
      'fast_overflow', train, ev, seed=0,
      options=auc_parity.OVERFLOW_OPTIONS, **KW)
  assert abs(auc - exact_auc) <= BAND, (auc, exact_auc)
