"""Canonical multi-process end-to-end flow (round-3 order #7).

The reference's canonical path is data partition → sharded embedding →
sync train → checkpoint in one multi-worker job
(``/root/reference/docs/tutorial/ranking/taobao/train.py:36-160`` +
``common/test.py:36-152`` Spawn). This test drives the whole chain
under the launcher: the native Parquet plane with
``partition_index/partition_count``, SyncReplicas training, a mid-train
checkpoint, process teardown, relaunch, and resume — final parameters
bit-equal to an uninterrupted run.
"""

import hashlib
import os
import subprocess
import sys

import numpy as np
import pytest

CHILD = """
import hashlib
import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

import hybridbackend_tpu as hb
from hybridbackend_tpu.data import ParquetDataset
from hybridbackend_tpu.embedding import TableConfig
from hybridbackend_tpu.estimator import SparseTrainer
from hybridbackend_tpu.models import EmbeddingSpec, StackedFeatureExtractor

ctx = hb.Context.get()
rank = jax.process_index()
phase = os.environ['HB_PHASE']          # full | part1 | part2
model_dir = os.environ['HB_MODEL_DIR']
data_dir = os.environ['HB_DATA_DIR']

files = sorted(os.path.join(data_dir, f) for f in os.listdir(data_dir)
               if f.endswith('.parquet'))

def batches():
    # Native data plane, partitioned by process (reference
    # dataset_v2.py:49-50 partition_count/partition_index).
    ds = ParquetDataset(files, batch_size=16, drop_remainder=True,
                        partition_index=rank, partition_count=2,
                        num_parallel_reads=1)
    it = iter(ds)
    if phase == 'part2':
        it = itertools.islice(it, 4, None)   # resume past 4 trained steps
    for b in it:
        yield {'cat': np.asarray(b['cat'], np.int32),
               'd0': np.asarray(b['d0'], np.float32),
               'label': np.asarray(b['label'], np.float32)}

specs = [EmbeddingSpec(TableConfig('cat', 256, 8))]
fx = StackedFeatureExtractor(specs, dense_columns=['d0'])

def model_loss(dense, emb_f, dense_f, batch):
    x = jnp.concatenate(emb_f + dense_f, axis=-1)
    logits = (x @ dense['w'])[:, 0] + dense['b']
    preds = jax.nn.sigmoid(logits)
    p = jnp.clip(preds, 1e-6, 1 - 1e-6)
    y = batch['label']
    pel = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
    return jnp.mean(pel), {'preds': preds, 'per_example_loss': pel}

dense = {'w': jnp.zeros((9, 1), jnp.float32), 'b': jnp.zeros((), jnp.float32)}
tr = SparseTrainer(fx, model_loss, dense, dense_optimizer=optax.adam(1e-2),
                   table_lr=0.1, rng=jax.random.PRNGKey(0),
                   model_dir=model_dir)

if phase == 'part1':
    assert tr.global_step == 0
    tr.train(batches(), max_steps=4)
    assert tr.global_step == 4
    with open(os.path.join(model_dir, f'part1_{rank}.done'), 'w') as f:
        f.write('ok')
    print('PART1_DONE rank', rank)
else:
    if phase == 'part2':
        assert tr.global_step == 4, tr.global_step  # restored mid-train ckpt
    tr.train(batches())
    # Digest of this rank's view: dense params + its addressable table
    # shards in device order. Deterministic across identical runs.
    h = hashlib.md5()
    for leaf in jax.tree_util.tree_leaves(tr.state.dense):
        h.update(np.asarray(leaf).tobytes())
    for name in sorted(tr.state.tables):
        t = tr.state.tables[name]
        for s in sorted(t.addressable_shards, key=lambda s: s.device.id):
            h.update(np.asarray(s.data).tobytes())
        for acc in tr.state.table_opt[name].acc:
            for s in sorted(acc.addressable_shards, key=lambda s: s.device.id):
                h.update(np.asarray(s.data).tobytes())
    # Per-rank result FILE is the source of truth: the shared stdout
    # pipe has twice (r2, r3) lost/corrupted lines under full-suite
    # load (see benchmarks/stress_e2e_launch.py) and transport
    # integrity is not what this test proves.
    with open(os.path.join(model_dir, f'final_{rank}.txt'), 'w') as f:
        f.write(f'{rank} {tr.global_step} {h.hexdigest()}')
    print('FINAL', rank, tr.global_step, h.hexdigest())
"""


def _write_data(data_dir):
  import pandas as pd
  rng = np.random.RandomState(42)
  os.makedirs(data_dir, exist_ok=True)
  for i in range(4):
    n = 64
    cat = rng.randint(0, 256, n).astype(np.int64)
    d0 = rng.rand(n).astype(np.float32)
    label = ((cat % 3 == 0) | (d0 > 0.8)).astype(np.float32)
    pd.DataFrame({'cat': cat, 'd0': d0, 'label': label}).to_parquet(
        os.path.join(data_dir, f'part-{i}.parquet'))


def _launch(script, env_extra, tmp_path, timeout=420):
  env = dict(os.environ)
  env.pop('XLA_FLAGS', None)
  env['HB_RUN_FAULT_TIMEOUT'] = '300'
  env.update(env_extra)
  cmd = [sys.executable, '-m', 'hybridbackend_tpu.run',
         '--simulate', '2', '--devices-per-process', '2', str(script)]
  cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=timeout, cwd=cwd)
  assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-3000:])
  # Tuck the stderr tail onto the string so assertion messages carry it
  # (FINAL parsing uses MULTILINE ^...$ anchors; stderr can't collide).
  return out.stdout + '\n<stderr>\n' + out.stderr[-3000:]


def _digests(model_dir, stdout):
  """Per-rank result files are the source of truth (the shared stdout
  pipe has lost lines under full-suite load — twice); stdout is kept in
  the return path only for assertion context."""
  import re
  import time
  out = {}
  for rank in (0, 1):
    p = os.path.join(model_dir, f'final_{rank}.txt')
    if os.path.exists(p):
      with open(p) as f:
        r, s, d = f.read().split()
      out[int(r)] = (int(s), d)
  # Transport-anomaly telemetry: children completed (files present) but
  # their FINAL lines are missing from the captured stdout — preserve
  # the evidence for root-causing (seen only inside full-suite runs).
  lines = re.findall(r'^FINAL \d+ \d+ [0-9a-f]+$', stdout, re.MULTILINE)
  if len(out) == 2 and len(lines) < 2:
    path = f'/tmp/e2e_stdout_anomaly_{int(time.time())}.txt'
    with open(path, 'w') as f:
      f.write(stdout)
    sys.stderr.write(f'[e2e] stdout transport anomaly: {len(lines)}/2 '
                     f'FINAL lines in captured output; saved {path}\n')
  return out


@pytest.mark.timeout(1500)
def test_partition_train_checkpoint_resume(tmp_path):
  data_dir = str(tmp_path / 'data')
  _write_data(data_dir)
  script = tmp_path / 'e2e.py'
  script.write_text(CHILD)

  # Uninterrupted baseline: 8 global steps straight through.
  full_dir = str(tmp_path / 'full')
  out_full = _launch(script, {
      'HB_PHASE': 'full', 'HB_DATA_DIR': data_dir,
      'HB_MODEL_DIR': full_dir}, tmp_path)
  full = _digests(full_dir, out_full)
  assert set(full) == {0, 1} and all(s == 8 for s, _ in full.values()), (
      full, out_full[-3000:])

  # Interrupted: 4 steps, checkpoint, processes exit...
  resume_dir = str(tmp_path / 'resume')
  out1 = _launch(script, {
      'HB_PHASE': 'part1', 'HB_DATA_DIR': data_dir,
      'HB_MODEL_DIR': resume_dir}, tmp_path)
  assert all(os.path.exists(os.path.join(resume_dir, f'part1_{r}.done'))
             for r in (0, 1)), out1[-3000:]

  # ...fresh relaunch restores step 4 and finishes the data.
  resumed = _digests(resume_dir, _launch(script, {
      'HB_PHASE': 'part2', 'HB_DATA_DIR': data_dir,
      'HB_MODEL_DIR': resume_dir}, tmp_path))
  assert set(resumed) == {0, 1}, resumed
  assert all(s == 8 for s, _ in resumed.values()), resumed

  # Bit-equal final state, per rank.
  assert resumed[0][1] == full[0][1]
  assert resumed[1][1] == full[1][1]
