"""Multi-process launcher: the reference's Spawn-style coverage.

The reference tests collectives by forking N single-GPU processes
(``/root/reference/hybridbackend/common/test.py:36-152``). Here the
launcher's ``--simulate N`` does the same with N jax.distributed CPU
processes; this test runs a real child script that psums across the
process boundary.
"""

import os
import subprocess
import sys
import tempfile

import pytest

SCRIPT = """
import jax
import jax.numpy as jnp
import numpy as np
import hybridbackend_tpu as hb

ctx = hb.Context.get()
assert jax.process_count() == 2, jax.process_count()
assert ctx.world_size == 4, ctx.world_size  # 2 procs x 2 devices
from jax.experimental.multihost_utils import process_allgather
got = process_allgather(np.asarray([jax.process_index()]))
assert sorted(got.ravel().tolist()) == [0, 1], got
# A real cross-process collective through the context mesh.
x = jax.device_put(jnp.ones((8,)), ctx.batch_sharding)
total = float(hb.distribute.allreduce(x).addressable_shards[0].data.sum())
assert total > 0
print('CHILD_OK rank', jax.process_index())
"""


@pytest.mark.timeout(300)
def test_simulate_two_processes(tmp_path):
  script = tmp_path / 'child.py'
  script.write_text(SCRIPT)
  env = dict(os.environ)
  env.pop('XLA_FLAGS', None)  # launcher sets its own device count
  out = subprocess.run(
      [sys.executable, '-m', 'hybridbackend_tpu.run',
       '--simulate', '2', '--devices-per-process', '2', str(script)],
      env=env, capture_output=True, text=True, timeout=280,
      cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
  assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
  assert out.stdout.count('CHILD_OK') == 2, out.stdout


@pytest.mark.timeout(300)
def test_failing_child_kills_peers(tmp_path):
  script = tmp_path / 'bad.py'
  script.write_text(
      'import os, sys, time\n'
      'if os.environ["HB_RUN_PROCESS_ID"] == "1":\n'
      '    sys.exit(3)\n'
      'time.sleep(120)\n')
  env = dict(os.environ)
  out = subprocess.run(
      [sys.executable, '-m', 'hybridbackend_tpu.run',
       '--simulate', '2', '--no-distributed', str(script)],
      env=env, capture_output=True, text=True, timeout=120,
      cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
  assert out.returncode == 3, (out.returncode, out.stderr[-500:])


SPARSE_TRAIN_SCRIPT = """
import jax
import jax.numpy as jnp
import numpy as np
import optax
import hybridbackend_tpu as hb
from hybridbackend_tpu.embedding import TableConfig
from hybridbackend_tpu.models import (EmbeddingSpec, StackedFeatureExtractor,
                                      stacked_dcn_v2_apply,
                                      stacked_dcn_v2_init)
from hybridbackend_tpu.training import (SparseTrainState,
                                        make_sparse_train_step)

ctx = hb.Context.get()
assert jax.process_count() == 2
assert ctx.world_size == 4
specs = [EmbeddingSpec(TableConfig('c0', 256, 8))]
fx = StackedFeatureExtractor(specs, dense_columns=['d0'])
kt, kn = jax.random.split(jax.random.PRNGKey(0))
tables = fx.init(kt)
# The stacked table must span all 4 devices across both processes.
assert len(tables[fx.stacks[0].stacked.name].sharding.device_set) == 4

def model_loss(dense, emb_f, dense_f, batch):
    p = jnp.clip(stacked_dcn_v2_apply(dense, emb_f + dense_f), 1e-6, 1-1e-6)
    y = batch['label']
    return -jnp.mean(y*jnp.log(p) + (1-y)*jnp.log(1-p)), {}

state = SparseTrainState.create(
    stacked_dcn_v2_init(kn, [8, 1], [16, 1]), tables, optax.adam(3e-3))
step = make_sparse_train_step(fx, model_loss, optax.adam(3e-3),
                              table_lr=0.1)
rng = np.random.RandomState(jax.process_index())
losses = []
for i in range(40):
    # per-process local shard of the global batch
    c0 = rng.randint(0, 256, 32)
    local = {'c0': np.asarray(c0, np.int32),
             'd0': rng.rand(32).astype(np.float32),
             'label': (c0 % 3 == 0).astype(np.float32)}
    batch = {k: jax.make_array_from_process_local_data(
                 ctx.batch_sharding, v) for k, v in local.items()}
    state, m = step(state, batch)
    losses.append(float(m['loss']))
assert losses[-1] < losses[0], (losses[0], losses[-1])
print('CHILD_TRAIN_OK rank', jax.process_index(),
      round(losses[0], 4), '->', round(losses[-1], 4))
"""


@pytest.mark.timeout(600)
def test_multiprocess_sparse_training(tmp_path):
  """Cross-process hybrid-parallel training: sharded tables span both
  processes; lookups and updates exchange over jax.distributed."""
  script = tmp_path / 'train2p.py'
  script.write_text(SPARSE_TRAIN_SCRIPT)
  env = dict(os.environ)
  env.pop('XLA_FLAGS', None)
  out = subprocess.run(
      [sys.executable, '-m', 'hybridbackend_tpu.run',
       '--simulate', '2', '--devices-per-process', '2', str(script)],
      env=env, capture_output=True, text=True, timeout=580,
      cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
  assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-3000:])
  assert out.stdout.count('CHILD_TRAIN_OK') == 2, out.stdout


EVAL_EXACT_SCRIPT = """
import jax
import jax.numpy as jnp
import numpy as np
import hybridbackend_tpu as hb
import hybridbackend_tpu.metrics as hbm
from hybridbackend_tpu.estimator import Trainer

ctx = hb.Context.get()
assert jax.process_count() == 2
rank = jax.process_index()

# Deterministic uneven partitions: p0 has 3 full batches of 8; p1 has one
# full batch, one PARTIAL batch of 5, then is exhausted (2 steps early in
# row terms). Every process can reconstruct the full dataset.
def proc_batches(p):
    rng = np.random.RandomState(100 + p)
    n = 24 if p == 0 else 13
    x = rng.rand(n, 4).astype(np.float32)
    y = (x.sum(1) > 2.0).astype(np.float32)
    g = (x[:, 0] * 4).astype(np.int64)  # group ids incl. 0 (sentinel check)
    return x, y, g

def batches_iter(p):
    x, y, g = proc_batches(p)
    for i in range(0, len(x), 8):
        yield {'x': x[i:i+8], 'label': y[i:i+8], 'g': g[i:i+8]}

w = jnp.asarray([0.9, -0.4, 0.3, 0.7], jnp.float32)

def loss_fn(params, batch):
    logits = batch['x'] @ params
    preds = jax.nn.sigmoid(logits)
    p = jnp.clip(preds, 1e-6, 1 - 1e-6)
    y = batch['label']
    pel = -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p))
    return jnp.mean(pel), {'preds': preds, 'per_example_loss': pel}

trainer = Trainer(loss_fn, w, label_key='label', group_key='g')
got = trainer.evaluate(batches_iter(rank))

# Single-host reference over the concatenated data (no sync, no padding).
x0, y0, g0 = proc_batches(0)
x1, y1, g1 = proc_batches(1)
X = jnp.asarray(np.concatenate([x0, x1]))
Y = jnp.asarray(np.concatenate([y0, y1]))
G = jnp.asarray(np.concatenate([g0, g1]))
P = jax.nn.sigmoid(X @ w)
ref_auc = float(hbm.auc_result(hbm.auc_update(hbm.auc_init(), Y, P)))
pc = jnp.clip(P, 1e-6, 1 - 1e-6)
pel = -(Y * jnp.log(pc) + (1 - Y) * jnp.log(1 - pc))
ref_loss = float(jnp.mean(pel))
# GAUC is a batch-wise metric (groups split at batch boundaries, like the
# reference gauc.cc) — accumulate it over the REAL rows of each global
# step batch: step i sees p0[8i:8i+8] then p1[8i:8i+8] in device order.
gauc_s = hbm.gauc_init()
for i in range(3):
    rows = [np.arange(8 * i, min(8 * (i + 1), 24)),
            24 + np.arange(8 * i, min(8 * (i + 1), 13))]
    sel = np.concatenate([r for r in rows if len(r)])
    gauc_s = hbm.gauc_update(gauc_s, Y[sel], P[sel], G[sel],
                             sort_groups=True)
ref_gauc = float(hbm.gauc_result(gauc_s))

assert abs(got['auc'] - ref_auc) < 1e-5, (got['auc'], ref_auc)
assert abs(got['loss'] - ref_loss) < 1e-5, (got['loss'], ref_loss)
assert abs(got['gauc'] - ref_gauc) < 1e-5, (got['gauc'], ref_gauc)
print('CHILD_EVAL_OK rank', rank, round(got['auc'], 6), round(ref_auc, 6))
"""


@pytest.mark.timeout(600)
def test_multiprocess_eval_exact_uneven_tail(tmp_path):
  """SURVEY hard-part #6: one of two hosts exhausts early (and its last
  batch is partial); global eval AUC/loss/GAUC must equal a single-host
  pass over the concatenated data. Exercises SyncReplicas pad+weights,
  the _sync_valid metric plumbing, and the GAUC padding sentinel."""
  script = tmp_path / 'eval2p.py'
  script.write_text(EVAL_EXACT_SCRIPT)
  env = dict(os.environ)
  env.pop('XLA_FLAGS', None)
  # If a child ever wedges, it dumps all thread stacks and exits instead
  # of hanging the suite (round-2 wedge was producer-thread device_put
  # racing consumer collectives; device ops are single-threaded in
  # multi-process mode now — see data/prefetch.py).
  env['HB_RUN_FAULT_TIMEOUT'] = '300'
  cmd = [sys.executable, '-m', 'hybridbackend_tpu.run',
         '--simulate', '2', '--devices-per-process', '2', str(script)]
  cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=420, cwd=cwd)
  assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-3000:])
  assert out.stdout.count('CHILD_EVAL_OK') == 2, out.stdout
