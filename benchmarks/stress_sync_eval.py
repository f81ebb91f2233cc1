"""Liveness stress for the multi-process SyncReplicas eval flow.

Round-2 observed a rare wedge of the 2-process eval launcher flow when
the host was loaded (never standalone). Round 3 made device access
single-threaded per process in multi-process mode (data/prefetch.py) and
gave the KV exchange cancellation + lagging-rank errors (data/sync.py).
This harness proves the fix: run the full eval flow N times back to
back (ideally while other work loads the box); any wedge self-reports
thread stacks via HB_RUN_FAULT_TIMEOUT and fails the run.

Usage: python benchmarks/stress_sync_eval.py [iterations]
"""

import os
import subprocess
import sys
import tempfile
import time

CHILD = """
import jax
import jax.numpy as jnp
import numpy as np
import hybridbackend_tpu as hb
import hybridbackend_tpu.metrics as hbm
from hybridbackend_tpu.estimator import Trainer

ctx = hb.Context.get()
rank = jax.process_index()

def proc_batches(p):
    rng = np.random.RandomState(100 + p)
    n = 24 if p == 0 else 13
    x = rng.rand(n, 4).astype(np.float32)
    y = (x.sum(1) > 2.0).astype(np.float32)
    g = (x[:, 0] * 4).astype(np.int64)
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
# Two consecutive evals per process: exercises iterator construction,
# finalize-barrier GC, and sid reuse across iterators.
for _ in range(2):
    got = trainer.evaluate(batches_iter(rank))
    assert 0.0 < got['auc'] <= 1.0, got
print('STRESS_OK rank', rank)
"""


def main():
  iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  with tempfile.TemporaryDirectory() as td:
    child = os.path.join(td, 'stress_child.py')
    with open(child, 'w') as f:
      f.write(CHILD)
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    # Generous on loaded 1-core boxes: compiles under contention are
    # slow; the dump distinguishes a true wedge from slow progress.
    env['HB_RUN_FAULT_TIMEOUT'] = '420'
    cmd = [sys.executable, '-m', 'hybridbackend_tpu.run',
           '--simulate', '2', '--devices-per-process', '2', child]
    times = []
    for i in range(iters):
      t0 = time.time()
      try:
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=480, cwd=repo)
      except subprocess.TimeoutExpired as e:
        print(f'ITER {i}: TIMEOUT (launcher-level)')
        print('stdout:', (e.stdout or b'')[-4000:])
        print('stderr:', (e.stderr or b'')[-4000:])
        sys.exit(1)
      dt = time.time() - t0
      times.append(dt)
      if out.returncode != 0 or out.stdout.count('STRESS_OK') != 2:
        print(f'ITER {i}: FAILED rc={out.returncode}')
        print('stdout:', out.stdout[-4000:])
        print('stderr:', out.stderr[-4000:])
        sys.exit(1)
      print(f'ITER {i}: ok {dt:.1f}s', flush=True)
    print(f'ALL {iters} CLEAN; median '
          f'{sorted(times)[len(times) // 2]:.1f}s')


if __name__ == '__main__':
  main()
