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
