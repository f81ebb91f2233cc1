"""Load-repro for the intermittent e2e launcher FINAL-line loss.

Observed twice (round 2, round 3) ONLY inside the full suite: the
2-process `--simulate` launch of the e2e resume 'full' phase returns
rc=0 but its captured stdout carries no `FINAL <rank> <step> <digest>`
lines. Standalone runs pass. This harness reproduces the conditions:
it launches the same child in a loop while a CPU burner saturates the
core, and preserves stdout/stderr of any anomalous iteration.

Usage:  python benchmarks/stress_e2e_launch.py [iters] [--no-burner]
"""

import multiprocessing
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))


def _burn():
  x = 1.0
  while True:
    x = x * 1.0000001 % 1e9


def main():
  iters = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
      else 30
  burn = '--no-burner' not in sys.argv
  from test_e2e_resume import CHILD, _write_data

  burners = []
  if burn:
    for _ in range(2):
      p = multiprocessing.Process(target=_burn, daemon=True)
      p.start()
      burners.append(p)

  bad = 0
  try:
    with tempfile.TemporaryDirectory() as tmp:
      data_dir = os.path.join(tmp, 'data')
      _write_data(data_dir)
      script = os.path.join(tmp, 'e2e.py')
      with open(script, 'w') as f:
        f.write(CHILD)
      for i in range(iters):
        env = dict(os.environ)
        env.pop('XLA_FLAGS', None)
        env.update({'HB_RUN_FAULT_TIMEOUT': '300',
                    'HB_PHASE': 'full', 'HB_DATA_DIR': data_dir,
                    'HB_MODEL_DIR': os.path.join(tmp, f'm{i}')})
        out = subprocess.run(
            [sys.executable, '-m', 'hybridbackend_tpu.run',
             '--simulate', '2', '--devices-per-process', '2', script],
            env=env, capture_output=True, text=True, timeout=420,
            cwd=REPO)
        finals = re.findall(r'^FINAL (\d+) (\d+) ([0-9a-f]+)$',
                            out.stdout, re.MULTILINE)
        # The children also write per-rank result files — distinguishes
        # "children never finished" from "stdout transport lost lines".
        files = sum(os.path.exists(os.path.join(env['HB_MODEL_DIR'],
                                                f'final_{r}.txt'))
                    for r in (0, 1))
        ok = out.returncode == 0 and len(finals) == 2 and files == 2
        print(f'iter {i}: rc={out.returncode} finals={len(finals)} '
              f'files={files}{" OK" if ok else "  <-- ANOMALY"}',
              flush=True)
        if not ok:
          bad += 1
          keep = f'/tmp/e2e_anomaly_{i}'
          with open(keep + '.out', 'w') as f:
            f.write(out.stdout)
          with open(keep + '.err', 'w') as f:
            f.write(out.stderr)
          print(f'  saved {keep}.out/.err', flush=True)
  finally:
    for p in burners:
      p.terminate()
  print(f'done: {bad}/{iters} anomalous', flush=True)
  sys.exit(1 if bad else 0)


if __name__ == '__main__':
  main()
