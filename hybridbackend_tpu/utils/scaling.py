"""Analytic multi-chip scaling model for the hybrid-parallel step.

BASELINE.json's north-star claim (">85% host-scaling efficiency")
cannot be measured in this environment (one chip). This module makes
the claim MODEL-BACKED instead of asserted (round-4 verdict order #5):
it combines

  1. the HLO-pinned per-device wire-byte formulas of the sharding
     planner (:mod:`hybridbackend_tpu.embedding.planner`, calibrated to
     <0.1% residual on the modeled terms by
     ``tests/test_planner_calibration.py``),
  2. measured single-chip phase times (docs/benchmarks.md: flagship
     7.19 ms/step exact at local batch 8192, of which the update phase
     is ~4.07 ms and everything else ~3.12 ms), and
  3. stated interconnect constants (below),

into predicted examples/s and scaling efficiency at W chips, strong and
weak scaling. ``tests/test_scaling_model.py`` asserts the model's
wire-byte input against compiled HLO on the 8-device mesh, so the one
non-measurable link in the chain is the bandwidth/latency constants —
which are printed with every table.

Interconnect constants (stated assumptions, v5e public figures; the
scaling-book mental model — pick a mesh, count bytes over links):

  * ICI: 45 GB/s per link per direction; a 2D-torus chip has 4 links
    but an all-to-all is bisection-limited — the model charges egress
    at 2 usable links = 90 GB/s per chip (conservative).
  * DCN: ~25 GB/s per 8-chip host NIC = ~3.1 GB/s per chip.
  * Latency floor: ~1 us per collective phase; the bucketed exchange
    compiles to ~8 phases (sizes + ids + payload + reverse, each way).

Reference analogue: the topology doctrine of the NCCL layer
(``/root/reference/hybridbackend/tensorflow/distribute/collective.h:52-112``)
and the hierarchical exchange (``embedding/sharding.py:207-278``) exist
for exactly this wire-byte arithmetic.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict, List, Optional

ICI_BW = 90e9        # B/s per chip usable for alltoall egress
DCN_BW = 3.1e9       # B/s per chip across slices
HOP_S = 1e-6         # latency per collective phase
N_HOPS = 8           # phases of the bucketed alltoall exchange

# Measured single-chip flagship phases (docs/benchmarks.md, round 4,
# one v5e chip, exact contracts): full 7.19 ms at local batch 8192;
# update phase ~4.07 ms = max(table stream ~2.3, one-hot scatter ~3.4)
# + eps; the rest (lookup + fwd/bwd + dense Adam) ~3.12 ms.
FLAGSHIP = dict(name='flagship-dcnv2', vocab=26 * 100_000, dim=16,
                local_examples=8192, local_flat_ids=26 * 8192,
                step_ms=7.19, update_ms=4.07, stream_ms=2.3)
PRODUCTION = dict(name='production-2x2M', vocab=2 * (1 << 21), dim=64,
                  local_examples=8192, local_flat_ids=2 * 8192,
                  step_ms=7.58, update_ms=4.2, stream_ms=3.3)

# Strong-scaling per-step fixed floor (ASSUMPTION, stated in every
# table): kernel grid-iteration fixed costs + dispatch — the update
# stream's ~163 block iterations at ~3.4 us plus host dispatch — do not
# shrink with the local batch. ~1.6 ms at the flagship shape.
FIXED_MS = 1.6


@dataclasses.dataclass
class ScalingPoint:
  world: int
  mode: str                   # 'weak' | 'strong'
  wire_bytes_per_dev: int     # per device per step (model input)
  comm_ms: float
  compute_ms: float
  step_ms: float
  examples_per_s: float
  efficiency: float           # vs ideal scaling of the 1-chip number
  fabric: str                 # 'ici' | 'ici+dcn'


def exchange_bytes_per_device(vocab: int, dim: int,
                              global_flat_ids: int, world: int,
                              slack: float = 2.0) -> int:
  """Per-device wire bytes of one step's bucketed-alltoall exchange
  (lookup fwd + cotangent + one-way update return) — the planner's
  HLO-pinned formula, reused verbatim."""
  from hybridbackend_tpu.embedding.planner import _cost_row_alltoall
  return _cost_row_alltoall(vocab, dim, global_flat_ids, world,
                            1.0, slack)[1]


def predict(shape: Dict, world: int, mode: str = 'weak',
            wire_bytes_per_elem: int = 4,
            dcn_fraction: float = 0.0,
            overlap: float = 0.0,
            fixed_ms: float = FIXED_MS) -> ScalingPoint:
  """Predict one (shape, W) point.

  mode='weak': local batch fixed (global grows with W) — per-device
    compute ~constant; the table stream shrinks ~1/W (sharded tables)
    but the model keeps the measured single-chip update time
    (conservative).
  mode='strong': GLOBAL batch fixed at the single-chip local batch —
    per-device compute = fixed + (step - fixed)/W.
  dcn_fraction: fraction of exchange bytes that cross DCN (0 while the
    job fits one ICI domain; with the hierarchical strategy across S
    slices, ~(S-1)/S of the SECOND hop's bytes).
  overlap: fraction of comm hidden under compute (0 = fully exposed,
    conservative default).
  """
  if mode == 'weak':
    global_flat = shape['local_flat_ids'] * world
    local_examples = shape['local_examples']
    compute_ms = shape['step_ms']
    base_rate = shape['local_examples'] / (shape['step_ms'] / 1e3)
    ideal = base_rate * world
  else:
    global_flat = shape['local_flat_ids']
    local_examples = shape['local_examples'] / world
    compute_ms = fixed_ms + (shape['step_ms'] - fixed_ms) / world
    base_rate = shape['local_examples'] / (shape['step_ms'] / 1e3)
    ideal = base_rate * world
  if world <= 1:
    wire = 0
    comm_ms = 0.0
  else:
    wire = exchange_bytes_per_device(shape['vocab'], shape['dim'],
                                     int(global_flat), world)
    wire = int(wire * wire_bytes_per_elem / 4)
    ici_bytes = wire * (1.0 - dcn_fraction)
    dcn_bytes = wire * dcn_fraction
    comm_s = (ici_bytes / ICI_BW + dcn_bytes / DCN_BW
              + N_HOPS * HOP_S)
    comm_ms = 1e3 * comm_s * (1.0 - overlap)
  step_ms = compute_ms + comm_ms
  rate = world * local_examples / (step_ms / 1e3)
  return ScalingPoint(
      world=world, mode=mode, wire_bytes_per_dev=wire,
      comm_ms=round(comm_ms, 3), compute_ms=round(compute_ms, 3),
      step_ms=round(step_ms, 3), examples_per_s=round(rate, 0),
      efficiency=round(rate / ideal, 4),
      fabric='ici+dcn' if dcn_fraction > 0 else 'ici')


def table(shape: Dict, worlds=(8, 64, 256), mode='weak',
          **kw) -> List[ScalingPoint]:
  return [predict(shape, w, mode, **kw) for w in worlds]


def main():
  rows = []
  for shape in (FLAGSHIP, PRODUCTION):
    for mode in ('weak', 'strong'):
      for pt in table(shape, mode=mode):
        rows.append({'shape': shape['name'], **dataclasses.asdict(pt)})
    # DCN-crossing variant: 256 chips as 2x128 slices, hierarchical
    # exchange — hop-1 (cross-slice) carries ~1/2 of the bytes.
    pt = predict(shape, 256, 'weak', dcn_fraction=0.5)
    rows.append({'shape': shape['name'] + ' (2x128 slices)',
                 **dataclasses.asdict(pt)})
    # bf16 wire halves every payload.
    pt = predict(shape, 256, 'weak', wire_bytes_per_elem=2)
    rows.append({'shape': shape['name'] + ' (bf16 wire)',
                 **dataclasses.asdict(pt)})
    # Recommended cross-slice config: hierarchical keeps the big hop on
    # ICI (cross-slice hop carries ~f(S)/(f(S)+f(ici)) ~ 1/3 of the
    # bytes at S=2) + bf16 wire.
    pt = predict(shape, 256, 'weak', wire_bytes_per_elem=2,
                 dcn_fraction=0.34)
    rows.append({'shape': shape['name'] + ' (2x128, hier+bf16)',
                 **dataclasses.asdict(pt)})
  print(json.dumps(rows, indent=1))


if __name__ == '__main__':
  main()


__all__ = ['predict', 'table', 'exchange_bytes_per_device',
           'ScalingPoint', 'FLAGSHIP', 'PRODUCTION']
