#!/bin/bash
# Round-4 session-2: per-cell multi-object capacity (n_object_slots=2) on
# cluttered scenes — the model-level lever against the extreme-overlap
# MERGE failure mode (VERDICT #6). The fine grid only moved the 5+-pair
# stratum 0.584 -> 0.600 because two digit CENTERS can share one cell at
# any pitch; S=2 gives the shared cell two independent
# (box, attr, depth, pres) tuples (reference contrast: one tuple per cell
# is structural, models.py:68 / modules.py:68-105).
#
# Arm (training, ~1.5-2 h):
#   python -m spair_pytorch_tpu.train --preset cluttered --box-prior free \
#     --render-mode ordered --slots 2 --pres-gate 0.01 --render-topk 32 \
#     --steps 100000 --steps-per-call 25 --eval-every 10000 \
#     --eval-batches 8 --calibrate-at-end --logdir runs/r4_slots2 --no-resume
# Baselines to beat (benchmarks/RESULTS.md):
#   11x11 S=1 (r3b):       calibrated 0.826, 5+-overlap stratum 0.584
#   16x16 S=1 (fine, r4):  calibrated 0.840, 5+-overlap stratum 0.600
# Success bar (VERDICT #6): 5+-overlap exact acc > 0.634, else a
# documented negative with mechanism.
set -x
date
# pooled 1,024-scene eval + analysis figure
python -m spair_pytorch_tpu.eval --logdir runs/r4_slots2 \
  --batches 32 --figure docs/analysis_r4_slots2.png
# failure-mode stratification at the stored calibrated operating point
python benchmarks/cluttered_failure_modes.py \
  --logdir runs/r4_slots2 --scenes 1024
date
