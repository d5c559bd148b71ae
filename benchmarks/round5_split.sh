#!/bin/bash
# Round-5: split-refinement measurement pipeline (models/refine.py) — the
# inference-time lever on the 5+-overlap merge failure, after every
# training-time lever measured negative (RESULTS.md "slots closure").
#
# Prerequisite (training arm, ~30 min on the chip, ~1.6k img/s):
#   python -u -m spair_pytorch_tpu.train --preset cluttered --box-prior free \
#     --render-mode ordered --pres-gate 0.01 --render-topk 32 \
#     --steps 100000 --steps-per-call 25 --eval-every 10000 --eval-batches 8 \
#     --calibrate-at-end --logdir runs/r5_cluttered_s1 --no-resume
# (Re-trains the S=1 baseline the round-3/4 tables quote — checkpoints do
#  not survive sessions; calibrated numbers should land near 0.826/0.584.)
#
# Baselines to beat (benchmarks/RESULTS.md):
#   11x11 S=1 (r3b):  calibrated 0.826, 5+-overlap 0.584
#   16x16 fine:       calibrated 0.840, 5+-overlap 0.600
#   11x11 S=2 stick:  calibrated 0.850, 5+-overlap 0.616
# Success bar (round-4 VERDICT #6): 5+-overlap exact acc > 0.634 without
# hurting the other strata / overall.
set -x
date
# sanity: pooled eval at the stored calibrated operating point
python -m spair_pytorch_tpu.eval --logdir runs/r5_cluttered_s1 \
  --batches 32 --figure docs/analysis_r5_cluttered_s1.png
# reproduce the stratified baseline for THIS checkpoint (refine OFF)
python benchmarks/cluttered_failure_modes.py \
  --logdir runs/r5_cluttered_s1 --scenes 1024
# split refinement: margin/gate calibration (held-out seed 4321) +
# stratified ON/OFF A/B on the failure-modes stream (seed 7)
python benchmarks/split_refine_probe.py --logdir runs/r5_cluttered_s1 \
  --calib-scenes 1024 --scenes 2048
date
