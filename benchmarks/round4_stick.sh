#!/bin/bash
# Round-4 session-4: stick-breaking slot coupling A/B — the counter to the
# measured independent-S=2 mixture collapse (RESULTS.md "n_object_slots=2":
# slot share 0.5%/99.5%, 2-GT-center cells resolved 3%, calibrated overall
# 0.785 vs 0.826 S=1 baseline).
#
# Arm (training, ~66 min):
#   python -m spair_pytorch_tpu.train --preset cluttered --box-prior free \
#     --render-mode ordered --slots 2 --slot-coupling stick \
#     --pres-gate 0.01 --render-topk 32 --steps 100000 --steps-per-call 25 \
#     --eval-every 10000 --eval-batches 8 --calibrate-at-end \
#     --logdir runs/r4_slots2_stick --no-resume
# Baselines (benchmarks/RESULTS.md):
#   11x11 S=1 (r3b):            calibrated 0.826, 5+-overlap 0.584
#   16x16 S=1 (fine, r4):       calibrated 0.840, 5+-overlap 0.600
#   11x11 S=2 independent (r4): calibrated 0.785, 5+-overlap 0.576 (FAILED)
# Success bar (VERDICT #6): 5+-overlap exact acc > 0.634; mechanism probe
# must show slot-1 share >> 0.5% for the coupling to have done its job.
set -x
date
# pooled 1,024-scene eval + analysis figure
python -m spair_pytorch_tpu.eval --logdir runs/r4_slots2_stick \
  --batches 32 --figure docs/analysis_r4_slots2_stick.png
# failure-mode stratification at the stored calibrated operating point
python benchmarks/cluttered_failure_modes.py \
  --logdir runs/r4_slots2_stick --scenes 1024
# mechanism: slot usage at the calibrated operating point
python benchmarks/slot_usage_probe.py --logdir runs/r4_slots2_stick \
  --scenes 512
date
