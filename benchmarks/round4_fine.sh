#!/bin/bash
# Round-3 session-5: fine-grid merge experiment (docs/NEXT.md #1) +
# ordered-mode top-K measurement + batched-NMS serving cost.
#
# Arm A (this script assumes it already ran):
#   python -m spair_pytorch_tpu.train --preset cluttered_fine \
#     --box-prior free --render-mode ordered --steps 100000 \
#     --steps-per-call 25 --eval-every 10000 --eval-batches 8 \
#     --calibrate-at-end --logdir runs/r4_cluttered_fine --no-resume
# Baseline to beat (reference-grid cluttered, recorded in RESULTS.md):
#   calibrated det count acc 0.826-0.828, 5+-overlap stratum 0.584.
set -x
date
# pooled 1,024-scene eval + analysis figure
python -m spair_pytorch_tpu.eval --logdir runs/r4_cluttered_fine \
  --batches 32 --figure docs/analysis_r4_cluttered_fine.png
# failure-mode stratification at the stored calibrated operating point
python benchmarks/cluttered_failure_modes.py \
  --logdir runs/r4_cluttered_fine --scenes 1024
# serving NMS cost: 121-step greedy loop vs batched fixpoint (b128)
python benchmarks/serving_nms_cost.py --logdir runs/r4_cluttered_fine \
  --batch 128
date
# ordered-mode compositor scaling: full vs gate(mask) vs gate+topk,
# interleaved in one process (render-level A/B, both grids)
python benchmarks/ordered_topk_ab.py --preset cluttered_fine --live 12 \
  --topk 32
python benchmarks/ordered_topk_ab.py --preset cluttered --live 12 --topk 32
# full-train-step context for the winner (steady state past the count
# prior; compare against the same command without --topk/--gate)
python bench.py --preset cluttered_fine --render-mode ordered \
  --pretrain 2500 --steps 25 --repeats 3
python bench.py --preset cluttered_fine --render-mode ordered \
  --gate 0.01 --topk 32 --pretrain 2500 --steps 25 --repeats 3
date
