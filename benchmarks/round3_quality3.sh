#!/bin/bash
# Round-3 session-2 quality queue (single TPU process, sequential):
#  A/B: presence-gated training (the 1.8x step-time lever) vs ungated
#       control, both paper128 + free prior + reference compositing, 50k;
#  flagship paper128 free+ordered 100k (round3_quality2 arm, never run);
#  cluttered free+ordered 100k (NEXT #6: count-acc extension, fresh run —
#       the 60k checkpoint did not survive the session transition);
#  small48 free+ordered 20k (completes the ordered matrix).
set -x
date
python -u -m spair_pytorch_tpu.train --preset paper128 --box-prior free \
  --steps 50000 --steps-per-call 25 --eval-every 5000 --eval-batches 8 \
  --logdir runs/r3b_p128_free_ctrl --no-resume 2>&1 | tail -3
python -u -m spair_pytorch_tpu.eval --logdir runs/r3b_p128_free_ctrl \
  --batches 32 --figure runs/r3b_p128_free_ctrl/fig.png
date
python -u -m spair_pytorch_tpu.train --preset paper128 --box-prior free \
  --pres-gate 0.01 \
  --steps 50000 --steps-per-call 25 --eval-every 5000 --eval-batches 8 \
  --logdir runs/r3b_p128_free_gate --no-resume 2>&1 | tail -3
python -u -m spair_pytorch_tpu.eval --logdir runs/r3b_p128_free_gate \
  --batches 32 --figure runs/r3b_p128_free_gate/fig.png
date
python -u -m spair_pytorch_tpu.train --preset paper128 --box-prior free \
  --render-mode ordered --steps 100000 --steps-per-call 25 \
  --eval-every 10000 --eval-batches 8 \
  --logdir runs/r3b_p128_free_ordered --no-resume 2>&1 | tail -3
python -u -m spair_pytorch_tpu.eval --logdir runs/r3b_p128_free_ordered \
  --batches 32 --figure runs/r3b_p128_free_ordered/fig.png
date
python -u -m spair_pytorch_tpu.train --preset cluttered --box-prior free \
  --render-mode ordered --steps 100000 --steps-per-call 25 \
  --eval-every 10000 --eval-batches 8 \
  --logdir runs/r3b_cluttered_free_ordered --no-resume 2>&1 | tail -3
python -u -m spair_pytorch_tpu.eval --logdir runs/r3b_cluttered_free_ordered \
  --batches 32 --figure runs/r3b_cluttered_free_ordered/fig.png
date
python -u -m spair_pytorch_tpu.train --preset small48 --box-prior free \
  --render-mode ordered --steps 20000 --steps-per-call 25 \
  --eval-every 5000 --eval-batches 8 \
  --logdir runs/r3b_small48_free_ordered --no-resume 2>&1 | tail -3
python -u -m spair_pytorch_tpu.eval --logdir runs/r3b_small48_free_ordered \
  --batches 32 --figure runs/r3b_small48_free_ordered/fig.png
date
# int8 serving A/B on a REAL trained checkpoint (accuracy + latency)
python -u benchmarks/int8_serving.py --logdir runs/r3b_p128_free_ctrl \
  --batch 32 --k 20
date
