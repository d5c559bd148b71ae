#!/bin/bash
# Round-3 quality push 2: ordered compositing across the quality matrix.
set -x
date
python -m spair_pytorch_tpu.train --preset paper128 --box-prior free \
  --render-mode ordered --steps 100000 --steps-per-call 25 \
  --eval-every 10000 --eval-batches 8 \
  --logdir runs/r3_paper128_free_ordered --no-resume
python -m spair_pytorch_tpu.eval --logdir runs/r3_paper128_free_ordered \
  --preset paper128 --batches 32 \
  --figure runs/r3_paper128_free_ordered/fig.png
date
python -m spair_pytorch_tpu.train --preset small48 --box-prior free \
  --render-mode ordered --steps 20000 --steps-per-call 25 \
  --eval-every 5000 --eval-batches 8 \
  --logdir runs/r3_small48_free_ordered --no-resume
python -m spair_pytorch_tpu.eval --logdir runs/r3_small48_free_ordered \
  --preset small48 --batches 32 \
  --figure runs/r3_small48_free_ordered/fig.png
date
# extend the cluttered ordered arm 60k -> 100k (resumes)
python -m spair_pytorch_tpu.train --preset cluttered --box-prior free \
  --render-mode ordered --steps 100000 --steps-per-call 25 \
  --eval-every 10000 --eval-batches 8 \
  --logdir runs/r3_cluttered_free_ordered
python -m spair_pytorch_tpu.eval --logdir runs/r3_cluttered_free_ordered \
  --preset cluttered --batches 32 \
  --figure runs/r3_cluttered_free_ordered/fig100k.png
date
