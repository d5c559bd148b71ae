#!/bin/bash
# Round-3 cluttered-scene quality push (VERDICT item 3):
#   A: cluttered preset + free box prior (the fix that unpinned AP on
#      paper128/small48 in round 2, never applied to cluttered)
#   B: same + corrected z-depth-ordered compositing (overlap-heavy scenes)
# Fresh runs, reference-faithful everything else. Eval pools 1k scenes.
set -x
date
python -m spair_pytorch_tpu.train --preset cluttered --box-prior free \
  --steps 60000 --steps-per-call 25 --eval-every 10000 --eval-batches 8 \
  --logdir runs/r3_cluttered_free --no-resume
python -m spair_pytorch_tpu.eval --logdir runs/r3_cluttered_free \
  --preset cluttered --batches 32 --figure runs/r3_cluttered_free/fig.png
date
python -m spair_pytorch_tpu.train --preset cluttered --box-prior free \
  --render-mode ordered \
  --steps 60000 --steps-per-call 25 --eval-every 10000 --eval-batches 8 \
  --logdir runs/r3_cluttered_free_ordered --no-resume
python -m spair_pytorch_tpu.eval --logdir runs/r3_cluttered_free_ordered \
  --preset cluttered --batches 32 \
  --figure runs/r3_cluttered_free_ordered/fig.png
date
