#!/bin/bash
# Round-3 hardware sweep: run once, sequentially, no external kills.
# Usage: bash benchmarks/round3_sweep.sh >> benchmarks/round3_sweep.log 2>&1
set -x
date
python benchmarks/render_ab.py --batch 32 --k 30
date
python benchmarks/perf_matrix.py --batch 32 --k 25
date
for b in 64 128 256; do
  python bench.py --steps 15 --repeats 3 --batch $b
  python bench.py --steps 15 --repeats 3 --batch $b --mode independent --render pallas_v3 --count-kl par
done
date
python bench.py --steps 30 --repeats 4 --check
date
