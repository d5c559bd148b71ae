#!/bin/bash
# Clean re-sweep with scan_remat_policy='dots' default + E1 kernel
# (bf16 planes/accumulators). Run: bash benchmarks/round3_sweep2.sh
set -x
date
python benchmarks/render_ab.py --batch 32 --k 30
date
python bench.py --steps 30 --repeats 4 --check
date
for b in 64 128 256; do
  python bench.py --steps 15 --repeats 3 --batch $b
done
date
for b in 64 256; do
  python bench.py --steps 15 --repeats 3 --batch $b --mode independent --count-kl par
done
date
python bench.py --steps 15 --repeats 3 --mode raster --count-kl par
date
python benchmarks/perf_matrix.py --batch 32 --k 25
date
