#!/bin/bash
# Clean round-3 sweep under final defaults (remat=full, v2 kernel).
# Batch-scaling rows for wavefront + independent, raster row, perf matrix.
set -x
date
python benchmarks/render_ab.py --batch 32 --k 30
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
