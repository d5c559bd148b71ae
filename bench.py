"""Headline benchmark: training images/sec/chip at 128x128 scattered-MNIST.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The reference publishes no numbers (SURVEY.md section 6); the baseline
denominator is the measured throughput of the UNMODIFIED reference PyTorch
implementation on this host (benchmarks/reference_probe.py; recorded in
BASELINE.md). Paper config: batch 32 per chip, 128x128 images, full training
step (forward + backward + Adam) with on-device data generation, sequential
lateral-context inference via the wavefront scan — the reference's
semantics, not the easier independent mode.
"""

from __future__ import annotations

import argparse
import json
import time

# Measured by benchmarks/reference_probe.py (torch-CPU, batch 32, paper
# config, 2026-08-16): 0.445 images/sec. See BASELINE.md for the record.
REFERENCE_BASELINE_IPS = 0.445


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=15)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--repeats", type=int, default=12,
                   help="timing blocks; the fastest is reported (the "
                        "tunneled TPU link has multi-MINUTE degraded "
                        "windows where every step runs ~30x slow, so "
                        "blocks are spread over time with --block-sleep)")
    p.add_argument("--block-sleep", type=float, default=8.0,
                   help="seconds between timing blocks (time diversity "
                        "against tunnel latency windows)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--mode", default="wavefront",
                   choices=["independent", "raster", "wavefront"])
    p.add_argument("--render", default=None,
                   choices=[None, "xla", "pallas"])
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--baseline-ips", type=float,
                   default=REFERENCE_BASELINE_IPS)
    args = p.parse_args()

    import jax

    from spair_pytorch_tpu.config import paper_config
    from spair_pytorch_tpu.data import DataConfig, glyph_bank
    from spair_pytorch_tpu.parallel import create_train_state, make_train_step

    overrides = dict(batch_size=args.batch, inference_mode=args.mode,
                     compute_dtype=args.compute_dtype)
    if args.render:
        overrides["render_backend"] = args.render
    cfg = paper_config(**overrides)

    import jax.numpy as jnp
    bank = jnp.asarray(glyph_bank((14, 14)))
    dcfg = DataConfig(image_hw=cfg.image_shape[1:], max_objects=6)

    # Fused step: on-device scene generation + train step in ONE dispatch
    # (BASELINE config 5; same arrangement as the training driver).
    state = create_train_state(cfg)
    step_fn = make_train_step(cfg, datagen=(dcfg, bank))

    for _ in range(args.warmup):
        state, metrics = step_fn(state)
    jax.block_until_ready(metrics)

    times = []
    for r in range(max(1, args.repeats)):
        if r and args.block_sleep:
            time.sleep(args.block_sleep)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step_fn(state)
        jax.block_until_ready(metrics)
        times.append(time.perf_counter() - t0)

    # step_fn is built without a mesh: exactly ONE chip does the work, so
    # per-chip throughput divides by 1, not jax.device_count().
    images = args.batch * args.steps
    per_block_ips = sorted(images / t for t in times)
    ips_per_chip = per_block_ips[-1]                      # best block
    median_ips = per_block_ips[len(per_block_ips) // 2]
    print(json.dumps({
        "metric": "train images/sec/chip, 128x128 scattered-MNIST, "
                  f"batch {args.batch}, {args.mode} inference",
        "value": round(ips_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_per_chip / args.baseline_ips, 2),
        # dispersion across timing blocks: the tunneled TPU link has
        # multi-ms latency windows, so best-vs-median separates real
        # regressions from link noise (VERDICT round 1, item 10).
        "spread": {"median": round(median_ips, 2),
                   "min": round(per_block_ips[0], 2),
                   "blocks": len(per_block_ips)},
    }))


if __name__ == "__main__":
    main()
