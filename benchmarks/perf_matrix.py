"""Honest perf matrix for the training step (real TPU, delta-timed).

Protocol (see bench.py): K steps fused into one lax.scan dispatch, forced
D2H on the final loss, per-step = (time(3 calls) - time(1 call)) / 2K.
Immune to the axon relay's acceptance-vs-completion ambiguity and to its
per-dispatch latency windows. Run:  python benchmarks/perf_matrix.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--k", type=int, default=25, help="steps per dispatch")
    p.add_argument("--trials", type=int, default=2)
    p.add_argument("--only", default=None,
                   help="substring filter on variant names")
    args = p.parse_args()

    from spair_pytorch_tpu.config import paper_config
    from spair_pytorch_tpu.data import DataConfig, glyph_bank
    from spair_pytorch_tpu.parallel import create_train_state, make_train_step

    bank = jnp.asarray(glyph_bank((14, 14)))
    k = args.k

    def flops_of(step, state):
        # the K-step while-loop body (one train step) is counted once by
        # the HLO cost analysis -> already per-step; inner scan fronts are
        # also counted once (a few % undercount). Tight lower bound.
        try:
            ca = step.lower(state).compile().cost_analysis()
            return float(ca.get("flops", 0.0))
        except Exception:
            return 0.0

    def measure(cfg):
        dcfg = DataConfig(image_hw=cfg.image_shape[1:], max_objects=6)
        step = make_train_step(cfg, datagen=(dcfg, bank), steps_per_call=k)
        state = create_train_state(cfg)
        measure.flops = flops_of(step, state)

        def run(ncalls, state):
            t0 = time.perf_counter()
            m = None
            for _ in range(ncalls):
                state, m = step(state)
            jax.device_get(m["losses/total"][-1])
            return time.perf_counter() - t0, state

        _, state = run(1, state)  # compile
        best = float("inf")
        for t in range(args.trials):
            if t:
                time.sleep(2)
            t1, state = run(1, state)
            t3, state = run(3, state)
            best = min(best, (t3 - t1) / (2 * k))
        return best

    base = dict(batch_size=args.batch, compute_dtype="bfloat16")
    variants = [
        ("wavefront seqKL remat",        dict(inference_mode="wavefront")),
        ("wavefront parKL remat",        dict(inference_mode="wavefront",
                                              count_prior_parallel=True)),
        ("wavefront parKL remat=F",      dict(inference_mode="wavefront",
                                              count_prior_parallel=True,
                                              scan_remat=False)),
        ("wavefront parKL unroll=4",     dict(inference_mode="wavefront",
                                              count_prior_parallel=True,
                                              scan_unroll=4)),
        ("wavefront parKL remat=dots",   dict(inference_mode="wavefront",
                                              count_prior_parallel=True,
                                              scan_remat_policy="dots")),
        ("wavefront parKL v3render",     dict(inference_mode="wavefront",
                                              count_prior_parallel=True,
                                              render_backend="pallas_v3")),
        ("independent parKL",            dict(inference_mode="independent",
                                              count_prior_parallel=True)),
        ("independent parKL v3render",   dict(inference_mode="independent",
                                              count_prior_parallel=True,
                                              render_backend="pallas_v3")),
        ("independent seqKL",            dict(inference_mode="independent")),
        ("raster parKL",                 dict(inference_mode="raster",
                                              count_prior_parallel=True)),
        ("raster parKL unroll=8",        dict(inference_mode="raster",
                                              count_prior_parallel=True,
                                              scan_unroll=8)),
    ]
    # v5e peak: 197 TFLOP/s bf16 (f32 ~1/4); MFU = XLA-counted model
    # flops per step / wall time / peak.
    peak = 197e12
    for name, over in variants:
        if args.only and args.only not in name:
            continue
        cfg = paper_config(**base, **over)
        dt = measure(cfg)
        gf = measure.flops / 1e9
        mfu = f" {gf:7.1f} GF {measure.flops / dt / peak * 100:5.2f}% MFU" \
            if gf else ""
        print(f"{name:30s} {dt * 1e3:8.2f} ms/step "
              f"{args.batch / dt:9.0f} img/s{mfu}", flush=True)


if __name__ == "__main__":
    main()
