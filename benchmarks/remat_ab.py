"""Interleaved A/B: scan_remat_policy 'dots' vs 'full', alternating blocks
in one process so tunnel-latency windows hit both arms equally.

Round-3 context: a perf_matrix run measured dots at 5.01 ms/step vs full
8.47; hours later dots read 8.97 in a fresh process. This discriminates
real-policy-effect from window/compile-cache artifacts. Honest protocol:
K steps fused per dispatch, forced D2H, delta timing (t3-t1)/(2K).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--k", type=int, default=25)
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--arms", default="dots,full",
                   help="comma list from {dots, full, names, off, uN, "
                        "nopack}: off = scan_remat=False (store "
                        "residuals); uN = remat=full with scan_unroll=N "
                        "(amortize while-loop overhead across N bodies); "
                        "names = save-only-tagged-activations policy; "
                        "nopack = remat=full with the packed multi-head "
                        "GEMM disabled (pre-round-4 per-head matmuls); "
                        "an inference-mode name (independent/raster/"
                        "wavefront/rowscan) selects that scan order "
                        "(rowscan-vs-wavefront = 11 vs 31 fronts)")
    p.add_argument("--gate", type=float, default=0.0,
                   help="pres_gate_threshold for ALL arms (combine with "
                        "--pretrain for steady-state sparsity)")
    p.add_argument("--pretrain", type=int, default=0,
                   help="untimed steps per arm before the timed rounds")
    args = p.parse_args()

    from spair_pytorch_tpu.config import paper_config
    from spair_pytorch_tpu.data import DataConfig, glyph_bank
    from spair_pytorch_tpu.parallel import create_train_state, make_train_step

    bank = jnp.asarray(glyph_bank((14, 14)))
    k = args.k
    arms = {}
    for name in args.arms.split(","):
        over = dict()
        if name == "off":
            over = dict(scan_remat=False)
        elif name == "nopack":
            over = dict(packed_heads=False)
        elif name in ("independent", "raster", "wavefront", "rowscan"):
            over = dict(inference_mode=name)
        elif name.startswith("u") and name[1:].isdigit():
            over = dict(scan_unroll=int(name[1:]))
        else:
            over = dict(scan_remat_policy=name)
        base = dict(batch_size=args.batch, compute_dtype="bfloat16",
                    inference_mode="wavefront", count_prior_parallel=True,
                    pres_gate_threshold=args.gate)
        base.update(over)
        cfg = paper_config(**base)
        dcfg = DataConfig(image_hw=cfg.image_shape[1:], max_objects=6)
        step = make_train_step(cfg, datagen=(dcfg, bank),
                               steps_per_call=k)
        state = create_train_state(cfg)
        state, m = step(state)  # compile
        jax.device_get(m["losses/total"][-1])
        for _ in range(max(0, args.pretrain - k) // k):
            state, m = step(state)
        jax.device_get(m["losses/total"][-1])
        arms[name] = (step, state)

    def delta(name):
        step, state = arms[name]
        t0 = time.perf_counter()
        state, m = step(state)
        jax.device_get(m["losses/total"][-1])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            state, m = step(state)
        jax.device_get(m["losses/total"][-1])
        t3 = time.perf_counter() - t0
        arms[name] = (step, state)
        return (t3 - t1) / (2 * k)

    names = list(arms)
    for rnd in range(args.rounds):
        if rnd:
            time.sleep(10)
        row = " | ".join(f"{n} {delta(n) * 1e3:7.2f} ms" for n in names)
        print(f"round {rnd}: {row}", flush=True)


if __name__ == "__main__":
    main()
