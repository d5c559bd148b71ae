"""Serving-path NMS cost A/B: per-image greedy loop vs batched fixpoint.

RESULTS.md (round 3, session 4) measured the 121-step greedy fori_loop at
~0.52 ms/call at b128 — a 15% serving overhead. nms_keep_batch replaces it
with a Jacobi fixpoint over the suppression DAG (2-4 batched sweeps); this
script measures all three arms on a TRAINED checkpoint (realistic score
sparsity — convergence depth depends on how many boxes overlap):

    python benchmarks/serving_nms_cost.py --logdir runs/<run> [--batch 128]

Arms are interleaved across rounds in one process so tunnel windows hit
all of them (the round-2/3 lesson: single-row measurements through this
relay are not conclusions). Honest protocol: K detector calls folded into
one lax.scan dispatch, forced D2H, delta timing.
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def delta_time(fn, k, trials=5):
    """(time(3 calls) - time(1 call)) / (2K); median of positive deltas."""
    jitted = jax.jit(fn)
    jax.device_get(jitted(0.0))  # compile
    deltas = []
    for t in range(trials):
        t0 = time.perf_counter()
        jax.device_get(jitted(float(4 * t + 1)))
        t1 = time.perf_counter()
        jax.device_get(jitted(float(4 * t + 2)))
        jax.device_get(jitted(float(4 * t + 3)))
        jax.device_get(jitted(float(4 * t + 4)))
        t2 = time.perf_counter()
        d = ((t2 - t1) - (t1 - t0)) / 2.0
        if d > 0:
            deltas.append(d / k)
    return float(np.median(deltas)) if deltas else float("nan")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", required=True)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--nms", type=float, default=0.6)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from spair_pytorch_tpu.config import config_from_json
    from spair_pytorch_tpu.data import DataConfig, digit_bank
    from spair_pytorch_tpu.data.scattered_mnist import generate_batch
    from spair_pytorch_tpu.models.infer import (detect, nms_keep,
                                                nms_keep_batch)
    from spair_pytorch_tpu.parallel import create_train_state
    from spair_pytorch_tpu.utils.checkpoint import CheckpointManager

    with open(os.path.join(args.logdir, "config.json")) as f:
        cfg = config_from_json(f.read())
    cfg = dataclasses.replace(cfg, batch_size=args.batch)
    state = create_train_state(cfg)
    state = CheckpointManager(os.path.join(args.logdir, "checkpoints")
                              ).restore(state, params_only=True)
    assert state is not None
    params = state.params

    bank = jnp.asarray(digit_bank("auto", (14, 14)))
    dcfg = DataConfig(image_hw=cfg.image_shape[1:],
                      max_objects=cfg.max_scene_objects,
                      min_objects=max(1, cfg.max_scene_objects - 3))
    x0, _, _ = generate_batch(jax.random.PRNGKey(7), bank, args.batch, dcfg)

    # correctness first: both NMS arms agree on this checkpoint's output
    det0 = detect(params, x0, cfg)
    loop_keep = jax.vmap(nms_keep, in_axes=(0, 0, None))(
        det0["boxes"], det0["scores"], args.nms)
    batch_keep = nms_keep_batch(det0["boxes"], det0["scores"], args.nms)
    same = bool(jnp.all(loop_keep == batch_keep))
    print(f"keep-mask parity (loop vs fixpoint, b{args.batch}): {same}")
    assert same

    def make_arm(nms_fn):
        def k_detect(s):
            def body(c, _):
                d = detect(params, x0 + 0.0 * c, cfg)
                sc = d["scores"]
                if nms_fn is not None:
                    sc = sc * nms_fn(d["boxes"], sc)
                return c + jnp.sum(sc), None
            return jax.lax.scan(body, s, None, length=args.k)[0]
        return k_detect

    arms = {
        "no-nms": make_arm(None),
        "loop": make_arm(lambda b, s: jax.vmap(
            nms_keep, in_axes=(0, 0, None))(b, s, args.nms)),
        "fixpoint": make_arm(lambda b, s: nms_keep_batch(b, s, args.nms)),
    }
    results = {k: [] for k in arms}
    for r in range(args.rounds):
        for name, fn in arms.items():  # interleaved
            results[name].append(delta_time(fn, args.k) * 1e3)
    print(f"\nms/call at b{args.batch} (K={args.k} fused, delta-timed, "
          f"{args.rounds} interleaved rounds):")
    base = np.median(results["no-nms"])
    for name, vals in results.items():
        med = float(np.median(vals))
        print(f"  {name:9s} {med:7.3f} ms  (+{med - base:6.3f} ms NMS cost)"
              f"  rounds: {[f'{v:.3f}' for v in vals]}")


if __name__ == "__main__":
    main()
