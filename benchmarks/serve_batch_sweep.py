"""Detector serving throughput vs batch size (docs/NEXT.md #5).

At b128 the detector measured ~36-37k img/s and looked latency-bound —
this sweep extends the curve (b32..b512) to find where the chip saturates.
Protocol: each arm is K detector calls folded into ONE lax.scan dispatch
with a forced D2H data dependency, delta-timed ((3 calls - 1 call)/2K, the
honest-timing recipe from CLAUDE.md / bench.py) so tunnel dispatch latency
and relay windows cancel; arms are interleaved across rounds so a relay
window cannot masquerade as a batch-size effect.

Usage:
    python benchmarks/serve_batch_sweep.py --logdir runs/r4_cluttered_fine \
        --batches 32,64,128,256,512 --k 20 --rounds 3
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from spair_pytorch_tpu.config import PRESETS
from spair_pytorch_tpu.models.infer import detect
from spair_pytorch_tpu.parallel import create_train_state


def delta_time_once(jitted, k):
    """One (3 calls - 1 call)/2K sample; non-positive = corrupted window."""
    t0 = time.perf_counter()
    jax.device_get(jitted(1.0))
    t1 = time.perf_counter()
    jax.device_get(jitted(2.0)), jax.device_get(jitted(3.0)), \
        jax.device_get(jitted(4.0))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (2 * k)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="paper128", choices=sorted(PRESETS))
    p.add_argument("--logdir", default=None)
    p.add_argument("--batches", default="32,64,128,256,512")
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--threshold", type=float, default=None)
    p.add_argument("--nms", type=float, default=None)
    p.add_argument("--dtypes", default="config",
                   help="comma list of compute dtypes per arm: 'config' "
                        "(the checkpoint's trained dtype), 'float32', "
                        "'bfloat16'. Arms are the (batch x dtype) product, "
                        "interleaved every round. Parity companion: "
                        "serve_dtype_ab.py")
    args = p.parse_args()
    batches = [int(b) for b in args.batches.split(",")]
    dtypes = args.dtypes.split(",")

    cfg = PRESETS[args.preset]()
    if args.logdir:
        saved = os.path.join(args.logdir, "config.json")
        if os.path.exists(saved):
            from spair_pytorch_tpu.config import config_from_json
            with open(saved) as f:
                cfg = config_from_json(f.read())
    state = create_train_state(cfg)
    if args.logdir:
        from spair_pytorch_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(os.path.join(args.logdir, "checkpoints"))
        restored = mgr.restore(state, params_only=True)
        if restored is None:
            raise SystemExit(f"no checkpoint under {args.logdir}")
        state = restored
        print(f"restored step {int(state.step)} from {args.logdir}")
    params = state.params

    from spair_pytorch_tpu.serve import resolve_nms, resolve_threshold
    threshold = resolve_threshold(args.threshold, args.logdir)
    nms_iou = resolve_nms(args.nms, args.logdir)
    print(f"operating point: threshold {threshold}, nms {nms_iou}")

    from spair_pytorch_tpu.data import DataConfig, digit_bank
    from spair_pytorch_tpu.data.scattered_mnist import generate_batch
    bank = jnp.asarray(digit_bank("auto", (14, 14)))
    dcfg = DataConfig(image_hw=cfg.image_shape[1:],
                      max_objects=cfg.max_scene_objects)

    import dataclasses
    arms = {}
    for b in batches:
        x0, _, _ = generate_batch(jax.random.PRNGKey(7), bank, b, dcfg)
        for dt_name in dtypes:
            cfg_b = dataclasses.replace(cfg, batch_size=b)
            if dt_name != "config":
                cfg_b = dataclasses.replace(cfg_b, compute_dtype=dt_name)

            def k_detect(s, _x=x0, _cfg=cfg_b):
                def body(c, _):
                    out = detect(params, _x + c * 1e-6, _cfg, threshold,
                                 nms_iou=nms_iou)
                    return c + out["scores"].mean() * 1e-9, ()
                return jax.lax.scan(body, s, None, length=args.k)[0]

            jitted = jax.jit(k_detect)
            jax.device_get(jitted(0.0))  # compile + warm
            arms[(b, dt_name)] = jitted

    samples = {key: [] for key in arms}
    for r in range(args.rounds):
        for key in arms:  # interleaved: every round touches every arm
            d = delta_time_once(arms[key], args.k)
            if d > 0:
                samples[key].append(d)
        time.sleep(1)

    print(f"\n{'batch':>6} {'dtype':>9} {'ms/call':>9} {'img/s':>10}  "
          f"(median of {args.rounds} interleaved rounds, K={args.k} fused)")
    for (b, dt_name) in arms:
        if not samples[(b, dt_name)]:
            print(f"{b:>6} {dt_name:>9}   all-rounds-corrupted")
            continue
        dt = float(np.median(samples[(b, dt_name)]))
        print(f"{b:>6} {dt_name:>9} {dt * 1e3:9.2f} {b / dt:10.0f}")


if __name__ == "__main__":
    main()
