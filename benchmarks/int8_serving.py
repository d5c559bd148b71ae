"""int8 detector serving A/B: accuracy delta + throughput vs f32/bf16.

Round-1 backlog item #6 (docs/NEXT.md #3). Quantizes every linear/conv of
the detector path (ops/quant.py: int8 weights per-output-channel, dynamic
per-row int8 activations, int32 MXU accumulation) and measures, on the
same generated scenes:

  * count accuracy + mean |count error| vs the generator labels, for both
    arms (the quality cost of int8);
  * max |box center/size delta| between arms (a direct fidelity probe);
  * delta-timed detector latency for both arms (honest protocol: K
    detector calls folded into one lax.scan dispatch, forced D2H).

Usage (real checkpoint recommended; fresh params measure speed only):
    python benchmarks/int8_serving.py --logdir runs/paper128_real100k \
        --batch 32 --k 20
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
from spair_pytorch_tpu.ops.quant import quantize_params_int8
from spair_pytorch_tpu.parallel import create_train_state


def delta_time(fn, k, trials=5):
    """(time(3 calls) - time(1 call)) / 2 for a K-fused scan dispatch.

    A relay window shifting between the 1-call and 3-call brackets can
    produce a NEGATIVE delta (3 calls "faster" than 1); min() over trials
    would then keep the corrupted sample forever. Reject non-positive
    deltas and report the median of the valid ones instead.
    """
    jitted = jax.jit(fn)
    out = jitted(0.0)
    jax.device_get(out)

    deltas = []
    for t in range(trials):
        if t:
            time.sleep(2)
        t0 = time.perf_counter()
        jax.device_get(jitted(1.0))
        t1 = time.perf_counter()
        jax.device_get(jitted(2.0)), jax.device_get(jitted(3.0)), \
            jax.device_get(jitted(4.0))
        t2 = time.perf_counter()
        d = ((t2 - t1) - (t1 - t0)) / (2 * k)
        if d > 0:
            deltas.append(d)
    if not deltas:
        return float("nan")
    return float(np.median(deltas))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="paper128", choices=sorted(PRESETS))
    p.add_argument("--logdir", default=None)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--scenes", type=int, default=512)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--threshold", type=float, default=0.5)
    args = p.parse_args()

    cfg = PRESETS[args.preset](batch_size=args.batch)
    state = create_train_state(cfg)
    if args.logdir:
        saved = os.path.join(args.logdir, "config.json")
        if os.path.exists(saved):
            from spair_pytorch_tpu.config import config_from_json
            import dataclasses
            with open(saved) as f:
                cfg = dataclasses.replace(config_from_json(f.read()),
                                          batch_size=args.batch)
            state = create_train_state(cfg)
        from spair_pytorch_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(os.path.join(args.logdir, "checkpoints"))
        restored = mgr.restore(state, params_only=True)
        if restored is None:
            raise SystemExit(f"no checkpoint under {args.logdir}")
        state = restored
        print(f"restored step {int(state.step)} from {args.logdir}")

    params_f = state.params
    params_q = quantize_params_int8(params_f)

    from spair_pytorch_tpu.data import DataConfig, digit_bank
    from spair_pytorch_tpu.data.scattered_mnist import _generate_one
    bank = jnp.asarray(digit_bank("auto", (14, 14)))
    dcfg = DataConfig(image_hw=cfg.image_shape[1:],
                      max_objects=cfg.max_scene_objects)

    # ---- accuracy arms over --scenes scenes ----
    n_b = max(1, args.scenes // args.batch)
    det = jax.jit(lambda p, x: detect(p, x, cfg, args.threshold))
    accs = {"f32": [], "int8": []}
    errs = {"f32": [], "int8": []}
    box_delta = 0.0
    for i in range(n_b):
        keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(0), i),
                                args.batch)
        x, _, counts = jax.vmap(lambda kk: _generate_one(kk, bank, dcfg))(
            keys)
        true = np.asarray(counts)[:, 0]
        of, oq = det(params_f, x), det(params_q, x)
        of, oq = jax.device_get((of, oq))
        for name, o in (("f32", of), ("int8", oq)):
            pred = np.asarray(o["count"])
            accs[name].append((pred == true).mean())
            errs[name].append(np.abs(pred - true).mean())
        # compare boxes only where BOTH arms detect (above threshold)
        both = ((np.asarray(of["scores"]) >= args.threshold)
                & (np.asarray(oq["scores"]) >= args.threshold))
        if both.any():
            d = np.abs(np.asarray(of["boxes"]) - np.asarray(oq["boxes"]))
            box_delta = max(box_delta, float(d[both].max()))

    print(f"scenes {n_b * args.batch}")
    for name in ("f32", "int8"):
        print(f"{name:5s} count acc {np.mean(accs[name]):.3f}   "
              f"mean|count err| {np.mean(errs[name]):.3f}")
    print(f"max |box delta| where both detect: {box_delta:.2f} px")

    # ---- latency arms (K fused calls, forced D2H, delta-timed) ----
    keys = jax.random.split(jax.random.PRNGKey(99), args.batch)
    x0, _, _ = jax.vmap(lambda kk: _generate_one(kk, bank, dcfg))(keys)

    for name, pp in (("f32", params_f), ("int8", params_q)):
        def k_detect(s, _p=pp):
            def body(c, _):
                out = detect(_p, x0 + c * 1e-6, cfg, args.threshold)
                return c + out["scores"].mean() * 1e-9, ()
            return jax.lax.scan(body, s, None, length=args.k)[0]

        dt = delta_time(k_detect, args.k)
        ips = args.batch / dt
        print(f"{name:5s} detector {dt * 1e3:7.2f} ms/call  "
              f"{ips:9.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
