"""Does detector-side NMS improve counting on overlapping scenes?

The cluttered failure-mode anatomy (benchmarks/RESULTS.md) found
two-sided count errors: duplicate detections at moderate overlap, merges
at extreme overlap. NMS can only remove duplicates, so the hypothesis is
a count-accuracy gain concentrated where duplicates dominate.

Sweeps exact count accuracy over (presence threshold x NMS IoU) on
held-out scenes for a trained checkpoint:

    python benchmarks/nms_sweep.py --logdir runs/<run> [--batches 16]
        [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", required=True)
    p.add_argument("--batches", type=int, default=16)
    p.add_argument("--seed", type=int, default=4321)
    p.add_argument("--cpu", action="store_true",
                   help="force CPU (e.g. while another job owns the TPU)")
    p.add_argument("--thresholds", default="0.5,0.6,0.7,0.75,0.8")
    p.add_argument("--nms", default="none,0.3,0.4,0.5,0.6")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from spair_pytorch_tpu.config import config_from_json
    from spair_pytorch_tpu.models.infer import detect
    from spair_pytorch_tpu.parallel import create_train_state
    from spair_pytorch_tpu.train import make_data
    from spair_pytorch_tpu.utils.checkpoint import CheckpointManager

    with open(os.path.join(args.logdir, "config.json")) as f:
        cfg = config_from_json(f.read())
    state = create_train_state(cfg)
    state = CheckpointManager(
        os.path.join(args.logdir, "checkpoints")).restore(
            state, params_only=True)
    assert state is not None, f"no checkpoint under {args.logdir}"

    ths = [float(t) for t in args.thresholds.split(",")]
    nms = [None if s == "none" else float(s) for s in args.nms.split(",")]
    th_arr = jnp.asarray(ths)

    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def run(params, batch, nms_iou):
        x, _, gt_count = batch
        det = detect(params, x, cfg, nms_iou=nms_iou)
        counts = jnp.sum(det["scores"][:, None, :] >= th_arr[None, :, None],
                         axis=-1)                      # (B, T)
        hits = (counts == gt_count[:, :1]).astype(jnp.float32)
        err = (counts - gt_count[:, :1]).astype(jnp.float32)
        return hits.sum(0), err.sum(0)

    data = iter(make_data(cfg, seed=args.seed))
    batches = [next(data) for _ in range(args.batches)]
    scenes = sum(int(b[0].shape[0]) for b in batches)

    table = {}
    for g in nms:
        hits = np.zeros(len(ths))
        errs = np.zeros(len(ths))
        for batch in batches:
            h, e = jax.device_get(run(state.params, batch, g))
            hits += h
            errs += e
        key = "none" if g is None else f"{g:.1f}"
        table[key] = {f"{t:.2f}": {"acc": round(float(h / scenes), 4),
                                   "err": round(float(e / scenes), 4)}
                      for t, h, e in zip(ths, hits, errs)}
        best_t = max(table[key], key=lambda t: table[key][t]["acc"])
        print(f"nms={key:5s} best acc {table[key][best_t]['acc']:.4f} "
              f"@ threshold {best_t} "
              f"(err {table[key][best_t]['err']:+.3f})", flush=True)

    print(json.dumps({"logdir": args.logdir, "scenes": scenes,
                      "table": table}))


if __name__ == "__main__":
    main()
