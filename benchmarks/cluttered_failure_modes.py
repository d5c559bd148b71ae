"""Characterize the cluttered-scene counting failure (RESULTS.md round-3
session 3: count acc plateaus ~0.74 with a persistent UNDERcount while
AP@0.5 holds 0.99+).

Hypotheses this script discriminates:
  (a) merge: densely-overlapping GT digits collapse into one detection —
      error should grow with the number of overlapping GT pairs;
  (b) soft presence: scores hover mid-range and the 0.5 threshold drops
      borderline objects — visible as mass in scores in (0.2, 0.8);
  (c) prior pressure: uniform undercount independent of overlap.

Usage:
    python benchmarks/cluttered_failure_modes.py \
        --logdir runs/r3b_cluttered_free_ordered --scenes 1024
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def pair_overlaps(bbox, count):
    """bbox (M,4) pixel [x,y,w,h] top-left; -> (#pairs with IoU>0,
    #pairs with center distance < patch size)."""
    m = bbox.shape[0]
    x, y, w, h = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    live = np.arange(m) < count
    n_iou = n_close = 0
    for i in range(m):
        if not live[i]:
            continue
        for j in range(i + 1, m):
            if not live[j]:
                continue
            ix = max(0.0, min(x[i] + w[i], x[j] + w[j]) - max(x[i], x[j]))
            iy = max(0.0, min(y[i] + h[i], y[j] + h[j]) - max(y[i], y[j]))
            if ix * iy > 0:
                n_iou += 1
            dc = np.hypot(x[i] + w[i] / 2 - x[j] - w[j] / 2,
                          y[i] + h[i] / 2 - y[j] - h[j] / 2)
            if dc < max(w[i], h[i]):
                n_close += 1
    return n_iou, n_close


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", required=True)
    p.add_argument("--scenes", type=int, default=1024)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--threshold", type=float, default=None,
                   help="presence threshold (default: the run's "
                        "calibration.json if present, else 0.5)")
    p.add_argument("--nms", type=float, default=None,
                   help="NMS IoU (default: calibration.json, else off; "
                        "0 forces off)")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest) — for matched-"
                        "step A/Bs between runs")
    args = p.parse_args()

    from spair_pytorch_tpu.config import config_from_json
    from spair_pytorch_tpu.data import DataConfig, digit_bank
    from spair_pytorch_tpu.data.scattered_mnist import generate_batch
    from spair_pytorch_tpu.models.infer import detect
    from spair_pytorch_tpu.parallel import create_train_state
    from spair_pytorch_tpu.utils.checkpoint import CheckpointManager

    with open(os.path.join(args.logdir, "config.json")) as f:
        cfg = config_from_json(f.read())
    cfg = dataclasses.replace(cfg, batch_size=args.batch)
    state = create_train_state(cfg)
    state = CheckpointManager(os.path.join(args.logdir, "checkpoints")
                              ).restore(state, step=args.step,
                                        params_only=True)
    assert state is not None

    bank = jnp.asarray(digit_bank("auto", (14, 14)))
    dcfg = DataConfig(image_hw=cfg.image_shape[1:],
                      max_objects=cfg.max_scene_objects,
                      min_objects=max(1, cfg.max_scene_objects - 3))
    from spair_pytorch_tpu.serve import resolve_nms, resolve_threshold
    threshold = resolve_threshold(args.threshold, args.logdir)
    nms_iou = resolve_nms(args.nms, args.logdir)
    print(f"operating point: threshold {threshold}, nms {nms_iou}")
    det = jax.jit(lambda pp, x: detect(pp, x, cfg, threshold,
                                       nms_iou=nms_iou))

    rows = []  # (gt_count, err, n_iou_pairs, n_close_pairs, n_soft_scores)
    n_b = max(1, args.scenes // args.batch)
    for i in range(n_b):
        key = jax.random.fold_in(jax.random.PRNGKey(7), i)
        x, bbox, count = generate_batch(key, bank, args.batch, dcfg)
        o = det(state.params, x)
        o, bbox, count = jax.device_get((o, bbox, count))
        for s in range(args.batch):
            gt = int(count[s, 0])
            pred = int(o["count"][s])
            sc = np.asarray(o["scores"][s])
            n_iou, n_close = pair_overlaps(np.asarray(bbox[s]), gt)
            rows.append((gt, pred - gt, n_iou, n_close,
                         int(((sc > 0.2) & (sc < 0.8)).sum())))

    rows = np.asarray(rows)
    print(f"scenes {len(rows)}  step {int(state.step)}  "
          f"exact acc {(rows[:, 1] == 0).mean():.3f}  "
          f"mean err {rows[:, 1].mean():+.3f}")

    print("\nerror vs #GT-overlapping pairs (IoU>0):")
    print(f"{'pairs':>6} {'scenes':>7} {'acc':>6} {'mean err':>9} "
          f"{'P(err<0)':>9}")
    for lo, hi in ((0, 0), (1, 1), (2, 2), (3, 4), (5, 99)):
        sel = (rows[:, 2] >= lo) & (rows[:, 2] <= hi)
        if sel.sum() == 0:
            continue
        r = rows[sel]
        label = f"{lo}" if lo == hi else f"{lo}-{hi}"
        print(f"{label:>6} {sel.sum():>7} {(r[:, 1] == 0).mean():>6.3f} "
              f"{r[:, 1].mean():>+9.3f} {(r[:, 1] < 0).mean():>9.3f}")

    print("\nerror vs GT count:")
    for gt in sorted(set(rows[:, 0])):
        r = rows[rows[:, 0] == gt]
        print(f"  gt={gt}: scenes {len(r):>4}  acc {(r[:, 1] == 0).mean():.3f}"
              f"  mean err {r[:, 1].mean():+.3f}")

    soft = rows[:, 4]
    print(f"\nsoft presence scores in (0.2, 0.8): mean {soft.mean():.2f} "
          f"per scene; scenes with >=1 soft score: {(soft > 0).mean():.3f}; "
          f"of the miscounted scenes: "
          f"{(soft[rows[:, 1] != 0] > 0).mean():.3f}")

    out = {
        "acc": float((rows[:, 1] == 0).mean()),
        "mean_err": float(rows[:, 1].mean()),
        "acc_no_overlap": float((rows[rows[:, 2] == 0, 1] == 0).mean())
        if (rows[:, 2] == 0).any() else None,
        "acc_3plus_overlap": float((rows[rows[:, 2] >= 3, 1] == 0).mean())
        if (rows[:, 2] >= 3).any() else None,
    }
    print("\n" + json.dumps(out))


if __name__ == "__main__":
    main()
