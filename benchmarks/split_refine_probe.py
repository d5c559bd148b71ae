"""Measure the split-refinement second pass (models/refine.py) on a
trained cluttered run — the candidate closure of the 5+-overlap merge
failure (benchmarks/RESULTS.md "slots closure": every TRAINING-time
capacity lever measured negative; this is the inference-time lever).

Protocol (mirrors the repo's calibration discipline):
  1. CALIBRATE the acceptance margin on held-out scenes (seed 4321 —
     the same stream eval.calibrate uses, disjoint from the eval
     stream): sweep margins, pick the one maximizing exact count
     accuracy. The gains are computed once; the sweep is free.
  2. EVALUATE at that margin on the eval stream (seed 7 — the same
     scenes benchmarks/cluttered_failure_modes.py stratifies), and
     report the stratified table (exact count acc by #overlapping GT
     pairs) with refinement OFF vs ON, plus split diagnostics.

Usage:
    python benchmarks/split_refine_probe.py --logdir runs/r5_cluttered_s1 \
        --scenes 2048 --calib-scenes 1024
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

MARGINS = np.concatenate([np.arange(0.0, 0.201, 0.02),
                          np.arange(0.25, 0.651, 0.05)])


def load(logdir, batch, step=None):
    from spair_pytorch_tpu.config import config_from_json
    from spair_pytorch_tpu.parallel import create_train_state
    from spair_pytorch_tpu.utils.checkpoint import CheckpointManager

    with open(os.path.join(logdir, "config.json")) as f:
        cfg = config_from_json(f.read())
    cfg = dataclasses.replace(cfg, batch_size=batch)
    state = create_train_state(cfg)
    state = CheckpointManager(os.path.join(logdir, "checkpoints")
                              ).restore(state, step=step, params_only=True)
    assert state is not None, f"no checkpoint under {logdir}"
    return cfg, state


def stream(cfg, batch, seed):
    from spair_pytorch_tpu.data import DataConfig, digit_bank
    from spair_pytorch_tpu.data.scattered_mnist import generate_batch

    bank = jnp.asarray(digit_bank("auto", (14, 14)))
    dcfg = DataConfig(image_hw=cfg.image_shape[1:],
                      max_objects=cfg.max_scene_objects,
                      min_objects=max(1, cfg.max_scene_objects - 3))
    i = 0
    while True:
        key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        yield generate_batch(key, bank, batch, dcfg)
        i += 1


def collect(cfg, state, threshold, nms_iou, batches, batch, seed, top_m):
    """Run detector + split gains over a scene stream. Returns per-scene
    arrays: gt count, base count, and the per-detection (live, gain)
    needed to recount at any margin."""
    from spair_pytorch_tpu.models.infer import detect
    from spair_pytorch_tpu.models.refine import split_gains

    @jax.jit
    def run(params, x):
        det = detect(params, x, cfg, threshold, nms_iou=nms_iou)
        gains = split_gains(params, cfg, x, det["boxes"], det["scores"],
                            top_m=top_m, pres_threshold=threshold)
        base = jnp.sum(det["scores"] >= threshold, axis=-1)
        return (base, gains["score"], gains["rel_gain"], gains["ink"],
                gains["neighbor_iou"])

    gts, bases, scores, gains, inks, nious, bboxes = ([], [], [], [], [],
                                                      [], [])
    it = stream(cfg, batch, seed)
    for _ in range(batches):
        x, bbox, count = next(it)
        b, s, g, ink, niou = jax.device_get(run(state.params, x))
        bbox, count = jax.device_get((bbox, count))
        gts.append(count[:, 0]); bases.append(b)
        scores.append(s); gains.append(g); inks.append(ink)
        nious.append(niou); bboxes.append(bbox)
    return (np.concatenate(gts), np.concatenate(bases),
            np.concatenate(scores), np.concatenate(gains),
            np.concatenate(inks), np.concatenate(nious),
            np.concatenate(bboxes))


def counts_at(base, scores, gains, ink, niou, threshold, margin,
              ink_min=0.0, niou_max=0.3):
    accept = ((scores >= threshold) & (gains > margin)
              & (ink >= ink_min) & (niou <= niou_max))
    return base + accept.sum(-1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", required=True)
    p.add_argument("--scenes", type=int, default=2048)
    p.add_argument("--calib-scenes", type=int, default=1024)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--top-m", type=int, default=12)
    p.add_argument("--threshold", type=float, default=None)
    p.add_argument("--nms", type=float, default=None)
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--margin", type=float, default=None,
                   help="skip calibration and use this margin")
    p.add_argument("--ink-min", type=float, default=0.0,
                   help="with --margin: ink gate (window ink mass floor)")
    args = p.parse_args()

    from spair_pytorch_tpu.serve import resolve_nms, resolve_threshold
    cfg, state = load(args.logdir, args.batch, args.step)
    threshold = resolve_threshold(args.threshold, args.logdir)
    nms_iou = resolve_nms(args.nms, args.logdir)
    print(f"operating point: threshold {threshold}, nms {nms_iou}, "
          f"top_m {args.top_m}, step {int(state.step)}")

    # ---- 1. margin x gates calibration (held-out stream, seed 4321) ----
    niou_grid = (0.3, 0.5, 1.0)
    if args.margin is None:
        nb = max(1, args.calib_scenes // args.batch)
        gt, base, sc, gn, ink, niou, _ = collect(
            cfg, state, threshold, nms_iou, nb, args.batch, 4321,
            args.top_m)
        live = sc >= threshold
        ink_q = np.quantile(ink[live], [0.0, 0.5, 0.65, 0.8])
        base_acc = (base == gt).mean()
        print(f"\ncalibration ({len(gt)} scenes, seed 4321): refine OFF "
              f"acc {base_acc:.3f}; live-det ink quantiles 0/50/65/80%: "
              f"{np.round(ink_q, 1).tolist()}")
        print("margin sweep at ink_min=0, niou_max=0.3:")
        print(f"{'margin':>8} {'acc':>7} {'mean err':>9} {'splits/scene':>13}")
        for m in MARGINS:
            c = counts_at(base, sc, gn, ink, niou, threshold, m)
            print(f"{m:>8.2f} {(c == gt).mean():>7.3f} "
                  f"{(c - gt).mean():>+9.3f} {(c - base).mean():>13.2f}")
        best = (-1.0, None, 0.0, 0.3)
        for nm in niou_grid:
            for q in ink_q:
                for m in MARGINS:
                    c = counts_at(base, sc, gn, ink, niou, threshold, m,
                                  q, nm)
                    acc = (c == gt).mean()
                    if acc > best[0]:
                        best = (acc, float(m), float(q), float(nm))
        _, margin, ink_min, niou_max = best
        print(f"best combo: margin {margin:.2f}, ink_min {ink_min:.1f}, "
              f"niou_max {niou_max:.1f} (calib acc {best[0]:.3f} vs OFF "
              f"{base_acc:.3f})")
    else:
        margin, ink_min, niou_max = args.margin, args.ink_min, 0.3
        print(f"margin fixed at {margin}, ink_min {ink_min}")

    # ---- 2. stratified eval (seed 7, the failure-modes stream) ----
    from cluttered_failure_modes import pair_overlaps
    nb = max(1, args.scenes // args.batch)
    gt, base, sc, gn, ink, niou, bbox = collect(
        cfg, state, threshold, nms_iou, nb, args.batch, 7, args.top_m)
    ref = counts_at(base, sc, gn, ink, niou, threshold, margin, ink_min,
                    niou_max)
    n_pairs = np.asarray([pair_overlaps(np.asarray(bbox[i]), int(gt[i]))[0]
                          for i in range(len(gt))])

    print(f"\neval ({len(gt)} scenes, seed 7, margin {margin:.2f}):")
    print(f"{'pairs':>6} {'scenes':>7} {'acc off':>8} {'acc ON':>8} "
          f"{'err off':>8} {'err ON':>8}")
    table = {}
    for lo, hi in ((0, 0), (1, 1), (2, 2), (3, 4), (5, 99)):
        sel = (n_pairs >= lo) & (n_pairs <= hi)
        if sel.sum() == 0:
            continue
        label = f"{lo}" if lo == hi else f"{lo}-{hi}"
        acc_off = (base[sel] == gt[sel]).mean()
        acc_on = (ref[sel] == gt[sel]).mean()
        print(f"{label:>6} {sel.sum():>7} {acc_off:>8.3f} {acc_on:>8.3f} "
              f"{(base[sel] - gt[sel]).mean():>+8.3f} "
              f"{(ref[sel] - gt[sel]).mean():>+8.3f}")
        table[label] = {"scenes": int(sel.sum()), "acc_off": float(acc_off),
                        "acc_on": float(acc_on)}

    acc_off, acc_on = (base == gt).mean(), (ref == gt).mean()
    print(f"\noverall: OFF {acc_off:.3f} -> ON {acc_on:.3f}  "
          f"(mean err {(base - gt).mean():+.3f} -> {(ref - gt).mean():+.3f}; "
          f"splits/scene {(ref - base).mean():.2f})")
    # split placement diagnostic: where do accepted splits land?
    live = sc >= threshold
    acc_mask = (live & (gn > margin) & (ink >= ink_min)
                & (niou <= niou_max))
    under = base < gt
    print(f"accepted-split rate on undercounted scenes: "
          f"{acc_mask[under].sum() / max(1, under.sum()):.2f}/scene; "
          f"on correct scenes: "
          f"{acc_mask[base == gt].sum() / max(1, (base == gt).sum()):.2f}"
          f"/scene")
    # discrimination diagnostics: gain/ink distributions by scene status
    for name, mask in (("undercounted", under), ("correct", base == gt)):
        if mask.sum() and live[mask].sum():
            g, k = gn[mask][live[mask]], ink[mask][live[mask]]
            print(f"  {name:>12} live dets: gain p50/p90 "
                  f"{np.percentile(g, 50):+.3f}/{np.percentile(g, 90):+.3f}"
                  f"  ink p50/p90 {np.percentile(k, 50):.1f}/"
                  f"{np.percentile(k, 90):.1f}")
    print(json.dumps({"margin": margin, "ink_min": float(ink_min),
                      "niou_max": float(niou_max),
                      "overall_off": float(acc_off),
                      "overall_on": float(acc_on), "strata": table}))


if __name__ == "__main__":
    main()
