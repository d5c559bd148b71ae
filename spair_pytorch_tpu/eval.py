"""Evaluation CLI: restore a checkpoint, measure detection metrics.

The reference has no standalone evaluation path (metrics are computed
inline on training batches, reference train.py:76-82). This evaluates a
trained checkpoint on freshly generated scenes: reference-compatible AP and
signed count error, plus the corrected center-based AP and exact count
accuracy, averaged over --batches batches; optionally writes a renderer
analysis figure.

Usage:
    python -m spair_pytorch_tpu.eval --logdir runs/paper128_50k \
        --preset paper128 --batches 16 --figure out.png
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from spair_pytorch_tpu import metrics as metric
from spair_pytorch_tpu.config import PRESETS
from spair_pytorch_tpu.models import forward
from spair_pytorch_tpu.parallel import create_train_state
from spair_pytorch_tpu.train import make_data
from spair_pytorch_tpu.utils.compile_cache import enable_persistent_cache


def evaluate(cfg, state, batches: int = 32, data=None, seed: int = 1234,
             digits: str = "auto", det_threshold=None, det_nms=None):
    data = iter(data if data is not None else
                make_data(cfg, seed=seed, digits=digits))
    img_size = cfg.image_shape[-1]

    # AP@0.5 is the headline, but SPAIR boxes on scattered-MNIST hover near
    # IoU 0.5 against the 28 px patch GT (predictions hug the ink, which is
    # tighter than the patch), so a few-percent tightness shift tips the
    # binary threshold from ~0.95 to ~0. Pool matches at several thresholds
    # so the cliff is visible instead of masquerading as a model collapse
    # (observed: the presence-gated training arm "collapsed" to AP@0.5=0
    # while AP@0.4 stayed at 0.978, above its control).
    ap_thresholds = (0.3, 0.4, 0.5, 0.6)

    from spair_pytorch_tpu.models.infer import detect

    @jax.jit
    def run(params, x, step, rng, gt_bbox, gt_count):
        _, aux = forward(params, cfg, x, step, rng)
        matches = {t: metric.match_predictions(
            aux["z_where"], aux["z_pres"], gt_bbox, gt_count, img_size,
            iou_threshold=t) for t in ap_thresholds}
        # deterministic-detector counts alongside the reference-semantics
        # stochastic rounding: on overlap-heavy scenes borderline presences
        # make the rounded sample noisy, and the measured best operating
        # point is the zero-noise detector at threshold ~0.7 (+0.08 exact
        # accuracy on cluttered — benchmarks/cluttered_failure_modes.py)
        det = detect(params, x, cfg)
        gt = gt_count[:, 0]
        out = {
            "bbox_average_precision": metric.mAP(
                aux["z_where"], aux["z_pres"], gt_bbox, gt_count, img_size),
            "bbox_ap_center": metric.mAP_center(
                aux["z_where"], aux["z_pres"], gt_bbox, gt_count, img_size),
            "object_count_error": metric.object_count_error(
                aux["z_pres"], gt_count),
            "count_exact_accuracy": metric.count_accuracy(
                aux["z_pres"], gt_count),
            "det_count_acc_50": jnp.mean(
                (det["count"] == gt).astype(jnp.float32)),
            "det_count_acc_70": jnp.mean(
                (jnp.sum(det["scores"] >= 0.7, axis=-1) == gt)
                .astype(jnp.float32)),
        }
        if det_threshold is not None:
            # calibrated operating point (from calibrate(); measured on
            # DIFFERENT scenes than the calibration set — seeds differ)
            scores_cal = det["scores"]
            if det_nms is not None:
                from spair_pytorch_tpu.models.infer import nms_keep_batch
                scores_cal = scores_cal * nms_keep_batch(
                    det["boxes"], det["scores"], det_nms)
            out["det_count_acc_cal"] = jnp.mean(
                (jnp.sum(scores_cal >= det_threshold, axis=-1) == gt)
                .astype(jnp.float32))
        return out, aux, matches

    rng = jax.random.PRNGKey(seed)
    sums, aux_last, x_last = None, None, None
    pooled = {t: [] for t in ap_thresholds}  # per-threshold (scores, tp, n_gt)
    for i in range(batches):
        x, gt_bbox, gt_count = next(data)
        m, aux_last, matches = run(state.params, x, state.step,
                                   jax.random.fold_in(rng, i),
                                   gt_bbox, gt_count)
        m, matches = jax.device_get((m, matches))
        for t in ap_thresholds:
            pooled[t].append(matches[t])
        x_last = x
        sums = m if sums is None else {k: sums[k] + m[k] for k in m}
    result = {k: float(v) / batches for k, v in sums.items()}
    for t in ap_thresholds:
        result[f"ap_at_{int(t * 100)}"] = metric.average_precision(
            np.concatenate([p[0] for p in pooled[t]]),
            np.concatenate([p[1] for p in pooled[t]]),
            np.concatenate([p[2] for p in pooled[t]]))
    result["step"] = int(state.step)
    return result, aux_last, x_last


# calibration grids: presence threshold 0.30 .. 0.90 by 0.05, and greedy
# NMS off/mild (the nms_sweep benchmark shows aggressive NMS < 0.5 removes
# TRUE overlapping neighbors and craters accuracy, so it isn't swept)
CALIB_THRESHOLDS = tuple(round(0.30 + 0.05 * i, 2) for i in range(13))
CALIB_NMS = (None, 0.5, 0.6, 0.7)


def calibrate(cfg, state, batches: int = 8, data=None, seed: int = 4321,
              digits: str = "auto", thresholds=CALIB_THRESHOLDS,
              nms_grid=CALIB_NMS, target: str = "count"):
    """Pick the detector operating point (presence threshold x NMS IoU)
    by exact-count accuracy on held-out scenes.

    target='count' (default) maximizes exact count accuracy jointly over
    (threshold x NMS). target='ap50' serves detection-quality deployments:
    the NMS setting is picked by pooled dataset AP@0.5 over the calibration
    scenes (AP integrates over the score ranking, so the presence threshold
    cannot move it — only duplicate suppression can), and the threshold is
    then picked by count accuracy WITHIN that NMS row, so the artifact
    still serves a sensible count cutoff.

    Why this exists: on overlap-heavy scenes the posterior leaves
    BORDERLINE presence probabilities (benchmarks/cluttered_failure_modes.py
    — 65% of miscounted scenes hold a score in (0.2, 0.8)) plus duplicate
    detections at moderate overlap, and the best operating point moves
    with the data distribution (cluttered: threshold 0.75 is +0.07 exact
    accuracy over 0.5, mild NMS@0.6 another +0.02 — benchmarks/nms_sweep.py;
    paper128: insensitive). This turns those measured operating points
    into a stored artifact (<logdir>/calibration.json) that serve.py
    picks up automatically.

    Uses its own seed (default 4321) so the calibration scenes are disjoint
    from evaluate()'s default eval stream (seed 1234).
    """
    import functools

    from spair_pytorch_tpu.models.infer import detect

    data = iter(data if data is not None else
                make_data(cfg, seed=seed, digits=digits))
    th = jnp.asarray(thresholds, dtype=jnp.float32)

    @functools.partial(jax.jit, static_argnums=4)
    def run(params, x, gt_bbox, gt_count, nms_iou):
        det = detect(params, x, cfg, nms_iou=nms_iou)
        # counts per threshold: (B, T)
        counts = jnp.sum(det["scores"][:, None, :] >= th[None, :, None],
                         axis=-1)
        hits = jnp.sum((counts == gt_count[:, :1]).astype(jnp.float32),
                       axis=0)
        matches = metric.match_boxes(det["boxes"], det["scores"],
                                     gt_bbox, gt_count, iou_threshold=0.5)
        return hits, matches

    hits = {g: np.zeros(len(thresholds)) for g in nms_grid}
    pooled = {g: [] for g in nms_grid}  # (scores, tp, n_gt) per batch
    scenes = 0
    for _ in range(batches):
        x, gt_bbox, gt_count = next(data)
        for g in nms_grid:
            h, m = jax.device_get(run(state.params, x, gt_bbox,
                                      gt_count, g))
            hits[g] += h
            pooled[g].append(m)
        scenes += x.shape[0]

    ap50 = {g: metric.average_precision(
        np.concatenate([p[0] for p in pooled[g]]),
        np.concatenate([p[1] for p in pooled[g]]),
        np.concatenate([p[2] for p in pooled[g]])) for g in nms_grid}

    if target == "ap50":
        # NMS by pooled AP (ties prefer the simpler graph = earlier in the
        # grid), then threshold by count accuracy within that row
        best_g = max(nms_grid, key=lambda g: ap50[g])
        grid_for_threshold = (best_g,)
    elif target == "count":
        grid_for_threshold = nms_grid
    else:
        raise ValueError(f"unknown calibration target {target!r}")

    table = {}
    best = (-1.0, None, 0.5)  # (acc, nms, threshold)
    for g in nms_grid:  # None first: ties prefer the simpler serving graph
        acc = hits[g] / scenes
        key = "none" if g is None else f"{g:.1f}"
        table[key] = {f"{t:.2f}": float(a)
                      for t, a in zip(thresholds, acc)}
        if g not in grid_for_threshold:
            continue
        # ties within a grid row: prefer the threshold closest to 0.5
        # (least aggressive departure from the reference operating point)
        order = np.lexsort((np.abs(np.asarray(thresholds) - 0.5), -acc))
        if acc[order[0]] > best[0]:
            best = (float(acc[order[0]]), g, thresholds[order[0]])
    return {
        "pres_threshold": float(best[2]),
        "nms_iou": best[1],
        "target": target,
        "count_accuracy": table,
        "ap_at_50": {("none" if g is None else f"{g:.1f}"): float(ap50[g])
                     for g in nms_grid},
        "scenes": scenes,
        "seed": seed,
        "step": int(state.step),
    }


def main(argv=None):
    enable_persistent_cache()  # SPAIR_COMPILE_CACHE=0 opts out
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--logdir", required=True)
    p.add_argument("--preset", default="paper128", choices=sorted(PRESETS))
    p.add_argument("--mode", default=None,
                   choices=[None, "independent", "raster", "wavefront", "rowscan"],
                   help="override inference mode (match how it was trained)")
    p.add_argument("--batches", type=int, default=32,
                   help="batches to pool for dataset-level AP@0.5 (32 x b32 = 1,024 scenes)")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    p.add_argument("--figure", default=None,
                   help="write a renderer-analysis PNG here")
    p.add_argument("--digits", default="auto",
                   choices=["auto", "mnist", "sklearn", "font"],
                   help="digit patch source for the eval scenes (match "
                        "what training used)")
    p.add_argument("--calibrate", action="store_true",
                   help="sweep the detector presence threshold on held-out "
                        "scenes (disjoint seed) and store the best one in "
                        "<logdir>/calibration.json; serve.py then uses it")
    p.add_argument("--calib-batches", type=int, default=8,
                   help="batches for the calibration sweep")
    p.add_argument("--calib-target", default="count",
                   choices=["count", "ap50"],
                   help="calibration objective: exact count accuracy "
                        "(joint threshold x NMS) or pooled AP@0.5 (picks "
                        "NMS by AP; threshold by count within that row)")
    args = p.parse_args(argv)

    import dataclasses
    import os

    from spair_pytorch_tpu.utils.checkpoint import CheckpointManager

    overrides = {"inference_mode": args.mode} if args.mode else {}
    saved = os.path.join(args.logdir, "config.json")
    if os.path.exists(saved):
        # prefer the run's own persisted config (written by train) so the
        # eval forward matches how the checkpoint was trained; CLI --mode
        # still overrides.
        from spair_pytorch_tpu.config import config_from_json
        with open(saved) as f:
            cfg = config_from_json(f.read())
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
    else:
        cfg = PRESETS[args.preset](**overrides)
    state = create_train_state(cfg)
    mgr = CheckpointManager(os.path.join(args.logdir, "checkpoints"))
    restored = mgr.restore(state, step=args.step, params_only=True)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.logdir}")
    state = restored

    cal_path = os.path.join(args.logdir, "calibration.json")
    cal = None
    if args.calibrate:
        cal = calibrate(cfg, state, batches=args.calib_batches,
                        digits=args.digits, target=args.calib_target)
        with open(cal_path, "w") as f:
            json.dump(cal, f, indent=2)
        print(f"calibrated pres_threshold = {cal['pres_threshold']}, "
              f"nms_iou = {cal['nms_iou']} "
              f"({cal['scenes']} scenes) -> wrote {cal_path}")
    elif os.path.exists(cal_path):
        with open(cal_path) as f:
            cal = json.load(f)

    result, aux, x = evaluate(
        cfg, state, batches=args.batches, digits=args.digits,
        det_threshold=cal["pres_threshold"] if cal else None,
        det_nms=cal.get("nms_iou") if cal else None)
    print(json.dumps(result, indent=2))

    if args.figure:
        from spair_pytorch_tpu.utils.viz import render_analysis_figure
        aux = jax.device_get(aux)
        fig = render_analysis_figure(np.asarray(x), aux["recon"],
                                     aux["z_where"], aux["z_pres"],
                                     aux["z_depth"])
        fig.savefig(args.figure, dpi=120)
        print(f"wrote {args.figure}")


if __name__ == "__main__":
    main()
