"""Serving-detector compute-dtype A/B: bfloat16 vs float32 parity.

The serving path (`models/infer.detect`) has only ever been measured in
f32 — every trained checkpoint's config carries compute_dtype='float32'
(training quality lanes are f32), and the round-5 serving batch sweep
inherited that. But the MXU's peak is bf16, so inference-only bf16 is a
candidate free-throughput lever IF detections survive the precision drop
at the calibrated operating point. This probe measures that parity half;
the throughput half is `serve_batch_sweep.py --dtypes float32,bfloat16`
(interleaved arms, fused-K delta timing).

Per dtype arm, on the eval stream (seed 1234 — disjoint from the 4321
calibration scenes), at the checkpoint's calibrated operating point:

  * calibrated exact-count accuracy vs GT
  * pooled AP@0.5 from detector boxes (metrics.match_boxes)

and arm-vs-arm on the SAME scenes:

  * fraction of scenes whose calibrated count is identical
  * mean / max |delta presence score| over all cells
  * mean |delta box coordinate| (px) over cells above threshold in
    EITHER arm (borderline cells included — that's where bf16 can flip)

No reference counterpart (the reference has no serving path, and trains
f32-only CUDA — /root/reference/train.py:65). Usage:

    python benchmarks/serve_dtype_ab.py --logdir runs/r5_cluttered_s1 \
        --batches 16
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from spair_pytorch_tpu import metrics as metric
from spair_pytorch_tpu.config import PRESETS, config_from_json
from spair_pytorch_tpu.models.infer import detect
from spair_pytorch_tpu.parallel import create_train_state
from spair_pytorch_tpu.train import make_data
from spair_pytorch_tpu.serve import resolve_nms, resolve_threshold
from spair_pytorch_tpu.utils.compile_cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="paper128", choices=sorted(PRESETS))
    p.add_argument("--logdir", required=True)
    p.add_argument("--batches", type=int, default=16)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--threshold", type=float, default=None)
    p.add_argument("--nms", type=float, default=None)
    args = p.parse_args()

    cfg = PRESETS[args.preset]()
    saved = os.path.join(args.logdir, "config.json")
    if os.path.exists(saved):
        with open(saved) as f:
            cfg = config_from_json(f.read())

    state = create_train_state(cfg)
    from spair_pytorch_tpu.utils.checkpoint import CheckpointManager
    mgr = CheckpointManager(os.path.join(args.logdir, "checkpoints"))
    restored = mgr.restore(state, params_only=True)
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.logdir}")
    state = restored
    print(f"restored step {int(state.step)} from {args.logdir}")

    threshold = resolve_threshold(args.threshold, args.logdir)
    nms_iou = resolve_nms(args.nms, args.logdir)
    print(f"operating point: threshold {threshold}, nms {nms_iou}; "
          f"trained compute_dtype={cfg.compute_dtype}")

    arms = {
        "float32": dataclasses.replace(cfg, compute_dtype="float32"),
        "bfloat16": dataclasses.replace(cfg, compute_dtype="bfloat16"),
    }

    def run_factory(cfg_arm):
        @jax.jit
        def run(params, x, gt_bbox, gt_count):
            # detect() applies NMS internally (suppressed scores -> 0)
            det = detect(params, x, cfg_arm, pres_threshold=threshold,
                         nms_iou=nms_iou)
            count = jnp.sum(det["scores"] >= threshold, axis=-1)
            hits = jnp.sum((count == gt_count[:, 0]).astype(jnp.float32))
            matches = metric.match_boxes(det["boxes"], det["scores"],
                                         gt_bbox, gt_count,
                                         iou_threshold=0.5)
            return det["boxes"], det["scores"], count, hits, matches
        return run

    runs = {k: run_factory(c) for k, c in arms.items()}

    data = iter(make_data(cfg, seed=args.seed))
    scenes = 0
    hits = {k: 0.0 for k in arms}
    pooled = {k: [] for k in arms}
    agree_scenes = 0
    d_score_sum, d_score_max, d_score_n = 0.0, 0.0, 0
    d_box_sum, d_box_n = 0.0, 0

    for i in range(args.batches):
        x, gt_bbox, gt_count = next(data)
        out = {}
        for k in arms:
            boxes, scores, count, h, m = jax.device_get(
                runs[k](state.params, x, gt_bbox, gt_count))
            out[k] = (boxes, scores, count)
            hits[k] += float(h)
            pooled[k].append(m)
        scenes += x.shape[0]

        print(f"batch {i + 1}/{args.batches} done", flush=True)
        b32, s32, c32 = out["float32"]
        b16, s16, c16 = out["bfloat16"]
        agree_scenes += int(np.sum(c32 == c16))
        ds = np.abs(s32 - s16)
        d_score_sum += float(ds.sum())
        d_score_max = max(d_score_max, float(ds.max()))
        d_score_n += ds.size
        # box deltas on cells above threshold in either arm (post-NMS
        # scores: a flipped keep-mask shows up as a large score delta)
        live = (s32 >= threshold) | (s16 >= threshold)
        if live.any():
            db = np.abs(b32 - b16)[live]
            d_box_sum += float(db.sum())
            d_box_n += db.size

    print(f"\nscenes: {scenes}")
    report = {}
    for k in arms:
        ap50 = metric.average_precision(
            np.concatenate([p[0] for p in pooled[k]]),
            np.concatenate([p[1] for p in pooled[k]]),
            np.concatenate([p[2] for p in pooled[k]]))
        report[k] = {"count_acc_cal": hits[k] / scenes, "ap50": float(ap50)}
        print(f"{k:>9}: count_acc_cal {hits[k] / scenes:.4f}  "
              f"ap50 {ap50:.4f}")
    print(f"arm-vs-arm: count agreement {agree_scenes}/{scenes} "
          f"({agree_scenes / scenes:.4f})")
    print(f"  |dscore| mean {d_score_sum / max(d_score_n, 1):.2e} "
          f"max {d_score_max:.2e}")
    print(f"  |dbox| mean {d_box_sum / max(d_box_n, 1):.3f} px over "
          f"{d_box_n // 4} live boxes")
    print(json.dumps({"report": report,
                      "agreement": agree_scenes / scenes}))


if __name__ == "__main__":
    main()
