"""Mechanism probe for the n_object_slots=2 negative (RESULTS.md round 4).

The S=2 cluttered run (runs/r4_slots2) FAILED its bar: the 5+-overlap
stratum read 0.576 (baseline 0.584/0.600) with a deeper undercount
(-0.27). This probe discriminates WHY, at the calibrated operating point:

  (a) dead slot: one slot of each cell never fires (symmetry breaking
      failed / no gradient incentive) -> slot-1 share of detections ~0;
  (b) duplicate-then-suppressed: both slots fire on the SAME digit and
      NMS removes one -> high both-slots-fire rate pre-NMS, but the
      pair's IoU is high and post-NMS the cell still yields 1;
  (c) capacity unused where needed: cells that actually contain TWO GT
      digit centers still emit <=1 detection even pre-NMS -> the
      posterior merges evidence before capacity matters.

Usage:
    python benchmarks/slot_usage_probe.py --logdir runs/r4_slots2 \
        --scenes 512
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--logdir", required=True)
    p.add_argument("--scenes", type=int, default=512)
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()

    from spair_pytorch_tpu.config import config_from_json
    from spair_pytorch_tpu.data import DataConfig, digit_bank
    from spair_pytorch_tpu.data.scattered_mnist import generate_batch
    from spair_pytorch_tpu.models.infer import detect
    from spair_pytorch_tpu.parallel import create_train_state
    from spair_pytorch_tpu.serve import resolve_nms, resolve_threshold
    from spair_pytorch_tpu.utils.checkpoint import CheckpointManager

    with open(os.path.join(args.logdir, "config.json")) as f:
        cfg = config_from_json(f.read())
    cfg = dataclasses.replace(cfg, batch_size=args.batch)
    s = cfg.n_object_slots
    assert s > 1, "probe only makes sense for n_object_slots > 1"
    from spair_pytorch_tpu.models.spair import geometry
    _, (gh, gw), (cell_h, cell_w) = geometry(cfg)
    n_cells = gh * gw
    state = create_train_state(cfg)
    state = CheckpointManager(os.path.join(args.logdir, "checkpoints")
                              ).restore(state, params_only=True)
    assert state is not None

    threshold = resolve_threshold(None, args.logdir)
    nms_iou = resolve_nms(None, args.logdir)
    print(f"operating point: threshold {threshold}, nms {nms_iou}; "
          f"grid {gh}x{gw} x {s} slots")
    det_nms = jax.jit(lambda pp, x: detect(pp, x, cfg, threshold,
                                           nms_iou=nms_iou))
    det_raw = jax.jit(lambda pp, x: detect(pp, x, cfg, threshold,
                                           nms_iou=None))

    bank = jnp.asarray(digit_bank("auto", (14, 14)))
    dcfg = DataConfig(image_hw=cfg.image_shape[1:],
                      max_objects=cfg.max_scene_objects,
                      min_objects=max(1, cfg.max_scene_objects - 3))

    # cell pitch in pixels (cells tile the image)
    pitch_y, pitch_x = float(cell_h), float(cell_w)

    tot = dict(cells=0, fire1=0, fire2=0, post1=0, post2=0,
               slot_fires=np.zeros(s), det_total=0,
               gt2_cells=0, gt2_fire2_raw=0, gt2_fire1_raw=0,
               gt2_fire0_raw=0, gt2_post2=0)
    n_b = max(1, args.scenes // args.batch)
    for i in range(n_b):
        key = jax.random.fold_in(jax.random.PRNGKey(11), i)
        x, bbox, count = generate_batch(key, bank, args.batch, dcfg)
        raw, nms, bbox, count = jax.device_get(
            (det_raw(state.params, x), det_nms(state.params, x),
             bbox, count))
        # scores: (B, n_cells * s), slot-fastest virtual axis
        rs = np.asarray(raw["scores"]).reshape(args.batch, n_cells, s)
        ns = np.asarray(nms["scores"]).reshape(args.batch, n_cells, s)
        rfire = rs >= threshold
        nfire = ns >= threshold
        per_cell_r = rfire.sum(-1)          # (B, n_cells) in {0..s}
        per_cell_n = nfire.sum(-1)
        tot["cells"] += rfire.shape[0] * n_cells
        tot["fire1"] += int((per_cell_r == 1).sum())
        tot["fire2"] += int((per_cell_r >= 2).sum())
        tot["post1"] += int((per_cell_n == 1).sum())
        tot["post2"] += int((per_cell_n >= 2).sum())
        tot["slot_fires"] += rfire.sum((0, 1))
        tot["det_total"] += int(rfire.sum())

        # GT-center cell occupancy: cells holding >=2 digit centers
        for b in range(args.batch):
            m = int(count[b, 0])
            cx = bbox[b, :m, 0] + bbox[b, :m, 2] / 2
            cy = bbox[b, :m, 1] + bbox[b, :m, 3] / 2
            cell = (np.clip((cy / pitch_y).astype(int), 0, gh - 1) * gw
                    + np.clip((cx / pitch_x).astype(int), 0, gw - 1))
            occ = np.bincount(cell, minlength=n_cells)
            multi = np.where(occ >= 2)[0]
            tot["gt2_cells"] += len(multi)
            tot["gt2_fire2_raw"] += int((per_cell_r[b, multi] >= 2).sum())
            tot["gt2_fire1_raw"] += int((per_cell_r[b, multi] == 1).sum())
            tot["gt2_fire0_raw"] += int((per_cell_r[b, multi] == 0).sum())
            tot["gt2_post2"] += int((per_cell_n[b, multi] >= 2).sum())

    n_scenes = n_b * args.batch
    print(f"\nscenes {n_scenes}  cells/scene {n_cells}")
    print(f"pre-NMS  cells firing exactly 1 slot: {tot['fire1']}  "
          f"(both slots: {tot['fire2']})")
    print(f"post-NMS cells yielding 1 detection: {tot['post1']}  "
          f"(2 detections: {tot['post2']})")
    share = tot["slot_fires"] / max(tot["det_total"], 1)
    print(f"slot share of pre-NMS detections: "
          + ", ".join(f"slot{j} {share[j]:.3f}" for j in range(s)))
    print(f"\ncells with >=2 GT digit centers: {tot['gt2_cells']} "
          f"({tot['gt2_cells'] / n_scenes:.2f}/scene)")
    if tot["gt2_cells"]:
        g = tot["gt2_cells"]
        print(f"  of those, pre-NMS the cell fires 2 slots: "
              f"{tot['gt2_fire2_raw'] / g:.3f}, 1 slot: "
              f"{tot['gt2_fire1_raw'] / g:.3f}, 0: "
              f"{tot['gt2_fire0_raw'] / g:.3f}")
        print(f"  post-NMS still 2 detections: {tot['gt2_post2'] / g:.3f}")
    print(json.dumps({
        "both_slot_fire_rate": tot["fire2"] / max(tot["cells"], 1),
        "slot1_share": float(share[1]) if s > 1 else 0.0,
        "gt2_cells_per_scene": tot["gt2_cells"] / n_scenes,
        "gt2_resolved_rate": (tot["gt2_fire2_raw"] / tot["gt2_cells"])
        if tot["gt2_cells"] else None}))


if __name__ == "__main__":
    main()
