"""Detection metrics, reference-compatible.

TPU-native counterpart of reference ``spair/metric.py``. The reference math
is reproduced exactly, INCLUDING its documented quirks (SURVEY.md section 2
quirks #1-2), because training curves are compared against it:

  * ``mAP`` treats z_where's (xt, yt) as a TOP-LEFT corner when converting
    to corner boxes (metric.py:21), although the renderer treats it as the
    box CENTER. It is also not COCO mAP: per-GT best IoU is soft-thresholded
    over 0.1..0.9 (metric.py:39-41) and predictions are not masked by
    z_pres (the masked tensor is computed then unused, metric.py:28).
  * ``object_count_error`` is the reference's ``object_count_accuracy``: a
    SIGNED mean count error (truth - predicted), not an accuracy
    (metric.py:49-56).

Corrected variants (``mAP_center``, ``count_accuracy``) are provided
alongside for honest evaluation; both families are jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_grid(t):
    """(B, D, gh, gw) -> (B, gh*gw, D) (reference metric.py:16-17)."""
    b, d = t.shape[:2]
    return jnp.transpose(t, (0, 2, 3, 1)).reshape(b, -1, d)


def intersect(box_a, box_b):
    """Pairwise intersection areas of corner boxes (reference metric.py:59-79).
    box_a (B, A, 4), box_b (B, M, 4) -> (B, A, M)."""
    max_xy = jnp.minimum(box_a[:, :, None, 2:], box_b[:, None, :, 2:])
    min_xy = jnp.maximum(box_a[:, :, None, :2], box_b[:, None, :, :2])
    wh = jnp.clip(max_xy - min_xy, 0.0, None)
    return wh[..., 0] * wh[..., 1]


def batch_jaccard(box_a, box_b):
    """Pairwise IoU of corner boxes (reference metric.py:82-100)."""
    inter = intersect(box_a, box_b)
    area_a = ((box_a[..., 2] - box_a[..., 0])
              * (box_a[..., 3] - box_a[..., 1]))[:, :, None]
    area_b = ((box_b[..., 2] - box_b[..., 0])
              * (box_b[..., 3] - box_b[..., 1]))[:, None, :]
    union = area_a + area_b - inter
    return inter / union


def _soft_ap(best_iou, gt_count):
    """Soft-thresholded AP over 0.1:0.1:0.9, normalized by GT count
    (reference metric.py:39-47). best_iou (B, M), gt_count (B, 1)."""
    thresholds = jnp.arange(0.1, 1.0, 0.1)
    scaled = jnp.clip((best_iou[..., None] - thresholds) / (1.0 - thresholds),
                      0.0, 1.0)
    ap = jnp.mean(scaled, axis=-1)  # (B, M)
    mean_ap = jnp.sum(ap, axis=-1, keepdims=True) / gt_count
    return jnp.mean(mean_ap)


def mAP(z_where, z_pres, gt_bbox, gt_count, image_size: int):
    """Reference-compatible AP (reference metric.py:5-47).

    z_where: (B, 4, gh, gw) normalized [xt, yt, xs, ys]; gt_bbox: (B, M, 4)
    pixel [x, y, w, h]; gt_count: (B, 1). Scales predictions by the image
    size and converts both to corner boxes by adding size to ORIGIN —
    i.e. treats (xt, yt) as top-left, the reference quirk."""
    del z_pres  # computed-but-unused in the reference too (metric.py:27-28)
    pred = _flatten_grid(z_where) * image_size
    pred = jnp.concatenate([pred[..., :2], pred[..., :2] + pred[..., 2:]],
                           axis=-1)
    gt = jnp.concatenate([gt_bbox[..., :2], gt_bbox[..., :2] + gt_bbox[..., 2:]],
                         axis=-1)
    ious = batch_jaccard(pred, gt)           # (B, N, M)
    best = jnp.max(ious, axis=1)             # per-GT best prediction
    return _soft_ap(best, gt_count)


def mAP_center(z_where, z_pres, gt_bbox, gt_count, image_size: int,
               pres_threshold: float = 0.5):
    """Corrected AP: (xt, yt) treated as box center (matching the renderer,
    reference models.py:373-376) and predictions gated by z_pres."""
    pred = _flatten_grid(z_where) * image_size
    half = pred[..., 2:] / 2.0
    pred = jnp.concatenate([pred[..., :2] - half, pred[..., :2] + half],
                           axis=-1)
    pres = _flatten_grid(z_pres)[..., 0]
    pred = pred * (pres >= pres_threshold)[..., None]
    gt = jnp.concatenate([gt_bbox[..., :2], gt_bbox[..., :2] + gt_bbox[..., 2:]],
                         axis=-1)
    # safe IoU: masked-out predictions and padded GT slots are zero-area
    # boxes, whose pairwise union is 0 — guard the division (the
    # reference-compatible mAP above keeps the unguarded math).
    inter = intersect(pred, gt)
    area_a = ((pred[..., 2] - pred[..., 0])
              * (pred[..., 3] - pred[..., 1]))[:, :, None]
    area_b = ((gt[..., 2] - gt[..., 0])
              * (gt[..., 3] - gt[..., 1]))[:, None, :]
    iou = inter / jnp.maximum(area_a + area_b - inter, 1e-9)
    best = jnp.max(iou, axis=1)
    return _soft_ap(best, gt_count)


def object_count_error(z_pres, gt_count):
    """Reference 'object_count_accuracy' (metric.py:49-56): signed mean
    (truth - sum(round(z_pres)))."""
    pred_count = jnp.sum(jnp.round(_flatten_grid(z_pres)), axis=1)
    return jnp.mean(gt_count - pred_count)


def count_accuracy(z_pres, gt_count):
    """Fraction of images whose rounded object count is exactly right —
    the paper's count-accuracy metric."""
    pred_count = jnp.sum(jnp.round(_flatten_grid(z_pres)), axis=1)
    return jnp.mean((pred_count == gt_count).astype(jnp.float32))


def match_predictions(z_where, z_pres, gt_bbox, gt_count, image_size: int,
                      iou_threshold: float = 0.5):
    """Greedy score-ordered prediction/GT matching for STANDARD AP.

    Neither the reference's soft-thresholded per-GT metric nor its corner
    quirk — this is the Pascal-VOC/COCO matching rule: predictions sorted
    by confidence (z_pres), each matched to the highest-IoU unmatched GT;
    a match with IoU >= threshold is a true positive. Boxes use the
    renderer's CENTER semantics (reference models.py:373-376).

    Returns (scores (B, N), tp (B, N) float 0/1, n_gt (B,)) — pool these
    across the eval set and feed ``average_precision`` for the dataset AP.
    """
    pred = _flatten_grid(z_where) * image_size
    half = pred[..., 2:] / 2.0
    pred = jnp.concatenate([pred[..., :2] - half, pred[..., :2] + half],
                           axis=-1)
    scores = _flatten_grid(z_pres)[..., 0]                     # (B, N)
    return match_boxes(pred, scores, gt_bbox, gt_count, iou_threshold)


def match_boxes(pred, scores, gt_bbox, gt_count, iou_threshold: float = 0.5):
    """``match_predictions`` for detector-format inputs: pixel-space
    CORNER boxes (B, N, 4) [x0, y0, x1, y1] + scores (B, N) — the shape
    ``models.infer.detect`` returns, optionally NMS-suppressed. Suppressed
    boxes carry score 0 and are EXCLUDED from matching entirely: they can
    neither register a true positive nor claim a GT (without the exclusion
    a wrongly-suppressed true detection would keep a tail-precision sliver
    of AP mass, biasing NMS calibration toward over-suppression — ADVICE
    round 3). Same greedy score-ordered matching rule; returns the same
    pooled (scores, tp, n_gt)."""
    gt = jnp.concatenate([gt_bbox[..., :2],
                          gt_bbox[..., :2] + gt_bbox[..., 2:]], axis=-1)
    m = gt.shape[1]
    gt_valid = jnp.arange(m)[None] < gt_count                   # (B, M)
    pred_valid = (scores > 0.0).astype(jnp.float32)             # (B, N)

    inter = intersect(pred, gt)
    area_a = ((pred[..., 2] - pred[..., 0])
              * (pred[..., 3] - pred[..., 1]))[:, :, None]
    area_b = ((gt[..., 2] - gt[..., 0])
              * (gt[..., 3] - gt[..., 1]))[:, None, :]
    ious = inter / jnp.maximum(area_a + area_b - inter, 1e-9)   # (B, N, M)

    order = jnp.argsort(-scores, axis=1)                        # (B, N)

    def per_image(ious_i, order_i, valid_i, pvalid_i):
        def body(matched, idx):
            cand = ious_i[idx] * valid_i * (1.0 - matched) * pvalid_i[idx]
            j = jnp.argmax(cand)
            hit = cand[j] >= iou_threshold
            matched = matched.at[j].max(hit.astype(matched.dtype))
            return matched, hit.astype(jnp.float32)

        _, tp_ordered = jax.lax.scan(body, jnp.zeros(m), order_i)
        # back to grid order so tp aligns with scores
        inv = jnp.zeros_like(order_i).at[order_i].set(
            jnp.arange(order_i.shape[0]))
        return tp_ordered[inv]

    tp = jax.vmap(per_image)(ious, order, gt_valid.astype(jnp.float32),
                             pred_valid)
    return scores, tp, jnp.sum(gt_valid, axis=1)


def average_precision(scores, tp, n_gt) -> float:
    """Dataset-level AP from pooled ``match_predictions`` outputs: sort all
    predictions by score, build the precision/recall curve, and integrate
    with all-point interpolation (Pascal VOC 2010+). Host-side numpy."""
    scores = np.asarray(scores).reshape(-1)
    tp = np.asarray(tp).reshape(-1)
    total_gt = float(np.sum(np.asarray(n_gt)))
    if total_gt == 0:
        return 0.0
    # NMS-suppressed predictions (score 0, tp forced 0 by match_boxes) are
    # dropped rather than integrated as tail false positives
    live = scores > 0.0
    scores, tp = scores[live], tp[live]
    order = np.argsort(-scores)
    tp = tp[order]
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(1.0 - tp)
    recall = cum_tp / total_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)
    # envelope: precision at recall r = max precision at recall >= r
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    # integrate over recall deltas
    recall = np.concatenate([[0.0], recall])
    return float(np.sum((recall[1:] - recall[:-1]) * precision))
