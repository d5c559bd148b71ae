"""Serving-path detector: images -> boxes, scores, counts.

No reference counterpart (the reference only exposes the training forward,
train.py:65). This is the deployment surface: a jitted, DETERMINISTIC
inference pass — posterior means instead of samples (zero noise), no KL, no
rendering, no loss — returning pixel-space detections.

    detect = make_detector(cfg)
    out = detect(params, images)          # images (B, C, H, W) in [0, 1]
    out["boxes"]   # (B, N, 4) pixel [x0, y0, x1, y1], center-based
    out["scores"]  # (B, N) presence probabilities
    out["count"]   # (B,) number of scores above the threshold
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from spair_pytorch_tpu.config import SpairConfig
from spair_pytorch_tpu.models.latents import geometry, sample_noise
from spair_pytorch_tpu.models.spair import infer_latents


def pairwise_iou(boxes):
    """IoU matrix (N, N) for corner-format boxes (N, 4) [x0, y0, x1, y1]."""
    x0 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y0 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x1 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y1 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.clip(x1 - x0, 0) * jnp.clip(y1 - y0, 0)
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) \
        * jnp.clip(boxes[:, 3] - boxes[:, 1], 0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_keep(boxes, scores, iou_threshold: float):
    """Greedy non-maximum suppression, jit-safe at fixed shape.

    boxes (N, 4) corner format, scores (N,) -> boolean keep mask (N,).
    Classic score-ordered greedy NMS: a box is suppressed iff a KEPT
    higher-scoring box overlaps it above the threshold (suppressed boxes
    do not themselves suppress). N is the static cell-grid size (121), so
    the O(N^2) IoU matrix + N-step fori_loop compile to fixed-shape
    vector ops — no dynamic shapes under jit.

    No reference counterpart (the reference has no serving path at all);
    this targets the measured duplicate-detection failure mode on
    overlapping scenes (benchmarks/RESULTS.md, cluttered failure-mode
    anatomy: duplicates at moderate overlap, merges at extreme).
    """
    n = scores.shape[0]
    order = jnp.argsort(-scores)
    iou = pairwise_iou(boxes[order])
    idx = jnp.arange(n)

    def body(i, keep):
        suppress = (iou[i] > iou_threshold) & (idx > i) & keep[i]
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, n, body, jnp.ones(n, bool))
    inv = jnp.zeros(n, jnp.int32).at[order].set(idx)
    return keep[inv]


def nms_keep_batch(boxes, scores, iou_threshold: float):
    """Batched greedy NMS: (B, N, 4), (B, N) -> boolean keep mask (B, N).

    Exactly the same keep set as ``nms_keep`` per image (asserted in
    tests/test_infer.py), computed without the N-step sequential loop.
    Greedy NMS is the unique fixpoint of the score-order recurrence

        keep_i = not any(keep_j and iou(j, i) > t  for j < i)

    over the sorted-order DAG (edges j -> i only for j < i), so Jacobi
    iteration from all-ones converges in (suppression-chain depth + 1)
    sweeps — measured 2-4 on real scenes, vs N = 121 sequential steps for
    the per-image fori_loop. Each sweep is one batched masked any-reduce
    over the (B, N, N) IoU tensor (docs/NEXT.md serving-throughput item:
    "one (B,121,121) masked matmul per step"), and a ``while_loop`` on
    "mask changed" exits as soon as the whole batch is converged.
    Serving-path only (boolean fixpoint — no gradients)."""
    b, n = scores.shape
    order = jnp.argsort(-scores, axis=-1)
    sorted_boxes = jnp.take_along_axis(boxes, order[..., None], axis=1)
    iou = jax.vmap(pairwise_iou)(sorted_boxes)
    # edge[b, i, j] = "j could suppress i": higher-scoring (j < i) and
    # overlapping above threshold
    lower = jnp.tril(jnp.ones((n, n), bool), k=-1)
    edge = (iou > iou_threshold) & lower[None]

    # sweep cap: convergence needs (suppression-chain depth + 1) <= n
    # sweeps (each sweep finalizes one more depth level), so the counter
    # only bounds pathological layouts — worst case n full (B, N, N)
    # reduces, same as n steps of the sequential loop (ADVICE round 3)
    def cond(state):
        _, changed, i = state
        return changed & (i < n)

    def body(state):
        keep, _, i = state
        new = ~jnp.any(edge & keep[:, None, :], axis=-1)
        return new, jnp.any(new != keep), i + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (jnp.ones((b, n), bool), jnp.array(True),
                     jnp.array(0, jnp.int32)))
    inv = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(keep, inv, axis=1)


def detect(params, x, cfg: SpairConfig, pres_threshold: float = 0.5,
           nms_iou=None):
    """Deterministic detection on a batch of images.

    nms_iou: optional IoU threshold for greedy NMS over each image's
    boxes (suppressed boxes get score 0, so they drop out of ``count``
    and any downstream thresholding)."""
    b = x.shape[0]
    _, (gh, gw), _ = geometry(cfg)
    # zero noise: samples collapse to posterior means; the presence logit
    # passes through sigmoid without logistic noise
    noise = jax.tree_util.tree_map(
        jnp.zeros_like, sample_noise(jax.random.PRNGKey(0), b, (gh, gw), cfg))
    # step far past the training-wheel cliff: stop-gradient mixing is
    # value-neutral, so any step works; this documents intent
    z = infer_latents(params, cfg, x, 10 ** 6, jax.random.PRNGKey(0), noise)

    n = gh * gw * cfg.n_object_slots
    img_h, img_w = cfg.image_shape[1:]
    zw = z["z_where"].reshape(b, n, 4)  # [xt, yt, xs, ys] normalized
    cx, cy = zw[..., 0] * img_w, zw[..., 1] * img_h
    bw, bh = zw[..., 2] * img_w, zw[..., 3] * img_h
    boxes = jnp.stack([cx - bw / 2, cy - bh / 2,
                       cx + bw / 2, cy + bh / 2], axis=-1)
    scores = z["z_pres_prob"].reshape(b, n)
    if nms_iou is not None:
        scores = scores * nms_keep_batch(boxes, scores, nms_iou)
    count = jnp.sum(scores >= pres_threshold, axis=-1)
    return {"boxes": boxes, "scores": scores, "count": count,
            "z_depth": z["z_depth"].reshape(b, n)}


def make_detector(cfg: SpairConfig, pres_threshold: float = 0.5,
                  nms_iou=None):
    """Jitted detector closure: detect_fn(params, images) -> dict."""
    return jax.jit(partial(detect, cfg=cfg, pres_threshold=pres_threshold,
                           nms_iou=nms_iou))


# make_detector returns jit(partial(...)): partial's keywords make cfg
# static-by-closure; params/x are the only traced args.
