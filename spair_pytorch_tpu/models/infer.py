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


def detect(params, x, cfg: SpairConfig, pres_threshold: float = 0.5):
    """Deterministic detection on a batch of images."""
    b = x.shape[0]
    _, (gh, gw), _ = geometry(cfg)
    # zero noise: samples collapse to posterior means; the presence logit
    # passes through sigmoid without logistic noise
    noise = jax.tree_util.tree_map(
        jnp.zeros_like, sample_noise(jax.random.PRNGKey(0), b, (gh, gw), cfg))
    # step far past the training-wheel cliff: stop-gradient mixing is
    # value-neutral, so any step works; this documents intent
    z = infer_latents(params, cfg, x, 10 ** 6, jax.random.PRNGKey(0), noise)

    n = gh * gw
    img_h, img_w = cfg.image_shape[1:]
    zw = z["z_where"].reshape(b, n, 4)  # [xt, yt, xs, ys] normalized
    cx, cy = zw[..., 0] * img_w, zw[..., 1] * img_h
    bw, bh = zw[..., 2] * img_w, zw[..., 3] * img_h
    boxes = jnp.stack([cx - bw / 2, cy - bh / 2,
                       cx + bw / 2, cy + bh / 2], axis=-1)
    scores = z["z_pres_prob"].reshape(b, n)
    count = jnp.sum(scores >= pres_threshold, axis=-1)
    return {"boxes": boxes, "scores": scores, "count": count,
            "z_depth": z["z_depth"].reshape(b, n)}


def make_detector(cfg: SpairConfig, pres_threshold: float = 0.5):
    """Jitted detector closure: detect_fn(params, images) -> dict."""
    return jax.jit(partial(detect, cfg=cfg, pres_threshold=pres_threshold))


# make_detector returns jit(partial(...)): partial's keywords make cfg
# static-by-closure; params/x are the only traced args.
