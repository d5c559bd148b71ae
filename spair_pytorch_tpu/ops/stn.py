"""Spatial transformer as separable interpolation matmuls (MXU-native).

The reference extracts/pastes glimpses with ``F.affine_grid`` +
``F.grid_sample`` once per grid cell inside a 121-iteration Python loop
(reference spair/modules.py:216-273, called from models.py:387 and
models.py:515). On TPU we replace the gather-based sampler with dense
separable interpolation: axis-aligned bilinear resampling factorizes as

    crop_o  = Wy_o @ X @ Wx_o^T          (object_h, H) @ (H, W) @ (W, object_w)
    paste_o = Py_o @ G_o @ Px_o^T        (H, object_h) @ (object_h, object_w) @ ...

where the interpolation matrices are hat-function weights built on the fly
from the box parameters. Each row of W has at most two non-zeros, so the
matrices are cheap to build on the VPU, and the resampling itself becomes
batched matmuls over all B x 121 objects on the MXU — no per-object kernel
launches, no gathers.

Semantics match PyTorch ``grid_sample(align_corners=True)`` (the torch-1.x
default the reference relies on) bit-for-bit in f32:
  * crop uses 'border' padding  (modules.py:268) -> clamp source coords.
  * paste uses 'zeros' padding  (modules.py:268) -> hat weights vanish
    naturally outside the glimpse.
Box layout everywhere is the reference's normalized z_where = [xt, yt, xs, ys]
with (xt, yt) the box CENTER in [0, 1] image coordinates and (xs, ys) the box
size as a fraction of the image (models.py:363-376; SURVEY.md quirk #1).
Tested for exact parity against torch.nn.functional.grid_sample in
tests/test_stn.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name


def _source_coords_crop(t, s, out_size: int, in_size: int):
    """Source pixel coordinate in the input image for each output pixel of a
    crop. t: box center in [0,1]; s: box scale. Shapes: t,s (...,) ->
    (..., out_size)."""
    j = jnp.arange(out_size, dtype=jnp.float32)
    u_out = 2.0 * j / (out_size - 1) - 1.0  # align_corners=True output grid
    x = s[..., None] * u_out + (2.0 * t[..., None] - 1.0)
    return (x + 1.0) * (in_size - 1) / 2.0


def _source_coords_paste(t, s, out_size: int, in_size: int):
    """Glimpse pixel coordinate sampled for each canvas pixel of a paste —
    the inverse affine of the crop (reference modules.py:256-261 inverts the
    3x3 matrix; analytically u = (u' - (2t-1)) / s)."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    u_out = 2.0 * i / (out_size - 1) - 1.0
    u = (u_out - (2.0 * t[..., None] - 1.0)) / s[..., None]
    return (u + 1.0) * (in_size - 1) / 2.0


def _hat(src, in_size: int):
    """Dense bilinear weights: w[..., j, a] = max(0, 1 - |src_j - a|).

    Exactly bilinear interpolation: for fractional src the two integer
    neighbors get (1-f, f); out-of-range src rows are all-zero (zeros
    padding)."""
    a = jnp.arange(in_size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - a))


def crop_weights(boxes, object_shape, image_hw):
    """Interpolation matrices for glimpse extraction.

    boxes: (..., 4) normalized [xt, yt, xs, ys].
    Returns (wy, wx): (..., object_h, H) and (..., object_w, W), with border
    padding (source coords clamped to the image)."""
    oh, ow = object_shape
    ih, iw = image_hw
    xt, yt, xs, ys = (boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3])
    sy = jnp.clip(_source_coords_crop(yt, ys, oh, ih), 0.0, ih - 1)
    sx = jnp.clip(_source_coords_crop(xt, xs, ow, iw), 0.0, iw - 1)
    return _hat(sy, ih), _hat(sx, iw)


def paste_weights(boxes, object_shape, image_hw):
    """Interpolation matrices for glimpse pasting (inverse STN).

    Returns (py, px): (..., H, object_h) and (..., W, object_w), zeros
    padding (weights vanish outside the glimpse)."""
    oh, ow = object_shape
    ih, iw = image_hw
    xt, yt, xs, ys = (boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3])
    sy = _source_coords_paste(yt, ys, ih, oh)
    sx = _source_coords_paste(xt, xs, iw, ow)
    return _hat(sy, oh), _hat(sx, ow)


def crop_glimpses(image, boxes, object_shape, dtype=None):
    """Batched glimpse extraction for all objects at once.

    image: (B, C, H, W); boxes: (B, N, 4) -> glimpses (B, N, C, oh, ow).
    One einsum pair over the full object grid replaces the reference's 121
    sequential grid_sample calls (models.py:68,387)."""
    ih, iw = image.shape[-2:]
    wy, wx = crop_weights(boxes, object_shape, (ih, iw))  # (B,N,oh,H),(B,N,ow,W)
    if dtype is not None:
        image, wy, wx = image.astype(dtype), wy.astype(dtype), wx.astype(dtype)
    # (B,N,oh,H) @ (B,C,H,W) -> (B,N,C,oh,W)
    tmp = jnp.einsum("bnyh,bchw->bncyw", wy, image)
    # (B,N,C,oh,ow); tagged so the inference scan's 'names' remat policy
    # saves the small glimpse tensor while recomputing the oh*H-sized
    # interpolation weights and the fat intermediate above (identity
    # under every other policy)
    return checkpoint_name(jnp.einsum("bncyw,bnxw->bncyx", tmp, wx),
                           "glimpse")


def paste_glimpses(glimpses, boxes, image_hw, dtype=None):
    """Batched inverse-STN paste to per-object canvases.

    glimpses: (B, N, C, oh, ow); boxes: (B, N, 4) -> (B, N, C, H, W).
    Materializes the full per-object canvas tensor — use only for small
    configs or tests; the training path composites chunk-wise
    (models/render.py) or in the fused Pallas kernel."""
    oh, ow = glimpses.shape[-2:]
    py, px = paste_weights(boxes, (oh, ow), image_hw)  # (B,N,H,oh),(B,N,W,ow)
    if dtype is not None:
        glimpses = glimpses.astype(dtype)
        py, px = py.astype(dtype), px.astype(dtype)
    tmp = jnp.einsum("bnhy,bncyx->bnchx", py, glimpses)
    return jnp.einsum("bnchx,bnwx->bnchw", tmp, px)
