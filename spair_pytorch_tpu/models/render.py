"""Object decoder + compositing renderer.

TPU-native counterpart of reference ``SPAIR._render``
(spair/models.py:452-542) and the decoder head (models.py:162-165,474-493).

The reference decodes all B*121 glimpses in one MLP, pastes each onto its
own full-size canvas via grid_sample (materializing a B x 121 x 3 x 128 x 128
tensor, ~760 MB at batch 32), then normalizes the depth-weighted importance
across objects and sums. Here:

  * decode is one batched matmul (same),
  * paste is the separable-matmul STN (ops/stn.py),
  * the composite accumulates over object CHUNKS with ``lax.scan``, so peak
    memory is (B, chunk, C+2, H, W) instead of all 121 objects at once.
    Because the reference normalizes importance AFTER pasting
    (models.py:527-537), output = num / den with
      num = sum_o paste(alpha_o) * paste(color_o) * (paste(imp_o) + 1e-9)
      den = sum_o (paste(imp_o) + 1e-9)
    both of which are chunk-associative — one pass, no 121-object tensor.
  * ``render_backend='pallas'`` swaps in the fused TPU kernel
    (ops/pallas/composite.py) that tiles the canvas and runs the paste
    matmuls on the MXU entirely in VMEM.

Compositing semantics note (SURVEY quirk #7): the reference's "importance"
(clamped alpha * depth, normalized over objects) is a gradient-shaping
approximation of z-ordered alpha compositing, not true alpha-over. We
reproduce it exactly; a corrected depth-ordered mode can be layered on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spair_pytorch_tpu.config import SpairConfig
from spair_pytorch_tpu.ops.math import clamped_sigmoid
from spair_pytorch_tpu.ops.mlp import apply_mlp1
from spair_pytorch_tpu.ops.stn import paste_weights


def decode_objects(params, cfg: SpairConfig, z_attr, z_pres, z_depth,
                   dtype=None, logit_tap=None):
    """z_attr (B, N, A) -> (color, alpha, importance), each (B, N, ·, oh, ow).

    Matches reference models.py:474-504: logits scaled (color x2.0,
    alpha x0.1 + 5.0), analytical sigmoid, alpha gated by z_pres,
    importance = clamp(alpha * depth, min=0.01).

    ``logit_tap``: optional zeros of shape (B, N, oh, ow, C+1) added to the
    scaled/biased logits — differentiating w.r.t. it yields the gradient at
    exactly the tensor the reference's ``decoder_output_grad_hook`` watched
    (models.py:490), without backward hooks (utils/debug.py).
    """
    c = cfg.n_channels
    oh, ow = cfg.object_shape
    if cfg.object_codec == "conv":
        from spair_pytorch_tpu.ops.convcodec import apply_conv_decoder
        logits = apply_conv_decoder(params["object_decoder"], z_attr,
                                    cfg.object_shape, dtype=dtype)
    else:
        logits = apply_mlp1(params["object_decoder"], z_attr, dtype)
        b, n = logits.shape[:2]
        logits = logits.reshape(b, n, oh, ow, c + 1)
    color_logits = logits[..., :c] * cfg.obj_logit_scale
    alpha_logits = (logits[..., c:] * cfg.alpha_logit_scale
                    + cfg.alpha_logit_bias)
    if logit_tap is not None:
        color_logits = color_logits + logit_tap[..., :c]
        alpha_logits = alpha_logits + logit_tap[..., c:]
    color = clamped_sigmoid(color_logits, use_analytical=True)
    alpha = clamped_sigmoid(alpha_logits, use_analytical=True)

    alpha = alpha * z_pres[..., None, None, :]          # (B,N,oh,ow,1)
    importance = jnp.clip(alpha * z_depth[..., None, None, :], 0.01, None)
    # to channel-first glimpse layout (B, N, C, oh, ow)
    color = jnp.moveaxis(color, -1, 2)
    alpha = jnp.moveaxis(alpha, -1, 2)
    importance = jnp.moveaxis(importance, -1, 2)
    return color, alpha, importance


def composite_xla(color, alpha, importance, z_where, image_hw, chunk: int):
    """Chunked paste-and-composite. Inputs (B, N, ·, oh, ow) + boxes
    (B, N, 4) -> canvas (B, C, H, W), un-clamped num/den form."""
    b, n, c = color.shape[:3]
    oh, ow = color.shape[-2:]
    h, w = image_hw
    chunk = min(chunk, n)
    pad = (-n) % chunk
    if pad:
        def padn(t):
            return jnp.pad(t, ((0, 0), (0, pad)) + ((0, 0),) * (t.ndim - 2))
        color, alpha, importance = map(padn, (color, alpha, importance))
        # pad boxes with a SAFE unit box, not zeros: a zero-scale box makes
        # the inverse-paste coordinate (u - t)/s hit 0/0 = NaN at canvas
        # pixel 0. The padded objects' glimpse channels are all zero, so
        # they contribute nothing either way.
        safe = jnp.broadcast_to(jnp.array([0.5, 0.5, 1.0, 1.0]),
                                (b, pad, 4)).astype(z_where.dtype)
        z_where = jnp.concatenate([z_where, safe], axis=1)
        n = n + pad
    steps = n // chunk

    def reshape_chunks(t):
        return t.reshape((b, steps, chunk) + t.shape[2:]).swapaxes(0, 1)

    xs = tuple(map(reshape_chunks, (color, alpha, importance, z_where)))

    def body(carry, x):
        num, den = carry
        col, alp, imp, boxes = x
        py, px = paste_weights(boxes, (oh, ow), (h, w))
        glimpse = jnp.concatenate([col, alp, imp], axis=2)  # (B,k,C+2,oh,ow)
        tmp = jnp.einsum("bnhy,bncyx->bnchx", py, glimpse)
        pasted = jnp.einsum("bnchx,bnwx->bnchw", tmp, px)
        p_col = pasted[:, :, :c]
        p_alp = pasted[:, :, c:c + 1]
        # padded objects paste zeros; the reference adds 1e-9 to every REAL
        # object's pasted importance (models.py:527), so add it pre-masked.
        p_imp = pasted[:, :, c + 1:c + 2] + 1e-9
        num = num + jnp.sum(p_alp * p_col * p_imp, axis=1)
        den = den + jnp.sum(p_imp, axis=1)
        return (num, den), None

    num0 = jnp.zeros((b, c, h, w), color.dtype)
    den0 = jnp.zeros((b, 1, h, w), color.dtype)
    (num, den), _ = jax.lax.scan(body, (num0, den0), xs)
    if pad:
        # keep den consistent with the reference's sum over exactly N
        # objects of (paste + 1e-9): padded objects contributed 1e-9 each.
        den = den - pad * 1e-9
    return num, den


def composite_ordered(color, alpha, z_depth_flat, z_where, image_hw,
                      chunk: int):
    """TRUE z-depth-ordered alpha-over compositing (corrected mode).

    The reference's importance normalization only approximates occlusion
    (its own FIXME, models.py:518-520; SURVEY quirk #7). This mode sorts
    objects front-to-back by z_depth (higher depth = nearer, consistent
    with importance = alpha * depth weighting) and applies the over
    operator with a running per-pixel transmittance:

        out  = sum_o T_o * paste(alpha)_o * paste(color)_o
        T_o  = prod_{o' nearer} (1 - paste(alpha)_o')

    Implemented as a scan over depth-ordered object chunks carrying
    (accumulated image, transmittance) — same bounded memory as
    composite_xla.
    """
    b, n, c = color.shape[:3]
    oh, ow = color.shape[-2:]
    h, w = image_hw
    order = jnp.argsort(-z_depth_flat[..., 0], axis=1)  # front first

    def take(t):
        return jnp.take_along_axis(
            t, order.reshape((b, n) + (1,) * (t.ndim - 2)), axis=1)

    color, alpha, z_where = take(color), take(alpha), take(z_where)

    chunk = min(chunk, n)
    pad = (-n) % chunk
    if pad:
        def padn(t):
            return jnp.pad(t, ((0, 0), (0, pad)) + ((0, 0),) * (t.ndim - 2))
        color, alpha = padn(color), padn(alpha)
        safe = jnp.broadcast_to(jnp.array([0.5, 0.5, 1.0, 1.0]),
                                (b, pad, 4)).astype(z_where.dtype)
        z_where = jnp.concatenate([z_where, safe], axis=1)
        n += pad
    steps = n // chunk

    def reshape_chunks(t):
        return t.reshape((b, steps, chunk) + t.shape[2:]).swapaxes(0, 1)

    xs = tuple(map(reshape_chunks, (color, alpha, z_where)))

    def body(carry, x):
        img, trans = carry
        col, alp, boxes = x
        py, px = paste_weights(boxes, (oh, ow), (h, w))
        glimpse = jnp.concatenate([col, alp], axis=2)
        tmp = jnp.einsum("bnhy,bncyx->bnchx", py, glimpse)
        pasted = jnp.einsum("bnchx,bnwx->bnchw", tmp, px)
        p_col, p_alp = pasted[:, :, :c], pasted[:, :, c:]

        # within-chunk front-to-back over-compositing (sequential in k)
        def inner(carry_k, k):
            img, trans = carry_k
            a_k = jnp.clip(p_alp[:, k], 0.0, 1.0)
            img = img + trans * a_k * p_col[:, k]
            trans = trans * (1.0 - a_k)
            return (img, trans), None

        (img, trans), _ = jax.lax.scan(inner, (img, trans),
                                       jnp.arange(p_alp.shape[1]))
        return (img, trans), None

    img0 = jnp.zeros((b, c, h, w), color.dtype)
    trans0 = jnp.ones((b, 1, h, w), color.dtype)
    (img, _), _ = jax.lax.scan(body, (img0, trans0), xs)
    return img


def paste_window_rows(cfg: SpairConfig, image_hw):
    """Static paste-window height for the Pallas compositor.

    An object's normalized height is ys = h * anchor_h / img_h with
    h <= cfg.max_hw (clamped_sigmoid <= 1 exactly). The hat weights are
    nonzero for source coords in (-1, oh), i.e. over ys * (1 + 2/(oh-1))
    of the normalized canvas, so the support spans at most
    ceil(max_ys * k * (H-1)) + 2 rows (k the overhang factor); +8 covers
    the 8-aligned window-start rounding. Exact coverage, asserted against
    the XLA compositor in tests/test_pallas_composite.py."""
    ih = image_hw[0]
    oh = cfg.object_shape[0]
    max_ys = cfg.max_hw * cfg.anchor_shape[0] / cfg.image_shape[1]
    k = 1.0 + 2.0 / (oh - 1)
    span = int(np.ceil(max_ys * k * (ih - 1))) + 2
    return min(ih, -(-(span + 7) // 8) * 8)


def render(params, cfg: SpairConfig, z_attr, z_where, z_depth, z_pres,
           image_hw, dtype=None):
    """Latent grids (B, gh, gw, ·) -> reconstruction (B, C, H, W) in [0, 1].

    cfg.render_mode selects the compositing semantics:
      'reference' — the reference's importance-normalized blend (default).
      'ordered'   — corrected z-depth-ordered alpha-over.
    """
    b, gh, gw = z_attr.shape[:3]
    n = gh * gw
    flat = lambda t: t.reshape(b, n, t.shape[-1])
    color, alpha, importance = decode_objects(
        params, cfg, flat(z_attr), flat(z_pres), flat(z_depth), dtype)
    boxes = flat(z_where)

    # Presence gating (opt-in, cfg.pres_gate_threshold > 0): objects whose
    # relaxed z_pres falls below the threshold are dropped from the
    # composite — semantically, their glimpse channels are zeroed (den
    # keeps each object's +1e-9 floor). Their contribution is already tiny
    # (alpha <= threshold, importance <= clip(4*threshold)), but gating
    # CHANGES GRADIENTS: dropped objects get no reconstruction gradient
    # (KL gradients remain), so training with it is an approximation. The
    # Pallas kernel turns the gate into a branch that skips the whole
    # paste, making compositor time scale with the live-object count.
    gate = None
    if cfg.pres_gate_threshold > 0.0:
        gate = (flat(z_pres)[..., 0] > cfg.pres_gate_threshold).astype(
            color.dtype)                                    # (B, N)

    if cfg.render_mode == "ordered":
        if gate is not None:
            alpha = alpha * gate[:, :, None, None, None]
        depth_flat = flat(z_depth)
        if cfg.render_topk > 0 and cfg.render_topk < n:
            if gate is None:
                raise ValueError(
                    "render_topk requires pres_gate_threshold > 0: without "
                    "the gate, dropped objects have small-but-nonzero alpha "
                    "and top-K selection would change the composite")
            # Top-K live-object ordered compositing. Gated objects have
            # alpha EXACTLY 0 (masked above) and zero-alpha objects are
            # identities under the over operator, so selecting the K
            # highest-presence objects is exact — values AND gradients
            # (dropped objects already get zero reconstruction gradient
            # through the gate mask) — whenever every image's live count
            # is <= K. The cond falls back to the full scan otherwise
            # (the dense training-wheel phase), keeping semantics exact
            # at every step. Parity asserted in tests/test_render_modes.py.
            k = cfg.render_topk
            scores = flat(z_pres)[..., 0]                       # (B, N)
            _, top_idx = jax.lax.top_k(scores, k)               # (B, K)

            def take_k(t):
                idx = top_idx.reshape((b, k) + (1,) * (t.ndim - 2))
                return jnp.take_along_axis(t, idx, axis=1)

            # count in int32, NOT color.dtype: bf16 integer sums are exact
            # only to 256 and a >256-cell grid would silently miscount,
            # flipping the exact-top-K branch condition (ADVICE round 3)
            live = jnp.sum((gate > 0).astype(jnp.int32), axis=1)  # (B,)
            out = jax.lax.cond(
                jnp.max(live) <= k,
                lambda args: composite_ordered(
                    *map(take_k, args), image_hw, cfg.render_chunk),
                lambda args: composite_ordered(
                    *args, image_hw, cfg.render_chunk),
                (color, alpha, depth_flat, boxes))
        else:
            out = composite_ordered(color, alpha, depth_flat, boxes,
                                    image_hw, cfg.render_chunk)
        return jnp.clip(out, 0.0, 1.0)
    backend = cfg.render_backend
    if backend == "auto":
        # resolved at trace time: the Pallas kernel wins on TPU hardware
        # (in-kernel windowed VJP, benchmarks/render_ab.py) but only runs
        # interpreted off-TPU, where the XLA chunk scan is the right tool.
        # note: the tunneled TPU platform reports itself as 'axon'; any
        # OTHER accelerator (e.g. gpu) gets the XLA compositor — the
        # kernel uses pltpu memory spaces and would fail to lower there.
        backend = ("pallas" if jax.default_backend() in ("tpu", "axon")
                   else "xla")
    if gate is not None and backend != "pallas":
        # non-skipping backends implement the gate by masking the glimpse
        # channels — same outputs and gradients as the kernel's branch
        # (asserted in tests/test_pallas_composite.py), no time saved.
        gmask = gate[:, :, None, None, None]
        color = color * gmask
        alpha = alpha * gmask
        importance = importance * gmask
    if backend == "pallas":
        from spair_pytorch_tpu.ops.pallas.composite import composite_pallas
        win = paste_window_rows(cfg, image_hw)
        if cfg.render_topk > 0 and cfg.render_topk < n:
            if gate is None:
                raise ValueError(
                    "render_topk requires pres_gate_threshold > 0: without "
                    "the gate, dropped objects have small-but-nonzero alpha "
                    "and top-K selection would change the composite")
            # Top-K live-object compaction for the reference blend (the
            # ordered-mode trick above, ported): the gated kernel already
            # SKIPS dead objects, but still iterates its fori_loop over all
            # n of them and (backward) writes their zero gradients — at
            # b128 that is b*n = 15k mostly-dead iterations. Gathering the
            # K highest-presence objects shrinks the loop to b*K. Exact vs
            # the gated full-grid kernel whenever every image's live count
            # is <= K (the selected set then contains every live object;
            # selected-but-dead ones are still gate-skipped; non-selected
            # objects were skipped before and get the same exactly-zero
            # gradients via the gather's scatter-VJP; den keeps the
            # reference's n*eps floor via den_floor_n) — up to float
            # reassociation, since compaction reorders the num/den
            # accumulation sums. lax.cond falls back to the full grid
            # otherwise (the dense training-wheel phase). Parity asserted
            # in tests/test_render_modes.py.
            #
            # MEASURED NEGATIVE for training throughput (RESULTS.md round 5
            # "reference-kernel top-K compaction"): 28.6 ms/step vs the
            # full-grid gated kernel's 14.9 at b128/K=16, and still 18.1
            # with the cond bypassed — the gated kernel's dead-object skip
            # is already nearly free, so the gather + scatter-add VJP adds
            # HBM traffic with no work left to remove, and the cond itself
            # adds ~10 ms (full-tensor operands materialized for both
            # branches). Kept opt-in for API parity with ordered mode
            # (where the same lever measured a 5.9x compositor WIN — that
            # scan does real over-operator work per dead object; this
            # kernel does not). Do not enable for perf.
            k = cfg.render_topk
            scores = flat(z_pres)[..., 0]                       # (B, N)
            _, top_idx = jax.lax.top_k(scores, k)               # (B, K)

            def take_k(t):
                idx = top_idx.reshape((b, k) + (1,) * (t.ndim - 2))
                return jnp.take_along_axis(t, idx, axis=1)

            live = jnp.sum((gate > 0).astype(jnp.int32), axis=1)  # (B,)
            num, den = jax.lax.cond(
                jnp.max(live) <= k,
                lambda args: composite_pallas(
                    *map(take_k, args[:4]), image_hw, win,
                    pres_gate=take_k(args[4]), den_floor_n=n),
                lambda args: composite_pallas(
                    *args[:4], image_hw, win, pres_gate=args[4]),
                (color, alpha, importance, boxes, gate))
        else:
            num, den = composite_pallas(color, alpha, importance, boxes,
                                        image_hw, win, pres_gate=gate)
    elif backend == "pallas_v3":
        # object-chunk batched kernel; sound ONLY for model-generated
        # boxes (band containment follows from the box parameterization —
        # see composite_v3.py docstring), which is what render() passes.
        from spair_pytorch_tpu.ops.backbone import grid_geometry
        from spair_pytorch_tpu.ops.pallas.composite_v3 import (
            composite_pallas_v3)
        _, _, (cell_h, _) = grid_geometry(image_hw, cfg.backbone_topology)
        max_ys = cfg.max_hw * cfg.anchor_shape[0] / cfg.image_shape[1]
        num, den = composite_pallas_v3(
            color, alpha, importance, boxes, image_hw, cell_h, (gh, gw),
            (cfg.min_yx, cfg.max_yx, max_ys), cfg.render_chunk_k)
    else:
        num, den = composite_xla(color, alpha, importance, boxes, image_hw,
                                 cfg.render_chunk)
    out = num / den
    return jnp.clip(out, 0.0, 1.0)
