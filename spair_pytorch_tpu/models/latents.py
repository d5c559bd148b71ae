"""SPAIR latent heads: parameter init and the per-cell inference step.

TPU-native counterpart of the head networks and sampling logic in reference
``spair/models.py`` (``_build_networks`` models.py:133-167, ``_build_box``
models.py:322-381, ``_encode_attr`` models.py:383-391, depth head
models.py:87-97, ``_build_obj_pres`` models.py:393-411, ``_freeze_learning``
models.py:413-429, ``_build_edge_element`` models.py:273-290).

Key departures from the reference, by design:
  * ``cell_step`` operates on a BATCH of cells (B, K, ...) so that the
    independent mode runs all 121 cells as one set of matmuls and the
    wavefront mode runs each wavefront's cells in parallel — the reference
    visits cells one at a time in a Python loop (models.py:68).
  * All stochasticity is pre-sampled per cell OUTSIDE the scan
    (``sample_noise``) and sliced inside, so every inference order computes
    the identical function of (params, x, noise) — raster, wavefront and
    independent modes are comparable draw-for-draw.
  * stop-gradient mixing replaces ``.detach()`` mixing for the training
    wheel (identical values, identical gradient-blocking semantics).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from spair_pytorch_tpu.config import SpairConfig
from spair_pytorch_tpu.ops.backbone import grid_geometry, init_backbone
from spair_pytorch_tpu.ops.math import clamped_sigmoid, latent_to_mean_std
from spair_pytorch_tpu.ops.mlp import apply_mlp, apply_mlp1, init_mlp
from spair_pytorch_tpu.ops.stn import crop_glimpses


def geometry(cfg: SpairConfig):
    """(pads, (grid_h, grid_w), (cell_h, cell_w)) for the configured image."""
    return grid_geometry(cfg.image_shape[1:], cfg.backbone_topology)


def init_params(key, cfg: SpairConfig) -> Dict:
    """Initialize every network (reference models.py:133-167 topology).

    Input sizes are derived, matching the verified reference dimensions
    (SURVEY.md section 2): box 100+224=324, z 478, obj 479, encoder C*oh*ow,
    decoder A -> oh*ow*(C+1).
    """
    c, oh, ow = cfg.n_channels, cfg.object_shape[0], cfg.object_shape[1]
    keys = jax.random.split(key, 8)
    n_feat = cfg.n_backbone_features
    n_pass = cfg.n_passthrough_features
    ctx = cfg.context_dim
    a = cfg.n_attributes

    box_in = n_feat + ctx
    z_in = 4 + a + n_pass + ctx + n_feat
    obj_in = z_in + 1

    if cfg.object_codec == "conv":
        from spair_pytorch_tpu.ops.convcodec import (init_conv_decoder,
                                                     init_conv_encoder)
        encoder = init_conv_encoder(keys[2], c, 2 * a, cfg.object_shape)
        decoder = init_conv_decoder(keys[5], a, c + 1, cfg.object_shape)
    else:
        encoder = init_mlp(keys[2], c * oh * ow, cfg.encoder_hidden, (2 * a,))
        decoder = init_mlp(keys[5], a, cfg.decoder_hidden,
                           (oh * ow * (c + 1),))
    params = {
        "backbone": init_backbone(keys[0], c, n_feat, cfg.backbone_topology),
        # box head widens to 8 per slot: slot-SPECIFIC head weights break
        # the symmetry between a cell's slots (encoder/z/obj nets below are
        # weight-shared across slots — their inputs already differ)
        "box_net": init_mlp(keys[1], box_in, cfg.mlp_hidden,
                            (8 * cfg.n_object_slots, n_pass)),
        "object_encoder": encoder,
        "z_net": init_mlp(keys[3], z_in, cfg.mlp_hidden, (2, n_pass)),
        "obj_net": init_mlp(keys[4], obj_in, cfg.mlp_hidden, (1,)),
        "object_decoder": decoder,
        "edge": _init_edge_element(keys[6], cfg),
    }
    if cfg.vestigial_self_attn:
        # Full parity with the reference's dead Self_Attn
        # (models.py:667-699): params registered AND the block computed
        # every forward (apply_self_attn, wired in models/spair.py), with
        # the output discarded exactly like the reference's models.py:120 —
        # no gradient ever flows to it.
        d = 4 + a + 1
        params["self_attn"] = {
            "query": init_mlp(keys[7], d, (), (d // 8,)),
            "key": init_mlp(jax.random.fold_in(keys[7], 1), d, (), (d // 8,)),
            "value": init_mlp(jax.random.fold_in(keys[7], 2), d, (), (d,)),
            "gamma": jnp.zeros((1,)),
        }
    return params


def _init_edge_element(key, cfg: SpairConfig):
    """Learnable virtual edge cell (reference models.py:273-290): random
    normal, with sigmoid applied ONCE at init to the loc/depth/pres slices
    (SURVEY.md quirk #13). Layout [loc(4), attr(A), depth(1), pres(1)],
    repeated per object slot (n_object_slots > 1)."""
    t = jax.random.normal(key, (cfg.context_elem_dim,))
    t = t.reshape(cfg.n_object_slots, -1)  # (S, 56): pattern per slot
    a = cfg.n_attributes
    loc, attr, depth, pres = jnp.split(t, [4, 4 + a, 4 + a + 1], axis=-1)
    out = jnp.concatenate([jax.nn.sigmoid(loc), attr,
                           jax.nn.sigmoid(depth), jax.nn.sigmoid(pres)],
                          axis=-1)
    return out.reshape(-1)


def sample_noise(key, batch: int, grid_hw: Tuple[int, int], cfg: SpairConfig):
    """Pre-sample every stochastic draw for one forward pass.

    The reference draws 7 values per cell inside its loop (4 box + attr +
    depth Normals via rsample, plus a Uniform for the presence logistic
    noise — models.py:333-336,84,95,400-404). Drawing them up-front keeps
    the scan body deterministic and makes all inference orders equivalent.
    """
    gh, gw = grid_hw
    ks = jax.random.split(key, 4)
    a = cfg.n_attributes
    s = cfg.n_object_slots  # widths scale per slot (slot-major layout)
    u = jax.random.uniform(ks[3], (batch, gh, gw, s))
    eps = 1e-9  # reference eps = 10e-10 (models.py:402)
    return {
        "box": jax.random.normal(ks[0], (batch, gh, gw, 4 * s)),
        "attr": jax.random.normal(ks[1], (batch, gh, gw, a * s)),
        "depth": jax.random.normal(ks[2], (batch, gh, gw, s)),
        "pres_noise": jnp.log(u + eps) - jnp.log(1.0 - u + eps),
    }


def apply_self_attn(params, ctx):
    """SAGAN-style self-attention over the grid of 55-dim (box, attr,
    depth) cell vectors — the reference's ``Self_Attn``
    (models.py:667-699), which it calls every forward and DISCARDS
    (models.py:120). 1x1 convs over the grid are per-cell linears here.
    Note the reference's forward never applies gamma or the residual; it
    returns the raw attention output — reproduced as-is.

    ctx: (B, N, d) -> (B, N, d)."""
    q = apply_mlp1(params["query"], ctx)               # (B, N, d//8)
    k = apply_mlp1(params["key"], ctx)                 # (B, N, d//8)
    v = apply_mlp1(params["value"], ctx)               # (B, N, d)
    attn = jax.nn.softmax(jnp.einsum("bid,bjd->bij", q, k), axis=-1)
    return jnp.einsum("bij,bjd->bid", attn, v)


def freeze_learning(v, tw):
    """tw * stop_grad(v) + (1 - tw) * v (reference models.py:413-429):
    value-preserving, blocks gradients while the training wheel is on."""
    return tw * jax.lax.stop_gradient(v) + (1.0 - tw) * v


def cell_step(params, cfg: SpairConfig, geom, image, feat_cells, context,
              noise, cell_hw, tw, dtype=None):
    """Run every head for a set of K cells in parallel.

    Args:
      image:      (B, C, H, W) input batch (for glimpse crops).
      feat_cells: (B, K, F) backbone features of the active cells.
      context:    (B, K, context_dim) lateral context (edge element outside).
      noise:      dict of per-cell noise slices, each (B, K, ...).
      cell_hw:    (K, 2) int cell coordinates (h, w).
      tw:         training-wheel scalar.

    Returns a dict with sampled latents, posterior (mean, std) pairs keyed by
    the reference's distribution names, the presence probability, and the
    S*56-dim context vector each cell exposes to its neighbors.

    With n_object_slots = S > 1, every per-object quantity carries an
    internal slot axis (B, K, S, ·) and is folded slot-major into the last
    dim (B, K, S*·) on return — infer_latents unfolds it into a virtual
    (gh, gw*S) grid so every downstream consumer is unchanged. S = 1
    computes exactly the reference semantics.
    """
    _, grid, cell_px = geom
    img_h, img_w = cfg.image_shape[1:]
    s = cfg.n_object_slots
    b, k = feat_cells.shape[:2]

    def per_slot(t):  # (B, K, S*d) -> (B, K, S, d)
        return t.reshape(b, k, s, -1)

    def fold(t):      # (B, K, S, d) -> (B, K, S*d)
        return t.reshape(b, k, -1)

    # --- z_where (reference models.py:76-79, 322-381) ---
    box_in = jnp.concatenate([feat_cells, context], axis=-1)
    box_latent, passthru = apply_mlp(params["box_net"], box_in, dtype,
                                     packed=cfg.packed_heads)
    mean, std = latent_to_mean_std(per_slot(box_latent))   # (B, K, S, 4)
    mean, std = freeze_learning(mean, tw), freeze_learning(std, tw)
    box_logits = mean + std * per_slot(noise["box"])  # order (cy, cx, h, w)
    cy_l, cx_l, h_l, w_l = jnp.split(box_logits, 4, axis=-1)

    yx_range = cfg.max_yx - cfg.min_yx
    cell_y = yx_range * clamped_sigmoid(cy_l) + cfg.min_yx
    cell_x = yx_range * clamped_sigmoid(cx_l) + cfg.min_yx
    hw_range = cfg.max_hw - cfg.min_hw
    height = hw_range * clamped_sigmoid(h_l) + cfg.min_hw
    width = hw_range * clamped_sigmoid(w_l) + cfg.min_hw

    # context/box layout is x-first (reference models.py:361)
    box = jnp.concatenate([cell_x, cell_y, width, height], axis=-1)

    # image-normalized [xt, yt, xs, ys] (reference models.py:363-376)
    ys = height * cfg.anchor_shape[0] / img_h
    xs = width * cfg.anchor_shape[1] / img_w
    h_idx = cell_hw[:, 0].astype(jnp.float32)[None, :, None, None]
    w_idx = cell_hw[:, 1].astype(jnp.float32)[None, :, None, None]
    yt = (cell_px[0] / img_h) * (cell_y + h_idx)
    xt = (cell_px[1] / img_w) * (cell_x + w_idx)
    z_where = jnp.concatenate([xt, yt, xs, ys], axis=-1)   # (B, K, S, 4)

    # --- z_what (reference models.py:82-85, 383-391) ---
    glimpses = crop_glimpses(image, z_where.reshape(b, k * s, 4),
                             cfg.object_shape, dtype)      # (B, K*S, C, oh, ow)
    if cfg.object_codec == "conv":
        from spair_pytorch_tpu.ops.convcodec import apply_conv_encoder
        attr_latent = apply_conv_encoder(params["object_encoder"], glimpses,
                                         dtype=dtype)
    else:
        flat = glimpses.reshape(b, k * s, -1)
        attr_latent = apply_mlp1(params["object_encoder"], flat, dtype)
    attr_mean, attr_std = latent_to_mean_std(
        attr_latent.reshape(b, k, s, -1))                  # (B, K, S, A)
    attr = attr_mean + attr_std * per_slot(noise["attr"])

    # --- z_depth (reference models.py:87-97) ---
    # feat / whole-cell context / box-net passthrough are shared across a
    # cell's slots; box and attr are per slot. The z/obj nets are applied
    # per slot with SHARED weights (batched over (B, K, S, .)).
    def shared(t):  # (B, K, D) -> (B, K, S, D)
        return jnp.broadcast_to(t[:, :, None], (b, k, s, t.shape[-1]))

    z_in = jnp.concatenate([shared(feat_cells), shared(context),
                            shared(passthru), box, attr], axis=-1)
    depth_latent, passthru2 = apply_mlp(params["z_net"], z_in, dtype,
                                        packed=cfg.packed_heads)
    depth_mean, depth_std = latent_to_mean_std(depth_latent)
    depth_mean = freeze_learning(depth_mean, tw)
    depth_std = freeze_learning(depth_std, tw)
    depth_logits = depth_mean + depth_std * per_slot(noise["depth"])
    depth = 4.0 * clamped_sigmoid(depth_logits)

    # --- z_pres (reference models.py:100-102, 393-411) ---
    obj_in = jnp.concatenate([shared(feat_cells), shared(context),
                              passthru2, box, attr, depth], axis=-1)
    pres_logit = apply_mlp1(params["obj_net"], obj_in, dtype)
    pres_logit = freeze_learning(pres_logit, tw)
    if s > 1 and cfg.slot_coupling == "stick":
        # ordered stick-breaking: bias later slots off at init (constant,
        # no extra params — the clip range +-10 leaves room to learn past
        # it), then couple below via cumprod. See config.slot_coupling.
        # pres_logit is (B, K, S, 1) here (obj_net applied per slot).
        offset = (-2.0 * jnp.arange(s, dtype=pres_logit.dtype)
                  )[None, None, :, None]
        pres_logit = pres_logit + offset
    log_odds = jnp.clip(pres_logit, -10.0, 10.0)
    pre_sigmoid = log_odds + per_slot(noise["pres_noise"])
    pres_prob = jax.nn.sigmoid(pre_sigmoid)
    if s > 1 and cfg.slot_coupling == "stick":
        # slot k's effective presence = prod_{j<=k} sigmoid(logit_j):
        # a later slot can only fire if every earlier slot fires, which
        # destroys the slot-permutation symmetry that collapsed the
        # independent-slots run (RESULTS.md round 4). Marginals stay in
        # [0,1] so the count prior and every downstream consumer of the
        # virtual grid are unchanged.
        pres_prob = jnp.cumprod(pres_prob, axis=2)
    pres = pres_prob  # relaxed sample == prob; no rounding (SURVEY quirk #4)

    ctx_vec = fold(jnp.concatenate([box, attr, depth, pres], axis=-1))

    cy_m, cx_m, h_m, w_m = jnp.split(mean, 4, axis=-1)
    cy_s, cx_s, h_s, w_s = jnp.split(std, 4, axis=-1)
    posterior = {
        "cy_logit": (fold(cy_m), fold(cy_s)),
        "cx_logit": (fold(cx_m), fold(cx_s)),
        "height_logit": (fold(h_m), fold(h_s)),
        "width_logit": (fold(w_m), fold(w_s)),
        "attr": (fold(attr_mean), fold(attr_std)),
        "depth_logit": (fold(depth_mean), fold(depth_std)),
    }
    return {
        "z_where": fold(z_where),
        "z_attr": fold(attr),
        "z_depth": fold(depth),
        "z_pres": fold(pres),
        "z_pres_prob": fold(pres_prob),
        "posterior": posterior,
        "context_vec": ctx_vec,
    }
