"""The SPAIR model: forward pass, inference orders, and loss.

TPU-native counterpart of reference ``SPAIR.forward`` + ``_build_loss``
(spair/models.py:35-131,544-563). The reference's 121-iteration Python loop
over grid cells becomes one of four compiled inference orders sharing the
same ``cell_step`` (models/latents.py):

  * ``independent``: no lateral context (every cell sees the learnable edge
    element) — all cells in parallel, one batched matmul per head. This is
    BASELINE config 1 and the throughput mode.
  * ``raster``: ``lax.scan`` over cells in the reference's raster order —
    the faithful dataflow (models.py:68).
  * ``wavefront``: ``lax.scan`` over wavefronts of constant d = 2h + w.
    The lateral-context dependency set {(-1,-1),(-1,0),(-1,1),(0,-1)}
    (models.py:294-307) makes plain anti-diagonals (h+w) NOT independent —
    the up-right neighbor (h-1, w+1) lies on the same anti-diagonal — but
    all four neighbors have strictly smaller 2h+w, so d-wavefronts are a
    valid topological order: 31 scan steps with up to ceil(min(gh, gw)/1)/2
    cells each instead of 121 sequential steps, computing the exact same
    function (noise is pre-sampled per cell, so raster and wavefront agree
    to float-reassociation; asserted in tests/test_model.py).
  * ``rowscan`` (opt-in, RELAXED — not a reference-exact reordering):
    whole rows as fronts (gh scan steps of gw-wide lanes); same-row west
    context is structurally replaced by the edge element, which CHANGES
    the function — see inference_schedule and docs/MIGRATION.md (quality
    A/B required before adoption).

Lateral context is held in a zero-copy "halo" buffer: a flat
(grid_h+2n)x(grid_w+2n)+1 board (n = n_lookback) initialized with the edge
element. Cells write their 56-dim context vector at their padded
coordinate; neighbors outside the grid (or not yet visited) naturally read
the edge element, and one extra trash slot absorbs writes from masked
wavefront lanes. Arbitrary N_LOOKBACK is supported with the generalized
wavefront d = (n+1)h + w (see inference_schedule).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spair_pytorch_tpu.config import SpairConfig
from spair_pytorch_tpu.models.kl import (count_prior_kl,
                                          count_prior_kl_parallel,
                                          independent_kl)
from spair_pytorch_tpu.models.latents import (cell_step, geometry,
                                              init_params, sample_noise)
from spair_pytorch_tpu.models.render import render
from spair_pytorch_tpu.ops.backbone import apply_backbone
from spair_pytorch_tpu.ops.math import binary_cross_entropy_sum
from spair_pytorch_tpu.ops.schedules import exponential_decay

__all__ = ["init_params", "forward", "loss_and_metrics", "geometry",
           "inference_schedule", "neighbor_offsets"]

def neighbor_offsets(n_lookback: int = 1):
    """Lateral-context neighbor offsets in the reference's order.

    The reference builds them by meshgrid over rows [-n..0] x cols [-n..n]
    and drops the trailing n+1 entries — i.e. all already-visited cells in
    the lookback window, row-major (models.py:294-307). For n=1 this is
    [(-1,-1), (-1,0), (-1,1), (0,-1)] (order verified by executing the
    reference construction)."""
    n = n_lookback
    offs = [(dh, dw) for dh in range(-n, 1) for dw in range(-n, n + 1)]
    return tuple(offs[:-(n + 1)])


def inference_schedule(mode: str, gh: int, gw: int, n_lookback: int = 1):
    """Static scan schedule: groups of mutually independent cells.

    The wavefront index is d = (n_lookback+1)*h + w: every neighbor offset
    (dh<0, any dw in [-n..n]) or (dh=0, dw<0) strictly decreases d, so
    equal-d fronts are mutually independent for ANY lookback (plain
    anti-diagonals h+w already fail at n=1: (h-1, w+1) shares them).

    Returns dict of numpy arrays (turned into scan xs):
      cell_idx (S, K): flat raster index of each lane's cell (0 for masked),
      cell_hw (S, K, 2), mask (S, K),
      nbr_idx (S, K, n_neighbors): flat indices into the halo board,
      write_idx (S, K): halo-board write position (trash slot for masked),
      perm (N,): lane position (s*K + k) of each raster cell, for unpacking.
    """
    offsets = neighbor_offsets(n_lookback)
    if mode == "raster":
        fronts: List[List[Tuple[int, int]]] = [
            [(h, w)] for h in range(gh) for w in range(gw)]
    elif mode == "wavefront":
        by_d: Dict[int, List[Tuple[int, int]]] = {}
        for h in range(gh):
            for w in range(gw):
                by_d.setdefault((n_lookback + 1) * h + w, []).append((h, w))
        fronts = [by_d[d] for d in sorted(by_d)]
    elif mode == "rowscan":
        # RELAXED lateral context (opt-in, non-reference): whole rows as
        # fronts — gh scan steps of gw-wide lanes instead of wavefront's
        # (n+1)*gh + gw - (n+1) steps. Same-row neighbors (dh=0, dw<0) are
        # computed in the SAME step, so their halo-board slots still hold
        # the edge element when the row reads: the west context is
        # structurally replaced by "out of grid". Rows above are real.
        # This CHANGES the function (unlike raster<->wavefront, which are
        # exact reorderings) — ship only with a quality A/B; gw=1 grids
        # degenerate to exact raster (no same-row neighbors exist).
        fronts = [[(h, w) for w in range(gw)] for h in range(gh)]
    else:
        raise ValueError(f"unknown scan mode {mode!r}")

    s = len(fronts)
    k = max(len(f) for f in fronts)
    halo = n_lookback
    pw = gw + 2 * halo  # halo board width
    board_size = (gh + 2 * halo) * pw
    trash = board_size  # extra slot absorbing masked writes

    cell_idx = np.zeros((s, k), np.int32)
    cell_hw = np.zeros((s, k, 2), np.int32)
    mask = np.zeros((s, k), bool)
    nbr_idx = np.zeros((s, k, len(offsets)), np.int32)
    write_idx = np.full((s, k), trash, np.int32)
    perm = np.zeros(gh * gw, np.int32)

    for si, front in enumerate(fronts):
        for ki, (h, w) in enumerate(front):
            cell_idx[si, ki] = h * gw + w
            cell_hw[si, ki] = (h, w)
            mask[si, ki] = True
            write_idx[si, ki] = (h + halo) * pw + (w + halo)
            for ni, (dh, dw) in enumerate(offsets):
                nbr_idx[si, ki, ni] = (h + halo + dh) * pw + (w + halo + dw)
            perm[h * gw + w] = si * k + ki
    return dict(cell_idx=cell_idx, cell_hw=cell_hw, mask=mask,
                nbr_idx=nbr_idx, write_idx=write_idx, perm=perm,
                board_size=board_size, steps=s, lanes=k)


def _compute_dtype(cfg: SpairConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


def infer_latents(params, cfg: SpairConfig, x, step, rng, noise=None):
    """The inference pass only: image -> latent grids (NHWC), posterior
    params, and presence probabilities — no KL, no rendering, no loss.
    Shared by ``forward`` (training) and the serving detector
    (models/infer.py)."""
    geom = geometry(cfg)
    pads, (gh, gw), _ = geom
    n = gh * gw
    b = x.shape[0]
    dtype = _compute_dtype(cfg)
    f32 = jnp.float32

    feat = apply_backbone(params["backbone"], x, cfg.backbone_topology,
                          pads, dtype)
    feat_flat = feat.reshape(b, n, -1).astype(f32)

    if noise is None:
        noise = sample_noise(rng, b, (gh, gw), cfg)
    noise_flat = {name: v.reshape(b, n, v.shape[-1])
                  for name, v in noise.items()}
    tw = exponential_decay(step, cfg.training_wheel)

    if cfg.inference_mode == "independent":
        # cell axis is shardable here: under a ('data', 'model') mesh the
        # heads/crop/decode split over chips along N (parallel/constraints).
        from spair_pytorch_tpu.parallel.constraints import constrain
        feat_flat = constrain(feat_flat, "data", "model", None)
        context = jnp.broadcast_to(
            jnp.tile(params["edge"], cfg.context_neighbors),
            (b, n, cfg.context_dim))
        hw = np.stack(np.unravel_index(np.arange(n), (gh, gw)),
                      -1).astype(np.int32)
        out = cell_step(params, cfg, geom, x, feat_flat, context, noise_flat,
                        jnp.asarray(hw), tw, dtype)
        out["z_attr"] = constrain(out["z_attr"], "data", "model", None)
        flat = out
    else:
        flat = _scan_inference(params, cfg, geom, x, feat_flat, noise_flat,
                               tw, dtype, b, gh, gw)

    def grid(t):
        # slot-major unfold into the virtual (gh, gw*S) grid: every
        # downstream consumer (render, KLs, metrics, detector, viz) is
        # object-count-driven and sees S*N objects without change
        slots = cfg.n_object_slots
        return t.reshape(b, gh, gw * slots, t.shape[-1] // slots)

    return {
        "z_where": grid(flat["z_where"]),
        "z_attr": grid(flat["z_attr"]),
        "z_depth": grid(flat["z_depth"]),
        "z_pres": grid(flat["z_pres"]),
        "z_pres_prob": grid(flat["z_pres_prob"]),
        "posterior": jax.tree_util.tree_map(grid, flat["posterior"]),
        "context_vec": grid(flat["context_vec"]),
        "training_wheel": tw,
        "feat_flat": feat_flat,
    }


def forward(params, cfg: SpairConfig, x, step, rng, noise=None):
    """Full inference + generation pass.

    Args:
      x: (B, C, H, W) images in [0, 1] (reference layout, train.py:58).
      step: global step (traced scalar ok) driving the schedules.
      rng: jax PRNG key for this step's stochastic draws.
      noise: optional pre-sampled noise pytree (see sample_noise) overriding
        the rng draws — used for fidelity testing and deterministic eval.

    Returns (loss, aux) where aux carries the reconstruction, latent grids
    in the reference's NCHW layout, and every scalar the reference logs
    (models.py:544-563).
    """
    z = infer_latents(params, cfg, x, step, rng, noise)
    z_where, z_attr = z["z_where"], z["z_attr"]
    z_depth, z_pres = z["z_depth"], z["z_pres"]
    z_pres_prob, posterior = z["z_pres_prob"], z["posterior"]
    tw, feat_flat = z["training_wheel"], z["feat_flat"]
    dtype = _compute_dtype(cfg)
    f32 = jnp.float32

    # nan_hunter call sites mirror the reference's (models.py:65,108,245);
    # zero-cost no-ops unless utils.debug.enable_nan_hunter(True) ran.
    from spair_pytorch_tpu.utils.debug import nan_hunter
    nan_hunter("after inference", z_where=z_where, z_pres=z_pres,
               z_depth=z_depth, feat=feat_flat)

    kls = independent_kl(posterior, z_pres, cfg)
    count_kl = (count_prior_kl_parallel if cfg.count_prior_parallel
                else count_prior_kl)
    kls["pres_dist"] = count_kl(z_pres_prob, z_pres, step, cfg)
    nan_hunter("KL divergence", **kls)

    recon = render(params, cfg, z_attr, z_where, z_depth, z_pres,
                   cfg.image_shape[1:], dtype).astype(f32)
    nan_hunter("render", recon=recon)

    loss, terms = loss_and_metrics(x, recon, kls, cfg)

    if cfg.pres_entropy_weight:
        # opt-in borderline-presence penalty (see config.py for the
        # measured motivation); gated by the training wheel like the
        # presence head itself so the first 1000 steps stay untouched
        from spair_pytorch_tpu.ops.math import safe_log
        p = z_pres_prob.astype(f32)
        ent = -(p * safe_log(p) + (1.0 - p) * safe_log(1.0 - p))
        ent_mean = jnp.mean(jnp.sum(ent, axis=(1, 2, 3)))
        ent_loss = cfg.pres_entropy_weight * (1.0 - tw) * ent_mean
        loss = loss + ent_loss
        terms["losses/pres_entropy"] = ent_mean
        terms["losses/total"] = loss

    if cfg.vestigial_self_attn and "self_attn" in params:
        # The reference runs its SAGAN Self_Attn every forward on the
        # (box, attr, depth) context grid and discards the output
        # (models.py:120) — no gradient path exists. Reproduce the compute
        # for full graph parity: stop_gradient guarantees zero backward
        # cost, and surfacing the mean as a (non-loss) metric keeps XLA
        # from dead-code-eliminating the "discarded" block.
        from spair_pytorch_tpu.models.latents import apply_self_attn
        b = x.shape[0]
        test_ctx = z["context_vec"][..., :-1]  # drop z_pres: 4 + A + 1 dims
        test_ctx = test_ctx.reshape(b, -1, test_ctx.shape[-1])
        attn_out = apply_self_attn(params["self_attn"],
                                   jax.lax.stop_gradient(test_ctx))
        terms["debug/self_attn_mean"] = jnp.mean(attn_out)

    def nchw(t):
        return jnp.transpose(t, (0, 3, 1, 2))

    aux = {
        "recon": recon,
        "z_where": nchw(z_where),
        "z_pres": nchw(z_pres),
        "z_depth": nchw(z_depth),
        "z_attr": nchw(z_attr),
        "z_pres_prob": nchw(z_pres_prob),
        "training_wheel": tw,
        "losses": terms,
    }
    return loss, aux


_NOISE_ORDER = ("box", "attr", "depth", "pres_noise")


def _scan_inference(params, cfg, geom, x, feat_flat, noise_flat, tw, dtype,
                    b, gh, gw):
    """Sequential lateral-context inference as a lax.scan over cell groups.

    Three per-iteration overhead cuts (the scan is dispatch-bound, not
    FLOP-bound, at small batch — docs/NEXT.md round-1 profiling):
      * features and noise are gathered for ALL steps up front (one big
        parallel gather each) and fed as scan xs instead of re-gathered
        inside every iteration;
      * the ~19 per-step output tensors are packed into ONE concatenated
        (B, K, D_total) tensor so the scan stacks a single array per step
        (one dynamic-update-slice instead of nineteen), split afterwards;
      * optionally (cfg.scan_remat) the body is rematerialized so the
        backward pass stores only per-step inputs/outputs instead of every
        intermediate — the body's FLOPs are trivial, its residual traffic
        is not.
    """
    sched = inference_schedule(cfg.inference_mode, gh, gw,
                               cfg.n_lookback)
    board0 = jnp.broadcast_to(params["edge"],
                              (b, sched["board_size"] + 1,
                               cfg.context_elem_dim))
    s, k = sched["steps"], sched["lanes"]

    flat_idx = jnp.asarray(sched["cell_idx"].reshape(-1))  # (S*K,)

    def pregather(t):  # (B, N, D) -> (S, B, K, D)
        g = jnp.take(t, flat_idx, axis=1).reshape(b, s, k, t.shape[-1])
        return jnp.swapaxes(g, 0, 1)

    noise_packed = pregather(jnp.concatenate(
        [noise_flat[n] for n in _NOISE_ORDER], axis=-1))
    noise_widths = [noise_flat[n].shape[-1] for n in _NOISE_ORDER]

    xs = dict(feats=pregather(feat_flat),
              noise=noise_packed,
              cell_hw=jnp.asarray(sched["cell_hw"]),
              nbr_idx=jnp.asarray(sched["nbr_idx"]),
              write_idx=jnp.asarray(sched["write_idx"]))

    # Under a (data, model) mesh, shard the wavefront LANE axis over
    # 'model': each front's up-to-K independent cells split across chips
    # (all heads + glimpse crop are batched over (B, K, ·)); the halo
    # board stays replicated, so GSPMD inserts one all-gather of the
    # 56-dim context vectors per front for the board update. Only applied
    # when K divides the model axis (K = ceil(gw / (n_lookback+1))-class).
    from spair_pytorch_tpu.parallel.constraints import (constrain,
                                                        model_axis_size)
    shard_lanes = k % max(1, model_axis_size()) == 0

    def lane_constrain(t):  # (B, K, D) lane-axis sharding
        return constrain(t, "data", "model", None) if shard_lanes else t

    # Output packing layout, derived once by abstract evaluation (no FLOPs).
    out_shapes = jax.eval_shape(
        lambda f, c, nz, hw: cell_step(params, cfg, geom, x, f, c, nz, hw,
                                       tw, dtype),
        xs["feats"][0], jax.ShapeDtypeStruct((b, k, cfg.context_dim),
                                             jnp.float32),
        {n: jax.ShapeDtypeStruct((b, k, w), jnp.float32)
         for n, w in zip(_NOISE_ORDER, noise_widths)},
        xs["cell_hw"][0])
    out_leaves, out_treedef = jax.tree_util.tree_flatten(out_shapes)
    out_widths = [l.shape[-1] for l in out_leaves]

    def body(board, step_xs):
        nz = dict(zip(_NOISE_ORDER,
                      jnp.split(step_xs["noise"],
                                np.cumsum(noise_widths)[:-1], axis=-1)))
        ctx = jnp.take(board, step_xs["nbr_idx"].reshape(-1), axis=1)
        ctx = lane_constrain(ctx.reshape(b, k, cfg.context_dim))
        out = cell_step(params, cfg, geom, x,
                        lane_constrain(step_xs["feats"]), ctx, nz,
                        step_xs["cell_hw"], tw, dtype)
        board = board.at[:, step_xs["write_idx"]].set(out["context_vec"])
        board = constrain(board, "data", None, None) if shard_lanes \
            else board
        packed = jnp.concatenate(jax.tree_util.tree_leaves(out), axis=-1)
        return board, lane_constrain(packed)

    if cfg.scan_remat:
        if cfg.scan_remat_policy == "dots":
            body = jax.checkpoint(
                body, policy=jax.checkpoint_policies.checkpoint_dots)
        elif cfg.scan_remat_policy == "names":
            # Save exactly the small tagged activations (every dense
            # output in apply_mlp + the cropped glimpses, ~0.5 MB/front
            # at b32) so the backward skips the ~14-matmul body replay,
            # while the bulky STN interpolation weights and einsum
            # intermediate (~3 MB/front — the traffic that made
            # remat=False 1.6 ms SLOWER, benchmarks/RESULTS.md round-4
            # "scan remat 'off' arm") are still rematerialized.
            body = jax.checkpoint(
                body, policy=jax.checkpoint_policies.save_only_these_names(
                    "mlp_dense", "glimpse"))
        else:
            body = jax.checkpoint(body)
    _, ys = jax.lax.scan(body, board0, xs, unroll=cfg.scan_unroll)

    perm = jnp.asarray(sched["perm"])
    ys = jnp.take(jnp.swapaxes(ys, 0, 1).reshape(b, s * k, ys.shape[-1]),
                  perm, axis=1)  # (B, N, D_total) in raster order
    leaves = jnp.split(ys, np.cumsum(out_widths)[:-1], axis=-1)
    return jax.tree_util.tree_unflatten(out_treedef, leaves)


def loss_and_metrics(x, recon, kls: Dict, cfg: SpairConfig):
    """Total loss (reference models.py:544-563): pixel-sum BCE + beta *
    sum over latents of batch-mean KL sums. Returns (loss, term dict with
    the reference's TensorBoard tag names)."""
    recon_loss = binary_cross_entropy_sum(recon, x)
    terms = {"losses/reconst": recon_loss}
    kl_loss = 0.0
    for name, z_kl in kls.items():
        kl_mean = jnp.mean(jnp.sum(z_kl, axis=(1, 2, 3)))
        kl_loss = kl_loss + kl_mean
        terms[f"losses/KL{name}"] = kl_mean
    loss = recon_loss + cfg.vae_beta * kl_loss
    terms["losses/total"] = loss
    return loss, terms
