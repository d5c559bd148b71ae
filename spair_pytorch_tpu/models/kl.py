"""KL terms: independent Gaussian latents + the autoregressive count prior.

TPU-native counterpart of reference ``SPAIR._compute_KL``
(spair/models.py:169-262). The independent-latent KLs are one fused
elementwise expression over the whole (B, grid_h, grid_w) map; the
sequential count-prior chain (reference's second 121-iteration Python loop,
models.py:204-257) becomes a single ``lax.scan`` carrying
(count_distribution, count_so_far) over cells in raster order.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from spair_pytorch_tpu.config import SpairConfig
from spair_pytorch_tpu.ops.math import bernoulli_kl, gaussian_kl
from spair_pytorch_tpu.ops.schedules import exponential_decay


def independent_kl(posterior: Dict, z_pres, cfg: SpairConfig) -> Dict:
    """Per-latent KL against the fixed Gaussian priors, masked by z_pres.

    posterior: {name: (mean, std)} with arrays (B, gh, gw, D).
    z_pres: (B, gh, gw, 1) — presence gates every latent's KL
    (reference models.py:172-177; SURVEY quirk #12).
    """
    priors = dict(cfg.priors)
    out = {}
    for name, (mean, std) in posterior.items():
        p_mean, p_std = priors[name]
        out[name] = z_pres * gaussian_kl(mean, std, p_mean, p_std)
    return out


def count_prior_kl(z_pres_prob, z_pres, step, cfg: SpairConfig):
    """SPAIR Appendix-B presence KL with the annealed geometric count prior.

    z_pres_prob, z_pres: (B, gh, gw, 1). Returns (B, gh, gw, 1).

    Faithful to reference models.py:179-257 including numerical details:
    the clamp bounds of p(z|C), safe-log placement in the Bernoulli KL, the
    1e-6 floor on the count-distribution normalizer, and the use of the
    ROUNDED relaxed sample for the count update (SURVEY quirk #4).
    """
    b, gh, gw, _ = z_pres_prob.shape
    hw = gh * gw
    support = jnp.arange(hw + 1, dtype=jnp.float32)  # (HW+1,)

    log_odds = exponential_decay(step, cfg.count_prior)
    prior_prob = 1.0 / (jnp.exp(-log_odds) + 1.0)  # analytical sigmoid
    count_dist = (1.0 - prior_prob) * jnp.power(prior_prob, support)
    count_dist = count_dist / jnp.sum(count_dist)
    count_dist = jnp.broadcast_to(count_dist, (b, hw + 1))

    probs = z_pres_prob.reshape(b, hw)  # (B, HW) raster order
    # Every input of the scan below is round()-gated: the count updates use
    # ROUNDED samples (reference models.py:232) and round() carries zero
    # gradient, so p_z has IDENTICALLY ZERO parameter gradient (same
    # argument as count_prior_kl_parallel). Computing the chain under
    # stop_gradient is therefore value- AND gradient-identical to the
    # reference — and it deletes the scan's backward while-loop, one of the
    # four sequential loops that dominate device time at small batch.
    samples = jax.lax.stop_gradient(jnp.round(z_pres.reshape(b, hw).T))

    def body(carry, xs):
        count_dist, count_so_far = carry
        sample, i = xs
        remaining = hw - i
        p_z_given_c = jnp.clip(support[None, :] - count_so_far,
                               0.0, remaining) / remaining
        # p_z <= 1 in exact arithmetic (convex combination), but float
        # summation can overshoot by ~1e-7 when the count distribution
        # concentrates at high counts — then safe_log(1 - p_z) sees a
        # negative argument and the whole loss NaNs (observed at ~step 1700
        # of a real run; the reference has the same latent hazard, which its
        # nan_hunter would merely report). Clipping is value-identical.
        p_z = jnp.clip(jnp.sum(count_dist * p_z_given_c, axis=-1), 0.0, 1.0)
        mult = (sample[:, None] * p_z_given_c
                + (1.0 - sample[:, None]) * (1.0 - p_z_given_c))
        new_dist = mult * count_dist
        normalizer = jnp.clip(jnp.sum(new_dist, axis=-1, keepdims=True),
                              1e-6, None)
        new_dist = new_dist / normalizer
        count_so_far = count_so_far + sample[:, None]
        return (new_dist, count_so_far), p_z

    init = (count_dist, jnp.zeros((b, 1)))
    xs = (samples, jnp.arange(hw, dtype=jnp.float32))
    _, p_zs = jax.lax.scan(body, init, xs, unroll=cfg.scan_unroll)  # (HW, B)
    kls = bernoulli_kl(probs, p_zs.T)  # vectorized; grads flow via probs only
    return kls.reshape(b, gh, gw, 1)


def count_prior_kl_parallel(z_pres_prob, z_pres, step, cfg: SpairConfig):
    """The same count-prior KL with NO sequential scan.

    The recurrence is only superficially sequential: the count updates use
    ROUNDED samples (reference models.py:232), which are known up front and
    round() carries zero gradient. The per-cell count distribution therefore
    telescopes:

        cd_i  ∝  cd_0 ⊙ Π_{j<i} mult_j          (per-step normalizations cancel)
        p_z_i =  Σ_k cd_0[k] M_i[k] p_i[k] / Σ_k cd_0[k] M_i[k]

    with M the exclusive cumulative product, computed in log space with a
    per-cell max shift (the raw product underflows f32 after ~120 factors of
    ~0.5 early in training; a feasible count k* with all-positive factors
    always exists, so the shifted exponentials are well-defined). One
    (B, HW, HW+1) elementwise block plus a cumsum — fully parallel on the
    VPU.

    Matches ``count_prior_kl`` to ~1e-5 whenever the sequential version's
    1e-6 normalizer clamp (reference models.py:238) does not bind. When the
    clamp DOES bind — presence counts wildly exceeding the annealed prior's
    support, e.g. 60 present cells against the end-of-anneal prior — the
    sequential version's clamp distorts the count posterior and the two
    diverge; this version is the exact telescoped value. The sequential
    scan therefore remains the fidelity default (enable via
    cfg.count_prior_parallel)."""
    b, gh, gw, _ = z_pres_prob.shape
    hw = gh * gw
    support = jnp.arange(hw + 1, dtype=jnp.float32)

    log_odds = exponential_decay(step, cfg.count_prior)
    # log cd0[k] = log(1-pp) + k*log(pp) - log Z; the k-independent terms
    # cancel in the p_z ratio, so only k*log(pp) survives. Computing the
    # log analytically matters: cd0 itself underflows f32 for k >~ 20 at
    # late steps (pp ~ 0.012), which would wipe out the feasible count's
    # weight and NaN the max-shift (the sequential scan dodges this via
    # per-step renormalization).
    log_pp = -jax.nn.softplus(-log_odds)  # log sigmoid(log_odds)
    log_cd0 = support * log_pp

    probs = z_pres_prob.reshape(b, hw)
    samples = jnp.round(z_pres.reshape(b, hw))
    csf = jnp.cumsum(samples, axis=1) - samples  # exclusive prefix (B, HW)
    idx = jnp.arange(hw, dtype=jnp.float32)
    rem = (hw - idx)[None, :, None]

    p = jnp.clip(support[None, None, :] - csf[..., None], 0.0, rem) / rem
    s = samples[..., None]
    # clamp: on TPU the division lowers to multiply-by-reciprocal, so p can
    # exceed 1 by an ulp and (1 - p) goes NEGATIVE -> log(mult) = NaN
    # (observed at step 0 on hardware; exact on CPU).
    mult = jnp.clip(s * p + (1.0 - s) * (1.0 - p), 0.0, 1.0)  # (B, HW, K)

    # Clamp instead of letting log(0) = -inf through: on TPU, XLA lowers
    # cumsum as a triangular-matrix MATMUL, and 0 * (-inf) = NaN poisons
    # every prefix (NaN at step 0 on hardware; CPU's sequential cumsum
    # masks the bug). -1e30 per factor keeps 121-term sums ~1e32, far from
    # f32 overflow, and exp(-1e30 - shift) underflows to the same 0.
    log_mult = jnp.maximum(jnp.log(mult), -1e30)
    l_incl = jnp.cumsum(log_mult, axis=1)
    l_excl = jnp.concatenate(
        [jnp.zeros((b, 1, hw + 1)), l_incl[:, :-1]], axis=1)
    logits = log_cd0[None, None, :] + l_excl
    shift = jnp.max(logits, axis=-1, keepdims=True)  # finite: k* feasible
    w = jnp.exp(logits - shift)
    p_z = jnp.clip(jnp.sum(w * p, axis=-1) / jnp.sum(w, axis=-1), 0.0, 1.0)
    # p_z has ZERO parameter gradient by construction — every input is
    # round()-gated (samples, csf) or constant — but the log(0) = -inf
    # intermediates make the naive VJP emit 0 * inf = NaN (observed killing
    # the tpu_throughput preset at step ~25). stop_gradient prunes the
    # dead-but-NaN branch; the sequential scan's gradient is identically
    # zero here too.
    p_z = jax.lax.stop_gradient(p_z)
    kl = bernoulli_kl(probs, p_z)
    return kl.reshape(b, gh, gw, 1)
