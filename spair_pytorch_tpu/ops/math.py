"""Latent-math primitives.

TPU-native counterparts of reference ``spair/modules.py:167-189,296`` plus the
closed-form Gaussian KL that replaces ``torch.distributions.kl_divergence``
(reference models.py:175). Everything is a pure jnp function; all are safe
under jit/vmap/scan/grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def latent_to_mean_std(latent):
    """Split a latent vector into (mean, std) along the last axis.

    Matches reference modules.py:167-176 exactly: the second half is mapped
    through ``2 * sigmoid(clamp(log_std, -10, 10))`` — std in (0, 2) — NOT
    ``exp(log_std / 2)`` (that variant is commented out in the reference).
    """
    mean, log_std = jnp.split(latent, 2, axis=-1)
    std = 2.0 * jax.nn.sigmoid(jnp.clip(log_std, -10.0, 10.0))
    return mean, std


@jax.custom_jvp
def _analytical_sigmoid(x):
    """1/(exp(-x)+1) with a numerically stable derivative.

    The naive autodiff of this expression is exp(-x)/(exp(-x)+1)^2, which
    overflows to inf/inf = NaN once x < ~-88 in f32. The decoder's color
    logits (x2 scale, reference config.py:74) drift that negative for black
    pixels after a few thousand steps — observed poisoning every parameter
    at step ~5662. The custom JVP uses s*(1-s): same value, same
    mathematical derivative, no overflow. (The reference's torch autograd
    has the identical hazard.)"""
    return 1.0 / (jnp.exp(-x) + 1.0)


@_analytical_sigmoid.defjvp
def _analytical_sigmoid_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    s = _analytical_sigmoid(x)
    return s, s * (1.0 - s) * t


def clamped_sigmoid(logit, use_analytical: bool = False):
    """sigmoid(clamp(logit, -10, 10)); reference modules.py:178-189.

    ``use_analytical`` computes 1/(exp(-x)+1) without clamping — the
    reference uses it in the decoder output path (models.py:492).
    """
    if use_analytical:
        return _analytical_sigmoid(logit)
    return jax.nn.sigmoid(jnp.clip(logit, -10.0, 10.0))


def safe_log(t):
    """log(t + 1e-9); reference modules.py:296-297.

    The outer ``maximum`` is load-bearing: XLA reassociates expressions like
    ``(1.0 - prob) + 1e-9`` into ``(1.0 + 1e-9) - prob``, and since
    1.0 + 1e-9 rounds back to 1.0 in f32, ``prob == 1.0`` yields log(0) =
    -inf — and then ``(1 - prob) * safe_log(1 - prob)`` becomes 0 * -inf =
    NaN *only under jit* (observed killing training at step ~1703; eager
    mode computes the written order and is fine). Clamping the log argument
    at 1e-9 is value-identical whenever the unreassociated sum would be
    >= 1e-9 — in particular exact at t == 0 — and blocks the rewrite."""
    return jnp.log(jnp.maximum(t + 1e-9, 1e-9))


def gaussian_kl(mean_q, std_q, mean_p, std_p):
    """KL(N(mean_q, std_q) || N(mean_p, std_p)), elementwise.

    Closed form replacing torch.distributions.kl_divergence at reference
    models.py:175. std arguments are standard deviations.
    """
    var_ratio = jnp.square(std_q / std_p)
    t1 = jnp.square((mean_q - mean_p) / std_p)
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


def bernoulli_kl(prob_q, prob_p):
    """KL(Bern(prob_q) || Bern(prob_p)) with the reference's safe_log
    placement (models.py:222-226)."""
    return (prob_q * (safe_log(prob_q) - safe_log(prob_p))
            + (1.0 - prob_q) * (safe_log(1.0 - prob_q) - safe_log(1.0 - prob_p)))


@jax.custom_vjp
def binary_cross_entropy_sum(recon, target):
    """Sum-reduced BCE matching ``F.binary_cross_entropy(reduction='sum')``
    (reference models.py:547), including torch's clamp of each log term at
    -100 which protects recon values of exactly 0 or 1.

    A custom VJP reproduces torch's native backward
    grad = (recon - target) / max(recon * (1 - recon), eps): the naive
    max(log(r), -100) forward would emit 0 * inf = NaN gradients at r = 0,
    which the renderer produces wherever no glimpse covers a pixel."""
    return _bce_fwd_value(recon, target)


def _bce_fwd_value(recon, target):
    log_r = jnp.maximum(jnp.log(recon), -100.0)
    log_1mr = jnp.maximum(jnp.log(1.0 - recon), -100.0)
    return -jnp.sum(target * log_r + (1.0 - target) * log_1mr)


def _bce_fwd(recon, target):
    return _bce_fwd_value(recon, target), (recon, target)


def _bce_bwd(res, g):
    recon, target = res
    denom = jnp.maximum(recon * (1.0 - recon), 1e-12)  # torch's EPSILON
    d_recon = g * (recon - target) / denom
    log_r = jnp.maximum(jnp.log(recon), -100.0)
    log_1mr = jnp.maximum(jnp.log(1.0 - recon), -100.0)
    d_target = g * (log_1mr - log_r)
    return d_recon, d_target


binary_cross_entropy_sum.defvjp(_bce_fwd, _bce_bwd)


def logistic_noise(key, shape, eps: float = 1e-9):
    """log(u+eps) - log(1-u+eps), u ~ U(0,1): the relaxed-Bernoulli noise of
    reference models.py:400-404 (eps there is 10e-10 = 1e-9)."""
    u = jax.random.uniform(key, shape)
    return jnp.log(u + eps) - jnp.log(1.0 - u + eps)
