"""Fused paste-and-composite TPU kernel (Pallas).

The hot generative path: paste B x N decoded glimpses onto canvases and
accumulate the importance-weighted composite (reference semantics:
models.py:515-537) WITHOUT materializing any per-object canvas. The XLA
fallback (models/render.py:composite_xla) scans over object chunks, writing
(B, chunk, 3, H, W) intermediates to HBM each step; this kernel keeps the
entire per-image working set — all N glimpses (~1.1 MB), the interpolation
matrices, and the (H, W) accumulators — resident in VMEM, and runs the
separable-paste matmuls on the MXU:

    per object o:   T   = Py_o @ G_o            (H, oh) @ (oh, 3*ow)
                    P_c = T[:, c, :] @ Px_o^T   (H, ow) @ (ow, W)
                    num += P_alpha * P_color * (P_imp + 1e-9)
                    den += (P_imp + 1e-9)

Grid: one program per batch element. Gradients flow through a custom VJP
whose backward differentiates the (mathematically identical) XLA compositor
— the forward is where the HBM-traffic win lives.

Currently specialized to single-channel images (the reference's scattered-
MNIST case); render.py falls back to the XLA path for C > 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _paste_matrix(t, s, out_size: int, in_size: int):
    """(out_size, in_size) hat-function interpolation weights for the
    inverse STN (zeros padding): ops/stn.py semantics, built on the VPU.
    tpu.iota only produces integers — build int32 and cast."""
    i = jax.lax.broadcasted_iota(jnp.int32, (out_size, 1), 0).astype(
        jnp.float32)
    a = jax.lax.broadcasted_iota(jnp.int32, (out_size, in_size), 1).astype(
        jnp.float32)
    u_out = 2.0 * i / (out_size - 1) - 1.0
    src = ((u_out - (2.0 * t - 1.0)) / s + 1.0) * (in_size - 1) / 2.0
    return jnp.maximum(0.0, 1.0 - jnp.abs(src - a))


def _composite_kernel(boxes_ref, glimpse_ref, num_ref, den_ref, *,
                      n_objects: int, oh: int, ow: int, ih: int, iw: int):
    num_acc = jnp.zeros((ih, iw), jnp.float32)
    den_acc = jnp.zeros((ih, iw), jnp.float32)

    def body(o, carry):
        num_acc, den_acc = carry
        xt = boxes_ref[o, 0]
        yt = boxes_ref[o, 1]
        xs = boxes_ref[o, 2]
        ys = boxes_ref[o, 3]
        py = _paste_matrix(yt, ys, ih, oh)            # (H, oh)
        px = _paste_matrix(xt, xs, iw, ow)            # (W, ow)
        g = glimpse_ref[0, o]                         # (oh, 3*ow)
        t = jnp.dot(py, g, preferred_element_type=jnp.float32)  # (H, 3*ow)
        col = jnp.dot(t[:, 0 * ow:1 * ow], px.T,
                      preferred_element_type=jnp.float32)       # (H, W)
        alp = jnp.dot(t[:, 1 * ow:2 * ow], px.T,
                      preferred_element_type=jnp.float32)
        imp = jnp.dot(t[:, 2 * ow:3 * ow], px.T,
                      preferred_element_type=jnp.float32) + 1e-9
        return num_acc + alp * col * imp, den_acc + imp

    num_acc, den_acc = jax.lax.fori_loop(0, n_objects, body,
                                         (num_acc, den_acc))
    num_ref[0, 0] = num_acc
    den_ref[0, 0] = den_acc


def _composite_pallas_fwd_impl(color, alpha, importance, boxes, image_hw):
    b, n, c, oh, ow = color.shape
    assert c == 1, "pallas compositor is specialized to grayscale"
    ih, iw = image_hw
    # channel-packed glimpse: (B, N, oh, 3*ow) with [color | alpha | imp]
    # along the packed axis — lets the kernel do ONE (H,oh)@(oh,3*ow)
    # matmul per object instead of three.
    g = jnp.concatenate([color[:, :, 0], alpha[:, :, 0], importance[:, :, 0]],
                        axis=-1)  # (B, N, oh, 3*ow)
    g = g.astype(jnp.float32)
    boxes = boxes.astype(jnp.float32)

    kernel = functools.partial(_composite_kernel, n_objects=n, oh=oh, ow=ow,
                               ih=ih, iw=iw)
    # interpret mode on CPU: lets the CI test suite (8 virtual CPU devices)
    # exercise the kernel without TPU hardware.
    interpret = jax.default_backend() == "cpu"
    num, den = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, n, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, oh, 3 * ow), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, ih, iw), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ih, iw), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, ih, iw), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, ih, iw), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * (ih * oh * 3 * ow + 3 * ih * ow * iw),
            bytes_accessed=4 * b * (n * oh * 3 * ow + 2 * ih * iw),
            transcendentals=0,
        ),
        interpret=interpret,
    )(boxes, g)
    return num, den


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def composite_pallas(color, alpha, importance, boxes, image_hw):
    """Drop-in for composite_xla: returns (num, den), each (B, ·, H, W)."""
    return _composite_pallas_fwd_impl(color, alpha, importance, boxes,
                                      image_hw)


def _fwd(color, alpha, importance, boxes, image_hw):
    out = _composite_pallas_fwd_impl(color, alpha, importance, boxes,
                                     image_hw)
    return out, (color, alpha, importance, boxes)


def _bwd(image_hw, residuals, cotangents):
    # Backward rides the mathematically identical XLA compositor: the
    # forward's HBM savings are what the kernel buys; the backward reuses
    # XLA's fused scan gradients.
    from spair_pytorch_tpu.models.render import composite_xla
    color, alpha, importance, boxes = residuals
    n = color.shape[1]
    _, vjp = jax.vjp(
        lambda c, a, i, bx: composite_xla(c, a, i, bx, image_hw,
                                          chunk=min(16, n)),
        color, alpha, importance, boxes)
    return vjp(cotangents)


composite_pallas.defvjp(_fwd, _bwd)
