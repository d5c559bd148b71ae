"""Debug & observability tools.

TPU-native counterparts of reference ``spair/debug_tools.py``:

  * ``nan_hunter`` (reference debug_tools.py:245-271, called at
    models.py:65,108,245): here a ``jax.debug.callback``-based NaN check
    usable INSIDE jitted code, gated by a module flag so production runs
    pay zero cost (the callback is not staged when disabled). For
    whole-program hunting, ``enable_debug_nans`` flips JAX's global
    jax_debug_nans mode.
  * ``benchmark`` scoped timers (reference debug_tools.py:30-40): wall-clock
    deltas with ``block_until_ready`` bracketing, plus a
    ``jax.profiler.TraceAnnotation`` so the spans show up in TPU profiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

_NAN_HUNTING = False


def enable_nan_hunter(on: bool = True):
    global _NAN_HUNTING
    _NAN_HUNTING = on


def enable_debug_nans(on: bool = True):
    jax.config.update("jax_debug_nans", on)


def nan_hunter(location: str, **tensors):
    """Inside jit: if any watched tensor contains NaN, dump all watched
    values and raise — mirroring the reference's behavior of dumping every
    kwarg then raising AssertionError (debug_tools.py:245-271)."""
    if not _NAN_HUNTING:
        return

    names = list(tensors.keys())

    def _check(*vals):
        bad = [n for n, v in zip(names, vals)
               if np.isnan(np.asarray(v, dtype=np.float64)).any()]
        if bad:
            print(f"============== NaN HUNTER ({location}) ==============")
            for n, v in zip(names, vals):
                print(f"  {n}: {np.asarray(v)!r}")
            raise FloatingPointError(
                f"NaN detected at {location} in {bad}")

    jax.debug.callback(_check, *[jnp.asarray(v) for v in tensors.values()])


class Benchmark:
    """Scoped wall-clock timing (reference debug_tools.py:30-40), with
    device-sync correctness: a span only ends after its outputs are ready."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str, sync=None):
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            yield
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            lines.append(f"{name}: total {total:.4f}s over {n} "
                         f"(avg {total / n * 1e3:.2f} ms)")
        return "\n".join(lines)


def generative_grad_views(params, cfg, x, z_attr, z_where, z_depth, z_pres):
    """Gradients of the reconstruction loss through the generative path —
    the JAX analogue of the reference's backward hooks (models.py:489-490):

      * w.r.t. the scaled decoder output logits (the exact tensor
        ``decoder_output_grad_hook`` watched, debug_tools.py:198-218),
      * w.r.t. z_attr (``z_attr_grad_hook``, debug_tools.py:221-243).

    Computed functionally: zero-valued taps are added at the hook points of
    the decode->composite->BCE path and differentiated. (The z_attr view
    covers the render path — the visualization's diagnostic target; the
    reference's hook would also accumulate the z/obj-network input paths.)

    Inputs are the aux pytree's NCHW grids; x is (B, C, H, W). Returns
    (dec_logit_grad (B, N, C+1, oh, ow), attr_grad (B, A, gh, gw)).
    """
    from spair_pytorch_tpu.models.render import composite_xla, decode_objects
    from spair_pytorch_tpu.ops.math import binary_cross_entropy_sum

    nhwc = lambda t: jnp.transpose(t, (0, 2, 3, 1))
    z_attr, z_where = nhwc(z_attr), nhwc(z_where)
    z_depth, z_pres = nhwc(z_depth), nhwc(z_pres)
    b, gh, gw = z_attr.shape[:3]
    n = gh * gw
    oh, ow = cfg.object_shape
    c = cfg.n_channels
    flat = lambda t: t.reshape(b, n, t.shape[-1])

    def path(attr_flat, tap):
        color, alpha, importance = decode_objects(
            params, cfg, attr_flat, flat(z_pres), flat(z_depth),
            logit_tap=tap)
        num, den = composite_xla(color, alpha, importance, flat(z_where),
                                 cfg.image_shape[1:], cfg.render_chunk)
        recon = jnp.clip(num / den, 0.0, 1.0)
        return binary_cross_entropy_sum(recon, x)

    tap0 = jnp.zeros((b, n, oh, ow, c + 1))
    g_attr, g_tap = jax.grad(path, argnums=(0, 1))(flat(z_attr), tap0)
    dec_grad = jnp.moveaxis(g_tap, -1, 2)                # (B, N, C+1, oh, ow)
    attr_grad = jnp.transpose(g_attr.reshape(b, gh, gw, -1), (0, 3, 1, 2))
    return dec_grad, attr_grad


def grad_norms_by_head(grads) -> Dict[str, jnp.ndarray]:
    """Global gradient norm per top-level parameter group (backbone,
    box_net, ...) — the scalar companion to the reference's gradient
    visualizers; jittable, logged as grad_norm/<head>."""
    out = {}
    for name, sub in grads.items():
        leaves = jax.tree_util.tree_leaves(sub)
        sq = sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
        out[f"grad_norm/{name}"] = jnp.sqrt(sq)
    return out
