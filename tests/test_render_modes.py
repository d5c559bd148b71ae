"""Corrected z-depth-ordered compositing tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_model import tiny_config
from spair_pytorch_tpu.models import forward, init_params
from spair_pytorch_tpu.models.render import composite_ordered


def test_nearer_object_occludes():
    """Two fully opaque overlapping objects: the one with larger z_depth
    (nearer) must win the overlap region under ordered compositing."""
    b, n, c, oh, ow = 1, 2, 1, 8, 8
    color = jnp.stack([jnp.full((c, oh, ow), 1.0),
                       jnp.full((c, oh, ow), 0.25)])[None]
    alpha = jnp.ones((b, n, 1, oh, ow))
    depth = jnp.array([[[3.5], [1.0]]])  # object 0 nearer
    boxes = jnp.array([[[0.5, 0.5, 0.5, 0.5],
                        [0.5, 0.5, 0.5, 0.5]]])  # same box: full overlap
    out = composite_ordered(color, alpha, depth, boxes, (32, 32), chunk=2)
    center = float(out[0, 0, 16, 16])
    assert abs(center - 1.0) < 1e-5, f"near object should win, got {center}"

    # swap depths: now the dim object wins
    depth2 = jnp.array([[[1.0], [3.5]]])
    out2 = composite_ordered(color, alpha, depth2, boxes, (32, 32), chunk=2)
    assert abs(float(out2[0, 0, 16, 16]) - 0.25) < 1e-5


def test_transmittance_blend():
    """A half-transparent near object over an opaque far object blends."""
    b, n, c, oh, ow = 1, 2, 1, 8, 8
    color = jnp.stack([jnp.full((c, oh, ow), 1.0),
                       jnp.full((c, oh, ow), 0.0)])[None]
    alpha = jnp.stack([jnp.full((1, oh, ow), 0.5),
                       jnp.full((1, oh, ow), 1.0)])[None]
    depth = jnp.array([[[2.0], [1.0]]])
    boxes = jnp.array([[[0.5, 0.5, 0.5, 0.5], [0.5, 0.5, 0.5, 0.5]]])
    out = composite_ordered(color, alpha, depth, boxes, (32, 32), chunk=2)
    # over: 0.5*1.0 + (1-0.5)*1.0*0.0 = 0.5
    assert abs(float(out[0, 0, 16, 16]) - 0.5) < 1e-5


def test_forward_with_ordered_mode():
    cfg = tiny_config(inference_mode="independent", render_mode="ordered",
                      render_chunk=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
    loss, aux = forward(params, cfg, x, 0, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert float(aux["recon"].min()) >= 0 and float(aux["recon"].max()) <= 1
    # gradients flow
    g = jax.grad(lambda p: forward(p, cfg, x, 0, jax.random.PRNGKey(2))[0])(
        params)
    mags = [float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(m) for m in mags)
    assert max(mags) > 0
