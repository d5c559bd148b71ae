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


def _topk_setup(pres_pattern, seed=0):
    """Crafted latent grids for render(): pres_pattern (gh*gw,) scores."""
    from spair_pytorch_tpu.models import init_params

    gate = 0.01
    base = tiny_config(inference_mode="independent", render_mode="ordered",
                       render_chunk=4, pres_gate_threshold=gate)
    params = init_params(jax.random.PRNGKey(seed), base)
    b, gh, gw = 2, 4, 4
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
    z_attr = jax.random.normal(k1, (b, gh, gw, base.n_attributes))
    z_where = jnp.stack(jnp.meshgrid(jnp.linspace(0.2, 0.8, gw),
                                     jnp.linspace(0.2, 0.8, gh)), -1)
    z_where = jnp.broadcast_to(
        jnp.concatenate([z_where, jnp.full((gh, gw, 2), 0.3)], -1)[None],
        (b, gh, gw, 4))
    z_depth = jax.random.uniform(k2, (b, gh, gw, 1), minval=0.5, maxval=3.5)
    z_pres = jnp.broadcast_to(
        jnp.asarray(pres_pattern, jnp.float32).reshape(1, gh, gw, 1),
        (b, gh, gw, 1))
    return base, params, (z_attr, z_where, z_depth, z_pres)


def test_render_topk_exact_when_sparse():
    """With 3 live objects and K=8, top-K ordered compositing must be
    numerically identical to the full scan — values and gradients."""
    import dataclasses

    from spair_pytorch_tpu.models.render import render

    pattern = np.full(16, 0.001)
    pattern[[2, 7, 11]] = [0.9, 0.6, 0.3]  # 3 live (> 0.01 gate)
    base, params, zs = _topk_setup(pattern)
    topk = dataclasses.replace(base, render_topk=8)

    def run(cfg, z_attr, z_where):
        return render(params, cfg, z_attr, z_where, zs[2], zs[3], (48, 48))

    out_full = run(base, zs[0], zs[1])
    out_topk = run(topk, zs[0], zs[1])
    np.testing.assert_allclose(np.asarray(out_topk), np.asarray(out_full),
                               rtol=1e-6, atol=1e-6)

    # gradients: identical in real arithmetic; the cond branch compiles a
    # differently-fused backward, so allow reassociation-level f32 noise
    # (a wrongly-included dropped object would show O(1) errors)
    g_full = jax.grad(lambda a, w: jnp.sum(run(base, a, w) ** 2),
                      argnums=(0, 1))(zs[0], zs[1])
    g_topk = jax.grad(lambda a, w: jnp.sum(run(topk, a, w) ** 2),
                      argnums=(0, 1))(zs[0], zs[1])
    for gf, gt in zip(g_full, g_topk):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gf),
                                   rtol=5e-4, atol=1e-5)


def test_render_topk_fallback_when_dense():
    """With 16 live objects and K=8, the cond must take the full-scan
    branch: output still identical to render_topk=0."""
    import dataclasses

    from spair_pytorch_tpu.models.render import render

    base, params, zs = _topk_setup(np.full(16, 0.9), seed=5)
    topk = dataclasses.replace(base, render_topk=8)
    out_full = render(params, base, *zs, (48, 48))
    out_topk = render(params, topk, *zs, (48, 48))
    np.testing.assert_allclose(np.asarray(out_topk), np.asarray(out_full),
                               rtol=1e-6, atol=1e-6)


def test_render_topk_requires_gate():
    import dataclasses

    import pytest

    from spair_pytorch_tpu.models.render import render

    base, params, zs = _topk_setup(np.full(16, 0.5))
    nogate = dataclasses.replace(base, render_topk=8,
                                 pres_gate_threshold=0.0)
    with pytest.raises(ValueError, match="render_topk"):
        render(params, nogate, *zs, (48, 48))


def test_forward_with_topk_trains():
    """Full training graph (loss + grad) with the top-K cond inside."""
    cfg = tiny_config(inference_mode="wavefront", render_mode="ordered",
                      render_chunk=4, pres_gate_threshold=0.01,
                      render_topk=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
    loss, aux = forward(params, cfg, x, 2000, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: forward(p, cfg, x, 2000,
                                   jax.random.PRNGKey(2))[0])(params)
    mags = [float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(m) for m in mags) and max(mags) > 0


# --- top-K compaction of the REFERENCE blend's gated Pallas kernel ---
# (models/render.py pallas branch; den floor carried via den_floor_n)


def _ref_pallas(base, **over):
    import dataclasses
    return dataclasses.replace(base, render_mode="reference",
                               render_backend="pallas", **over)


def test_reference_topk_exact_when_sparse():
    """Reference blend, gated Pallas kernel: top-K compaction must match
    the full-grid gated kernel — values and gradients (up to f32
    reassociation: compaction reorders the num/den accumulation sums)."""
    from spair_pytorch_tpu.models.render import render

    pattern = np.full(16, 0.001)
    pattern[[2, 7, 11]] = [0.9, 0.6, 0.3]  # 3 live (> 0.01 gate)
    base, params, zs = _topk_setup(pattern)
    full = _ref_pallas(base)
    topk = _ref_pallas(base, render_topk=8)

    def run(cfg, z_attr, z_where):
        return render(params, cfg, z_attr, z_where, zs[2], zs[3], (48, 48))

    out_full = run(full, zs[0], zs[1])
    out_topk = run(topk, zs[0], zs[1])
    np.testing.assert_allclose(np.asarray(out_topk), np.asarray(out_full),
                               rtol=1e-5, atol=1e-6)

    g_full = jax.grad(lambda a, w: jnp.sum(run(full, a, w) ** 2),
                      argnums=(0, 1))(zs[0], zs[1])
    g_topk = jax.grad(lambda a, w: jnp.sum(run(topk, a, w) ** 2),
                      argnums=(0, 1))(zs[0], zs[1])
    for gf, gt in zip(g_full, g_topk):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gf),
                                   rtol=5e-4, atol=1e-5)


def test_reference_topk_den_floor_preserved():
    """The compacted kernel must reproduce the reference's n*eps den floor
    (one +1e-9 per GRID object, models.py:527), not k*eps: with all
    objects gated out, the composite is exactly 0/(n*eps) = 0 in both
    arms, and intermediate den must match. Checked via the kernel API
    directly to observe den."""
    from spair_pytorch_tpu.ops.pallas.composite import composite_pallas

    b, n, c, oh, ow = 1, 16, 1, 8, 8
    k = 4
    rng = np.random.RandomState(0)
    color = jnp.asarray(rng.rand(b, n, c, oh, ow), jnp.float32)
    alpha = jnp.asarray(rng.rand(b, n, 1, oh, ow), jnp.float32)
    imp = jnp.asarray(rng.rand(b, n, 1, oh, ow), jnp.float32)
    boxes = jnp.asarray(
        np.stack([rng.uniform(0.3, 0.7, (b, n)), rng.uniform(0.3, 0.7, (b, n)),
                  np.full((b, n), 0.3), np.full((b, n), 0.3)], -1),
        jnp.float32)
    gate = np.zeros((b, n), np.float32)
    gate[:, [3, 9]] = 1.0  # 2 live
    gate = jnp.asarray(gate)

    num_f, den_f = composite_pallas(color, alpha, imp, boxes, (48, 48), 40,
                                    pres_gate=gate)
    idx = jnp.argsort(-gate, axis=1)[:, :k]                      # live first
    take = lambda t: jnp.take_along_axis(
        t, idx.reshape((b, k) + (1,) * (t.ndim - 2)), axis=1)
    num_k, den_k = composite_pallas(take(color), take(alpha), take(imp),
                                    take(boxes), (48, 48), 40,
                                    pres_gate=take(gate), den_floor_n=n)
    np.testing.assert_allclose(np.asarray(num_k), np.asarray(num_f),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(den_k), np.asarray(den_f),
                               rtol=1e-6, atol=0)
    # and WITHOUT den_floor_n the floors differ by (n-k)*eps — the exact
    # mistake the parameter exists to prevent
    _, den_bad = composite_pallas(take(color), take(alpha), take(imp),
                                  take(boxes), (48, 48), 40,
                                  pres_gate=take(gate))
    assert float(jnp.max(jnp.abs(den_bad - den_f))) > 0


def test_reference_topk_fallback_when_dense():
    """All 16 live with K=8: the cond must take the full-grid branch."""
    from spair_pytorch_tpu.models.render import render

    base, params, zs = _topk_setup(np.full(16, 0.9), seed=5)
    full = _ref_pallas(base)
    topk = _ref_pallas(base, render_topk=8)
    out_full = render(params, full, *zs, (48, 48))
    out_topk = render(params, topk, *zs, (48, 48))
    np.testing.assert_allclose(np.asarray(out_topk), np.asarray(out_full),
                               rtol=1e-6, atol=1e-6)


def test_reference_topk_requires_gate():
    import dataclasses

    import pytest

    from spair_pytorch_tpu.models.render import render

    base, params, zs = _topk_setup(np.full(16, 0.5))
    nogate = dataclasses.replace(_ref_pallas(base), render_topk=8,
                                 pres_gate_threshold=0.0)
    with pytest.raises(ValueError, match="render_topk"):
        render(params, nogate, *zs, (48, 48))


def test_forward_with_reference_topk_trains():
    """Full training graph (loss + grad) through the compacted kernel."""
    cfg = tiny_config(inference_mode="wavefront", render_mode="reference",
                      render_backend="pallas", pres_gate_threshold=0.01,
                      render_topk=8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
    loss, aux = forward(params, cfg, x, 2000, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: forward(p, cfg, x, 2000,
                                   jax.random.PRNGKey(2))[0])(params)
    mags = [float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(m) for m in mags) and max(mags) > 0
