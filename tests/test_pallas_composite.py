"""Pallas fused compositor vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spair_pytorch_tpu.models.render import composite_xla
from spair_pytorch_tpu.ops.pallas.composite import composite_pallas


def make_inputs(seed, b=2, n=9, oh=14, ow=14):
    rng = np.random.RandomState(seed)
    color = rng.rand(b, n, 1, oh, ow).astype("f")
    alpha = rng.rand(b, n, 1, oh, ow).astype("f")
    imp = rng.rand(b, n, 1, oh, ow).astype("f") + 0.01
    boxes = np.stack([
        rng.uniform(0.1, 0.9, (b, n)),
        rng.uniform(0.1, 0.9, (b, n)),
        rng.uniform(0.1, 0.5, (b, n)),
        rng.uniform(0.1, 0.5, (b, n)),
    ], axis=-1).astype("f")
    return map(jnp.asarray, (color, alpha, imp, boxes))


class TestForwardParity:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_xla_compositor(self, seed):
        color, alpha, imp, boxes = make_inputs(seed)
        hw = (64, 64)
        num_p, den_p = composite_pallas(color, alpha, imp, boxes, hw)
        num_x, den_x = composite_xla(color, alpha, imp, boxes, hw, chunk=4)
        np.testing.assert_allclose(np.asarray(num_p), np.asarray(num_x),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(den_p), np.asarray(den_x),
                                   rtol=1e-5, atol=1e-6)

    def test_under_jit(self):
        color, alpha, imp, boxes = make_inputs(7)
        hw = (64, 64)
        f = jax.jit(lambda c, a, i, b: composite_pallas(c, a, i, b, hw))
        num, den = f(color, alpha, imp, boxes)
        num_x, den_x = composite_xla(color, alpha, imp, boxes, hw, chunk=4)
        np.testing.assert_allclose(np.asarray(num), np.asarray(num_x),
                                   rtol=1e-5, atol=1e-6)


class TestGradients:
    def test_custom_vjp_matches_xla_grads(self):
        color, alpha, imp, boxes = make_inputs(3, b=1, n=4)
        hw = (48, 48)

        def loss_pallas(c, a, i, bx):
            num, den = composite_pallas(c, a, i, bx, hw)
            return jnp.sum((num / den) ** 2)

        def loss_xla(c, a, i, bx):
            num, den = composite_xla(c, a, i, bx, hw, chunk=4)
            return jnp.sum((num / den) ** 2)

        g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(color, alpha, imp,
                                                          boxes)
        g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(color, alpha, imp,
                                                       boxes)
        for a, b in zip(g_p, g_x):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=5e-4)


class TestEndToEnd:
    def test_render_backend_pallas_forward(self):
        from tests.test_model import tiny_config
        from spair_pytorch_tpu.models import forward, init_params
        cfg = tiny_config(inference_mode="independent",
                          render_backend="pallas")
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
        loss_p, aux_p = forward(params, cfg, x, 0, jax.random.PRNGKey(2))
        cfg_x = tiny_config(inference_mode="independent",
                            render_backend="xla")
        loss_x, aux_x = forward(params, cfg_x, x, 0, jax.random.PRNGKey(2))
        np.testing.assert_allclose(np.asarray(aux_p["recon"]),
                                   np.asarray(aux_x["recon"]),
                                   rtol=1e-5, atol=1e-5)
        assert np.isclose(float(loss_p), float(loss_x), rtol=1e-5)


def make_inputs_c(seed, b=2, n=9, c=3, oh=14, ow=14, extreme=False):
    rng = np.random.RandomState(seed)
    color = rng.rand(b, n, c, oh, ow).astype("f")
    alpha = rng.rand(b, n, 1, oh, ow).astype("f")
    imp = rng.rand(b, n, 1, oh, ow).astype("f") + 0.01
    if extreme:
        # boxes straddling every edge and at the max scale the window must
        # cover (centers can leave [0,1] in SPAIR: cell_y in [-0.5, 1.5])
        xt = rng.uniform(-0.1, 1.1, (b, n))
        yt = rng.uniform(-0.1, 1.1, (b, n))
        xs = rng.uniform(0.05, 0.5, (b, n))
        ys = np.full((b, n), 0.5, "f")  # exactly max scale
    else:
        xt = rng.uniform(0.1, 0.9, (b, n))
        yt = rng.uniform(0.1, 0.9, (b, n))
        xs = rng.uniform(0.1, 0.5, (b, n))
        ys = rng.uniform(0.1, 0.5, (b, n))
    boxes = np.stack([xt, yt, xs, ys], axis=-1).astype("f")
    return map(jnp.asarray, (color, alpha, imp, boxes))


class TestWindowedV2:
    """v2 windowing: the static WIN-row window must cover every support."""

    @pytest.mark.parametrize("seed", [0, 5])
    def test_windowed_matches_full(self, seed):
        color, alpha, imp, boxes = make_inputs_c(seed, c=1, extreme=True)
        hw = (64, 64)
        # max ys = 0.5 -> span = ceil(0.5*63)+3 = 35 -> win = 48
        num_w, den_w = composite_pallas(color, alpha, imp, boxes, hw, 48)
        num_x, den_x = composite_xla(color, alpha, imp, boxes, hw, chunk=4)
        np.testing.assert_allclose(np.asarray(num_w), np.asarray(num_x),
                                   rtol=5e-5, atol=5e-6)
        np.testing.assert_allclose(np.asarray(den_w), np.asarray(den_x),
                                   rtol=5e-5, atol=5e-6)

    def test_multichannel(self):
        color, alpha, imp, boxes = make_inputs_c(2, c=3)
        hw = (48, 48)
        num_p, den_p = composite_pallas(color, alpha, imp, boxes, hw, 40)
        num_x, den_x = composite_xla(color, alpha, imp, boxes, hw, chunk=4)
        assert num_p.shape == (2, 3, 48, 48)
        np.testing.assert_allclose(np.asarray(num_p), np.asarray(num_x),
                                   rtol=5e-5, atol=5e-6)
        np.testing.assert_allclose(np.asarray(den_p), np.asarray(den_x),
                                   rtol=5e-5, atol=5e-6)

    def test_windowed_grads_match_xla(self):
        color, alpha, imp, boxes = make_inputs_c(4, b=1, n=4, c=2,
                                                 extreme=True)
        hw = (48, 48)
        win = 40  # ceil(0.5*47)+3 = 27 -> 32 + 8

        def loss_pallas(c, a, i, bx):
            num, den = composite_pallas(c, a, i, bx, hw, win)
            return jnp.sum((num / den) ** 2)

        def loss_xla(c, a, i, bx):
            num, den = composite_xla(c, a, i, bx, hw, chunk=4)
            return jnp.sum((num / den) ** 2)

        g_p = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(color, alpha,
                                                          imp, boxes)
        g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(color, alpha,
                                                       imp, boxes)
        for a, b in zip(g_p, g_x):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=5e-4)

    def test_bf16_operand_path(self):
        # bf16 model compute routes the paste matmuls through the MXU's
        # native bf16 path (composite.py::_mm_dtype); parity vs the f32
        # XLA compositor within bf16 tolerance, fwd AND grads.
        color, alpha, imp, boxes = make_inputs_c(3, c=2)
        hw = (48, 48)
        bf = [t.astype(jnp.bfloat16) for t in (color, alpha, imp)]

        def loss_p(co, al, im, bx):
            num, den = composite_pallas(co, al, im, bx, hw, None)
            return jnp.sum((num / den) ** 2)

        def loss_x(co, al, im, bx):
            num, den = composite_xla(co, al, im, bx, hw, 4)
            return jnp.sum((num / den) ** 2)

        vp, gp = jax.value_and_grad(loss_p, argnums=(0, 1, 2, 3))(
            *bf, boxes)
        vx, gx = jax.value_and_grad(loss_x, argnums=(0, 1, 2, 3))(
            color, alpha, imp, boxes)
        assert np.isclose(float(vp), float(vx), rtol=3e-2)
        for a, b in zip(gp, gx):
            a = np.asarray(a, np.float32)
            b = np.asarray(b)
            denom = max(1e-3, float(np.max(np.abs(b))))
            assert float(np.max(np.abs(a - b))) / denom < 6e-2

    def test_window_rows_derivation(self):
        from tests.test_model import tiny_config
        from spair_pytorch_tpu.models.render import paste_window_rows
        cfg = tiny_config()
        win = paste_window_rows(cfg, cfg.image_shape[1:])
        ih = cfg.image_shape[1]
        max_ys = cfg.max_hw * cfg.anchor_shape[0] / cfg.image_shape[1]
        assert win >= min(ih, int(np.ceil(max_ys * (ih - 1))) + 3)
        assert win <= ih and win % 8 == 0 or win == ih


def make_banded_inputs(seed, b=2, gh=4, gw=4, c=1, oh=14, ow=14, ih=48,
                       iw=48, cell=12, min_cy=-0.5, max_cy=1.5, max_ys=0.5):
    """Boxes from the MODEL's parameterization (cell-anchored, sigma-
    bounded scales) — the precondition composite_pallas_v3 documents."""
    rng = np.random.RandomState(seed)
    n = gh * gw
    col = rng.rand(b, n, c, oh, ow).astype("f")
    alp = rng.rand(b, n, 1, oh, ow).astype("f")
    imp = (rng.rand(b, n, 1, oh, ow) + 0.01).astype("f")
    hh, ww = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    yt = (hh.ravel()[None] + rng.uniform(min_cy, max_cy, (b, n))) * cell / ih
    xt = (ww.ravel()[None] + rng.uniform(min_cy, max_cy, (b, n))) * cell / iw
    ys = rng.uniform(0.05, max_ys, (b, n))
    xs = rng.uniform(0.05, max_ys, (b, n))
    boxes = np.stack([xt, yt, xs, ys], -1).astype("f")
    args = tuple(map(jnp.asarray, (col, alp, imp, boxes)))
    meta = (cell, (gh, gw), (min_cy, max_cy, max_ys))
    return args, meta


class TestV3ChunkedKernel:
    """Object-chunk batched kernel (composite_v3.py) vs the XLA path."""

    @pytest.mark.parametrize("chunk_k", [1, 2, 4])
    def test_fwd_and_grads_match_xla(self, chunk_k):
        from spair_pytorch_tpu.ops.pallas.composite_v3 import (
            composite_pallas_v3)
        (col, alp, imp, boxes), (cell, ghw, bounds) = make_banded_inputs(0)

        def lp(co, al, im, bx):
            num, den = composite_pallas_v3(co, al, im, bx, (48, 48), cell,
                                           ghw, bounds, chunk_k=chunk_k)
            return jnp.sum((num / den) ** 2)

        def lr(co, al, im, bx):
            num, den = composite_xla(co, al, im, bx, (48, 48), 8)
            return jnp.sum((num / den) ** 2)

        vp, gp = jax.value_and_grad(lp, argnums=(0, 1, 2, 3))(
            col, alp, imp, boxes)
        vr, gr = jax.value_and_grad(lr, argnums=(0, 1, 2, 3))(
            col, alp, imp, boxes)
        assert np.isclose(float(vp), float(vr), rtol=1e-5)
        for a, bb in zip(gp, gr):
            denom = max(1e-6, float(np.max(np.abs(bb))))
            assert float(np.max(np.abs(np.asarray(a) - np.asarray(bb)))
                         ) / denom < 1e-3

    def test_multichannel_bf16(self):
        from spair_pytorch_tpu.ops.pallas.composite_v3 import (
            composite_pallas_v3)
        (col, alp, imp, boxes), (cell, ghw, bounds) = make_banded_inputs(
            1, c=3)
        bf = [t.astype(jnp.bfloat16) for t in (col, alp, imp)]

        def lp(co, al, im, bx):
            num, den = composite_pallas_v3(co, al, im, bx, (48, 48), cell,
                                           ghw, bounds, chunk_k=2)
            return jnp.sum((num / den) ** 2)

        def lr(co, al, im, bx):
            num, den = composite_xla(co, al, im, bx, (48, 48), 8)
            return jnp.sum((num / den) ** 2)

        vp, gp = jax.value_and_grad(lp, argnums=(0, 1, 2, 3))(*bf, boxes)
        vr, gr = jax.value_and_grad(lr, argnums=(0, 1, 2, 3))(
            col, alp, imp, boxes)
        assert np.isclose(float(vp), float(vr), rtol=3e-2)
        for a, bb in zip(gp, gr):
            a = np.asarray(a, np.float32)
            denom = max(1e-3, float(np.max(np.abs(np.asarray(bb)))))
            assert float(np.max(np.abs(a - np.asarray(bb)))) / denom < 6e-2

    def test_band_geometry_paper(self):
        from spair_pytorch_tpu.ops.pallas.composite_v3 import band_geometry
        band, starts = band_geometry((128, 128), 12, -0.5, 1.5, 0.375,
                                     28, 11)
        assert band == 88 and band % 8 == 0
        assert starts[0] == 0 and starts[-1] == 128 - band
        assert all(s % 8 == 0 for s in starts)
        # every row's worst-case support fits its window
        k = 1.0 + 2.0 / 27
        for h in range(11):
            lo = ((h - 0.5) * 12 / 128 - 0.375 * k / 2) * 127 - 1
            hi = ((h + 1.5) * 12 / 128 + 0.375 * k / 2) * 127 + 1
            assert starts[h] <= max(0, int(np.floor(lo)))
            assert starts[h] + band >= min(127, int(np.ceil(hi)))

    def test_render_backend_v3(self):
        from tests.test_model import tiny_config
        from spair_pytorch_tpu.models import init_params
        from spair_pytorch_tpu.models.render import render
        cfg_x = tiny_config(render_backend="xla")
        cfg_v = tiny_config(render_backend="pallas_v3", render_chunk_k=2)
        params = init_params(jax.random.PRNGKey(0), cfg_x)
        b, gh, gw = 2, 4, 4
        rng = np.random.RandomState(5)
        z_attr = jnp.asarray(rng.randn(b, gh, gw, cfg_x.n_attributes)
                             .astype("f") * 0.3)
        hh, ww = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
        yt = (hh[None] + rng.uniform(-0.4, 1.4, (b, gh, gw))) * 12 / 48
        xt = (ww[None] + rng.uniform(-0.4, 1.4, (b, gh, gw))) * 12 / 48
        sc = rng.uniform(0.1, 0.4, (b, gh, gw, 2))
        z_where = jnp.asarray(np.stack([xt, yt, sc[..., 0], sc[..., 1]],
                                       -1).astype("f"))
        z_depth = jnp.full((b, gh, gw, 1), 2.0)
        z_pres = jnp.full((b, gh, gw, 1), 0.7)
        out_x = render(params, cfg_x, z_attr, z_where, z_depth, z_pres,
                       (48, 48))
        out_v = render(params, cfg_v, z_attr, z_where, z_depth, z_pres,
                       (48, 48))
        np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_x),
                                   rtol=1e-4, atol=1e-5)


class TestPresenceGate:
    """pres_gate semantics: skipping an object in the kernel == compositing
    its gate-masked glimpses (models/render.py gating contract)."""

    @pytest.mark.parametrize("seed", [0, 3])
    def test_fwd_matches_masked_xla(self, seed):
        color, alpha, imp, boxes = make_inputs_c(seed, c=2)
        hw = (48, 48)
        rng = np.random.RandomState(seed + 100)
        gate = jnp.asarray((rng.rand(2, 9) > 0.5).astype("f"))
        num_p, den_p = composite_pallas(color, alpha, imp, boxes, hw, 40,
                                        pres_gate=gate)
        gm = gate[:, :, None, None, None]
        num_x, den_x = composite_xla(color * gm, alpha * gm, imp * gm,
                                     boxes, hw, chunk=4)
        np.testing.assert_allclose(np.asarray(num_p), np.asarray(num_x),
                                   rtol=5e-5, atol=5e-6)
        np.testing.assert_allclose(np.asarray(den_p), np.asarray(den_x),
                                   rtol=5e-5, atol=5e-6)

    def test_grads_match_masked_xla_and_zero_for_gated(self):
        color, alpha, imp, boxes = make_inputs_c(1, b=1, n=4, c=1)
        hw = (48, 48)
        gate = jnp.asarray(np.array([[1.0, 0.0, 1.0, 0.0]], dtype="f"))

        def loss_p(c, a, i, bx):
            num, den = composite_pallas(c, a, i, bx, hw, 40, pres_gate=gate)
            return jnp.sum((num / den) ** 2)

        def loss_x(c, a, i, bx):
            gm = gate[:, :, None, None, None]
            num, den = composite_xla(c * gm, a * gm, i * gm, bx, hw, chunk=4)
            return jnp.sum((num / den) ** 2)

        g_p = jax.grad(loss_p, argnums=(0, 1, 2, 3))(color, alpha, imp,
                                                     boxes)
        g_x = jax.grad(loss_x, argnums=(0, 1, 2, 3))(color, alpha, imp,
                                                     boxes)
        for a, b in zip(g_p, g_x):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=5e-4)
        # gated-out objects: exactly zero glimpse AND box gradients
        for t in g_p[:3]:
            assert float(np.abs(np.asarray(t)[:, 1]).max()) == 0.0
            assert float(np.abs(np.asarray(t)[:, 3]).max()) == 0.0
        assert float(np.abs(np.asarray(g_p[3])[:, 1]).max()) == 0.0
        assert float(np.abs(np.asarray(g_p[3])[:, 3]).max()) == 0.0

    def test_gate_none_is_bitwise_ungated(self):
        color, alpha, imp, boxes = make_inputs_c(2, c=1)
        hw = (48, 48)
        a1 = composite_pallas(color, alpha, imp, boxes, hw, 40)
        a2 = composite_pallas(color, alpha, imp, boxes, hw, 40,
                              pres_gate=None)
        for x, y in zip(a1, a2):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_render_level_backend_parity(self):
        # cfg.pres_gate_threshold routes the SAME gate through the kernel
        # skip (pallas) and the glimpse mask (xla): identical recon + grads.
        from tests.test_model import tiny_config
        from spair_pytorch_tpu.models import forward, init_params
        cfg_p = tiny_config(inference_mode="independent",
                            render_backend="pallas",
                            pres_gate_threshold=0.3)
        cfg_x = tiny_config(inference_mode="independent",
                            render_backend="xla",
                            pres_gate_threshold=0.3)
        params = init_params(jax.random.PRNGKey(0), cfg_p)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))

        def loss_fn(cfg):
            def f(p):
                loss, aux = forward(p, cfg, x, 0, jax.random.PRNGKey(2))
                return loss, aux["recon"]
            return f

        (lp, rp), gp = jax.value_and_grad(loss_fn(cfg_p), has_aux=True)(
            params)
        (lx, rx), gx = jax.value_and_grad(loss_fn(cfg_x), has_aux=True)(
            params)
        np.testing.assert_allclose(np.asarray(rp), np.asarray(rx),
                                   rtol=1e-5, atol=1e-5)
        assert np.isclose(float(lp), float(lx), rtol=1e-5)
        flat_p = jax.tree_util.tree_leaves(gp)
        flat_x = jax.tree_util.tree_leaves(gx)
        for a, b in zip(flat_p, flat_x):
            denom = max(1e-3, float(np.max(np.abs(np.asarray(b)))))
            assert float(np.max(np.abs(np.asarray(a) - np.asarray(b)))
                         ) / denom < 1e-3

    def test_all_gated_is_finite_zero(self):
        # every object skipped: num = 0, den = n*1e-9 floor -> recon 0,
        # no NaN/Inf anywhere (the 0/0 hazard class kl.py documents)
        color, alpha, imp, boxes = make_inputs_c(5, c=1)
        hw = (48, 48)
        gate = jnp.zeros((2, 9))
        num, den = composite_pallas(color, alpha, imp, boxes, hw, 40,
                                    pres_gate=gate)
        out = np.asarray(num / den)
        assert np.isfinite(out).all() and np.abs(out).max() == 0.0
        np.testing.assert_allclose(np.asarray(den), 9e-9, rtol=1e-3)

    def test_gate_with_bf16_operands(self):
        # gating composes with the bf16 MXU operand path (the two Mosaic
        # paths that historically broke only on hardware — also covered
        # on-device by bench --check's gated leg)
        color, alpha, imp, boxes = make_inputs_c(6, c=2)
        hw = (48, 48)
        gate = jnp.asarray((np.random.RandomState(6).rand(2, 9) > 0.5)
                           .astype("f"))
        bf = [t.astype(jnp.bfloat16) for t in (color, alpha, imp)]
        num_p, den_p = composite_pallas(*bf, boxes, hw, 40, pres_gate=gate)
        gm = gate[:, :, None, None, None]
        num_x, den_x = composite_xla(color * gm, alpha * gm, imp * gm,
                                     boxes, hw, chunk=4)
        assert np.isfinite(np.asarray(num_p)).all()
        denom = max(1e-3, float(np.max(np.abs(np.asarray(num_x)))))
        assert float(np.max(np.abs(np.asarray(num_p) - np.asarray(num_x)))
                     ) / denom < 3e-2
