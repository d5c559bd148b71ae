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
