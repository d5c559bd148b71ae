"""Unit tests for L0/L1: schedules, latent math, backbone geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spair_pytorch_tpu.config import TRAINING_WHEEL, COUNT_PRIOR, SpairConfig
from spair_pytorch_tpu.ops import (
    exponential_decay,
    latent_to_mean_std,
    clamped_sigmoid,
    safe_log,
    gaussian_kl,
    bernoulli_kl,
    binary_cross_entropy_sum,
    grid_geometry,
    init_backbone,
    apply_backbone,
    init_mlp,
    apply_mlp,
)


class TestSchedules:
    def test_training_wheel_cliff(self):
        # Hard cliff at step 1000 (reference config.py:58-62, SURVEY quirk #5).
        for step in [0, 1, 500, 999]:
            assert float(exponential_decay(step, TRAINING_WHEEL)) == 1.0
        for step in [1000, 1001, 5000]:
            assert float(exponential_decay(step, TRAINING_WHEEL)) == 0.0

    def test_count_prior_anneal(self):
        # log-space anneal from ~log(1e6) toward log(0.0125)
        # (reference config.py:65-69, modules.py:191-213).
        v0 = float(exponential_decay(0, COUNT_PRIOR))
        assert np.isclose(v0, np.log(1e6 + 1e-6), rtol=1e-5)
        v1000 = float(exponential_decay(1000, COUNT_PRIOR))
        expected = np.log((1e6 - 0.0125) * 0.1 + 0.0125 + 1e-6)
        assert np.isclose(v1000, expected, rtol=1e-4)
        v_inf = float(exponential_decay(100000, COUNT_PRIOR))
        assert np.isclose(v_inf, np.log(0.0125 + 1e-6), rtol=1e-4)

    def test_non_staircase_fraction(self):
        sched = COUNT_PRIOR
        v500 = float(exponential_decay(500, sched))
        expected = np.log((1e6 - 0.0125) * 0.1 ** 0.5 + 0.0125 + 1e-6)
        assert np.isclose(v500, expected, rtol=1e-4)


class TestLatentMath:
    def test_latent_to_mean_std(self):
        # std = 2*sigmoid(clamp(log_std, -10, 10)) in (0, 2)
        # (reference modules.py:167-176, SURVEY quirk #3).
        x = jnp.array([[1.0, -2.0, 0.0, 100.0]])
        mean, std = latent_to_mean_std(x)
        np.testing.assert_allclose(np.asarray(mean), [[1.0, -2.0]])
        expected = 2.0 / (1.0 + np.exp(-np.clip([0.0, 100.0], -10, 10)))
        np.testing.assert_allclose(np.asarray(std), [expected], rtol=1e-6)

    def test_clamped_sigmoid(self):
        x = jnp.array([-50.0, 0.0, 50.0])
        y = clamped_sigmoid(x)
        np.testing.assert_allclose(
            np.asarray(y), 1 / (1 + np.exp(-np.clip([-50, 0, 50], -10, 10))),
            rtol=1e-5)
        y2 = clamped_sigmoid(x, use_analytical=True)
        np.testing.assert_allclose(np.asarray(y2), 1 / (1 + np.exp([50.0, 0, -50])),
                                   rtol=1e-5)

    def test_safe_log(self):
        assert np.isclose(float(safe_log(jnp.array(0.0))), np.log(1e-9))

    def test_analytical_sigmoid_grad_stable(self):
        """Regression: naive grad of 1/(exp(-x)+1) is exp(-x)/(exp(-x)+1)^2
        = inf/inf = NaN for x < ~-88; poisoned all params at step ~5662."""
        g = jax.grad(lambda x: clamped_sigmoid(x, use_analytical=True))
        for v in [-200.0, -89.0, -10.0, 0.0, 10.0, 200.0]:
            gv = float(g(jnp.float32(v)))
            assert np.isfinite(gv), f"grad NaN at {v}"
        s = 1 / (1 + np.exp(2.0))
        assert np.isclose(float(g(jnp.float32(-2.0))), s * (1 - s), rtol=1e-5)

    def test_bernoulli_kl_saturated_prob_under_jit(self):
        """Regression: XLA reassociates (1 - prob) + 1e-9 into
        (1 + 1e-9) - prob == 0 at prob == 1.0, making the jitted KL
        0 * log(0) = NaN while eager is finite. Killed training at step
        ~1703 on TPU (and reproduces on CPU)."""
        p = jnp.float32(1.0)
        q = jnp.float32(0.0274)
        eager = float(bernoulli_kl(p, q))
        jitted = float(jax.jit(bernoulli_kl)(p, q))
        assert np.isfinite(jitted)
        assert np.isclose(eager, jitted, rtol=1e-6)
        # and at prob == 0 / p_z == 1 too
        assert np.isfinite(float(jax.jit(bernoulli_kl)(
            jnp.float32(0.0), jnp.float32(1.0))))

    def test_gaussian_kl_matches_torch(self):
        torch = pytest.importorskip("torch")
        from torch.distributions import Normal, kl_divergence
        rng = np.random.RandomState(0)
        mq, sq = rng.randn(5, 3).astype("f"), rng.rand(5, 3).astype("f") + 0.1
        ours = np.asarray(gaussian_kl(jnp.array(mq), jnp.array(sq), 7.0, 0.5))
        theirs = kl_divergence(Normal(torch.tensor(mq), torch.tensor(sq)),
                               Normal(7.0, 0.5)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_bce_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(1)
        r = rng.rand(4, 1, 8, 8).astype("f")
        x = (rng.rand(4, 1, 8, 8) > 0.5).astype("f")
        ours = float(binary_cross_entropy_sum(jnp.array(r), jnp.array(x)))
        theirs = float(torch.nn.functional.binary_cross_entropy(
            torch.tensor(r), torch.tensor(x), reduction="sum"))
        assert np.isclose(ours, theirs, rtol=1e-4)

    def test_bernoulli_kl_zero_when_equal(self):
        p = jnp.array([0.3, 0.9])
        np.testing.assert_allclose(np.asarray(bernoulli_kl(p, p)), 0.0, atol=1e-6)


class TestBackbone:
    def test_grid_geometry_matches_reference_128(self):
        # Verified numbers from SURVEY.md section 2: pads (9,14,9,14),
        # 11x11 grid, 12px cells (reference modules.py:68-105).
        cfg = SpairConfig()
        pads, grid, cell = grid_geometry((128, 128), cfg.backbone_topology)
        assert pads == (9, 14, 9, 14)
        assert grid == (11, 11)
        assert cell == (12, 12)

    def test_grid_geometry_48(self):
        cfg = SpairConfig()
        pads, grid, cell = grid_geometry((48, 48), cfg.backbone_topology)
        assert grid == (4, 4) and cell == (12, 12)
        assert pads == (9, 10, 9, 10)

    def test_backbone_output_shape(self):
        cfg = SpairConfig(image_shape=(1, 48, 48))
        pads, grid, _ = grid_geometry((48, 48), cfg.backbone_topology)
        params = init_backbone(jax.random.PRNGKey(0), 1,
                               cfg.n_backbone_features, cfg.backbone_topology)
        x = jnp.zeros((2, 1, 48, 48))
        out = apply_backbone(params, x, cfg.backbone_topology, pads)
        assert out.shape == (2, grid[0], grid[1], cfg.n_backbone_features)

    def test_backbone_matches_torch_conv(self):
        """Bit-level parity of the conv stack vs torch on shared weights."""
        torch = pytest.importorskip("torch")
        cfg = SpairConfig(image_shape=(1, 48, 48))
        pads, _, _ = grid_geometry((48, 48), cfg.backbone_topology)
        params = init_backbone(jax.random.PRNGKey(1), 1, 7,
                               cfg.backbone_topology)
        x = np.random.RandomState(2).randn(2, 1, 48, 48).astype("f")
        ours = np.asarray(apply_backbone(params, jnp.array(x),
                                         cfg.backbone_topology, pads))

        t = torch.tensor(x)
        t = torch.nn.functional.pad(t, (pads[2], pads[3], pads[0], pads[1]))
        strides = [s for (_, _, s) in cfg.backbone_topology] + [1]
        n = len(params["layers"])
        for i, layer in enumerate(params["layers"]):
            w = torch.tensor(np.asarray(layer["w"]).transpose(3, 2, 0, 1))
            b = torch.tensor(np.asarray(layer["b"]))
            t = torch.nn.functional.conv2d(t, w, b, stride=strides[i])
            if i < n - 1:
                t = torch.relu(t)
        theirs = t.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, theirs, atol=2e-4)


class TestMLP:
    def test_multi_head_shapes(self):
        params = init_mlp(jax.random.PRNGKey(0), 324, (100, 100), (8, 100))
        outs = apply_mlp(params, jnp.zeros((5, 324)))
        assert outs[0].shape == (5, 8) and outs[1].shape == (5, 100)

    def test_matches_torch_linear(self):
        torch = pytest.importorskip("torch")
        params = init_mlp(jax.random.PRNGKey(3), 10, (16,), (4,))
        x = np.random.RandomState(4).randn(3, 10).astype("f")
        ours = np.asarray(apply_mlp(params, jnp.array(x))[0])
        t = torch.tensor(x)
        for layer in params["trunk"]:
            t = torch.relu(t @ torch.tensor(np.asarray(layer["w"]))
                           + torch.tensor(np.asarray(layer["b"])))
        head = params["heads"][0]
        t = t @ torch.tensor(np.asarray(head["w"])) + torch.tensor(
            np.asarray(head["b"]))
        np.testing.assert_allclose(ours, t.numpy(), atol=1e-5)

    def test_packed_heads_equal(self):
        """The packed multi-head GEMM (one matmul over concatenated head
        columns) computes the same contraction per output column as the
        per-head matmuls; only backend GEMM blocking (shape-dependent
        summation order) may differ, so fwd values must agree to f32
        reassociation noise and grads likewise. Guards the round-4
        scan-op-count optimization against numeric drift."""
        params = init_mlp(jax.random.PRNGKey(7), 24, (32, 32), (8, 16, 1))
        x = jax.random.normal(jax.random.PRNGKey(8), (6, 24))

        def loss(p, packed):
            outs = apply_mlp(p, x, packed=packed)
            return outs, sum(jnp.sum(o**2) for o in outs)

        outs_p, _ = loss(params, True)
        outs_u, _ = loss(params, False)
        for a, b in zip(outs_p, outs_u):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        gp = jax.grad(lambda p: loss(p, True)[1])(params)
        gu = jax.grad(lambda p: loss(p, False)[1])(params)
        for a, b in zip(jax.tree_util.tree_leaves(gp),
                        jax.tree_util.tree_leaves(gu)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
