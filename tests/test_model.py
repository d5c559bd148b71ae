"""Model-level tests: shapes, inference-order equivalence, KL, e2e training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spair_pytorch_tpu.config import SpairConfig, small_config
from spair_pytorch_tpu.models import (
    forward,
    init_params,
    geometry,
    inference_schedule,
    count_prior_kl,
)
from spair_pytorch_tpu.parallel import create_train_state, make_train_step


def tiny_config(**kw):
    """Small enough to run scans fast on CPU."""
    base = dict(image_shape=(1, 48, 48), batch_size=4,
                object_shape=(14, 14), anchor_shape=(24, 24),
                n_attributes=8, mlp_hidden=(32, 32), encoder_hidden=(32,),
                decoder_hidden=(32,), n_backbone_features=16,
                n_passthrough_features=16, render_chunk=8)
    base.update(kw)
    return SpairConfig(**base)


class TestSchedules:
    def test_wavefront_is_topological(self):
        """Every cell's 4 lateral neighbors must be scheduled strictly
        earlier (the reference dependency set, models.py:294-307)."""
        sched = inference_schedule("wavefront", 11, 11)
        order = {}
        for s in range(sched["steps"]):
            for k in range(sched["lanes"]):
                if sched["mask"][s, k]:
                    h, w = sched["cell_hw"][s, k]
                    order[(h, w)] = s
        for (h, w), s in order.items():
            for dh, dw in [(-1, -1), (-1, 0), (-1, 1), (0, -1)]:
                nb = (h + dh, w + dw)
                if nb in order:
                    assert order[nb] < s, f"{nb} not before {(h, w)}"

    def test_raster_covers_all_cells(self):
        sched = inference_schedule("raster", 4, 4)
        assert sched["steps"] == 16 and sched["lanes"] == 1
        assert sorted(sched["perm"].tolist()) == list(range(16))

    def test_wavefront_step_count(self):
        sched = inference_schedule("wavefront", 11, 11)
        assert sched["steps"] == 2 * 10 + 10 + 1  # d in 0..30
        assert sched["lanes"] == 6


class TestForward:
    @pytest.mark.parametrize("mode", ["independent", "raster", "wavefront"])
    def test_shapes_and_finiteness(self, mode):
        cfg = tiny_config(inference_mode=mode)
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
        loss, aux = forward(params, cfg, x, 0, jax.random.PRNGKey(2))
        _, (gh, gw), _ = geometry(cfg)
        assert aux["recon"].shape == (2, 1, 48, 48)
        assert aux["z_where"].shape == (2, 4, gh, gw)
        assert aux["z_pres"].shape == (2, 1, gh, gw)
        assert np.isfinite(float(loss))
        assert float(jnp.min(aux["recon"])) >= 0.0
        assert float(jnp.max(aux["recon"])) <= 1.0

    def test_raster_equals_wavefront(self):
        """Same params, same noise: identical latents and loss — the
        wavefront is just a different topological order of the same DAG."""
        cfg_r = tiny_config(inference_mode="raster")
        cfg_w = tiny_config(inference_mode="wavefront")
        params = init_params(jax.random.PRNGKey(0), cfg_r)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
        rng = jax.random.PRNGKey(2)
        loss_r, aux_r = forward(params, cfg_r, x, 500, rng)
        loss_w, aux_w = forward(params, cfg_w, x, 500, rng)
        np.testing.assert_allclose(np.asarray(aux_r["z_where"]),
                                   np.asarray(aux_w["z_where"]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(aux_r["z_pres"]),
                                   np.asarray(aux_w["z_pres"]),
                                   rtol=1e-5, atol=1e-6)
        assert np.isclose(float(loss_r), float(loss_w), rtol=1e-4)

    def test_lateral_context_flows(self):
        """In sequential modes, a cell's latents must depend on its
        neighbors' latents: perturbing the edge element changes outputs."""
        cfg = tiny_config(inference_mode="raster")
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 48, 48))
        _, aux1 = forward(params, cfg, x, 0, jax.random.PRNGKey(2))
        params2 = dict(params)
        params2["edge"] = params["edge"] + 1.0
        _, aux2 = forward(params2, cfg, x, 0, jax.random.PRNGKey(2))
        assert not np.allclose(np.asarray(aux1["z_pres"]),
                               np.asarray(aux2["z_pres"]))

    def test_training_wheel_blocks_gradients(self):
        """Before step 1000, box/depth/pres heads receive zero gradient
        (reference models.py:413-429, config.py:58-62)."""
        cfg = tiny_config(inference_mode="independent")
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))

        def loss_at(step):
            def f(p):
                return forward(p, cfg, x, step, jax.random.PRNGKey(2))[0]
            return jax.grad(f)(params)

        g_early = loss_at(0)
        g_late = loss_at(2000)
        box_early = np.abs(np.asarray(g_early["box_net"]["heads"][0]["w"]))
        box_late = np.abs(np.asarray(g_late["box_net"]["heads"][0]["w"]))
        assert box_early.max() == 0.0
        assert box_late.max() > 0.0
        obj_early = np.abs(np.asarray(g_early["obj_net"]["heads"][0]["w"]))
        assert obj_early.max() == 0.0
        # encoder (z_what path) is never frozen
        enc = np.abs(np.asarray(g_early["object_encoder"]["heads"][0]["w"]))
        assert enc.max() > 0.0


class TestCountPriorKL:
    def test_saturated_presence_stays_finite(self):
        """Regression: with every cell confidently present on a full 11x11
        grid, the count distribution concentrates at high counts and float
        rounding can push p_z just above 1 — safe_log(1 - p_z) then NaNs.
        Observed live at step ~1700 of a TPU run."""
        b, gh, gw = 2, 11, 11
        prob = jnp.full((b, gh, gw, 1), 0.999)
        cfg = tiny_config()
        for step in [0, 1700, 5000, 50000]:
            kl = count_prior_kl(prob, prob, step, cfg)
            assert bool(jnp.isfinite(kl).all()), f"NaN at step {step}"

    def test_against_naive_numpy(self):
        """Cross-check the scan against a direct numpy transcription of the
        reference loop (models.py:179-257) on a tiny 2x2 grid."""
        rng = np.random.RandomState(0)
        b, gh, gw = 3, 2, 2
        hw = gh * gw
        prob = rng.uniform(0.05, 0.95, (b, gh, gw, 1)).astype("f")
        pres = prob.copy()
        step = 3000
        cfg = tiny_config()

        ours = np.asarray(count_prior_kl(jnp.array(prob), jnp.array(pres),
                                         step, cfg))

        # naive reference math
        sched = cfg.count_prior
        t = step / sched.decay_step
        log_odds = np.log((sched.start - sched.end) * sched.decay_rate ** t
                          + sched.end + 1e-6)
        p = 1 / (np.exp(-log_odds) + 1)
        support = np.arange(hw + 1, dtype="f")
        cd = (1 - p) * p ** support
        cd = cd / cd.sum()
        cd = np.tile(cd, (b, 1))
        count_so_far = np.zeros((b, 1), "f")
        expect = np.zeros((b, gh, gw, 1), "f")
        i = 0
        for h in range(gh):
            for w in range(gw):
                p_z_given = np.clip(support - count_so_far, 0, hw - i) / (hw - i)
                p_z = (cd * p_z_given).sum(-1, keepdims=True)
                q = prob[:, h, w]
                kl = (q * (np.log(q + 1e-9) - np.log(p_z + 1e-9))
                      + (1 - q) * (np.log(1 - q + 1e-9)
                                   - np.log(1 - p_z + 1e-9)))
                expect[:, h, w] = kl
                sample = np.round(pres[:, h, w])
                mult = sample * p_z_given + (1 - sample) * (1 - p_z_given)
                cd = mult * cd
                cd = cd / np.clip(cd.sum(-1, keepdims=True), 1e-6, None)
                count_so_far += sample
                i += 1
        np.testing.assert_allclose(ours, expect, rtol=1e-4, atol=1e-6)


class TestTraining:
    def test_loss_decreases_e2e(self):
        """BASELINE config-1 style sanity: a few Adam steps on a fixed batch
        must reduce the loss (SURVEY.md section 4 rebuild-test (f))."""
        cfg = tiny_config(inference_mode="independent", learning_rate=1e-3)
        state = create_train_state(cfg)
        step = make_train_step(cfg, donate=False)
        x = (jax.random.uniform(jax.random.PRNGKey(5), (4, 1, 48, 48))
             > 0.8).astype(jnp.float32)
        first = None
        for _ in range(8):
            state, metrics = step(state, x)
            if first is None:
                first = float(metrics["losses/total"])
        last = float(metrics["losses/total"])
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first

    def test_train_step_wavefront_runs(self):
        cfg = tiny_config(inference_mode="wavefront")
        state = create_train_state(cfg)
        step = make_train_step(cfg, donate=False)
        x = jax.random.uniform(jax.random.PRNGKey(5), (2, 1, 48, 48))
        state, metrics = step(state, x)
        assert np.isfinite(float(metrics["losses/total"]))


class TestNonSquare:
    def test_non_square_image_forward(self):
        """Geometry, STN, and renderer must handle H != W (per-axis padding
        math, reference modules.py:68-105 keeps axes separate)."""
        cfg = tiny_config(image_shape=(1, 48, 72))
        from spair_pytorch_tpu.models import geometry as geom_fn
        _, (gh, gw), cell = geom_fn(cfg)
        assert (gh, gw) == (4, 6) and cell == (12, 12)
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 72))
        loss, aux = forward(params, cfg, x, 0, jax.random.PRNGKey(2))
        assert aux["recon"].shape == (2, 1, 48, 72)
        assert aux["z_where"].shape == (2, 4, 4, 6)
        assert np.isfinite(float(loss))

    def test_non_square_wavefront(self):
        cfg = tiny_config(image_shape=(1, 48, 72), inference_mode="wavefront")
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, 48, 72))
        loss, _ = forward(params, cfg, x, 0, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))


class TestLookback2:
    def test_neighbor_offsets_match_reference_construction(self):
        """Offsets must equal the reference's meshgrid construction
        (models.py:294-307) for any N_LOOKBACK."""
        from spair_pytorch_tpu.models import spair as spair_mod
        for n in [1, 2, 3]:
            rows = np.arange(-n, 1)
            cols = np.arange(-n, n + 1)
            mesh = np.array(np.meshgrid(rows, cols)).T
            ref = [tuple(c) for c in
                   np.reshape(mesh, (-1, 2))[:-(n + 1), :].tolist()]
            assert list(spair_mod.neighbor_offsets(n)) == ref

    def test_lookback2_raster_equals_wavefront(self):
        cfg = tiny_config(n_lookback=2, inference_mode="raster")
        cfg_w = tiny_config(n_lookback=2, inference_mode="wavefront")
        assert cfg.context_dim == 12 * (4 + 8 + 1 + 1)
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
        loss_r, aux_r = forward(params, cfg, x, 1500, jax.random.PRNGKey(2))
        loss_w, aux_w = forward(params, cfg_w, x, 1500, jax.random.PRNGKey(2))
        np.testing.assert_allclose(np.asarray(aux_r["z_pres"]),
                                   np.asarray(aux_w["z_pres"]),
                                   rtol=1e-5, atol=1e-6)
        assert np.isclose(float(loss_r), float(loss_w), rtol=1e-4)

    def test_lookback2_wavefront_topological(self):
        sched = inference_schedule("wavefront", 6, 6, n_lookback=2)
        order = {}
        for s in range(sched["steps"]):
            for k in range(sched["lanes"]):
                if sched["mask"][s, k]:
                    order[tuple(sched["cell_hw"][s, k])] = s
        from spair_pytorch_tpu.models.spair import neighbor_offsets
        for (h, w), s in order.items():
            for dh, dw in neighbor_offsets(2):
                nb = (h + dh, w + dw)
                if nb in order:
                    assert order[nb] < s


class TestParallelCountKL:
    def test_matches_sequential_scan(self):
        from spair_pytorch_tpu.models.kl import count_prior_kl_parallel
        rng = np.random.RandomState(0)
        cfg = tiny_config()
        # dense random presence at early/mid anneal
        for b, gh, gw, step in [(3, 4, 4, 0), (2, 11, 11, 1700)]:
            prob = jnp.asarray(rng.uniform(0.01, 0.99,
                                           (b, gh, gw, 1)).astype("f"))
            seq = np.asarray(count_prior_kl(prob, prob, step, cfg))
            par = np.asarray(count_prior_kl_parallel(prob, prob, step, cfg))
            np.testing.assert_allclose(par, seq, rtol=1e-3, atol=1e-5)
        # late anneal with REALISTIC sparse presence (a trained model):
        # the sequential clamp never binds, so the two agree. With dense
        # random presence against the end-of-anneal prior the reference's
        # 1e-6 normalizer clamp binds and the versions legitimately diverge
        # (see count_prior_kl_parallel docstring).
        prob = np.full((2, 11, 11, 1), 0.01, "f")
        idx = rng.choice(121, 5, replace=False)
        prob[:, idx // 11, idx % 11, 0] = 0.97
        prob = jnp.asarray(prob)
        seq = np.asarray(count_prior_kl(prob, prob, 50000, cfg))
        par = np.asarray(count_prior_kl_parallel(prob, prob, 50000, cfg))
        np.testing.assert_allclose(par, seq, rtol=1e-3, atol=1e-5)

    def test_saturated_and_gradients(self):
        from spair_pytorch_tpu.models.kl import count_prior_kl_parallel
        cfg = tiny_config()
        prob = jnp.full((2, 11, 11, 1), 0.999)
        kl = count_prior_kl_parallel(prob, prob, 1700, cfg)
        assert bool(jnp.isfinite(kl).all())

        def f(p):
            return jnp.sum(count_prior_kl_parallel(p, p, 2000, cfg))
        g = jax.grad(f)(jnp.full((1, 4, 4, 1), 0.4))
        assert bool(jnp.isfinite(g).all())

    def test_gradients_with_mixed_saturated_probs_under_jit(self):
        """Regression: mult == 0 entries emit log(0) = -inf; without the
        stop_gradient on p_z the VJP computes 0 * inf = NaN (killed the
        tpu_throughput preset at step ~25 on TPU). Mixed 0/1-rounding probs
        on a full grid exercise every mult-zero pattern."""
        from spair_pytorch_tpu.models.kl import count_prior_kl_parallel
        cfg = tiny_config()
        rng = np.random.RandomState(3)
        prob = jnp.asarray(
            rng.choice([0.02, 0.98], (2, 11, 11, 1)).astype("f"))

        @jax.jit
        def f(p):
            return jnp.sum(count_prior_kl_parallel(p, p, 10, cfg))
        g = jax.grad(f)(prob)
        assert bool(jnp.isfinite(g).all()), "NaN grads in parallel count KL"
        # and the gradient matches the sequential scan's (both dead through
        # p_z, live through prob)
        @jax.jit
        def f_seq(p):
            return jnp.sum(count_prior_kl(p, p, 10, cfg))
        g_seq = jax.grad(f_seq)(prob)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_seq),
                                   rtol=1e-3, atol=1e-5)

    def test_forward_with_parallel_count_kl(self):
        cfg = tiny_config(inference_mode="independent",
                          count_prior_parallel=True)
        cfg_seq = tiny_config(inference_mode="independent")
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
        loss_p, _ = forward(params, cfg, x, 0, jax.random.PRNGKey(2))
        loss_s, _ = forward(params, cfg_seq, x, 0, jax.random.PRNGKey(2))
        assert np.isclose(float(loss_p), float(loss_s), rtol=1e-4)


class TestBf16:
    def test_bf16_forward_and_grads(self):
        """compute_dtype='bfloat16': matmuls in bf16, latent math in f32,
        finite loss and gradients."""
        cfg = tiny_config(inference_mode="wavefront",
                          compute_dtype="bfloat16")
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
        loss, aux = forward(params, cfg, x, 0, jax.random.PRNGKey(2))
        assert aux["recon"].dtype == jnp.float32
        assert np.isfinite(float(loss))
        # close to the f32 result (bf16 has ~3 decimal digits)
        cfg32 = tiny_config(inference_mode="wavefront")
        loss32, _ = forward(params, cfg32, x, 0, jax.random.PRNGKey(2))
        assert np.isclose(float(loss), float(loss32), rtol=0.05)
        g = jax.grad(lambda p: forward(p, cfg, x, 0,
                                       jax.random.PRNGKey(2))[0])(params)
        assert all(np.isfinite(float(jnp.abs(l).max()))
                   for l in jax.tree_util.tree_leaves(g))


class TestSelfAttn:
    """The reference's vestigial SAGAN block (models.py:120,667-699):
    computed every forward, output discarded, zero gradient."""

    def test_self_attn_loss_and_grads_unchanged(self):
        cfg_off = tiny_config(inference_mode="independent")
        cfg_on = tiny_config(inference_mode="independent",
                             vestigial_self_attn=True)
        params = init_params(jax.random.PRNGKey(0), cfg_on)
        assert "self_attn" in params
        params_off = {k: v for k, v in params.items() if k != "self_attn"}
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
        rng = jax.random.PRNGKey(2)

        loss_on, aux_on = forward(params, cfg_on, x, 0, rng)
        loss_off, _ = forward(params_off, cfg_off, x, 0, rng)
        assert float(loss_on) == float(loss_off)
        # the block really computed something
        assert np.isfinite(float(aux_on["losses"]["debug/self_attn_mean"]))

        g_on = jax.grad(lambda p: forward(p, cfg_on, x, 0, rng)[0])(params)
        g_off = jax.grad(lambda p: forward(p, cfg_off, x, 0, rng)[0])(
            params_off)
        # zero gradient to the attn params (discarded output)
        for leaf in jax.tree_util.tree_leaves(g_on["self_attn"]):
            assert float(jnp.abs(leaf).max()) == 0.0
        # identical gradients everywhere else
        for k in g_off:
            for a, b_ in zip(jax.tree_util.tree_leaves(g_on[k]),
                             jax.tree_util.tree_leaves(g_off[k])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def test_self_attn_matches_torch_block(self):
        """apply_self_attn vs a torch transcription of the reference's
        Self_Attn forward (1x1-conv QKV, softmax over keys, bmm; no gamma,
        no residual — models.py:683-699)."""
        import torch
        from spair_pytorch_tpu.models.latents import apply_self_attn
        from spair_pytorch_tpu.ops.mlp import init_mlp

        d, n, b = 16, 9, 2
        params = {
            "query": init_mlp(jax.random.PRNGKey(0), d, (), (d // 8,)),
            "key": init_mlp(jax.random.PRNGKey(1), d, (), (d // 8,)),
            "value": init_mlp(jax.random.PRNGKey(2), d, (), (d,)),
            "gamma": jnp.zeros((1,)),
        }
        ctx = jax.random.normal(jax.random.PRNGKey(3), (b, n, d))
        ours = np.asarray(apply_self_attn(params, ctx))

        def lin(p, x):  # torch equivalent of our per-cell linear
            w = torch.tensor(np.asarray(p["heads"][0]["w"]))
            bb = torch.tensor(np.asarray(p["heads"][0]["b"]))
            return x @ w + bb

        xt = torch.tensor(np.asarray(ctx))
        q, k, v = lin(params["query"], xt), lin(params["key"], xt), \
            lin(params["value"], xt)
        energy = torch.bmm(q, k.transpose(1, 2))
        attn = torch.softmax(energy, dim=-1)
        theirs = torch.bmm(attn, v).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


class TestRematPolicy:
    def test_gradients_identical_across_policies(self):
        """scan_remat_policy changes only what is stored vs recomputed in
        the scan backward — gradients must agree to recompute-reordering
        fp noise. Guards the knob (config.py) against changing math."""
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
        rng = jax.random.PRNGKey(2)
        grads = []
        for policy in ("full", "dots", "names"):
            cfg = tiny_config(inference_mode="wavefront",
                              scan_remat_policy=policy)
            params = init_params(jax.random.PRNGKey(0), cfg)
            g = jax.grad(
                lambda p: forward(p, cfg, x, 1500, rng)[0])(params)
            grads.append(g)
        for other in grads[1:]:
            for a, b in zip(jax.tree_util.tree_leaves(grads[0]),
                            jax.tree_util.tree_leaves(other)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=5e-4, atol=1e-4)


class TestPresEntropy:
    """Opt-in borderline-presence penalty (cfg.pres_entropy_weight)."""

    def test_off_by_default_and_wheel_gated(self):
        cfg0 = tiny_config(inference_mode="independent")
        cfg1 = tiny_config(inference_mode="independent",
                           pres_entropy_weight=0.5)
        params = init_params(jax.random.PRNGKey(0), cfg0)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
        # while the training wheel is on (step < 1000) the penalty is
        # value-neutral even when enabled
        l0, _ = forward(params, cfg0, x, 0, jax.random.PRNGKey(2))
        l1, aux1 = forward(params, cfg1, x, 0, jax.random.PRNGKey(2))
        assert np.isclose(float(l0), float(l1), rtol=1e-6)
        assert "losses/pres_entropy" in aux1["losses"]

    def test_adds_weighted_entropy_after_wheel(self):
        cfg0 = tiny_config(inference_mode="independent")
        cfg1 = tiny_config(inference_mode="independent",
                           pres_entropy_weight=0.5)
        params = init_params(jax.random.PRNGKey(0), cfg0)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
        l0, _ = forward(params, cfg0, x, 2000, jax.random.PRNGKey(2))
        l1, aux1 = forward(params, cfg1, x, 2000, jax.random.PRNGKey(2))
        ent = float(aux1["losses"]["losses/pres_entropy"])
        assert ent > 0.0
        np.testing.assert_allclose(float(l1), float(l0) + 0.5 * ent,
                                   rtol=1e-5)
        assert np.isclose(float(aux1["losses"]["losses/total"]), float(l1),
                          rtol=1e-6)

    def test_gradients_finite_under_jit(self):
        # saturated probabilities hit the log(0) hazard class the repo
        # documents (safe_log must keep entropy gradients finite)
        cfg = tiny_config(inference_mode="independent",
                          pres_entropy_weight=1.0)
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((2, 1, 48, 48))  # black images -> extreme logits

        @jax.jit
        def g(p):
            return jax.grad(
                lambda pp: forward(pp, cfg, x, 5000,
                                   jax.random.PRNGKey(2))[0])(p)

        grads = g(params)
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()


def test_fine_grid_topology_forward():
    """Non-reference backbone topologies (e.g. the cluttered_fine 8px-cell
    grid) derive a consistent geometry and train: forward loss and grads
    finite on a 6x6 grid (strides 2,2,2 on 48x48)."""
    import numpy as np

    from spair_pytorch_tpu.models import forward
    from spair_pytorch_tpu.models.latents import geometry
    from spair_pytorch_tpu.models.spair import init_params

    fine = ((16, 4, 2), (16, 4, 2), (16, 4, 2), (16, 1, 1))
    cfg = tiny_config(backbone_topology=fine, batch_size=2,
                      inference_mode="wavefront")
    pads, (gh, gw), (ch, cw) = geometry(cfg)
    assert (gh, gw) == (6, 6) and (ch, cw) == (8, 8)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (2,) + tuple(cfg.image_shape))
    loss, aux = forward(params, cfg, x, 2000, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert aux["z_pres"].shape == (2, 1, 6, 6)
    g = jax.grad(lambda p: forward(p, cfg, x, 2000,
                                   jax.random.PRNGKey(2))[0])(params)
    assert all(np.all(np.isfinite(l))
               for l in jax.tree_util.tree_leaves(g))


class TestRowscan:
    """'rowscan' relaxed-context mode: gh row-fronts of gw-wide lanes.
    NON-reference semantics (the same-row west neighbor reads the edge
    element); these tests pin exactly what is and is not preserved."""

    def test_shapes_grads_finite(self):
        cfg = tiny_config(inference_mode="rowscan")
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
        loss, aux = forward(params, cfg, x, 1500, jax.random.PRNGKey(2))
        _, (gh, gw), _ = geometry(cfg)
        assert aux["z_where"].shape == (2, 4, gh, gw)
        assert np.isfinite(float(loss))
        g = jax.grad(lambda p: forward(p, cfg, x, 1500,
                                       jax.random.PRNGKey(2))[0])(params)
        assert all(np.all(np.isfinite(l))
                   for l in jax.tree_util.tree_leaves(g))

    def test_step_count_is_rows(self):
        sched = inference_schedule("rowscan", 7, 5)
        assert sched["steps"] == 7 and sched["lanes"] == 5
        assert sched["mask"].all()

    def test_row0_matches_independent_rest_differs(self):
        """Row 0 sees only edge context in both modes (bit-comparable);
        later rows must DIFFER from independent (real north context flows)
        and from raster (west context relaxed)."""
        cfg_s = tiny_config(inference_mode="rowscan")
        cfg_i = tiny_config(inference_mode="independent")
        cfg_r = tiny_config(inference_mode="raster")
        params = init_params(jax.random.PRNGKey(0), cfg_s)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
        rng = jax.random.PRNGKey(2)
        _, aux_s = forward(params, cfg_s, x, 1500, rng)
        _, aux_i = forward(params, cfg_i, x, 1500, rng)
        _, aux_r = forward(params, cfg_r, x, 1500, rng)
        zs = np.asarray(aux_s["z_where"])  # (B, 4, gh, gw)
        zi = np.asarray(aux_i["z_where"])
        zr = np.asarray(aux_r["z_where"])
        np.testing.assert_allclose(zs[:, :, 0], zi[:, :, 0],
                                   rtol=1e-5, atol=1e-6)
        assert np.abs(zs[:, :, 1:] - zi[:, :, 1:]).max() > 1e-4
        assert np.abs(zs[:, :, 1:] - zr[:, :, 1:]).max() > 1e-4

    def test_train_step_runs(self):
        cfg = tiny_config(inference_mode="rowscan")
        state = create_train_state(cfg)
        step = make_train_step(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1),
                               (cfg.batch_size,) + cfg.image_shape)
        state, scalars = step(state, x)
        assert np.isfinite(float(jax.device_get(scalars["losses/total"])))
