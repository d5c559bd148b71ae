"""Multi-object-per-cell capacity (cfg.n_object_slots).

The reference is structurally one-object-per-cell (one latent tuple per
grid cell, reference models.py:68); n_object_slots = S generalizes every
per-cell head to S (box, attr, depth, pres) tuples exposed downstream as a
virtual (gh, gw*S) grid. S = 1 must reproduce the original model exactly
(same params, same forward values) — that invariance is what keeps every
reference-parity test meaningful.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from spair_pytorch_tpu.config import SpairConfig
from spair_pytorch_tpu.models import forward, geometry, init_params
from spair_pytorch_tpu.parallel import create_train_state, make_train_step


def tiny_config(**kw):
    base = dict(image_shape=(1, 48, 48), batch_size=4,
                object_shape=(14, 14), anchor_shape=(24, 24),
                n_attributes=8, mlp_hidden=(32, 32), encoder_hidden=(32,),
                decoder_hidden=(32,), n_backbone_features=16,
                n_passthrough_features=16, render_chunk=8)
    base.update(kw)
    return SpairConfig(**base)


def test_slots1_params_identical():
    """S=1 inits the exact same parameter pytree as the pre-slot model
    (checkpoint compatibility + every parity test stays load-bearing)."""
    cfg = tiny_config()
    assert cfg.n_object_slots == 1
    p = init_params(jax.random.PRNGKey(3), cfg)
    # box head is (8,)-wide, edge element 4+A+1+1 — the reference dims
    assert p["box_net"]["heads"][0]["w"].shape[-1] == 8
    assert p["edge"].shape == (4 + cfg.n_attributes + 1 + 1,)


def test_slots2_shapes_and_finiteness():
    """S=2: virtual grid doubles the object axis; loss and grads finite in
    every inference mode."""
    for mode in ("independent", "wavefront"):
        cfg = tiny_config(inference_mode=mode, n_object_slots=2)
        _, (gh, gw), _ = geometry(cfg)
        params = init_params(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1),
                               (cfg.batch_size,) + cfg.image_shape)
        loss, aux = forward(params, cfg, x, 1500, jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))
        assert aux["z_where"].shape == (cfg.batch_size, 4, gh, gw * 2)
        assert aux["z_pres"].shape == (cfg.batch_size, 1, gh, gw * 2)
        assert aux["recon"].shape == x.shape
        g = jax.grad(lambda p: forward(p, cfg, x, 1500,
                                       jax.random.PRNGKey(2))[0])(params)
        assert all(np.all(np.isfinite(l))
                   for l in jax.tree_util.tree_leaves(g))


def test_slots2_raster_equals_wavefront():
    """The slot extension preserves the inference-order equivalence: raster
    and wavefront compute the same function of (params, x, noise)."""
    cfg_r = tiny_config(inference_mode="raster", n_object_slots=2)
    cfg_w = dataclasses.replace(cfg_r, inference_mode="wavefront")
    params = init_params(jax.random.PRNGKey(0), cfg_r)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (cfg_r.batch_size,) + cfg_r.image_shape)
    rng = jax.random.PRNGKey(7)
    loss_r, aux_r = forward(params, cfg_r, x, 1500, rng)
    loss_w, aux_w = forward(params, cfg_w, x, 1500, rng)
    np.testing.assert_allclose(float(loss_r), float(loss_w), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_r["z_where"]),
                               np.asarray(aux_w["z_where"]),
                               rtol=1e-5, atol=1e-6)


def test_slots2_detector_and_count_support():
    """Serving detector returns S*N boxes; the count-prior support covers
    S*N slots (an all-present grid is representable)."""
    from spair_pytorch_tpu.models.infer import detect

    cfg = tiny_config(inference_mode="independent", n_object_slots=2)
    _, (gh, gw), _ = geometry(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (2,) + cfg.image_shape)
    det = detect(params, x, cfg)
    assert det["boxes"].shape == (2, gh * gw * 2, 4)
    assert det["scores"].shape == (2, gh * gw * 2)


def test_slots2_train_step_runs():
    """One optimizer step end-to-end (the lever's training path)."""
    cfg = tiny_config(inference_mode="wavefront", n_object_slots=2,
                      render_mode="ordered")
    state = create_train_state(cfg)
    step = make_train_step(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (cfg.batch_size,) + cfg.image_shape)
    state, scalars = step(state, x)
    assert np.isfinite(float(jax.device_get(scalars["losses/total"])))


def test_stick_coupling_monotone_and_bounded():
    """slot_coupling='stick': effective presence is non-increasing across
    a cell's slot axis (slot k fires only if slots <k fire) and stays a
    valid probability. Counter to the measured independent-S=2 collapse
    (RESULTS.md round 4)."""
    cfg = tiny_config(inference_mode="independent", n_object_slots=3,
                      slot_coupling="stick")
    _, (gh, gw), _ = geometry(cfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (cfg.batch_size,) + cfg.image_shape)
    _, aux = forward(params, cfg, x, 1500, jax.random.PRNGKey(2))
    pres = np.asarray(aux["z_pres"])          # (B, 1, gh, gw*S)
    pres = pres.reshape(cfg.batch_size, gh, gw, 3)  # slot-minor
    assert np.all(pres >= 0) and np.all(pres <= 1)
    assert np.all(pres[..., 1] <= pres[..., 0] + 1e-6)
    assert np.all(pres[..., 2] <= pres[..., 1] + 1e-6)


def test_stick_coupling_none_is_identity():
    """slot_coupling is a no-op at S=1 (any value) and 'none' reproduces
    the original S=2 forward bit-for-bit."""
    cfg1a = tiny_config()
    cfg1b = tiny_config(slot_coupling="stick")
    params = init_params(jax.random.PRNGKey(0), cfg1a)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (cfg1a.batch_size,) + cfg1a.image_shape)
    rng = jax.random.PRNGKey(2)
    loss_a, _ = forward(params, cfg1a, x, 1500, rng)
    loss_b, _ = forward(params, cfg1b, x, 1500, rng)
    assert float(loss_a) == float(loss_b)

    cfg2a = tiny_config(n_object_slots=2)
    cfg2b = tiny_config(n_object_slots=2, slot_coupling="none")
    params2 = init_params(jax.random.PRNGKey(0), cfg2a)
    loss_c, _ = forward(params2, cfg2a, x, 1500, rng)
    loss_d, _ = forward(params2, cfg2b, x, 1500, rng)
    assert float(loss_c) == float(loss_d)


def test_stick_coupling_grads_finite():
    """Training path: finite loss/grads through the cumprod coupling."""
    cfg = tiny_config(inference_mode="wavefront", n_object_slots=2,
                      slot_coupling="stick", render_mode="ordered")
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (cfg.batch_size,) + cfg.image_shape)
    loss, g = jax.value_and_grad(
        lambda p: forward(p, cfg, x, 1500, jax.random.PRNGKey(2))[0]
    )(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(l)) for l in jax.tree_util.tree_leaves(g))


def test_slot_coupling_typo_raises():
    """Unknown slot_coupling values fail at config construction (ADVICE r4:
    a typo'd value — e.g. 'sticky' from a hand-edited config.json — must
    not silently train with independent slots)."""
    import pytest
    with pytest.raises(ValueError, match="slot_coupling"):
        tiny_config(n_object_slots=2, slot_coupling="sticky")
