"""Split-refinement second pass (models/refine.py).

Structural/behavioral tests on random params (the quality evidence is
the hardware A/B in benchmarks/RESULTS.md "split refinement"): geometry
round-trips, shapes/finiteness, margin semantics (no-op at +inf,
count bookkeeping, monotonicity), and jit closure parity.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_model import tiny_config
from spair_pytorch_tpu.models import init_params
from spair_pytorch_tpu.models.infer import detect
from spair_pytorch_tpu.models.refine import (N_CANDIDATES, apply_splits,
                                             corner_to_zwhere, make_refiner,
                                             split_candidates, split_gains,
                                             zwhere_to_corner)


def _setup(mode="independent", b=2):
    cfg = tiny_config(inference_mode=mode)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (b,) + cfg.image_shape)
    det = detect(params, x, cfg)
    return cfg, params, x, det


def test_corner_zwhere_roundtrip():
    rng = np.random.RandomState(0)
    zw = np.stack([rng.uniform(0.2, 0.8, (5, 7)),
                   rng.uniform(0.2, 0.8, (5, 7)),
                   rng.uniform(0.05, 0.4, (5, 7)),
                   rng.uniform(0.05, 0.4, (5, 7))], axis=-1)
    hw = (48, 64)
    back = corner_to_zwhere(zwhere_to_corner(jnp.asarray(zw), hw), hw)
    np.testing.assert_allclose(np.asarray(back), zw, atol=1e-5)


def test_split_candidates_geometry():
    parent = jnp.asarray([[0.5, 0.5, 0.4, 0.2]])
    ch = np.asarray(split_candidates(parent))  # (1, C, 2, 4)
    assert ch.shape == (1, N_CANDIDATES, 2, 4)
    # children smaller than the parent along at least one axis, and
    # their centers land inside the parent box
    assert (ch[..., 2] <= 0.4 + 1e-6).all()
    assert (ch[..., 3] <= 0.2 + 1e-6).all()
    assert ((ch[..., 2] < 0.4 - 1e-6) | (ch[..., 3] < 0.2 - 1e-6)).all()
    assert (np.abs(ch[..., 0] - 0.5) <= 0.4 / 2 + 1e-6).all()
    assert (np.abs(ch[..., 1] - 0.5) <= 0.2 / 2 + 1e-6).all()
    # each candidate's two children are distinct (a split, not a copy)
    assert (np.abs(ch[:, :, 0, :2] - ch[:, :, 1, :2]).sum(-1) > 1e-3).all()


def test_split_gains_shapes_and_topm():
    cfg, params, x, det = _setup()
    g = split_gains(params, cfg, x, det["boxes"], det["scores"], top_m=5)
    b, n = det["scores"].shape
    assert g["rel_gain"].shape == (b, 5)
    assert g["best_child"].shape == (b, 5, 2, 4)
    for k in ("rel_gain", "err_parent", "err_child", "score", "ink"):
        assert np.isfinite(np.asarray(g[k])).all(), k
    assert (np.asarray(g["ink"]) >= 0).all()
    # idx points at the true top-5 scores, and gains picked the best
    # candidate: err_child <= err_parent would NOT always hold (split can
    # be worse), but rel_gain must be <= 1 and err_* >= 0
    np.testing.assert_allclose(
        np.asarray(g["score"]),
        np.sort(np.asarray(det["scores"]), axis=-1)[:, ::-1][:, :5],
        atol=1e-6)
    assert (np.asarray(g["rel_gain"]) <= 1.0 + 1e-6).all()
    assert (np.asarray(g["err_parent"]) >= 0).all()
    assert (np.asarray(g["err_child"]) >= 0).all()


def test_apply_splits_margin_inf_is_noop():
    cfg, params, x, det = _setup()
    g = split_gains(params, cfg, x, det["boxes"], det["scores"], top_m=4)
    out = apply_splits(det, g, margin=jnp.inf, pres_threshold=0.5)
    b, n = det["scores"].shape
    assert out["boxes"].shape == (b, n + 4, 4)
    assert int(np.asarray(out["n_split"]).sum()) == 0
    # original slots untouched, extension slots dead
    np.testing.assert_array_equal(np.asarray(out["boxes"][:, :n]),
                                  np.asarray(det["boxes"]))
    np.testing.assert_array_equal(np.asarray(out["scores"][:, :n]),
                                  np.asarray(det["scores"]))
    assert (np.asarray(out["scores"][:, n:]) == 0).all()
    np.testing.assert_array_equal(
        np.asarray(out["count"]),
        np.asarray(jnp.sum(det["scores"] >= 0.5, axis=-1)))


def test_apply_splits_accept_all_counts():
    cfg, params, x, det = _setup()
    th = 0.3
    g = split_gains(params, cfg, x, det["boxes"], det["scores"], top_m=4,
                    pres_threshold=th)
    # gates wide open: every live detection must split
    out = apply_splits(det, g, margin=-jnp.inf, pres_threshold=th,
                       max_neighbor_iou=2.0)
    live = np.asarray(g["score"]) >= th            # (B, 4)
    base = np.asarray(jnp.sum(det["scores"] >= th, axis=-1))
    np.testing.assert_array_equal(np.asarray(out["n_split"]),
                                  live.sum(-1))
    # each accepted split adds exactly one above-threshold box
    np.testing.assert_array_equal(np.asarray(out["count"]),
                                  base + live.sum(-1))
    # accepted parents' boxes were replaced by child A
    idx = np.asarray(g["idx"])
    child_a = np.asarray(g["best_child"][:, :, 0])
    for i in range(idx.shape[0]):
        for j in range(idx.shape[1]):
            if live[i, j]:
                np.testing.assert_allclose(
                    np.asarray(out["boxes"][i, idx[i, j]]),
                    child_a[i, j], atol=1e-6)


def test_split_count_monotone_in_margin():
    cfg, params, x, det = _setup(b=3)
    g = split_gains(params, cfg, x, det["boxes"], det["scores"], top_m=6)
    prev = None
    for margin in (-1.0, 0.0, 0.05, 0.2, 0.5, 1.0):
        out = apply_splits(det, g, margin=margin, pres_threshold=0.4)
        tot = int(np.asarray(out["n_split"]).sum())
        if prev is not None:
            assert tot <= prev
        prev = tot


def test_make_refiner_jit_matches_eager():
    cfg, params, x, det = _setup()
    refine = make_refiner(cfg, top_m=4)
    out_j = refine(params, x, det, 0.1, 0.5)
    g = split_gains(params, cfg, x, det["boxes"], det["scores"], top_m=4)
    out_e = apply_splits(det, g, 0.1, 0.5)
    np.testing.assert_allclose(np.asarray(out_j["boxes"]),
                               np.asarray(out_e["boxes"]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_j["count"]),
                                  np.asarray(out_e["count"]))
