"""Serving detector tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_model import tiny_config
from spair_pytorch_tpu.models import init_params
from spair_pytorch_tpu.models.infer import detect, make_detector


def test_detect_shapes_and_determinism():
    cfg = tiny_config(inference_mode="wavefront")
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
    out1 = detect(params, x, cfg)
    out2 = detect(params, x, cfg)
    assert out1["boxes"].shape == (2, 16, 4)
    assert out1["scores"].shape == (2, 16)
    assert out1["count"].shape == (2,)
    np.testing.assert_array_equal(np.asarray(out1["boxes"]),
                                  np.asarray(out2["boxes"]))
    s = np.asarray(out1["scores"])
    assert (s >= 0).all() and (s <= 1).all()


def test_make_detector_jit():
    cfg = tiny_config(inference_mode="independent")
    params = init_params(jax.random.PRNGKey(0), cfg)
    det = make_detector(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
    out = det(params, x)
    assert np.isfinite(np.asarray(out["boxes"])).all()
    # boxes are [x0,y0,x1,y1] with x1>=x0, y1>=y0
    b = np.asarray(out["boxes"])
    assert (b[..., 2] >= b[..., 0]).all() and (b[..., 3] >= b[..., 1]).all()


def test_detector_bf16_matches_f32():
    """Serving under bfloat16 compute: finite, and boxes within bf16
    tolerance of the f32 detector (same params)."""
    cfg32 = tiny_config(inference_mode="independent")
    cfg16 = tiny_config(inference_mode="independent",
                        compute_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(3), cfg32)
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 1, 48, 48))
    o32 = detect(params, x, cfg32)
    o16 = detect(params, x, cfg16)
    assert np.isfinite(np.asarray(o16["boxes"])).all()
    assert np.isfinite(np.asarray(o16["scores"])).all()
    # bf16 has ~3 decimal digits; boxes live in [~-50, ~100] px
    np.testing.assert_allclose(np.asarray(o16["boxes"]),
                               np.asarray(o32["boxes"]), atol=1.5)
    np.testing.assert_allclose(np.asarray(o16["scores"]),
                               np.asarray(o32["scores"]), atol=0.05)


def test_threshold_sweep_monotone():
    """Raising the presence threshold can only lower the count."""
    cfg = tiny_config(inference_mode="independent")
    params = init_params(jax.random.PRNGKey(5), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(6), (3, 1, 48, 48))
    counts = [np.asarray(detect(params, x, cfg, pres_threshold=t)["count"])
              for t in (0.1, 0.3, 0.5, 0.7, 0.9)]
    for lo, hi in zip(counts, counts[1:]):
        assert (hi <= lo).all()
    # threshold 0 counts every cell
    n_cells = counts[0].shape  # smoke: shapes consistent
    all_cells = np.asarray(detect(params, x, cfg,
                                  pres_threshold=0.0)["count"])
    assert (all_cells == 16).all()


def test_detector_matches_zeroed_noise_forward():
    """The serving path must agree with the training forward run with
    zeroed noise: same z_where -> same pixel boxes."""
    from spair_pytorch_tpu.models import forward, geometry, sample_noise
    cfg = tiny_config(inference_mode="wavefront")
    params = init_params(jax.random.PRNGKey(7), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(8), (2, 1, 48, 48))
    out = detect(params, x, cfg)

    _, (gh, gw), _ = geometry(cfg)
    noise = jax.tree_util.tree_map(
        jnp.zeros_like, sample_noise(jax.random.PRNGKey(0), 2, (gh, gw), cfg))
    _, aux = forward(params, cfg, x, 10 ** 6, jax.random.PRNGKey(0),
                     noise=noise)
    zw = np.asarray(aux["z_where"]).transpose(0, 2, 3, 1).reshape(2, -1, 4)
    img = 48.0
    cx, cy = zw[..., 0] * img, zw[..., 1] * img
    bw, bh = zw[..., 2] * img, zw[..., 3] * img
    expected = np.stack([cx - bw / 2, cy - bh / 2,
                         cx + bw / 2, cy + bh / 2], -1)
    np.testing.assert_allclose(np.asarray(out["boxes"]), expected,
                               rtol=1e-5, atol=1e-4)


def test_detector_batch_consistency():
    """detect on a batch equals detect on each image alone."""
    cfg = tiny_config(inference_mode="independent")
    params = init_params(jax.random.PRNGKey(9), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(10), (3, 1, 48, 48))
    full = detect(params, x, cfg)
    for i in range(3):
        one = detect(params, x[i:i + 1], cfg)
        np.testing.assert_allclose(np.asarray(one["boxes"][0]),
                                   np.asarray(full["boxes"][i]),
                                   rtol=1e-5, atol=1e-4)


class TestDetectorServer:
    def test_batched_requests_unpadded(self):
        """Arbitrary request counts pack into fixed buckets; padded slots
        never leak into results."""
        from spair_pytorch_tpu.serve import DetectorServer
        cfg = tiny_config(inference_mode="independent")
        params = init_params(jax.random.PRNGKey(0), cfg)
        server = DetectorServer(cfg, params, batch_sizes=(4,),
                                pres_threshold=0.5)
        server.warmup()
        x = np.asarray(jax.random.uniform(jax.random.PRNGKey(1),
                                          (6, 1, 48, 48)))
        dets = server.detect(x)
        assert len(dets) == 6
        for d in dets:
            assert d["boxes"].shape == (d["count"], 4)
            assert (d["scores"] >= 0.5).all()

    def test_matches_direct_detect(self):
        """Server results equal direct detect() on the same images."""
        from spair_pytorch_tpu.serve import DetectorServer
        cfg = tiny_config(inference_mode="independent")
        params = init_params(jax.random.PRNGKey(2), cfg)
        server = DetectorServer(cfg, params, batch_sizes=(2,))
        x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3),
                                          (2, 1, 48, 48)))
        dets = server.detect(x)
        direct = detect(params, jnp.asarray(x), cfg)
        for j in range(2):
            keep = np.asarray(direct["scores"][j]) >= 0.5
            np.testing.assert_allclose(dets[j]["boxes"],
                                       np.asarray(direct["boxes"][j])[keep],
                                       rtol=1e-6)


def test_nms_hand_worked_case():
    """Greedy NMS on a hand-checked 4-box scene: the duplicate of the top
    box is suppressed, a suppressed box does NOT suppress others, and
    disjoint boxes survive."""
    from spair_pytorch_tpu.models.infer import nms_keep

    boxes = jnp.asarray([
        [0.0, 0.0, 10.0, 10.0],   # A: top score
        [1.0, 1.0, 11.0, 11.0],   # B: heavy overlap with A -> suppressed
        [8.0, 8.0, 18.0, 18.0],   # C: IoU with A ~0.02, with B ~0.047
        [50.0, 50.0, 60.0, 60.0], # D: disjoint
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    keep = np.asarray(jax.jit(nms_keep, static_argnums=2)(boxes, scores, 0.5))
    assert keep.tolist() == [True, False, True, True]
    # chain rule: C inside B (iou 0.64) but far enough from A (iou 0.22)
    boxes3 = jnp.asarray([
        [0.0, 0.0, 10.0, 10.0],
        [4.0, 4.0, 14.0, 14.0],    # iou with A = 36/164 ~0.22 -> KEPT at 0.5
        [5.0, 5.0, 13.0, 13.0],    # inside B: iou(B,C)=64/100 -> suppressed
        [50.0, 50.0, 60.0, 60.0],
    ])
    keep3 = np.asarray(nms_keep(boxes3, jnp.asarray([0.9, 0.8, 0.7, 0.6]),
                                0.5))
    assert keep3.tolist() == [True, True, False, True]
    # now kill B via A (duplicate) -> C must SURVIVE (suppressed boxes
    # don't suppress)
    boxes4 = boxes3.at[1].set(jnp.asarray([0.5, 0.5, 10.5, 10.5]))
    keep4 = np.asarray(nms_keep(boxes4, jnp.asarray([0.9, 0.8, 0.7, 0.6]),
                                0.5))
    assert bool(keep4[1]) is False
    assert bool(keep4[2]) is True


def test_nms_score_order_not_index_order():
    """Suppression must follow SCORES, not array position."""
    from spair_pytorch_tpu.models.infer import nms_keep

    boxes = jnp.asarray([[0.0, 0.0, 10.0, 10.0],
                         [1.0, 1.0, 11.0, 11.0]])
    # index 1 has the higher score -> index 0 is the one suppressed
    keep = np.asarray(nms_keep(boxes, jnp.asarray([0.3, 0.9]), 0.5))
    assert keep.tolist() == [False, True]


def test_detect_nms_drops_duplicate_counts():
    """detect(nms_iou=...) zeroes suppressed scores; count can only stay
    or drop vs the un-NMSed detector, and survivors' scores are
    unchanged."""
    cfg = tiny_config(inference_mode="independent", batch_size=3)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (3,) + tuple(cfg.image_shape))
    plain = detect(params, x, cfg)
    nmsed = detect(params, x, cfg, nms_iou=0.4)
    assert np.all(np.asarray(nmsed["count"]) <= np.asarray(plain["count"]))
    kept = np.asarray(nmsed["scores"]) > 0
    assert np.allclose(np.asarray(nmsed["scores"])[kept],
                       np.asarray(plain["scores"])[kept])


def test_nms_keep_batch_matches_greedy():
    """The batched fixpoint NMS must reproduce the per-image greedy keep
    set EXACTLY — including multi-level suppression chains (a suppressed
    box must not suppress, and its would-be victims resurrect)."""
    from spair_pytorch_tpu.models.infer import nms_keep, nms_keep_batch

    rng = np.random.RandomState(0)
    # dense box soup on a small canvas -> heavy overlap, long chains
    b, n = 4, 50
    cxy = rng.uniform(0, 40, size=(b, n, 2))
    wh = rng.uniform(4, 25, size=(b, n, 2))
    boxes = jnp.asarray(np.concatenate([cxy - wh / 2, cxy + wh / 2], -1),
                        jnp.float32)
    scores = jnp.asarray(rng.uniform(size=(b, n)), jnp.float32)
    for t in (0.2, 0.4, 0.6, 0.8):
        ref = np.stack([np.asarray(nms_keep(boxes[i], scores[i], t))
                        for i in range(b)])
        got = np.asarray(nms_keep_batch(boxes, scores, t))
        np.testing.assert_array_equal(got, ref, err_msg=f"iou_t={t}")


def test_nms_keep_batch_hand_worked_chain():
    """Batched NMS on the hand-worked chain case (suppressed B must not
    suppress C) and under jit."""
    from spair_pytorch_tpu.models.infer import nms_keep_batch

    boxes = jnp.asarray([[
        [0.0, 0.0, 10.0, 10.0],
        [0.5, 0.5, 10.5, 10.5],   # duplicate of A -> suppressed
        [5.0, 5.0, 13.0, 13.0],   # inside B, far from A -> resurrected
        [50.0, 50.0, 60.0, 60.0],
    ]])
    scores = jnp.asarray([[0.9, 0.8, 0.7, 0.6]])
    keep = np.asarray(jax.jit(nms_keep_batch, static_argnums=2)(
        boxes, scores, 0.5))
    assert keep[0].tolist() == [True, False, True, True]
