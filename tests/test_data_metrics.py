"""Data generator and metric tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spair_pytorch_tpu.data import (DataConfig, OnDeviceScatteredDigits,
                                    generate_batch, glyph_bank)
from spair_pytorch_tpu.metrics import (batch_jaccard, count_accuracy, mAP,
                                       mAP_center, object_count_error)


class TestGenerator:
    def test_shapes_and_ranges(self):
        dcfg = DataConfig(image_hw=(64, 64), max_objects=4)
        bank = jnp.asarray(glyph_bank((14, 14)))
        img, bbox, count = generate_batch(jax.random.PRNGKey(0), bank, 8, dcfg)
        assert img.shape == (8, 1, 64, 64)
        assert bbox.shape == (8, 4, 4)
        assert count.shape == (8, 1)
        assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0
        assert np.all((np.asarray(count) >= 1) & (np.asarray(count) <= 4))

    def test_digits_land_inside_their_bboxes(self):
        dcfg = DataConfig(image_hw=(64, 64), max_objects=3)
        bank = jnp.asarray(glyph_bank((14, 14)))
        img, bbox, count = generate_batch(jax.random.PRNGKey(1), bank, 4, dcfg)
        img, bbox, count = map(np.asarray, (img, bbox, count))
        for b in range(4):
            mask = np.zeros((64, 64), bool)
            for o in range(int(count[b, 0])):
                x, y, w, h = bbox[b, o]
                mask[int(y):int(y + h), int(x):int(x + w)] = True
            lit = img[b, 0] > 0
            assert not np.any(lit & ~mask), "ink outside every bbox"

    def test_iterator_advances(self):
        ds = OnDeviceScatteredDigits(DataConfig(image_hw=(48, 48)), batch=2)
        a = np.asarray(next(ds)[0])
        b = np.asarray(next(ds)[0])
        assert not np.allclose(a, b)


class TestMetrics:
    def test_jaccard_identity(self):
        boxes = jnp.array([[[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0]]])
        iou = np.asarray(batch_jaccard(boxes, boxes))
        np.testing.assert_allclose(np.diagonal(iou[0]), 1.0, rtol=1e-6)
        # overlap 5x5=25, union 200-25=175
        assert np.isclose(iou[0, 0, 1], 25.0 / 175.0, rtol=1e-5)

    def test_map_matches_reference_math(self):
        """Cross-check against a torch transcription of reference
        metric.py:5-47 on random inputs."""
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(0)
        b, gh, gw, m = 3, 4, 4, 5
        z_where = rng.uniform(0.05, 0.6, (b, 4, gh, gw)).astype("f")
        z_pres = rng.uniform(0, 1, (b, 1, gh, gw)).astype("f")
        gt = rng.uniform(0, 80, (b, m, 4)).astype("f")
        counts = rng.randint(1, m + 1, (b, 1)).astype("f")
        image_size = 128

        ours = float(mAP(jnp.array(z_where), jnp.array(z_pres),
                         jnp.array(gt), jnp.array(counts), image_size))

        # torch transcription (matching the reference exactly)
        zw = torch.tensor(z_where) * image_size
        zw = zw.permute(0, 2, 3, 1).reshape(b, -1, 4).clone()
        gtb = torch.tensor(gt).clone()
        zw[..., 2:] += zw[..., :2]
        gtb[..., 2:] += gtb[..., :2]
        A, M = zw.shape[1], gtb.shape[1]
        max_xy = torch.min(zw[..., 2:].unsqueeze(2).expand(b, A, M, 2),
                           gtb[..., 2:].unsqueeze(1).expand(b, A, M, 2))
        min_xy = torch.max(zw[..., :2].unsqueeze(2).expand(b, A, M, 2),
                           gtb[..., :2].unsqueeze(1).expand(b, A, M, 2))
        inter = torch.clamp(max_xy - min_xy, min=0)
        inter = inter[..., 0] * inter[..., 1]
        area_a = ((zw[..., 2] - zw[..., 0]) * (zw[..., 3] - zw[..., 1])
                  ).unsqueeze(2).expand_as(inter)
        area_b = ((gtb[..., 2] - gtb[..., 0]) * (gtb[..., 3] - gtb[..., 1])
                  ).unsqueeze(1).expand_as(inter)
        ious = inter / (area_a + area_b - inter)
        best = torch.max(ious, dim=1)[0].unsqueeze(-1)
        scale = torch.arange(0.1, 1.0, 0.1)
        scaled = torch.clamp((best - scale) / (1 - scale), min=0, max=1)
        ap = scaled.mean(dim=-1)
        theirs = float((ap.sum(dim=-1, keepdim=True)
                        / torch.tensor(counts)).mean())
        assert np.isclose(ours, theirs, rtol=1e-5)

    def test_count_error_and_accuracy(self):
        z_pres = jnp.zeros((2, 1, 3, 3)).at[0, 0, 0, 0].set(0.9).at[
            0, 0, 1, 1].set(0.7).at[1, 0, 2, 2].set(0.2)
        counts = jnp.array([[2.0], [1.0]])
        # image 0: 2 predicted, 2 true; image 1: 0 predicted, 1 true
        err = float(object_count_error(z_pres, counts))
        assert np.isclose(err, (0.0 + 1.0) / 2)
        acc = float(count_accuracy(z_pres, counts))
        assert np.isclose(acc, 0.5)

    def test_map_center_perfect_predictions(self):
        """With z_where centers matching GT exactly, corrected AP ~ 1."""
        gt = jnp.array([[[10.0, 20.0, 14.0, 14.0]]])  # x,y,w,h
        counts = jnp.array([[1.0]])
        image_size = 64
        z_where = jnp.zeros((1, 4, 1, 1))
        z_where = z_where.at[0, 0].set((10 + 7) / 64)  # xt center
        z_where = z_where.at[0, 1].set((20 + 7) / 64)
        z_where = z_where.at[0, 2].set(14 / 64)
        z_where = z_where.at[0, 3].set(14 / 64)
        z_pres = jnp.ones((1, 1, 1, 1))
        val = float(mAP_center(z_where, z_pres, gt, counts, image_size))
        assert val > 0.99
