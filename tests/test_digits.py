"""Digit patch sources (idx MNIST reader, sklearn bank) and standard AP."""

import gzip
import os
import struct

import jax.numpy as jnp
import numpy as np
import pytest

from spair_pytorch_tpu.data.digits import (digit_bank, find_mnist_file,
                                           load_mnist_idx, mnist_bank,
                                           resize_bilinear, resolve_source,
                                           sklearn_digit_bank)
from spair_pytorch_tpu import metrics as metric


def _write_idx(path, images, gz=False):
    n, h, w = images.shape
    payload = struct.pack(">iiii", 2051, n, h, w) + images.tobytes()
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        f.write(payload)


class TestIdxReader:
    def test_roundtrip_plain_and_gz(self, tmp_path):
        rng = np.random.RandomState(0)
        images = rng.randint(0, 256, (5, 28, 28)).astype(np.uint8)
        for gz, name in [(False, "train-images-idx3-ubyte"),
                         (True, "t10k-images-idx3-ubyte.gz")]:
            p = str(tmp_path / name)
            _write_idx(p, images, gz=gz)
            out = load_mnist_idx(p)
            assert out.shape == (5, 28, 28)
            assert out.dtype == np.float32
            np.testing.assert_allclose(out, images / 255.0)

    def test_bad_magic_raises(self, tmp_path):
        p = str(tmp_path / "bad")
        with open(p, "wb") as f:
            f.write(struct.pack(">iiii", 2049, 1, 2, 2) + b"\0\0\0\0")
        with pytest.raises(ValueError, match="magic"):
            load_mnist_idx(p)

    def test_truncated_raises(self, tmp_path):
        p = str(tmp_path / "short")
        with open(p, "wb") as f:
            f.write(struct.pack(">iiii", 2051, 10, 28, 28) + b"\0" * 100)
        with pytest.raises(ValueError, match="truncated"):
            load_mnist_idx(p)

    def test_find_and_bank(self, tmp_path):
        assert find_mnist_file([str(tmp_path)]) is None
        images = np.full((3, 28, 28), 128, np.uint8)
        p = str(tmp_path / "train-images-idx3-ubyte.gz")
        _write_idx(p, images, gz=True)
        assert find_mnist_file([str(tmp_path)]) == p
        bank = mnist_bank((14, 14), path=p)
        assert bank.shape == (3, 14, 14)
        np.testing.assert_allclose(bank, 128 / 255.0, atol=1e-6)

    def test_mnist_dir_env(self, tmp_path, monkeypatch):
        images = np.zeros((2, 28, 28), np.uint8)
        p = str(tmp_path / "train-images-idx3-ubyte")
        _write_idx(p, images)
        monkeypatch.setenv("MNIST_DIR", str(tmp_path))
        assert find_mnist_file() == p


class TestBanks:
    def test_sklearn_bank_real_handwriting(self):
        bank = sklearn_digit_bank((14, 14))
        assert bank.shape == (1797, 14, 14)
        assert bank.dtype == np.float32
        assert 0.0 <= bank.min() and bank.max() <= 1.0
        # real data: variety across samples of the same class
        assert not np.allclose(bank[0], bank[10])

    def test_resolve_auto_prefers_available(self, monkeypatch):
        # no MNIST file in this environment's default paths + sklearn
        # importable -> sklearn
        monkeypatch.delenv("MNIST_DIR", raising=False)
        monkeypatch.chdir("/tmp")
        assert resolve_source("auto") in ("sklearn", "mnist")
        assert resolve_source("font") == "font"

    def test_digit_bank_dispatch(self):
        font = digit_bank("font", (14, 14))
        sk = digit_bank("sklearn", (14, 14), limit=100)
        assert font.shape[1:] == (14, 14)
        assert sk.shape == (100, 14, 14)

    def test_resize_identity(self):
        x = np.random.RandomState(0).rand(2, 8, 8).astype(np.float32)
        np.testing.assert_allclose(resize_bilinear(x, (8, 8)), x, atol=1e-6)

    def test_generator_with_sklearn_bank(self):
        import jax
        from spair_pytorch_tpu.data import (DataConfig,
                                            OnDeviceScatteredDigits)
        dcfg = DataConfig(image_hw=(48, 48), patch_hw=(10, 10),
                          max_objects=3)
        bank = digit_bank("sklearn", (10, 10), limit=50)
        gen = OnDeviceScatteredDigits(dcfg, batch=4, bank=bank)
        x, bbox, count = next(gen)
        assert x.shape == (4, 1, 48, 48)
        assert float(jnp.max(x)) <= 1.0 and float(jnp.max(x)) > 0.1


class TestStandardAP:
    def _grids(self, boxes_px, scores, img=128, gh=2, gw=2):
        """Pack per-cell pixel center-boxes + scores into (B,4,gh,gw)."""
        b = boxes_px.shape[0]
        z_where = np.zeros((b, 4, gh, gw), np.float32)
        z_pres = np.zeros((b, 1, gh, gw), np.float32)
        for i in range(gh * gw):
            h, w = divmod(i, gw)
            z_where[:, :, h, w] = boxes_px[:, i] / img
            z_pres[:, 0, h, w] = scores[:, i]
        return jnp.asarray(z_where), jnp.asarray(z_pres)

    def test_perfect_predictions(self):
        # 2 GT boxes; 2 predictions exactly on them (center layout), 2 at
        # score 0 elsewhere
        gt = np.array([[[10, 10, 20, 20], [60, 60, 20, 20],
                        [0, 0, 0, 0], [0, 0, 0, 0]]], np.float32)
        count = np.array([[2.0]], np.float32)
        boxes = np.array([[[20, 20, 20, 20], [70, 70, 20, 20],
                           [100, 100, 5, 5], [40, 40, 5, 5]]], np.float32)
        scores = np.array([[0.9, 0.8, 0.01, 0.02]], np.float32)
        zw, zp = self._grids(boxes, scores)
        s, tp, n_gt = metric.match_predictions(zw, zp, jnp.asarray(gt),
                                               jnp.asarray(count), 128)
        assert float(n_gt[0]) == 2.0
        ap = metric.average_precision(s, tp, n_gt)
        # two TPs at the top of the ranking -> precision 1.0 at recall 1.0
        assert ap == pytest.approx(1.0)

    def test_no_double_matching(self):
        # two predictions on the SAME GT: only the higher-scored is a TP
        gt = np.array([[[10, 10, 20, 20], [0, 0, 0, 0],
                        [0, 0, 0, 0], [0, 0, 0, 0]]], np.float32)
        count = np.array([[1.0]], np.float32)
        boxes = np.array([[[20, 20, 20, 20], [20, 20, 20, 20],
                           [100, 100, 5, 5], [90, 90, 5, 5]]], np.float32)
        scores = np.array([[0.9, 0.8, 0.0, 0.0]], np.float32)
        zw, zp = self._grids(boxes, scores)
        s, tp, n_gt = metric.match_predictions(zw, zp, jnp.asarray(gt),
                                               jnp.asarray(count), 128)
        tp = np.asarray(tp)[0]
        assert tp.sum() == 1.0
        ap = metric.average_precision(s, tp[None], n_gt)
        assert ap == pytest.approx(1.0)  # TP ranked first -> AP still 1

    def test_known_pr_curve(self):
        # ranking: TP, FP, TP over 2 GT -> precisions 1, 1/2, 2/3;
        # VOC all-point AP = 0.5*1 + 0.5*(2/3) = 5/6
        scores = np.array([[0.9, 0.8, 0.7]])
        tp = np.array([[1.0, 0.0, 1.0]])
        n_gt = np.array([2.0])
        ap = metric.average_precision(scores, tp, n_gt)
        assert ap == pytest.approx(5.0 / 6.0)

    def test_all_wrong_is_zero(self):
        scores = np.array([[0.9, 0.8]])
        tp = np.zeros((1, 2))
        assert metric.average_precision(scores, tp, np.array([3.0])) == 0.0
