"""Parity tests: matmul-STN vs torch affine_grid/grid_sample.

The reference relies on F.affine_grid + F.grid_sample with the torch-1.x
align_corners=True semantics ('border' padding for crops, 'zeros' for pastes
— reference spair/modules.py:216-273). Our separable-matmul resampler must
match per-pixel. SURVEY.md hard-part #3.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from spair_pytorch_tpu.ops import crop_glimpses, paste_glimpses

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def torch_stn(image, boxes, out_hw, inverse=False):
    """Independent torch harness reproducing the reference stn semantics:
    theta = [[xs, 0, 2*xt-1], [0, ys, 2*yt-1]], border/zeros padding,
    align_corners=True (reference modules.py:232-269)."""
    image = torch.tensor(image)
    n = image.shape[0]
    xt, yt, xs, ys = [torch.tensor(boxes[:, i]) for i in range(4)]
    theta = torch.zeros(n, 2, 3)
    theta[:, 0, 0] = xs
    theta[:, 1, 1] = ys
    theta[:, 0, 2] = 2 * xt - 1
    theta[:, 1, 2] = 2 * yt - 1
    if inverse:
        bottom = torch.tensor([0.0, 0.0, 1.0]).repeat(n, 1, 1)
        full = torch.cat([theta, bottom], dim=1)
        theta = torch.inverse(full)[:, :2, :]
    grid = F.affine_grid(theta, [n, image.shape[1]] + list(out_hw),
                         align_corners=True)
    pad = "zeros" if inverse else "border"
    return F.grid_sample(image, grid, padding_mode=pad,
                         align_corners=True).numpy()


def rand_boxes(rng, n, lo_t=-0.3, hi_t=1.3, lo_s=0.05, hi_s=0.6):
    xt = rng.uniform(lo_t, hi_t, n)
    yt = rng.uniform(lo_t, hi_t, n)
    xs = rng.uniform(lo_s, hi_s, n)
    ys = rng.uniform(lo_s, hi_s, n)
    return np.stack([xt, yt, xs, ys], -1).astype("f")


class TestCropParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_crop_matches_grid_sample_border(self, seed):
        rng = np.random.RandomState(seed)
        B, N, H, W, oh, ow = 2, 5, 64, 64, 28, 28
        image = rng.rand(B, 1, H, W).astype("f")
        boxes = rand_boxes(rng, B * N).reshape(B, N, 4)

        ours = np.asarray(crop_glimpses(jnp.array(image), jnp.array(boxes),
                                        (oh, ow)))
        # torch path: one stn call per (b, n), like the reference's loop.
        for b in range(B):
            for k in range(N):
                ref = torch_stn(image[b:b + 1], boxes[b, k:k + 1], [oh, ow])
                np.testing.assert_allclose(ours[b, k], ref[0], atol=1e-5)

    def test_crop_extreme_boxes(self):
        # Boxes fully/partially outside: border padding must clamp.
        rng = np.random.RandomState(7)
        image = rng.rand(1, 1, 32, 32).astype("f")
        boxes = np.array([[[-0.4, -0.4, 0.2, 0.2]],
                          [[1.4, 1.4, 0.9, 0.9]]], dtype="f")[:, 0][None]
        boxes = boxes.reshape(1, 2, 4)
        ours = np.asarray(crop_glimpses(jnp.array(image), jnp.array(boxes),
                                        (14, 14)))
        for k in range(2):
            ref = torch_stn(image, boxes[0, k:k + 1], [14, 14])
            np.testing.assert_allclose(ours[0, k], ref[0], atol=1e-5)


class TestPasteParity:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_paste_matches_inverse_grid_sample_zeros(self, seed):
        rng = np.random.RandomState(seed)
        B, N, oh, ow, H, W = 2, 4, 28, 28, 64, 64
        glimpses = rng.rand(B, N, 3, oh, ow).astype("f")
        boxes = rand_boxes(rng, B * N, lo_t=0.1, hi_t=0.9).reshape(B, N, 4)

        ours = np.asarray(paste_glimpses(jnp.array(glimpses),
                                         jnp.array(boxes), (H, W)))
        for b in range(B):
            for k in range(N):
                ref = torch_stn(glimpses[b, k:k + 1], boxes[b, k:k + 1],
                                [H, W], inverse=True)
                # torch computes the inverse affine by 3x3 matrix inversion;
                # we use the analytical (u - t)/s, so allow rounding slack.
                np.testing.assert_allclose(ours[b, k], ref[0], atol=1e-4)

    def test_golden_pixel_placement(self):
        """A lit glimpse pixel must land at the predictable canvas coordinate
        (asserting version of the reference's manual visual harness,
        spair/test/test_renderer.py:8-36)."""
        oh = ow = 28
        H = W = 112
        glimpse = np.zeros((1, 1, 1, oh, ow), dtype="f")
        glimpse[0, 0, 0, 14, 14] = 1.0
        # Box centered at (0.25, 0.5) with scale 0.25: glimpse center pixel
        # (14,14) maps to canvas center of box.
        boxes = np.array([[[0.25, 0.5, 0.25, 0.25]]], dtype="f")
        out = np.asarray(paste_glimpses(jnp.array(glimpse), jnp.array(boxes),
                                        (H, W)))[0, 0, 0]
        ys, xs = np.nonzero(out > 0.05)
        # canvas x = (2*0.25-1 ... ) center: x_norm = 2*xt-1 = -0.5 ->
        # pixel = ( -0.5 + 1 ) * (W-1)/2 = 27.75; y center -> (H-1)/2 = 55.5
        assert xs.min() >= 26 and xs.max() <= 29
        assert ys.min() >= 54 and ys.max() <= 57
