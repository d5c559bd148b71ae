"""Scattered-digit data: HDF5 reader + on-device generator.

Two sources, one schema — items are (image (C,H,W) float in [0,1],
bbox (MAX_OBJ, 4) as pixel [x, y, w, h] with top-left corner,
digit_count (1,)):

  * ``ScatteredMNISTFile``: reads the reference's HDF5 layout — group
    'train/full' with datasets image/bbox/digit_count (reference
    spair/dataloader.py:10-36). The reference's dataset was never published
    ("Data: Coming soon...", reference README.md:24), so this exists for
    drop-in parity when a user supplies the file.

  * ``generate_batch``: a jit-compiled on-device generator that scatters
    digit patches from a patch bank onto blank canvases, producing images
    AND training targets entirely on the TPU (BASELINE config 5: feeds the
    chips at line rate with zero host IO). The patch bank is either real
    MNIST (any (N, ph, pw) array the user supplies) or the built-in
    procedural glyph bank: a 5x7 bitmap digit font, randomly scaled/shifted
    with brightness jitter — recognizable digit shapes with exact bbox and
    count labels, sufficient for detection/counting benchmarks without any
    external download.

Placement uses integer offsets + ``lax.dynamic_update_slice`` in a scan
over object slots, compositing by maximum (scattered-MNIST style: white
strokes on black). Everything is static-shaped: images always carry
``max_objects`` slots with a presence mask; digit_count is the number of
active slots.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# 5x7 bitmap font for digits 0-9 (rows of 5 bits, MSB left).
_FONT = {
    0: ["01110", "10001", "10011", "10101", "11001", "10001", "01110"],
    1: ["00100", "01100", "00100", "00100", "00100", "00100", "01110"],
    2: ["01110", "10001", "00001", "00010", "00100", "01000", "11111"],
    3: ["11111", "00010", "00100", "00010", "00001", "10001", "01110"],
    4: ["00010", "00110", "01010", "10010", "11111", "00010", "00010"],
    5: ["11111", "10000", "11110", "00001", "00001", "10001", "01110"],
    6: ["00110", "01000", "10000", "11110", "10001", "10001", "01110"],
    7: ["11111", "00001", "00010", "00100", "01000", "01000", "01000"],
    8: ["01110", "10001", "10001", "01110", "10001", "10001", "01110"],
    9: ["01110", "10001", "10001", "01111", "00001", "00010", "01100"],
}


def glyph_bank(patch_hw: Tuple[int, int] = (14, 14),
               variants_per_digit: int = 16, seed: int = 0) -> np.ndarray:
    """Procedural digit patch bank (n, ph, pw) float32 in [0, 1].

    Each variant nearest-neighbor upsamples the 5x7 glyph to a random
    sub-size of the patch, at a random offset, with brightness jitter —
    a stand-in for MNIST with exact ground truth."""
    ph, pw = patch_hw
    rng = np.random.RandomState(seed)
    bank = np.zeros((10 * variants_per_digit, ph, pw), np.float32)
    for d in range(10):
        glyph = np.array([[int(c) for c in row] for row in _FONT[d]],
                         np.float32)
        for v in range(variants_per_digit):
            th = rng.randint(max(7, ph - 5), ph + 1)
            tw = rng.randint(max(5, pw - 5), pw + 1)
            ys = np.clip((np.arange(th) * 7 / th).astype(int), 0, 6)
            xs = np.clip((np.arange(tw) * 5 / tw).astype(int), 0, 4)
            patch = glyph[np.ix_(ys, xs)]
            patch = patch * rng.uniform(0.7, 1.0)
            oy = rng.randint(0, ph - th + 1)
            ox = rng.randint(0, pw - tw + 1)
            out = np.zeros((ph, pw), np.float32)
            out[oy:oy + th, ox:ox + tw] = patch
            bank[d * variants_per_digit + v] = out
    return bank


@dataclasses.dataclass(frozen=True)
class DataConfig:
    image_hw: Tuple[int, int] = (128, 128)
    patch_hw: Tuple[int, int] = (14, 14)
    min_objects: int = 1
    max_objects: int = 6
    channels: int = 1


def _generate_one(key, bank, dcfg: DataConfig):
    ih, iw = dcfg.image_hw
    ph, pw = dcfg.patch_hw
    m = dcfg.max_objects
    k_count, k_pick, k_y, k_x = jax.random.split(key, 4)

    count = jax.random.randint(k_count, (), dcfg.min_objects, m + 1)
    picks = jax.random.randint(k_pick, (m,), 0, bank.shape[0])
    oys = jax.random.randint(k_y, (m,), 0, ih - ph + 1)
    oxs = jax.random.randint(k_x, (m,), 0, iw - pw + 1)
    active = jnp.arange(m) < count

    # Max-composite all patches at once via 0/1 selector matmuls (the
    # MXU-native form of integer placement): selector[i, a] = 1 iff canvas
    # row i equals oy + a. Value-identical to the former sequential
    # dynamic_update_slice scan (placement offsets are integers, so the
    # selectors are exact deltas and max is order-free), but one batched
    # einsum pair instead of an M-step scatter loop — the loop was ~0.9 ms
    # of the fused train step at batch 32.
    patches = bank[picks] * active[:, None, None].astype(jnp.float32)
    sel_y = (jnp.arange(ih)[None, :, None]
             == oys[:, None, None] + jnp.arange(ph)[None, None, :])
    sel_x = (jnp.arange(iw)[None, :, None]
             == oxs[:, None, None] + jnp.arange(pw)[None, None, :])
    placed = jnp.einsum("mia,mab,mjb->mij", sel_y.astype(jnp.float32),
                        patches, sel_x.astype(jnp.float32))
    canvas = jnp.max(placed, axis=0)

    # bbox pixel layout [x, y, w, h], top-left corner — the layout
    # metric.mAP consumes (reference metric.py:21-22); inactive slots are
    # all-zero (zero-area boxes contribute zero IoU).
    bbox = jnp.stack([oxs.astype(jnp.float32), oys.astype(jnp.float32),
                      jnp.full((m,), float(pw)), jnp.full((m,), float(ph))],
                     axis=-1) * active[:, None]
    image = jnp.broadcast_to(canvas[None], (dcfg.channels, ih, iw))
    return image, bbox, count[None].astype(jnp.float32)


@partial(jax.jit, static_argnames=("batch", "dcfg"))
def generate_batch(key, bank, batch: int, dcfg: DataConfig):
    """(key, bank (n,ph,pw)) -> (image (B,C,H,W), bbox (B,M,4),
    count (B,1)); runs entirely on device."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: _generate_one(k, bank, dcfg))(keys)


class OnDeviceScatteredDigits:
    """Infinite generator iterator with a stateful key (host-side wrapper)."""

    def __init__(self, dcfg: DataConfig, batch: int, bank=None, seed: int = 0):
        self.dcfg = dcfg
        self.batch = batch
        self.bank = jnp.asarray(bank if bank is not None
                                else glyph_bank(dcfg.patch_hw))
        self.key = jax.random.PRNGKey(seed)

    def __iter__(self):
        return self

    def __next__(self):
        self.key, sub = jax.random.split(self.key)
        return generate_batch(sub, self.bank, self.batch, self.dcfg)


class ScatteredMNISTFile:
    """Reader for the reference HDF5 schema (reference dataloader.py:10-36):
    file['train/full'] with datasets image (N, H, W), bbox (N, M, 4),
    digit_count (N, 1). Yields numpy batches in the reference layout."""

    def __init__(self, path: str, group: str = "train/full"):
        import h5py  # lazy: only needed for file-backed data
        self._h5 = h5py.File(path, "r")[group]

    def __len__(self):
        return self._h5["image"].shape[0]

    def __getitem__(self, index):
        image = np.asarray(self._h5["image"][index], np.float32)[None]
        bbox = np.asarray(self._h5["bbox"][index], np.float32)
        count = np.asarray(self._h5["digit_count"][index], np.float32)
        return image, bbox, count

    def batches(self, batch_size: int, drop_last: bool = True):
        n = len(self)
        for start in range(0, n - (batch_size if drop_last else 1) + 1,
                           batch_size):
            idx = slice(start, min(start + batch_size, n))
            image = np.asarray(self._h5["image"][idx], np.float32)[:, None]
            bbox = np.asarray(self._h5["bbox"][idx], np.float32)
            count = np.asarray(self._h5["digit_count"][idx], np.float32)
            yield image, bbox, count
