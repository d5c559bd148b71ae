"""ctypes binding for the native C++ scattered-digits pipeline.

Host-side data generation (native/scattered_digits.cc): multithreaded C++
producing batches into preallocated numpy buffers — the CPU-resident
alternative to the on-device jitted generator, for overlapping host data
production with device compute (and for feeding meshes where per-host data
sharding is wanted). Builds the shared library on first use via the
checked-in Makefile; callers can fall back to OnDeviceScatteredDigits when
no C++ toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from spair_pytorch_tpu.data.scattered_mnist import DataConfig, glyph_bank

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libspair_native.so")


def build_native(force: bool = False) -> str:
    """Compile the shared library (idempotent). Returns its path."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True)
    return _LIB_PATH


def load_native() -> ctypes.CDLL:
    lib = ctypes.CDLL(build_native())
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.spair_generate_batch.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,  # bank, n, ph, pw
        ctypes.c_int, ctypes.c_int, ctypes.c_int,        # batch, H, W
        ctypes.c_int, ctypes.c_int,                      # min/max objects
        ctypes.c_uint64, ctypes.c_int,                   # seed, threads
        f32p, f32p, f32p,                                # out buffers
    ]
    lib.spair_generate_batch.restype = None
    return lib


class NativeScatteredDigits:
    """Iterator yielding (image (B,C,H,W), bbox (B,M,4), count (B,1)) numpy
    batches from the C++ generator. Matches the on-device generator's item
    schema (and the reference HDF5 schema, dataloader.py:20-33)."""

    def __init__(self, dcfg: DataConfig, batch: int, bank=None, seed: int = 0,
                 n_threads: Optional[int] = None):
        self.dcfg = dcfg
        self.batch = batch
        self.bank = np.ascontiguousarray(
            np.asarray(bank if bank is not None else glyph_bank(dcfg.patch_hw),
                       np.float32))
        self.seed = seed
        self.index = 0
        self.n_threads = n_threads or min(8, os.cpu_count() or 1)
        self._lib = load_native()
        ih, iw = dcfg.image_hw
        self._images = np.empty((batch, ih, iw), np.float32)
        self._bboxes = np.empty((batch, dcfg.max_objects, 4), np.float32)
        self._counts = np.empty((batch,), np.float32)

    def __iter__(self):
        return self

    def __next__(self):
        d = self.dcfg
        ih, iw = d.image_hw
        ph, pw = d.patch_hw
        self._lib.spair_generate_batch(
            self.bank, self.bank.shape[0], ph, pw,
            self.batch, ih, iw, d.min_objects, d.max_objects,
            np.uint64(self.seed * 0x9E3779B9 + self.index), self.n_threads,
            self._images, self._bboxes, self._counts)
        self.index += 1
        image = np.repeat(self._images[:, None], d.channels, axis=1).copy()
        return image, self._bboxes.copy(), self._counts[:, None].copy()
