"""Dataset-builder test: write a reference-schema file, train from it."""

import numpy as np
import pytest

from spair_pytorch_tpu.data import DataConfig, ScatteredMNISTFile
from spair_pytorch_tpu.data.build_hdf5 import build


def test_build_and_read(tmp_path):
    pytest.importorskip("h5py")
    dcfg = DataConfig(image_hw=(48, 48), patch_hw=(10, 10), max_objects=3)
    out = build(str(tmp_path / "ds.hdf5"), n=40, dcfg=dcfg, chunk=16)
    ds = ScatteredMNISTFile(out)
    assert len(ds) == 40
    img, bbox, count = ds[7]
    assert img.shape == (1, 48, 48)
    assert bbox.shape == (3, 4)
    assert 1 <= float(count[0]) <= 3
    # scenes must actually contain ink
    total = sum(ds[i][0].sum() for i in range(10))
    assert total > 0
