"""Evaluation harness test (no checkpoint needed)."""

import numpy as np

from tests.test_model import tiny_config
from spair_pytorch_tpu.data import DataConfig, OnDeviceScatteredDigits
from spair_pytorch_tpu.eval import evaluate
from spair_pytorch_tpu.parallel import create_train_state


def test_evaluate_fresh_model():
    cfg = tiny_config(inference_mode="independent", batch_size=4)
    state = create_train_state(cfg)
    data = OnDeviceScatteredDigits(
        DataConfig(image_hw=(48, 48), patch_hw=(10, 10), max_objects=3),
        batch=4, seed=0)
    result, aux, x = evaluate(cfg, state, batches=2, data=data)
    for key in ("bbox_average_precision", "bbox_ap_center",
                "object_count_error", "count_exact_accuracy", "step"):
        assert key in result
        assert np.isfinite(result[key])
    assert aux["recon"].shape == (4, 1, 48, 48)
