"""Evaluation harness test (no checkpoint needed)."""

import numpy as np

from tests.test_model import tiny_config
from spair_pytorch_tpu.data import DataConfig, OnDeviceScatteredDigits
from spair_pytorch_tpu.eval import evaluate
from spair_pytorch_tpu.parallel import create_train_state

import pytest

pytestmark = pytest.mark.slow  # E2E train+eval loops


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


def test_evaluate_deterministic():
    """Fixed data + params -> identical metric dicts on repeat runs."""
    cfg = tiny_config(inference_mode="independent", batch_size=4)
    state = create_train_state(cfg)
    dcfg = DataConfig(image_hw=(48, 48), patch_hw=(10, 10), max_objects=3)
    batches = [next(OnDeviceScatteredDigits(dcfg, batch=4, seed=7))
               for _ in range(2)]
    r1, _, _ = evaluate(cfg, state, batches=2, data=iter(batches))
    r2, _, _ = evaluate(cfg, state, batches=2, data=iter(batches))
    assert r1 == r2
    assert 0.0 <= r1["ap_at_50"] <= 1.0


def test_eval_checkpoint_step_labels(tmp_path):
    """Checkpoints land on ROUND step numbers (step_2, step_4 — the
    round-1 ADVICE off-by-one) and restore by explicit --step."""
    from spair_pytorch_tpu.train import train
    from spair_pytorch_tpu.utils.checkpoint import CheckpointManager

    cfg = tiny_config(inference_mode="independent", batch_size=2)
    train(cfg, steps=4, logdir=str(tmp_path / "run"), checkpoint_every=2,
          metrics_every=0, verbose=False)
    mgr = CheckpointManager(str(tmp_path / "run" / "checkpoints"))
    state = create_train_state(cfg)
    restored = mgr.restore(state, step=2, params_only=True)
    assert restored is not None
    restored_latest = mgr.restore(state, params_only=True)
    assert int(restored_latest.step) in (2, 4)


def test_eval_restores_cross_mode(tmp_path, capsys):
    """Regression (VERDICT r1 weak #7): a checkpoint trained in ONE
    inference mode must restore and evaluate under ANOTHER (params are
    mode-independent; only the schedule differs)."""
    from spair_pytorch_tpu.train import train
    from spair_pytorch_tpu.utils.checkpoint import CheckpointManager

    cfg = tiny_config(inference_mode="independent", batch_size=2)
    train(cfg, steps=2, logdir=str(tmp_path / "run"), checkpoint_every=2,
          metrics_every=0, verbose=False)

    cfg_wave = tiny_config(inference_mode="wavefront", batch_size=2)
    state = create_train_state(cfg_wave)
    mgr = CheckpointManager(str(tmp_path / "run" / "checkpoints"))
    restored = mgr.restore(state, params_only=True)
    assert restored is not None
    data = OnDeviceScatteredDigits(
        DataConfig(image_hw=(48, 48), patch_hw=(10, 10), max_objects=3),
        batch=2, seed=1)
    result, _, _ = evaluate(cfg_wave, restored, batches=1, data=data)
    assert np.isfinite(result["count_exact_accuracy"])


def test_train_heldout_eval_logs(tmp_path):
    """train(eval_every=...) writes eval/* scalars from the fixed held-out
    set."""
    import json
    cfg = tiny_config(inference_mode="independent", batch_size=2)
    train(cfg, steps=4, logdir=str(tmp_path / "run"), checkpoint_every=0,
          metrics_every=0, eval_every=2, eval_batches=1, verbose=False)
    tags = set()
    with open(tmp_path / "run" / "metrics.jsonl") as fh:
        for line in fh:
            tags.update(json.loads(line))  # flat records: {step, time, tag..}
    assert any(t.startswith("eval/") for t in tags), tags


from spair_pytorch_tpu.train import train  # noqa: E402 (used above)


def test_config_json_roundtrip():
    """config.json persistence: tuples survive the JSON trip and the
    result is the same hashable frozen dataclass."""
    from spair_pytorch_tpu.config import (PRESETS, config_from_json,
                                          config_to_json)
    for preset in PRESETS.values():
        cfg = preset()
        back = config_from_json(config_to_json(cfg))
        assert back == cfg
        assert hash(back) == hash(cfg)
    # overrides survive too (free box prior + ordered compositing)
    from spair_pytorch_tpu.config import free_box_priors
    cfg = PRESETS["cluttered"](render_mode="ordered",
                               priors=free_box_priors())
    assert config_from_json(config_to_json(cfg)) == cfg


def test_train_writes_config_and_eval_prefers_it(tmp_path):
    """train persists <logdir>/config.json; the eval CLI reconstructs the
    run's exact config from it instead of the --preset default."""
    import json
    import os

    from spair_pytorch_tpu.config import config_from_json
    from spair_pytorch_tpu.train import train

    cfg = tiny_config(inference_mode="independent", batch_size=4,
                      render_mode="ordered")
    logdir = str(tmp_path / "run")
    train(cfg, steps=2, logdir=logdir, checkpoint_every=2,
          metrics_every=0, verbose=False, eval_every=0)
    path = os.path.join(logdir, "config.json")
    assert os.path.exists(path)
    with open(path) as f:
        assert config_from_json(f.read()) == cfg


def test_calibrate_picks_grid_operating_point():
    """calibrate() sweeps (presence threshold x NMS IoU) on held-out
    scenes and returns a member of the joint grid plus the full table."""
    from spair_pytorch_tpu.eval import (CALIB_NMS, CALIB_THRESHOLDS,
                                        calibrate)

    cfg = tiny_config(inference_mode="independent", batch_size=4)
    state = create_train_state(cfg)
    data = OnDeviceScatteredDigits(
        DataConfig(image_hw=(48, 48), patch_hw=(10, 10), max_objects=3),
        batch=4, seed=11)
    cal = calibrate(cfg, state, batches=2, data=data)
    assert cal["pres_threshold"] in CALIB_THRESHOLDS
    assert cal["nms_iou"] in CALIB_NMS
    assert cal["scenes"] == 8
    nms_key = ("none" if cal["nms_iou"] is None
               else f"{cal['nms_iou']:.1f}")
    assert set(cal["count_accuracy"]) == {
        "none" if g is None else f"{g:.1f}" for g in CALIB_NMS}
    for row in cal["count_accuracy"].values():
        assert set(row) == {f"{t:.2f}" for t in CALIB_THRESHOLDS}
        assert all(0.0 <= a <= 1.0 for a in row.values())
    # the chosen operating point attains the max of the whole table
    best = max(max(row.values()) for row in cal["count_accuracy"].values())
    chosen = cal["count_accuracy"][nms_key][f"{cal['pres_threshold']:.2f}"]
    assert chosen == best


def test_calibrated_threshold_reaches_serving(tmp_path):
    """eval --calibrate writes calibration.json; serve resolves its
    threshold AND nms from it (CLI still wins; no file -> 0.5 / off)."""
    import json

    from spair_pytorch_tpu.serve import resolve_nms, resolve_threshold

    logdir = tmp_path / "run"
    logdir.mkdir()
    assert resolve_threshold(None, str(logdir)) == 0.5
    assert resolve_nms(None, str(logdir)) is None
    with open(logdir / "calibration.json", "w") as f:
        json.dump({"pres_threshold": 0.7, "nms_iou": 0.6,
                   "scenes": 256}, f)
    assert resolve_threshold(None, str(logdir)) == 0.7
    assert resolve_threshold(0.55, str(logdir)) == 0.55
    assert resolve_threshold(None, None) == 0.5
    assert resolve_nms(None, str(logdir)) == 0.6
    assert resolve_nms(0.4, str(logdir)) == 0.4
    assert resolve_nms(0.0, str(logdir)) is None  # explicit 0 disables
    assert resolve_nms(None, None) is None
    # pre-NMS calibration files (no nms_iou key) still resolve
    with open(logdir / "calibration.json", "w") as f:
        json.dump({"pres_threshold": 0.75, "scenes": 256}, f)
    assert resolve_threshold(None, str(logdir)) == 0.75
    assert resolve_nms(None, str(logdir)) is None


def test_evaluate_reports_calibrated_det_metric():
    cfg = tiny_config(inference_mode="independent", batch_size=4)
    state = create_train_state(cfg)
    data = OnDeviceScatteredDigits(
        DataConfig(image_hw=(48, 48), patch_hw=(10, 10), max_objects=3),
        batch=4, seed=3)
    result, _, _ = evaluate(cfg, state, batches=1, data=data,
                            det_threshold=0.7)
    assert "det_count_acc_cal" in result
    assert 0.0 <= result["det_count_acc_cal"] <= 1.0
    # 0.7 is also the fixed det_count_acc_70 column -> must agree
    assert result["det_count_acc_cal"] == result["det_count_acc_70"]


def test_train_calibrate_at_end_writes_artifact(tmp_path):
    """train(calibrate_at_end=True) leaves the run serving-ready: a
    calibration.json next to the checkpoint, with a grid threshold."""
    import json
    import os

    from spair_pytorch_tpu.eval import CALIB_THRESHOLDS
    from spair_pytorch_tpu.train import train

    cfg = tiny_config(inference_mode="independent", batch_size=2)
    logdir = str(tmp_path / "run")
    train(cfg, steps=2, logdir=logdir, checkpoint_every=2, metrics_every=0,
          verbose=False, eval_every=0, eval_batches=1, calibrate_at_end=True)
    path = os.path.join(logdir, "calibration.json")
    assert os.path.exists(path)
    with open(path) as f:
        cal = json.load(f)
    assert cal["pres_threshold"] in CALIB_THRESHOLDS
    # production floor: >= 512 scenes regardless of eval_batches (a
    # 256-scene calibration mis-picked on a shifted score distribution)
    assert cal["scenes"] >= 512


def test_train_calibrate_at_end_failure_preserves_run(tmp_path, monkeypatch):
    """A calibrate-at-end crash must never take the run report with it
    (round 3 lost a 100k-run's calibration this way): checkpoints and
    metrics stay durable, and the failure surfaces as SystemExit with a
    clear message instead of a raw traceback mid-teardown."""
    import os

    import pytest

    from spair_pytorch_tpu import eval as eval_mod
    from spair_pytorch_tpu.train import train

    def boom(*a, **k):
        raise AttributeError("simulated mixed-module-version crash")

    monkeypatch.setattr(eval_mod, "calibrate", boom)
    cfg = tiny_config(inference_mode="independent", batch_size=2)
    logdir = str(tmp_path / "run")
    with pytest.raises(SystemExit, match="calibrate-at-end failed"):
        train(cfg, steps=2, logdir=logdir, checkpoint_every=2,
              metrics_every=0, verbose=False, eval_every=0, eval_batches=1,
              calibrate_at_end=True)
    # the run directory is complete: checkpoint saved, metrics flushed
    ckpts = os.listdir(os.path.join(logdir, "checkpoints"))
    assert ckpts, "final checkpoint must survive a calibration crash"
    assert os.path.exists(os.path.join(logdir, "metrics.jsonl"))
    assert not os.path.exists(os.path.join(logdir, "calibration.json"))


def test_count_prior_override_roundtrip():
    """--count-prior-end persists through config.json (a Schedule field
    override must survive serialization, like priors do)."""
    import dataclasses

    from spair_pytorch_tpu.config import (COUNT_PRIOR, PRESETS,
                                          config_from_json, config_to_json)

    cfg = PRESETS["cluttered"](
        count_prior=dataclasses.replace(COUNT_PRIOR, end=0.1))
    back = config_from_json(config_to_json(cfg))
    assert back == cfg
    assert back.count_prior.end == 0.1


def test_calibrate_ap_target():
    """target='ap50': NMS is picked by pooled AP@0.5 (max of the reported
    AP table), the threshold by count accuracy WITHIN that NMS row, and
    the artifact records its objective."""
    from spair_pytorch_tpu.eval import CALIB_NMS, calibrate

    cfg = tiny_config(inference_mode="independent", batch_size=4)
    state = create_train_state(cfg)
    data = OnDeviceScatteredDigits(
        DataConfig(image_hw=(48, 48), patch_hw=(10, 10), max_objects=3),
        batch=4, seed=12)
    cal = calibrate(cfg, state, batches=2, data=data, target="ap50")
    assert cal["target"] == "ap50"
    keys = {"none" if g is None else f"{g:.1f}" for g in CALIB_NMS}
    assert set(cal["ap_at_50"]) == keys
    assert all(0.0 <= v <= 1.0 for v in cal["ap_at_50"].values())
    nms_key = ("none" if cal["nms_iou"] is None
               else f"{cal['nms_iou']:.1f}")
    assert cal["ap_at_50"][nms_key] == max(cal["ap_at_50"].values())
    # threshold is the count-accuracy argmax of the CHOSEN row only
    row = cal["count_accuracy"][nms_key]
    assert row[f"{cal['pres_threshold']:.2f}"] == max(row.values())


def test_match_boxes_equals_match_predictions():
    """The detector-format matching entry point must agree with the
    grid-format one on the same geometry."""
    import numpy as np

    from spair_pytorch_tpu import metrics as metric

    rng = np.random.RandomState(3)
    b, gh, gw = 2, 3, 3
    zw = rng.uniform(0.1, 0.6, size=(b, 4, gh, gw)).astype(np.float32)
    zp = rng.uniform(size=(b, 1, gh, gw)).astype(np.float32)
    gt_bbox = rng.uniform(5, 20, size=(b, 4, 4)).astype(np.float32)
    gt_count = np.array([[3], [2]], np.int32)
    img = 48
    ref = metric.match_predictions(zw, zp, gt_bbox, gt_count, img)

    pred = zw.transpose(0, 2, 3, 1).reshape(b, -1, 4) * img
    corners = np.concatenate([pred[..., :2] - pred[..., 2:] / 2,
                              pred[..., :2] + pred[..., 2:] / 2], -1)
    scores = zp.transpose(0, 2, 3, 1).reshape(b, -1)
    got = metric.match_boxes(corners, scores, gt_bbox, gt_count)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   rtol=1e-6, atol=1e-6)
