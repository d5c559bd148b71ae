"""Smoke tests for the host-side visualization figures."""

import numpy as np
import pytest

pytest.importorskip("matplotlib")

from spair_pytorch_tpu.utils.viz import (glimpse_grid_figure,
                                         render_analysis_figure)


def test_render_analysis_figure():
    rng = np.random.RandomState(0)
    fig = render_analysis_figure(
        x=rng.rand(2, 1, 48, 48),
        recon=rng.rand(2, 1, 48, 48),
        z_where=rng.uniform(0.1, 0.6, (2, 4, 4, 4)),
        z_pres=rng.rand(2, 1, 4, 4),
        z_depth=rng.rand(2, 1, 4, 4) * 4,
    )
    assert len(fig.axes) >= 5
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_glimpse_grid_figure():
    rng = np.random.RandomState(1)
    fig = glimpse_grid_figure(rng.rand(1, 16, 1, 14, 14))
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_writer_figure_fallback(tmp_path):
    from spair_pytorch_tpu.utils.logging import MetricWriter
    w = MetricWriter(str(tmp_path), use_tensorboard=False)
    fig = glimpse_grid_figure(np.zeros((1, 4, 1, 8, 8)))
    w.figure(3, "analysis/test", fig)
    assert (tmp_path / "figures" / "analysis_test_3.png").exists()
    w.close()


def test_latent_stats_logging(tmp_path):
    import json
    from spair_pytorch_tpu.utils.logging import MetricWriter
    w = MetricWriter(str(tmp_path), use_tensorboard=False)
    rng = np.random.RandomState(0)
    w.latent_stats(7, rng.rand(2, 4, 3, 3), rng.rand(2, 1, 3, 3),
                   rng.rand(2, 1, 3, 3) * 4)
    w.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert any("z_presence/mean" in r for r in rows)
    assert any("z_depth/max" in r for r in rows)


def test_memory_report_runs():
    from spair_pytorch_tpu.utils.memory import (device_memory_stats,
                                                live_array_report)
    assert isinstance(device_memory_stats(), dict)
    assert "total live" in live_array_report()
