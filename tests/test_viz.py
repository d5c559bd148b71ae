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


def test_prerender_components_figure():
    from spair_pytorch_tpu.utils.viz import prerender_components_figure
    rng = np.random.RandomState(2)
    b, gh, gw, oh, ow = 2, 4, 4, 14, 14
    n = gh * gw
    fig = prerender_components_figure(
        color=rng.rand(b, n, 1, oh, ow),
        alpha=rng.rand(b, n, 1, oh, ow),
        importance=rng.rand(b, n, 1, oh, ow),
        z_where=rng.uniform(0.1, 0.6, (b, 4, gh, gw)),
        z_pres=rng.rand(b, 1, gh, gw),
        z_depth=rng.rand(b, 1, gh, gw) * 4,
        x=rng.rand(b, 1, 48, 48),
    )
    # 6 panels + colorbars for the 4 heatmaps
    assert len(fig.axes) >= 6
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_attr_stats_figure():
    from spair_pytorch_tpu.utils.viz import attr_stats_figure
    fig = attr_stats_figure(np.random.RandomState(3).rand(2, 8, 4, 4))
    assert len(fig.axes) >= 3
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_decoder_grad_figure():
    from spair_pytorch_tpu.utils.viz import decoder_grad_figure
    fig = decoder_grad_figure(
        np.random.RandomState(4).rand(1, 16, 2, 14, 14) * 1e-5, (4, 4))
    import matplotlib.pyplot as plt
    plt.close(fig)


def test_mosaic_layout():
    """Tile (gy, gx) must land at block-row gy, block-col gx — the
    reference's double-concatenate (debug_tools.py:60-62)."""
    from spair_pytorch_tpu.utils.viz import _mosaic
    tiles = np.zeros((2, 3, 4, 5))
    tiles[1, 2] = 7.0
    m = _mosaic(tiles)
    assert m.shape == (8, 15)
    assert (m[4:8, 10:15] == 7.0).all() and m.sum() == 7.0 * 20


def test_generative_grad_views_and_head_norms():
    import jax
    import jax.numpy as jnp
    from spair_pytorch_tpu.config import SpairConfig
    from spair_pytorch_tpu.models import forward, init_params
    from spair_pytorch_tpu.utils.debug import (generative_grad_views,
                                               grad_norms_by_head)
    cfg = SpairConfig(image_shape=(1, 48, 48), batch_size=2,
                      object_shape=(14, 14), anchor_shape=(24, 24),
                      n_attributes=8, mlp_hidden=(16,), encoder_hidden=(16,),
                      decoder_hidden=(16,), n_backbone_features=8,
                      n_passthrough_features=8, render_chunk=8,
                      inference_mode="independent")
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 48, 48))
    loss, aux = forward(params, cfg, x, 0, jax.random.PRNGKey(2))

    dec_grad, attr_grad = generative_grad_views(
        params, cfg, x, aux["z_attr"], aux["z_where"], aux["z_depth"],
        aux["z_pres"])
    gh, gw = aux["z_pres"].shape[-2:]
    assert dec_grad.shape == (2, gh * gw, 2, 14, 14)
    assert attr_grad.shape == (2, 8, gh, gw)
    assert bool(jnp.isfinite(dec_grad).all())
    assert bool(jnp.isfinite(attr_grad).all())
    assert float(jnp.abs(dec_grad).max()) > 0.0

    grads = jax.grad(lambda p: forward(p, cfg, x, 0,
                                       jax.random.PRNGKey(2))[0])(params)
    norms = grad_norms_by_head(grads)
    assert "grad_norm/backbone" in norms and "grad_norm/obj_net" in norms
    import numpy as onp
    manual = onp.sqrt(sum(
        float(jnp.sum(jnp.square(l)))
        for l in jax.tree_util.tree_leaves(grads["box_net"])))
    assert onp.isclose(float(norms["grad_norm/box_net"]), manual, rtol=1e-5)


def test_train_loop_writes_full_debug_surface(tmp_path, monkeypatch):
    """3-step driver run with figures every 2 steps: every reference debug
    tag (debug_tools.py:104,129,153,218,243) must appear on disk."""
    import spair_pytorch_tpu.utils.logging as slog
    monkeypatch.setattr(slog, "_try_tb_writer", lambda d: None)
    from spair_pytorch_tpu.config import SpairConfig
    from spair_pytorch_tpu.train import train
    cfg = SpairConfig(image_shape=(1, 48, 48), batch_size=2,
                      object_shape=(14, 14), anchor_shape=(24, 24),
                      n_attributes=8, mlp_hidden=(16,), encoder_hidden=(16,),
                      decoder_hidden=(16,), n_backbone_features=8,
                      n_passthrough_features=8, render_chunk=8,
                      inference_mode="independent")
    train(cfg, steps=3, logdir=str(tmp_path), checkpoint_every=0,
          log_figures_every=2, log_flush_every=1, verbose=False,
          digits="font")
    figs = {p.name for p in (tmp_path / "figures").iterdir()}
    for tag in ("renderer_analysis_2", "debug_cropped_input_images_2",
                "z_attr_heatmap_2", "grad_visualization_decoder_out_2",
                "grad_visualization_z_attr_2", "analysis_renderer_2"):
        assert any(f.startswith(tag) for f in figs), (tag, figs)
