"""Renderer-analysis figures (host-side, matplotlib).

TPU-native counterpart of reference ``debug_tools.plot_prerender_components``
/ ``plot_cropped_input_images`` (debug_tools.py:53-195): the pre-render
component heatmaps (presence, depth), predicted-box overlays, cropped
glimpse grids, and the input|reconstruction pair the reference writes to
TensorBoard every 50 steps. Pure host code operating on numpy arrays pulled
from the aux pytree — the model stays free of logging (inverting the
reference's model-owns-the-writer design, models.py:16-19).
"""

from __future__ import annotations

import numpy as np


def _require_plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def render_analysis_figure(x, recon, z_where, z_pres, z_depth, batch_idx=0):
    """The reference's renderer-analysis panel (debug_tools.py:53-104):
    input, reconstruction, bbox overlay, presence and depth heatmaps.

    x, recon: (B, C, H, W); z_where: (B, 4, gh, gw) normalized
    [xt, yt, xs, ys] (centers); z_pres, z_depth: (B, 1, gh, gw).
    Returns a matplotlib Figure.
    """
    plt = _require_plt()
    x, recon = np.asarray(x), np.asarray(recon)
    z_where = np.asarray(z_where)
    z_pres, z_depth = np.asarray(z_pres), np.asarray(z_depth)
    b = batch_idx
    h, w = x.shape[-2:]

    fig, axes = plt.subplots(1, 5, figsize=(16, 3.5))
    axes[0].imshow(x[b, 0], cmap="gray", vmin=0, vmax=1)
    axes[0].set_title("input")
    axes[1].imshow(recon[b, 0], cmap="gray", vmin=0, vmax=1)
    axes[1].set_title("reconstruction")

    axes[2].imshow(x[b, 0], cmap="gray", vmin=0, vmax=1)
    gh, gw = z_where.shape[-2:]
    for gy in range(gh):
        for gx in range(gw):
            if z_pres[b, 0, gy, gx] < 0.5:
                continue
            xt, yt, xs, ys = z_where[b, :, gy, gx]
            # (xt, yt) is the box CENTER (reference models.py:373-376;
            # the overlay subtracts half-extent like debug_tools.py:188-190)
            x0, y0 = (xt - xs / 2) * w, (yt - ys / 2) * h
            rect = plt.Rectangle((x0, y0), xs * w, ys * h, fill=False,
                                 edgecolor="lime", linewidth=1)
            axes[2].add_patch(rect)
    axes[2].set_title("predicted boxes (pres>0.5)")

    im3 = axes[3].imshow(z_pres[b, 0], vmin=0, vmax=1, cmap="viridis")
    axes[3].set_title("z_pres")
    fig.colorbar(im3, ax=axes[3], fraction=0.046)
    im4 = axes[4].imshow(z_depth[b, 0], vmin=0, vmax=4, cmap="magma")
    axes[4].set_title("z_depth")
    fig.colorbar(im4, ax=axes[4], fraction=0.046)
    for ax in axes:
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    return fig


def glimpse_grid_figure(glimpses, batch_idx=0, max_cols=11):
    """Grid of cropped input glimpses for one image (the reference's
    plot_cropped_input_images, debug_tools.py:107-139).
    glimpses: (B, N, C, oh, ow)."""
    plt = _require_plt()
    g = np.asarray(glimpses)[batch_idx]
    n = g.shape[0]
    cols = min(max_cols, n)
    rows = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(cols, rows))
    axes = np.atleast_2d(axes)
    for i in range(rows * cols):
        ax = axes[i // cols, i % cols]
        if i < n:
            ax.imshow(g[i, 0], cmap="gray", vmin=0, vmax=1)
        ax.axis("off")
    fig.tight_layout(pad=0.1)
    return fig
