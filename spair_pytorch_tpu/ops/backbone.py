"""Conv backbone with receptive-field-aligned padding.

TPU-native counterpart of reference ``spair/modules.py:12-122``. The padding
arithmetic that aligns each output grid cell to a fixed input window
(modules.py:68-105) is reproduced as pure integer math executed at trace
time — no dummy forward pass is needed to infer shapes (the reference runs
one at construction, modules.py:32-41; here ``grid_geometry`` is closed-form
and ``jax.eval_shape`` would agree).

Convs run in NHWC with HWIO kernels — the layouts XLA:TPU tiles onto the MXU
without transposes. Parameter init follows torch's Conv2d/Linear default
(kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) for both weight and bias)
so parameter statistics are comparable with the reference at step 0.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def uniform_fan_in(key, shape, fan_in: int, dtype=jnp.float32):
    """torch default init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def grid_geometry(image_hw: Tuple[int, int],
                  topology: Sequence[Tuple[int, int, int]]):
    """Receptive-field padding and grid dimensions.

    Mirrors reference modules.py:68-105. Returns
    (pad_top, pad_bottom, pad_left, pad_right), (grid_h, grid_w),
    (cell_h, cell_w). For the reference topology on 128x128 this yields
    pads (9, 14, 9, 14), an 11x11 grid, and 12x12-pixel cells (verified in
    tests/test_backbone.py against SURVEY.md section 2)."""
    j = [1, 1]  # cumulative stride (translation) per axis
    r = [1, 1]  # receptive field size per axis
    for (_, k, s) in topology:
        r = [r[i] + (k - 1) * j[i] for i in range(2)]
        j = [j[i] * s for i in range(2)]
    cell = j
    pre = [int(math.floor(r[i] / 2 - cell[i] / 2)) for i in range(2)]
    n_cells = [int(math.ceil(image_hw[i] / cell[i])) for i in range(2)]
    required = [r[i] + (n_cells[i] - 1) * cell[i] for i in range(2)]
    post = [required[i] - image_hw[i] - pre[i] for i in range(2)]
    pads = (pre[0], post[0], pre[1], post[1])
    return pads, tuple(n_cells), tuple(cell)


def init_backbone(key, in_channels: int, n_out: int,
                  topology: Sequence[Tuple[int, int, int]]):
    """Conv stack params: topology layers with ReLU, then a 1x1 output conv
    (reference modules.py:43-66). Kernels are HWIO."""
    layers = []
    c_prev = in_channels
    for (f, k, _) in topology:
        key, wk, bk = jax.random.split(key, 3)
        fan_in = c_prev * k * k
        w = uniform_fan_in(wk, (k, k, c_prev, f), fan_in)
        b = uniform_fan_in(bk, (f,), fan_in)
        layers.append({"w": w, "b": b})
        c_prev = f
    key, wk, bk = jax.random.split(key, 3)
    layers.append({"w": uniform_fan_in(wk, (1, 1, c_prev, n_out), c_prev),
                   "b": uniform_fan_in(bk, (n_out,), c_prev)})
    return {"layers": layers}


def apply_backbone(params, x_nchw, topology, pads, dtype=None):
    """x: (B, C, H, W) -> features (B, grid_h, grid_w, n_out) in NHWC.

    Zero-pads (top, bottom, left, right) like the reference's ZeroPad2d
    (modules.py:105), then runs VALID strided convs with ReLU between and a
    linear 1x1 output conv (modules.py:107-111)."""
    pt, pb, pl, pr = pads
    x = jnp.transpose(x_nchw, (0, 2, 3, 1))  # NHWC
    if dtype is not None:
        x = x.astype(dtype)
    x = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    strides = [s for (_, _, s) in topology] + [1]
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        if "w_q" in layer:  # int8 serving path (ops/quant.py)
            from spair_pytorch_tpu.ops.quant import conv_int8
            x = conv_int8(layer, x.astype(jnp.float32), strides[i])
            if dtype is not None:
                x = x.astype(dtype)
        else:
            w, b = layer["w"], layer["b"]
            if dtype is not None:
                w, b = w.astype(dtype), b.astype(dtype)
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(strides[i], strides[i]),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=x.dtype)
            x = x + b
        if i < n - 1:  # no activation on the output conv
            x = jax.nn.relu(x)
    return x
