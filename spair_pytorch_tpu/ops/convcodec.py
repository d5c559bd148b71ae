"""Convolutional object encoder/decoder (the reference's broken sketch, made
functional).

The reference contains ``ObjectConvEncoder`` / ``ObjectConvDecoder``
(models.py:606-665) with a dedicated topology (config.py:15-20), but both
are dead code that cannot run: the encoder calls an undefined
``self.linear`` with a hardcoded wrong input size, and the decoder calls
``list.reverse()`` for its topology (returns None) and misuses
``OrderedDict.pop``. This module implements what they sketch, working:

  * encoder: strided conv stack over the glimpse -> flatten -> linear to
    2*n_attributes (posterior mean/log-std), replacing the MLP
    ``object_encoder`` when cfg.object_codec == 'conv'.
  * decoder: linear from z_what to the encoder's final spatial shape, then
    transposed convs mirroring the topology back to (oh, ow, C+1) logits,
    replacing the MLP ``object_decoder``.

Convs are NHWC/HWIO (MXU-native), torch-default init like the rest of the
framework. Output spatial shapes are computed in closed form so arbitrary
object sizes work (the reference hardcoded 28x28-era numbers).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from spair_pytorch_tpu.ops.backbone import uniform_fan_in

# (filters, kernel, stride) — reference config.py:15-20
CONV_CODEC_TOPOLOGY: Tuple[Tuple[int, int, int], ...] = (
    (32, 4, 2),
    (32, 3, 2),
    (32, 3, 2),
    (32, 1, 1),
)


def _conv_out(size: int, k: int, s: int) -> int:
    return (size - k) // s + 1


def effective_topology(object_hw, topology=CONV_CODEC_TOPOLOGY):
    """Truncate layers that would shrink the feature map below 1x1 (the
    reference hardcoded 28x28-era sizes; smaller glimpses need fewer
    downsampling stages)."""
    h, w = object_hw
    out = []
    for (f, k, s) in topology:
        nh, nw = _conv_out(h, k, s), _conv_out(w, k, s)
        if nh < 1 or nw < 1:
            break
        out.append((f, k, s))
        h, w = nh, nw
    return tuple(out)


def codec_shapes(object_hw, topology=None):
    """Spatial shapes after each (effective) encoder conv (VALID padding)."""
    topology = effective_topology(object_hw) if topology is None         else effective_topology(object_hw, topology)
    shapes = [tuple(object_hw)]
    h, w = object_hw
    for (_, k, s) in topology:
        h, w = _conv_out(h, k, s), _conv_out(w, k, s)
        shapes.append((h, w))
    return shapes


def init_conv_encoder(key, in_channels: int, n_out: int, object_hw,
                      topology=CONV_CODEC_TOPOLOGY):
    topology = effective_topology(object_hw, topology)
    layers = []
    c_prev = in_channels
    for (f, k, _) in topology:
        key, wk, bk = jax.random.split(key, 3)
        fan_in = c_prev * k * k
        layers.append({"w": uniform_fan_in(wk, (k, k, c_prev, f), fan_in),
                       "b": uniform_fan_in(bk, (f,), fan_in)})
        c_prev = f
    h, w = codec_shapes(object_hw, topology)[-1]
    flat = c_prev * h * w
    key, wk, bk = jax.random.split(key, 3)
    out = {"w": uniform_fan_in(wk, (flat, n_out), flat),
           "b": uniform_fan_in(bk, (n_out,), flat)}
    return {"convs": layers, "out": out}


def apply_conv_encoder(params, glimpses, topology=CONV_CODEC_TOPOLOGY,
                       dtype=None):
    """glimpses (..., C, oh, ow) -> (..., n_out)."""
    lead = glimpses.shape[:-3]
    c, oh, ow = glimpses.shape[-3:]
    topology = effective_topology((oh, ow), topology)
    x = glimpses.reshape((-1, c, oh, ow)).transpose(0, 2, 3, 1)  # NHWC
    if dtype is not None:
        x = x.astype(dtype)
    for layer, (_, _, s) in zip(params["convs"], topology):
        w, b = layer["w"], layer["b"]
        if dtype is not None:
            w, b = w.astype(dtype), b.astype(dtype)
        x = jax.lax.conv_general_dilated(
            x, w, (s, s), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        x = jax.nn.relu(x + b)
    x = x.reshape(x.shape[0], -1)
    w, b = params["out"]["w"], params["out"]["b"]
    if dtype is not None:
        w, b = w.astype(dtype), b.astype(dtype)
    out = jnp.dot(x, w, preferred_element_type=x.dtype) + b
    return out.reshape(lead + (out.shape[-1],)).astype(jnp.float32)


def init_conv_decoder(key, n_in: int, out_channels: int, object_hw,
                      topology=CONV_CODEC_TOPOLOGY):
    """Mirror of the encoder: linear to the smallest feature map, then
    transposed convs back up; final transposed conv emits out_channels."""
    topology = effective_topology(object_hw, topology)
    shapes = codec_shapes(object_hw, topology)
    c_small = topology[-1][0]
    h, w = shapes[-1]
    key, wk, bk = jax.random.split(key, 3)
    inp = {"w": uniform_fan_in(wk, (n_in, c_small * h * w), n_in),
           "b": uniform_fan_in(bk, (c_small * h * w,), n_in)}
    layers = []
    rev = list(reversed(topology))
    c_prev = c_small
    for i, (f, k, s) in enumerate(rev):
        # output channels of this up-layer: next (shallower) layer's
        # filters, or the image channels at the end
        c_out = rev[i + 1][0] if i + 1 < len(rev) else out_channels
        key, wk, bk = jax.random.split(key, 3)
        fan_in = c_prev * k * k
        layers.append({"w": uniform_fan_in(wk, (k, k, c_prev, c_out), fan_in),
                       "b": uniform_fan_in(bk, (c_out,), fan_in)})
        c_prev = c_out
    return {"inp": inp, "deconvs": layers}


def apply_conv_decoder(params, z, object_hw, topology=CONV_CODEC_TOPOLOGY,
                       dtype=None):
    """z (..., n_in) -> logits (..., oh, ow, out_channels)."""
    topology = effective_topology(object_hw, topology)
    lead = z.shape[:-1]
    x = z.reshape(-1, z.shape[-1])
    if dtype is not None:
        x = x.astype(dtype)
    w, b = params["inp"]["w"], params["inp"]["b"]
    if dtype is not None:
        w, b = w.astype(dtype), b.astype(dtype)
    x = jax.nn.relu(jnp.dot(x, w, preferred_element_type=x.dtype) + b)
    shapes = codec_shapes(object_hw, topology)
    h, w_sp = shapes[-1]
    c_small = topology[-1][0]
    x = x.reshape(-1, h, w_sp, c_small)
    n_layers = len(params["deconvs"])
    target_shapes = list(reversed(shapes[:-1]))  # spatial outputs per layer
    rev = list(reversed(topology))
    for i, layer in enumerate(params["deconvs"]):
        _, k, s = rev[i]
        wgt, b = layer["w"], layer["b"]
        if dtype is not None:
            wgt, b = wgt.astype(dtype), b.astype(dtype)
        x = jax.lax.conv_transpose(
            x, wgt, (s, s), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + b
        # VALID conv_transpose yields (in-1)*s + k, which mismatches the
        # encoder's input size whenever the strided conv floor-divided
        # (e.g. 13 -> 5 -> back to 11... pad) or overshot; pad/crop to the
        # mirrored spatial target.
        th, tw = target_shapes[i]
        ph, pw = max(0, th - x.shape[1]), max(0, tw - x.shape[2])
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = x[:, :th, :tw, :]
        if i < n_layers - 1:
            x = jax.nn.relu(x)
    oh, ow = object_hw
    return x.reshape(lead + (oh, ow, x.shape[-1])).astype(jnp.float32)
