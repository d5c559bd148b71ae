"""MLP factory with shared trunk and multiple output heads.

TPU-native counterpart of reference ``spair/modules.py:124-165``
(``build_MLP`` / ``SequentialMultipleOutput``): hidden layers with ReLU, then
either a single linear head or several linear heads off the shared trunk
(the reference uses two-head MLPs for the box and depth networks to produce
latent params plus passthrough features, models.py:145,156).

Plain pytree params + pure apply functions: trivially composable with
vmap/scan/pjit, and the per-cell networks batch over (B * active_cells) rows
as a single matmul per layer.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from spair_pytorch_tpu.ops.backbone import uniform_fan_in


def _init_linear(key, n_in: int, n_out: int):
    wk, bk = jax.random.split(key)
    return {"w": uniform_fan_in(wk, (n_in, n_out), n_in),
            "b": uniform_fan_in(bk, (n_out,), n_in)}


def init_mlp(key, n_in: int, hidden: Sequence[int], heads: Sequence[int]):
    """Params for trunk ``hidden`` + one linear head per entry of ``heads``."""
    layers = []
    n_prev = n_in
    for h in hidden:
        key, sub = jax.random.split(key)
        layers.append(_init_linear(sub, n_prev, h))
        n_prev = h
    head_params = []
    for out in heads:
        key, sub = jax.random.split(key)
        head_params.append(_init_linear(sub, n_prev, out))
    return {"trunk": layers, "heads": head_params}


def apply_mlp(params, x, dtype=None, packed=True):
    """x: (..., n_in) -> tuple of head outputs (..., head_dim).

    Multi-head output layers run as ONE packed GEMM (head weight/bias
    columns concatenated, output split back): each output column is the
    same contraction either way (identical values up to backend GEMM
    blocking, i.e. f32 reassociation noise) while the op count drops.
    The concatenations are loop-invariant (params don't vary across
    fronts), so XLA's while-loop LICM hoists them out of the scan.
    MEASURED EFFECT: none — the interleaved A/B (benchmarks/RESULTS.md
    "wavefront-scan levers", remat_ab.py arm 'nopack') reads packed at
    8.47-8.64 ms/step vs per-head 8.40-8.48 at b32 wavefront; XLA's
    fusion already hides the tiny per-head matmuls, so this is a
    neutral op-count simplification, not a perf lever.

    ``packed`` is an explicit, trace-time argument (model call sites pass
    ``cfg.packed_heads``, a jit-static frozen-dataclass field) so the A/B
    toggle participates in jit cache keys instead of living in a module
    global that a compiled function would silently ignore.

    Layers carrying int8 weights (``ops/quant.quantize_params_int8``)
    dispatch to the int8 MXU path; mixing quantized and float layers in
    one tree is allowed (serving-only feature). Quantized heads fall back
    to the per-head path.

    Dense outputs carry ``checkpoint_name`` tags ('mlp_dense') so the
    scan's 'names' remat policy (config.scan_remat_policy) can save
    exactly these small activations while recomputing everything else;
    the tags are identity ops under any other policy."""
    if dtype is not None:
        x = x.astype(dtype)

    def dense(layer, v):
        if "w_q" in layer:
            from spair_pytorch_tpu.ops.quant import dense_int8
            out = dense_int8(layer, v)
            return out.astype(dtype) if dtype is not None else out
        w, b = layer["w"], layer["b"]
        if dtype is not None:
            w, b = w.astype(dtype), b.astype(dtype)
        return jnp.dot(v, w, preferred_element_type=v.dtype) + b

    for layer in params["trunk"]:
        x = jax.nn.relu(checkpoint_name(dense(layer, x), "mlp_dense"))
    heads = params["heads"]
    if packed and len(heads) > 1 and not any("w_q" in h for h in heads):
        packed = {"w": jnp.concatenate([h["w"] for h in heads], axis=-1),
                  "b": jnp.concatenate([h["b"] for h in heads], axis=-1)}
        widths = [h["w"].shape[-1] for h in heads]
        out = checkpoint_name(dense(packed, x), "mlp_dense")
        outs = tuple(jnp.split(out, np.cumsum(widths)[:-1], axis=-1))
    else:
        outs = tuple(checkpoint_name(dense(head, x), "mlp_dense")
                     for head in heads)
    if dtype is not None:
        # matmuls run in the compute dtype (bf16 on the MXU); head outputs
        # are promoted back to f32 so downstream latent math stays precise.
        outs = tuple(o.astype(jnp.float32) for o in outs)
    return outs


def apply_mlp1(params, x, dtype=None):
    """Single-head convenience wrapper."""
    return apply_mlp(params, x, dtype)[0]
