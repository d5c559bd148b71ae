"""Device mesh construction and sharding rules.

The reference is strictly single-device (train.py:24-30 only toggles
CPU/one-GPU; no torch.distributed anywhere — SURVEY.md section 2 #29/#30).
Parallelism here is designed TPU-first, not ported:

  * axis 'data'  — batch sharding (data parallel over ICI, e.g. v5e-8).
    Gradients are reduced by XLA-inserted collectives: the loss is computed
    on sharded batches and jit + NamedSharding makes psum placement
    automatic.
  * axis 'model' — optional object/cell-axis sharding for the render and
    glimpse paths (the 121-object axis is embarrassingly parallel up to the
    final importance normalization, which XLA lowers to an all-reduce over
    ICI).

Collectives ride ICI within a slice; nothing here ever touches DCN for the
benchmark configs. TP/PP across layers is documented as out of scope: the
model is ~1M params — there is nothing to pipeline (SURVEY.md section 5).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'model') mesh; defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def batch_spec() -> P:
    return P("data")


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with the leading axis sharded over 'data'."""
    return jax.tree_util.tree_map(
        lambda t: jax.device_put(
            t, NamedSharding(mesh, P(*(("data",) + (None,) * (t.ndim - 1))))),
        batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params / opt state) over the mesh."""
    return jax.tree_util.tree_map(
        lambda t: jax.device_put(t, NamedSharding(mesh, P())), tree)
