"""Sharding-constraint plumbing for intra-model (cell/object) parallelism.

The SPAIR grid has a second embarrassingly parallel axis besides the batch:
the N = grid_h * grid_w cells/objects. In independent-inference mode every
head, the glimpse crop, and the object decode are batched over (B, N, ...),
so sharding N over a 'model' mesh axis splits those matmuls across chips;
XLA/GSPMD inserts the collectives (the composite's sum over objects becomes
an all-reduce over 'model' riding ICI).

The model code stays mesh-agnostic: ``constrain(x, *spec)`` is a no-op
unless a mesh with a >1 'model' axis has been installed by the train-step
builder (parallel/train_step.py). This keeps ``forward`` a pure function
usable on a single chip, under pure DP, or under (data, model) sharding
without signature changes.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_MESH: Optional[Mesh] = None


def set_constraint_mesh(mesh: Optional[Mesh]):
    """Install (or clear) the mesh used by ``constrain``. Call before
    tracing the step function; traced computations capture it."""
    global _MESH
    _MESH = mesh


def model_axis_active() -> bool:
    return _MESH is not None and _MESH.shape.get("model", 1) > 1


def model_axis_size() -> int:
    """Size of the active 'model' axis (1 when no mesh is installed) —
    lets callers gate lane/cell constraints on divisibility."""
    return _MESH.shape.get("model", 1) if _MESH is not None else 1


def constrain(x, *spec):
    """with_sharding_constraint(x, P(*spec)) when a model axis is active."""
    if not model_axis_active():
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_MESH, P(*spec)))
