"""Multi-host sharded data loading (SURVEY §5 comm-backend spec).

The reference loads a single HDF5 file on one host (reference
spair/dataloader.py:10-36 + torch DataLoader in train.py:38). On a
multi-host TPU pod, shipping the whole global batch from one host wastes
DCN bandwidth and serializes ingest; the TPU-native arrangement is
per-host generation: every process materializes ONLY the examples that
land on its addressable devices, and the global batch is assembled
zero-copy with ``jax.make_array_from_process_local_data``.

Determinism contract: example ``i`` of global step keyed by ``key`` is
``fold_in(key, i)`` — a pure function of the GLOBAL example index, so the
generated data is bit-identical no matter how many processes participate
(1-host and N-host runs train on the same stream; asserted in
tests/test_parallel.py).

Single-process meshes (tests, v5e-8) degrade gracefully: the "local"
slice is the whole batch and assembly is a plain device_put.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spair_pytorch_tpu.data.scattered_mnist import DataConfig, _generate_one

__all__ = ["host_slice", "generate_host_local", "sharded_scattered_batch"]


def host_slice(global_batch: int, num_processes: int,
               process_index: int) -> Tuple[int, int]:
    """[start, stop) of the global batch owned by ``process_index``.

    Contiguous equal slices, matching the device order of a mesh whose
    'data' axis enumerates devices in process order (jax.devices() sorts
    by process). The global batch must divide evenly — the same constraint
    jax.make_array_from_process_local_data imposes.
    """
    if global_batch % num_processes:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{num_processes} processes")
    per = global_batch // num_processes
    return process_index * per, (process_index + 1) * per


def generate_host_local(key, bank, dcfg: DataConfig, global_batch: int,
                        num_processes: int, process_index: int):
    """Generate THIS host's slice of the global batch.

    Every example's key is folded from its GLOBAL index, so the content of
    example i is independent of the process topology.
    """
    start, stop = host_slice(global_batch, num_processes, process_index)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(start, stop))
    return jax.vmap(lambda k: _generate_one(k, bank, dcfg))(keys)


def sharded_scattered_batch(key, bank, dcfg: DataConfig, global_batch: int,
                            mesh: Mesh):
    """One global (image, bbox, count) batch, data-axis-sharded over
    ``mesh``, with each process generating only its local examples."""
    num, idx = jax.process_count(), jax.process_index()
    local = generate_host_local(key, bank, dcfg, global_batch, num, idx)
    local = jax.tree_util.tree_map(np.asarray, local)

    def assemble(t):
        spec = P(*(("data",) + (None,) * (t.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        global_shape = (global_batch,) + t.shape[1:]
        return jax.make_array_from_process_local_data(sharding, t,
                                                      global_shape)

    return jax.tree_util.tree_map(assemble, local)
