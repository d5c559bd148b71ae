"""Subprocess worker for the REAL multi-process distributed test.

Run as:  python tests/multiproc_worker.py <pid> <nproc> <port> <outdir>

Each process owns 2 virtual CPU devices (XLA_FLAGS), joins a
``jax.distributed`` cluster via the Gloo CPU collectives backend, and:

  1. generates its process-local slice of a global scattered-digits batch
     (data/sharded.py contract: example content keyed by GLOBAL index);
  2. assembles the global batch with ``jax.make_array_from_process_local_data``
     and runs ONE data-parallel train step over the full mesh;
  3. writes its local slice + the (replicated) loss and post-step param
     L2 norm to ``<outdir>/proc<pid>.npz``.

tests/test_parallel.py launches this with nproc=2 and nproc=1 and asserts
the generated stream and the training math are process-count-invariant —
the claim sharded.py makes (sharded.py:11-18) that single-process tests
alone cannot establish.
"""

import os
import sys


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    # sitecustomize pins the axon TPU platform via env; override in-process
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from spair_pytorch_tpu.config import SpairConfig
    from spair_pytorch_tpu.data import DataConfig, glyph_bank
    from spair_pytorch_tpu.data.sharded import (generate_host_local,
                                                sharded_scattered_batch)
    from spair_pytorch_tpu.parallel import (create_train_state,
                                            make_train_step, replicate)

    cfg = SpairConfig(image_shape=(1, 48, 48), batch_size=8,
                      object_shape=(14, 14), anchor_shape=(24, 24),
                      n_attributes=8, mlp_hidden=(32, 32),
                      encoder_hidden=(32,), decoder_hidden=(32,),
                      n_backbone_features=16, n_passthrough_features=16,
                      render_chunk=8, inference_mode="independent")
    dcfg = DataConfig(image_hw=(48, 48), patch_hw=(10, 10), max_objects=3)
    bank = jnp.asarray(glyph_bank((10, 10)))
    key = jax.random.PRNGKey(1234)

    mesh = Mesh(np.array(jax.devices()), ("data",))

    # (1) the process-local slice, saved for the stream-invariance check
    local = generate_host_local(key, bank, dcfg, cfg.batch_size,
                                nproc, pid)
    local_np = jax.tree_util.tree_map(np.asarray, local)

    # (2) one DP train step on the assembled global batch
    batch = sharded_scattered_batch(key, bank, dcfg, cfg.batch_size, mesh)
    state = create_train_state(cfg)  # deterministic seed -> identical
    state = replicate(mesh, state)
    step = make_train_step(cfg, mesh)
    state, metrics = step(state, batch[0])

    pnorm = jax.jit(
        lambda p: jnp.sqrt(sum(jnp.sum(x ** 2)
                               for x in jax.tree_util.tree_leaves(p))),
        out_shardings=NamedSharding(mesh, P()))(state.params)

    np.savez(os.path.join(outdir, f"proc{pid}.npz"),
             images=local_np[0], bbox=local_np[1], count=local_np[2],
             loss=np.asarray(jax.device_get(metrics["losses/total"]),
                             np.float64),
             pnorm=np.asarray(jax.device_get(pnorm), np.float64))
    print(f"proc {pid}/{nproc} done", flush=True)


if __name__ == "__main__":
    main()
