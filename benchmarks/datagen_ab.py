"""A/B the three scattered-digit sources: native C++ (host), jitted
on-device generator, and (for context) the HDF5 build path's producer.

Closes NEXT.md "native pipeline" item with measured numbers. The on-device
arm runs on whatever backend JAX resolves (TPU under axon; pass nothing on
CPU test boxes). Delta-timed like every other benchmark here: the
on-device arm folds K batches into one lax.scan dispatch with a forced
D2H; the host arms are plain wall-clock (no tunnel to lie to us).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--k", type=int, default=50)
    p.add_argument("--image", type=int, default=128)
    p.add_argument("--skip-device", action="store_true")
    args = p.parse_args()

    from spair_pytorch_tpu.data import DataConfig, glyph_bank
    from spair_pytorch_tpu.data.native import NativeScatteredDigits

    dcfg = DataConfig(image_hw=(args.image, args.image), max_objects=6)
    bank = glyph_bank(dcfg.patch_hw)
    b, k = args.batch, args.k

    # --- native C++ (host) ---
    for threads in sorted({1, os.cpu_count() or 1}):
        it = NativeScatteredDigits(dcfg, b, bank=bank, n_threads=threads)
        next(it)  # warm (also builds the .so on first use)
        t0 = time.perf_counter()
        for _ in range(k):
            next(it)
        dt = (time.perf_counter() - t0) / k
        print(f"native C++ ({threads} thr)   {dt * 1e3:8.3f} ms/batch "
              f"{b / dt:10.0f} img/s", flush=True)

    # (build_hdf5 feeds from the same native generator, so it has no
    # separate producer arm to time.)

    if args.skip_device:
        return

    # --- jitted on-device generator ---
    import jax
    import jax.numpy as jnp
    from spair_pytorch_tpu.data.scattered_mnist import generate_batch

    jbank = jnp.asarray(bank)

    def gen_k(key):
        def body(c, _):
            img = generate_batch(c, jbank, b, dcfg)[0]
            return jax.random.fold_in(c, 1), img.mean()
        _, means = jax.lax.scan(body, key, None, length=k)
        return means[-1]

    jitted = jax.jit(gen_k)
    key = jax.random.PRNGKey(0)
    jax.device_get(jitted(key))
    t1 = time.perf_counter()
    jax.device_get(jitted(key))
    t1 = time.perf_counter() - t1
    t3 = time.perf_counter()
    for _ in range(3):
        jax.device_get(jitted(key))
    t3 = time.perf_counter() - t3
    dt = (t3 - t1) / (2 * k)
    print(f"on-device jitted ({jax.default_backend()})  "
          f"{dt * 1e3:8.3f} ms/batch {b / dt:10.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
