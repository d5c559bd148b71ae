"""Interleaved A/B/A/B: external-batch step vs fused-datagen step, blocks
alternating within one process, so tunnel-latency windows hit both arms."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from spair_pytorch_tpu.config import paper_config
from spair_pytorch_tpu.data import DataConfig, glyph_bank
from spair_pytorch_tpu.data.scattered_mnist import generate_batch
from spair_pytorch_tpu.parallel import create_train_state, make_train_step

cfg = paper_config(batch_size=32, inference_mode="wavefront",
                   compute_dtype="bfloat16")
bank = jnp.asarray(glyph_bank((14, 14)))
dcfg = DataConfig(image_hw=cfg.image_shape[1:], max_objects=6)

step_ext = make_train_step(cfg)
step_fused = make_train_step(cfg, datagen=(dcfg, bank))
s_ext = create_train_state(cfg)
s_fus = create_train_state(cfg, seed=1)
key = jax.random.PRNGKey(0)


def batch(i):
    return generate_batch(jax.random.fold_in(key, i), bank,
                          cfg.batch_size, dcfg)[0]


# warm both compiles
for i in range(3):
    s_ext, m1 = step_ext(s_ext, batch(i))
    s_fus, m2 = step_fused(s_fus)
jax.block_until_ready((m1, m2))

k = 100
for rnd in range(12):
    time.sleep(45)
    t0 = time.perf_counter()
    for _ in range(30):
        s_ext, m1 = step_ext(s_ext, batch(k)); k += 1
    jax.block_until_ready(m1)
    dt_e = (time.perf_counter() - t0) / 30

    t0 = time.perf_counter()
    for _ in range(30):
        s_fus, m2 = step_fused(s_fus)
    jax.block_until_ready(m2)
    dt_f = (time.perf_counter() - t0) / 30
    print(f"round {rnd}: external {dt_e*1e3:7.2f} ms | "
          f"fused {dt_f*1e3:7.2f} ms", flush=True)
