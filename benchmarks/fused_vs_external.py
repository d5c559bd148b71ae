"""One-process A/B: make_train_step with external batches vs fused datagen.

Both paths run 50-step blocks back to back, so tunnel-latency windows can't
masquerade as a code difference."""

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

# --- external-batch step (round-1 bench arrangement) ---
step_ext = make_train_step(cfg)
state = create_train_state(cfg)
key = jax.random.PRNGKey(0)


def batch(i):
    return generate_batch(jax.random.fold_in(key, i), bank,
                          cfg.batch_size, dcfg)[0]


for i in range(3):
    state, m = step_ext(state, batch(i))
jax.block_until_ready(m)
for blk in range(3):
    t0 = time.perf_counter()
    for i in range(50):
        state, m = step_ext(state, batch(100 + blk * 50 + i))
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / 50
    print(f"external-batch step   {dt * 1e3:8.2f} ms/step "
          f"({32 / dt:7.0f} img/s)", flush=True)

# --- fused datagen step (round-2 bench arrangement) ---
step_fused = make_train_step(cfg, datagen=(dcfg, bank))
state2 = create_train_state(cfg)
for _ in range(3):
    state2, m2 = step_fused(state2)
jax.block_until_ready(m2)
for blk in range(3):
    t0 = time.perf_counter()
    for _ in range(50):
        state2, m2 = step_fused(state2)
    jax.block_until_ready(m2)
    dt = (time.perf_counter() - t0) / 50
    print(f"fused-datagen step    {dt * 1e3:8.2f} ms/step "
          f"({32 / dt:7.0f} img/s)", flush=True)

# --- fused datagen, NO detection metrics / grad norms (hand-built) ---
import optax
from spair_pytorch_tpu.data.scattered_mnist import _generate_one
from spair_pytorch_tpu.models import forward
from spair_pytorch_tpu.parallel.train_step import TrainState, optimizer

opt = optimizer(cfg)


@jax.jit
def step_fused_bare(state):
    rng, sub = jax.random.split(state.rng)
    keys = jax.random.split(jax.random.fold_in(sub, 1), cfg.batch_size)
    x, _, _ = jax.vmap(lambda k: _generate_one(k, bank, dcfg))(keys)

    def loss_fn(p):
        loss, aux = forward(p, cfg, x, state.step, sub)
        return loss
    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(step=state.step + 1, params=params,
                      opt_state=opt_state, rng=rng), loss


state3 = create_train_state(cfg)
for _ in range(3):
    state3, m3 = step_fused_bare(state3)
jax.block_until_ready(m3)
for blk in range(3):
    t0 = time.perf_counter()
    for _ in range(50):
        state3, m3 = step_fused_bare(state3)
    jax.block_until_ready(m3)
    dt = (time.perf_counter() - t0) / 50
    print(f"fused bare (no metrics) {dt * 1e3:6.2f} ms/step "
          f"({32 / dt:7.0f} img/s)", flush=True)

# --- external batch + detection metrics (with_detection=True) ---
step_det = make_train_step(cfg, with_detection=True)
state4 = create_train_state(cfg)


def full_batch(i):
    return generate_batch(jax.random.fold_in(key, 7000 + i), bank,
                          cfg.batch_size, dcfg)


for i in range(3):
    state4, m4 = step_det(state4, full_batch(i))
jax.block_until_ready(m4)
for blk in range(3):
    t0 = time.perf_counter()
    for i in range(50):
        state4, m4 = step_det(state4, full_batch(100 + blk * 50 + i))
    jax.block_until_ready(m4)
    dt = (time.perf_counter() - t0) / 50
    print(f"external + detection  {dt * 1e3:8.2f} ms/step "
          f"({32 / dt:7.0f} img/s)", flush=True)
