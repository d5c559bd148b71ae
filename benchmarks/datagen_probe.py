"""Isolate the fused-datagen slowdown: time (a) generate_batch jitted alone,
(b) train step with external batch, (c) fused datagen+step in one jit."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from spair_pytorch_tpu.config import paper_config
from spair_pytorch_tpu.data import DataConfig, glyph_bank
from spair_pytorch_tpu.data.scattered_mnist import _generate_one, generate_batch
from spair_pytorch_tpu.models import forward
from spair_pytorch_tpu.parallel import create_train_state
from spair_pytorch_tpu.parallel.train_step import TrainState, optimizer

cfg = paper_config(batch_size=32, inference_mode="wavefront",
                   compute_dtype="bfloat16")
bank = jnp.asarray(glyph_bank((14, 14)))
dcfg = DataConfig(image_hw=cfg.image_shape[1:], max_objects=6)
opt = optimizer(cfg)


def bench(name, step, state):
    state, m = step(state)
    state, m = step(state)
    jax.block_until_ready(m)
    best = float("inf")
    for b in range(3):
        if b:
            time.sleep(2)
        t0 = time.perf_counter()
        s = state
        for _ in range(10):
            s, m = step(s)
        jax.block_until_ready(m)
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"{name:34s} {best * 1e3:8.2f} ms/step", flush=True)


# (a) datagen alone, chained through the key
@jax.jit
def gen_step(key):
    x, bb, ct = generate_batch(key, bank, cfg.batch_size, dcfg)
    return jax.random.fold_in(key, 1), x.sum() + bb.sum() + ct.sum()


bench("datagen alone", gen_step, jax.random.PRNGKey(0))


def train_core(state, x):
    def loss_fn(p):
        loss, aux = forward(p, cfg, x, state.step, state.rng)
        return loss
    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(step=state.step + 1, params=params,
                      opt_state=opt_state,
                      rng=jax.random.fold_in(state.rng, 0)), loss


# (b) step with a fixed external batch
x0, _, _ = generate_batch(jax.random.PRNGKey(1), bank, cfg.batch_size, dcfg)
x0 = jax.block_until_ready(x0)
step_ext = jax.jit(lambda s: train_core(s, x0))
bench("step, external fixed batch", step_ext, create_train_state(cfg))


# (c) fused datagen + step in ONE jit
@jax.jit
def step_fused(state):
    keys = jax.random.split(jax.random.fold_in(state.rng, 1),
                            cfg.batch_size)
    x, _, _ = jax.vmap(lambda kk: _generate_one(kk, bank, dcfg))(keys)
    return train_core(state, x)


bench("fused datagen + step", step_fused, create_train_state(cfg))
