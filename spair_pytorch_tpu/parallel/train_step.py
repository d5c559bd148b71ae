"""Jitted training/eval steps with optional data-parallel sharding.

TPU-native counterpart of the reference training loop body
(train.py:54-92): forward, backward, Adam(1e-4) — but as one compiled,
donated-buffer step. Under a mesh, the batch is sharded over 'data' and the
replicated-parameter gradient reduction is inserted by XLA (psum over ICI).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spair_pytorch_tpu.config import SpairConfig
from spair_pytorch_tpu.models import forward, init_params


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array


def create_train_state(cfg: SpairConfig, seed: Optional[int] = None) -> TrainState:
    key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
    pkey, rkey = jax.random.split(key)
    params = init_params(pkey, cfg)
    opt = optimizer(cfg)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt.init(params), rng=rkey)


def optimizer(cfg: SpairConfig):
    # Adam with torch defaults (reference train.py:44: lr=1e-4, betas
    # (0.9, 0.999), eps 1e-8).
    return optax.adam(cfg.learning_rate, b1=0.9, b2=0.999, eps=1e-8)


def make_train_step(cfg: SpairConfig, mesh: Optional[Mesh] = None,
                    donate: bool = True):
    """Returns step(state, batch) -> (state, metrics). ``batch`` is the
    (B, C, H, W) image tensor; labels are not consumed by the loss
    (metrics are host-side, like the reference train.py:76-82)."""
    opt = optimizer(cfg)

    def step_fn(state: TrainState, x):
        rng, sub = jax.random.split(state.rng)

        def loss_fn(params):
            loss, aux = forward(params, cfg, x, state.step, sub)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, rng=rng)
        metrics = dict(aux["losses"])
        metrics["training_wheel"] = aux["training_wheel"]
        return new_state, metrics

    from spair_pytorch_tpu.parallel.constraints import set_constraint_mesh
    set_constraint_mesh(mesh)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    replicated = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data", None, None, None))
    # State (params/opt/rng) is replicated; a single spec broadcasts over
    # the whole pytree.
    return jax.jit(step_fn,
                   in_shardings=(replicated, batch_sh),
                   out_shardings=(replicated, replicated),
                   donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: SpairConfig, mesh: Optional[Mesh] = None):
    """Returns eval(params, x, step, rng) -> (loss, aux)."""

    def eval_fn(params, x, step, rng):
        return forward(params, cfg, x, step, rng)

    if mesh is None:
        return jax.jit(eval_fn)
    replicated = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data", None, None, None))
    return jax.jit(eval_fn, in_shardings=(replicated, batch_sh, None, None))
