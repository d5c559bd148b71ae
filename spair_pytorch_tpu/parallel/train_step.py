"""Jitted training/eval steps with optional data-parallel sharding.

TPU-native counterpart of the reference training loop body
(train.py:54-92): forward, backward, Adam(1e-4) — but as one compiled,
donated-buffer step. Under a mesh, the batch is sharded over 'data' and the
replicated-parameter gradient reduction is inserted by XLA (psum over ICI).
"""

from __future__ import annotations

import dataclasses
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
    # (0.9, 0.999), eps 1e-8); optional global-norm clipping in front
    # (cfg.grad_clip_norm > 0) to survive the loss explosions that crash
    # the unclipped reference.
    adam = optax.adam(cfg.learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    if cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                           adam)
    return adam


def make_train_step(cfg: SpairConfig, mesh: Optional[Mesh] = None,
                    donate: bool = True, with_detection: bool = False,
                    datagen=None, steps_per_call: int = 1):
    """Returns step(state, batch) -> (state, metrics).

    ``batch`` is the (B, C, H, W) image tensor, or the full
    (x, gt_bbox, gt_count) tuple when ``with_detection`` — detection
    metrics are then computed from the training forward's own latents,
    exactly like the reference evaluates on the training batch
    (train.py:77-81), at negligible extra cost and zero extra dispatches.

    ``datagen``: optional (DataConfig, bank) pair — the step then takes NO
    batch argument and generates its scene on device from the step RNG
    (BASELINE config 5), collapsing the whole iteration into one dispatch.

    ``steps_per_call``: with ``datagen``, fold K consecutive steps into ONE
    dispatch via ``lax.scan`` over the step body. Bit-identical to K
    sequential calls (the state chain is the scan carry; each iteration
    splits the carried RNG exactly as a separate call would), and metrics
    come back stacked with a leading (K,) axis, so per-step logging is
    preserved. The win is dispatch amortization: the tunneled TPU link's
    per-dispatch latency (up to ~15 ms in degraded windows) is paid once
    per K steps instead of per step.
    """
    opt = optimizer(cfg)

    def core(state: TrainState, x, gt_bbox=None, gt_count=None):
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
        # presence-count diagnostics for the long-horizon loss-explosion
        # analysis: the count-prior's sequential normalizer clamp
        # (models/kl.py, reference models.py:238) binds only when the
        # rounded presence count far exceeds the annealed prior's support,
        # so batch count extremes localize when/where that regime starts.
        counts = jnp.sum(jnp.round(aux["z_pres"]), axis=(1, 2, 3))
        metrics["debug/pres_count_max"] = jnp.max(counts)
        metrics["debug/pres_count_mean"] = jnp.mean(counts)
        metrics["debug/grad_global_norm"] = optax.global_norm(grads)
        from spair_pytorch_tpu.utils.debug import grad_norms_by_head
        metrics.update(grad_norms_by_head(grads))
        if gt_bbox is not None:
            from spair_pytorch_tpu import metrics as metric
            img_size = cfg.image_shape[-1]
            metrics["accuracy/bbox_average_precision"] = metric.mAP(
                aux["z_where"], aux["z_pres"], gt_bbox, gt_count, img_size)
            metrics["accuracy/object_count_accuracy"] = (
                metric.object_count_error(aux["z_pres"], gt_count))
            metrics["accuracy/count_exact"] = metric.count_accuracy(
                aux["z_pres"], gt_count)
            metrics["accuracy/bbox_ap_center"] = metric.mAP_center(
                aux["z_where"], aux["z_pres"], gt_bbox, gt_count, img_size)
        return new_state, metrics

    if datagen is not None:
        from spair_pytorch_tpu.data.scattered_mnist import _generate_one
        dcfg, bank = datagen

        def one_step(state: TrainState):
            rng, sub = jax.random.split(state.rng, 2)
            keys = jax.random.split(jax.random.fold_in(sub, 1),
                                    cfg.batch_size)
            x, gt_bbox, gt_count = jax.vmap(
                lambda k: _generate_one(k, bank, dcfg))(keys)
            state = TrainState(step=state.step, params=state.params,
                               opt_state=state.opt_state, rng=rng)
            return core(state, x, gt_bbox, gt_count)

        if steps_per_call > 1:
            def step_fn(state: TrainState):
                return jax.lax.scan(lambda s, _: one_step(s), state,
                                    None, length=steps_per_call)
        else:
            step_fn = one_step
    elif with_detection:
        def step_fn(state: TrainState, batch):
            x, gt_bbox, gt_count = batch
            return core(state, x, gt_bbox, gt_count)
    else:
        def step_fn(state: TrainState, x):
            return core(state, x)

    from spair_pytorch_tpu.parallel.constraints import set_constraint_mesh

    inner_step = step_fn

    def step_fn(*args):
        # Bind the sharding-constraint mesh AT TRACE TIME (jit traces this
        # wrapper on first call), so interleaved construction of steps for
        # different meshes can't cross-contaminate the traced constraints.
        set_constraint_mesh(mesh)
        return inner_step(*args)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    replicated = NamedSharding(mesh, P())
    # State (params/opt/rng) is replicated; a single spec broadcasts over
    # the whole pytree. Batch leaves shard their leading axis over 'data'.
    if datagen is not None:
        in_sh = (replicated,)
    else:
        def leaf_sh(ndim):
            return NamedSharding(mesh, P(*(("data",) + (None,) * (ndim - 1))))
        if with_detection:
            in_sh = (replicated, (leaf_sh(4), leaf_sh(3), leaf_sh(2)))
        else:
            in_sh = (replicated, leaf_sh(4))
    return jax.jit(step_fn,
                   in_shardings=in_sh,
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
