"""Honest A/B: XLA chunk-scan compositor vs Pallas v2 kernel, fwd and
fwd+bwd, paper-config shapes (b32, 121 objects, 128x128). Delta-timed.

--gate LIVE: presence-gated arm — LIVE of the 121 objects get z_pres 0.7,
the rest 0.001 (below the 0.01 gate threshold), matching the post-count-
prior sparsity of real training (1-12 live objects). Measures how much of
the compositor's per-object serial floor the pl.when skip recovers."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from spair_pytorch_tpu.config import paper_config
from spair_pytorch_tpu.models import geometry, init_params
from spair_pytorch_tpu.models.render import render, paste_window_rows


def delta_time(fn, init, k, trials=3):
    jitted = jax.jit(fn)
    c = jitted(init)
    jax.device_get(jax.tree_util.tree_leaves(c)[0].ravel()[0])

    def run(ncalls, c):
        t0 = time.perf_counter()
        for _ in range(ncalls):
            c = jitted(c)
        jax.device_get(jax.tree_util.tree_leaves(c)[0].ravel()[0])
        return time.perf_counter() - t0, c

    best = float("inf")
    for t in range(trials):
        if t:
            time.sleep(2)
        t1, c = run(1, init)
        t3, c = run(3, init)
        best = min(best, (t3 - t1) / (2 * k))
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--k", type=int, default=30)
    p.add_argument("--gate", type=int, default=0, metavar="LIVE",
                   help="presence-gated arm: LIVE objects at z_pres 0.7, "
                        "rest at 0.001 with pres_gate_threshold=0.01")
    p.add_argument("--backends", default=None,
                   help="comma list (default: xla,pallas,pallas_v3)")
    args = p.parse_args()
    b, k = args.batch, args.k

    backends = (args.backends.split(",") if args.backends
                else ("xla", "pallas", "pallas_v3"))
    for backend in backends:
        cfg = paper_config(batch_size=b, compute_dtype="bfloat16",
                           render_backend=backend,
                           pres_gate_threshold=0.01 if args.gate else 0.0)
        params = init_params(jax.random.PRNGKey(0), cfg)
        _, (gh, gw), _ = geometry(cfg)
        rng = jax.random.PRNGKey(1)
        z_attr0 = jax.random.normal(rng, (b, gh, gw, cfg.n_attributes)) * 0.3
        # cell-anchored boxes (the model's parameterization): required for
        # a fair A/B with pallas_v3, whose static row bands assume it.
        ih = cfg.image_shape[1]
        cell = ih / gh
        hh = jnp.arange(gh, dtype=jnp.float32)[None, :, None]
        ww = jnp.arange(gw, dtype=jnp.float32)[None, None, :]
        cy = jax.random.uniform(rng, (b, gh, gw), minval=-0.4, maxval=1.4)
        cx = jax.random.uniform(jax.random.fold_in(rng, 1), (b, gh, gw),
                                minval=-0.4, maxval=1.4)
        sc = jax.random.uniform(jax.random.fold_in(rng, 2), (b, gh, gw, 2),
                                minval=0.1, maxval=0.3)
        z_where0 = jnp.stack([(ww + cx) * cell / ih,
                              (hh + cy) * cell / ih,
                              sc[..., 0], sc[..., 1]], axis=-1)
        z_depth0 = jnp.full((b, gh, gw, 1), 2.0)
        if args.gate:
            # LIVE objects per image at 0.7, the rest just below the gate
            flat_pres = jnp.full((b, gh * gw), 0.001)
            live_idx = jax.random.permutation(
                jax.random.PRNGKey(9), gh * gw)[:args.gate]
            flat_pres = flat_pres.at[:, live_idx].set(0.7)
            z_pres0 = flat_pres.reshape(b, gh, gw, 1)
        else:
            z_pres0 = jnp.full((b, gh, gw, 1), 0.7)
        hw = cfg.image_shape[1:]
        if backend == "pallas":
            print(f"  (window rows: {paste_window_rows(cfg, hw)})")

        def fwd_scan(c):
            def body(c, _):
                r = render(params, cfg, c, z_where0, z_depth0, z_pres0,
                           hw, jnp.bfloat16)
                return c * 0.999 + r.mean() * 1e-6, ()
            return jax.lax.scan(body, c, None, length=k)[0]

        dt = delta_time(fwd_scan, z_attr0, k)
        print(f"{backend:7s} render fwd       {dt * 1e3:7.2f} ms", flush=True)

        def fwdbwd_scan(c):
            def body(c, _):
                def loss(za, zw):
                    r = render(params, cfg, za, zw, z_depth0, z_pres0,
                               hw, jnp.bfloat16)
                    return jnp.sum(r * r)
                l, (ga, gw_) = jax.value_and_grad(loss, argnums=(0, 1))(
                    c, z_where0)
                return c * 0.999 + ga * 1e-6 + l * 1e-9 + \
                    gw_.mean() * 1e-9, ()
            return jax.lax.scan(body, c, None, length=k)[0]

        dt = delta_time(fwdbwd_scan, z_attr0, k)
        print(f"{backend:7s} render fwd+bwd   {dt * 1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
