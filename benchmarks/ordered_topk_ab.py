"""Interleaved A/B: ordered-mode compositor full-scan vs top-K live.

Arms (all render_mode='ordered', synthetic post-count-prior sparsity —
LIVE of the n grid objects at z_pres 0.7, rest below the 0.01 gate):
  full        — no gate, n-object scan (the shipped cluttered recipe)
  gate        — gate on (mask only in ordered mode: no time saved, the
                control for "masking is free")
  topk<K>     — gate + render_topk=K (the cond's top-K branch)

Arms alternate inside ONE process across --rounds so tunnel latency
windows hit all of them (the round-2/3 measurement lesson). Delta-timed
K-fused scans, forced D2H.

    python benchmarks/ordered_topk_ab.py --preset cluttered_fine \
        --live 12 --topk 32 [--batch 32] [--rounds 3]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def delta_time(jitted, init, k):
    c = jitted(init)
    jax.device_get(jax.tree_util.tree_leaves(c)[0].ravel()[0])

    def run(ncalls):
        t0 = time.perf_counter()
        cc = init
        for _ in range(ncalls):
            cc = jitted(cc)
        jax.device_get(jax.tree_util.tree_leaves(cc)[0].ravel()[0])
        return time.perf_counter() - t0

    t1 = run(1)
    t3 = run(3)
    return (t3 - t1) / (2 * k)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="cluttered_fine")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--live", type=int, default=12)
    p.add_argument("--topk", type=int, default=32)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from spair_pytorch_tpu.config import PRESETS
    from spair_pytorch_tpu.models import geometry, init_params

    base = PRESETS[args.preset](batch_size=args.batch,
                                compute_dtype="bfloat16",
                                render_mode="ordered")
    b = args.batch
    params = init_params(jax.random.PRNGKey(0), base)
    _, (gh, gw), _ = geometry(base)
    n = gh * gw
    print(f"{args.preset}: {gh}x{gw} grid ({n} objects), b{b}, "
          f"{args.live} live, topk {args.topk}")

    rng = jax.random.PRNGKey(1)
    z_attr0 = jax.random.normal(rng, (b, gh, gw, base.n_attributes)) * 0.3
    ih = base.image_shape[1]
    cell = ih / gh
    hh = jnp.arange(gh, dtype=jnp.float32)[None, :, None]
    ww = jnp.arange(gw, dtype=jnp.float32)[None, None, :]
    cy = jax.random.uniform(rng, (b, gh, gw), minval=-0.4, maxval=1.4)
    cx = jax.random.uniform(jax.random.fold_in(rng, 1), (b, gh, gw),
                            minval=-0.4, maxval=1.4)
    sc = jax.random.uniform(jax.random.fold_in(rng, 2), (b, gh, gw, 2),
                            minval=0.1, maxval=0.3)
    z_where0 = jnp.stack([(ww + cx) * cell / ih, (hh + cy) * cell / ih,
                          sc[..., 0], sc[..., 1]], axis=-1)
    z_depth0 = jax.random.uniform(jax.random.fold_in(rng, 3),
                                  (b, gh, gw, 1), minval=0.5, maxval=3.5)
    flat_pres = jnp.full((b, n), 0.001)
    live_idx = jax.random.permutation(jax.random.PRNGKey(9), n)[:args.live]
    z_pres0 = flat_pres.at[:, live_idx].set(0.7).reshape(b, gh, gw, 1)
    hw = base.image_shape[1:]

    arms = {
        "full": base,
        "gate": dataclasses.replace(base, pres_gate_threshold=0.01),
        f"topk{args.topk}": dataclasses.replace(
            base, pres_gate_threshold=0.01, render_topk=args.topk),
    }

    from spair_pytorch_tpu.models.render import render

    def make_fwdbwd(cfg):
        def fwdbwd(c):
            def body(c, _):
                def loss(za, zw):
                    r = render(params, cfg, za, zw, z_depth0, z_pres0,
                               hw, jnp.bfloat16)
                    return jnp.sum(r * r)
                l, (ga, gw_) = jax.value_and_grad(loss, argnums=(0, 1))(
                    c, z_where0)
                return c * 0.999 + ga * 1e-6 + l * 1e-9 + \
                    gw_.mean() * 1e-9, ()
            return jax.lax.scan(body, c, None, length=args.k)[0]
        return fwdbwd

    # value parity across arms before timing
    outs = {name: render(params, cfg, z_attr0, z_where0, z_depth0,
                         z_pres0, hw, jnp.bfloat16)
            for name, cfg in arms.items()}
    ref = np.asarray(outs["full"], np.float32)
    for name, o in outs.items():
        err = float(np.abs(np.asarray(o, np.float32) - ref).max())
        print(f"  parity vs full: {name:8s} max|err| {err:.2e}")
        assert err < 2e-2, name  # bf16 compute; gated alphas <= 0.01

    # jit once per arm (outside the rounds loop — a fresh closure per round
    # would miss jax's function-identity jit cache and recompile every time)
    jitted = {name: jax.jit(make_fwdbwd(cfg)) for name, cfg in arms.items()}
    results = {name: [] for name in arms}
    for r in range(args.rounds):
        for name in arms:  # interleaved
            dt = delta_time(jitted[name], z_attr0, args.k)
            results[name].append(dt * 1e3)
    print(f"\nrender fwd+bwd ms (K={args.k} fused, delta-timed, "
          f"{args.rounds} interleaved rounds):")
    for name, vals in results.items():
        print(f"  {name:8s} median {np.median(vals):7.2f}  "
              f"rounds {[f'{v:.2f}' for v in vals]}")


if __name__ == "__main__":
    main()
