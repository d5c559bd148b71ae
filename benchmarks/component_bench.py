"""Component-level delta-timed bench: where do the step's ~14 ms go?

Each component is wrapped in a K-iteration lax.scan (one dispatch), the
final value is device_get-forced, and per-iteration time is
(time(3 calls) - time(1 call)) / 2K — the same artifact-proof protocol as
bench.py. Components are chained through a carry so XLA can't dead-code or
overlap them across iterations.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from spair_pytorch_tpu.config import paper_config
from spair_pytorch_tpu.data import DataConfig, glyph_bank
from spair_pytorch_tpu.data.scattered_mnist import _generate_one
from spair_pytorch_tpu.models import forward, geometry, init_params
from spair_pytorch_tpu.models.render import decode_objects, render
from spair_pytorch_tpu.ops.backbone import apply_backbone
from spair_pytorch_tpu.ops.stn import crop_glimpses


def delta_time(make_scan_fn, k, trials=2):
    """make_scan_fn(length) -> jitted fn(carry) -> carry; returns s/iter."""
    fn = make_scan_fn(k)
    carry = fn()  # first call compiles and returns the carry
    jax.device_get(jax.tree_util.tree_leaves(carry)[0].ravel()[0])

    def run(ncalls):
        t0 = time.perf_counter()
        for _ in range(ncalls):
            c = fn()
        jax.device_get(jax.tree_util.tree_leaves(c)[0].ravel()[0])
        return time.perf_counter() - t0

    best = float("inf")
    for t in range(trials):
        if t:
            time.sleep(2)
        t1 = run(1)
        t3 = run(3)
        best = min(best, (t3 - t1) / (2 * k))
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--k", type=int, default=30)
    args = p.parse_args()
    b, k = args.batch, args.k

    cfg = paper_config(batch_size=b, inference_mode="wavefront",
                       compute_dtype="bfloat16")
    bank = jnp.asarray(glyph_bank((14, 14)))
    dcfg = DataConfig(image_hw=cfg.image_shape[1:], max_objects=6)
    params = init_params(jax.random.PRNGKey(0), cfg)
    geom = geometry(cfg)
    pads, (gh, gw), _ = geom
    n = gh * gw
    key = jax.random.PRNGKey(1)
    keys = jax.random.split(key, b)
    x0, _, _ = jax.vmap(lambda kk: _generate_one(kk, bank, dcfg))(keys)
    x0 = jnp.asarray(x0)
    dtype = jnp.bfloat16

    rows = []

    def bench(name, body, init_carry):
        def make(length):
            @jax.jit
            def fn(c=init_carry):
                def step(c, _):
                    return body(c), ()
                c, _ = jax.lax.scan(step, c, None, length=length)
                return c
            return fn
        dt = delta_time(make, k)
        rows.append((name, dt))
        print(f"{name:36s} {dt * 1e6:9.0f} us/iter", flush=True)

    # 1. datagen (vmap of per-scene scan with dynamic_update_slice placement)
    def datagen_body(c):
        kk = jax.random.fold_in(key, c[0].astype(jnp.int32))
        ks = jax.random.split(kk, b)
        xx, _, _ = jax.vmap(lambda q: _generate_one(q, bank, dcfg))(ks)
        return (c[0] + 1.0 + xx.mean() * 0.0, )
    bench("datagen", datagen_body, (jnp.zeros(()),))

    # 2. backbone conv stack (bf16)
    def backbone_body(c):
        f = apply_backbone(params["backbone"], c, cfg.backbone_topology,
                           pads, dtype)
        return c * 0.999 + f.mean() * 1e-6
    bench("backbone fwd", backbone_body, x0)

    # 3. crop_glimpses for all N cells
    boxes0 = jnp.tile(jnp.asarray([0.5, 0.5, 0.3, 0.3], jnp.float32),
                      (b, n, 1))
    def crop_body(c):
        g = crop_glimpses(x0, c, cfg.object_shape, dtype)
        return c * 0.999 + g.mean() * 1e-6
    bench("crop_glimpses (121 objects)", crop_body, boxes0)

    # 4. decode + render fwd (XLA compositor)
    z_attr0 = jnp.zeros((b, gh, gw, cfg.n_attributes)) + 0.1
    z_where0 = jnp.tile(jnp.asarray([0.5, 0.5, 0.3, 0.3]), (b, gh, gw, 1))
    z_depth0 = jnp.full((b, gh, gw, 1), 2.0)
    z_pres0 = jnp.full((b, gh, gw, 1), 0.7)

    def render_body(c):
        r = render(params, cfg, c, z_where0, z_depth0, z_pres0,
                   cfg.image_shape[1:], dtype)
        return c * 0.999 + r.mean() * 1e-6
    bench("render fwd (decode+composite)", render_body, z_attr0)

    # 5. full forward (loss only)
    def fwd_body(c):
        loss, _ = forward(params, cfg, c, 2000, jax.random.PRNGKey(0))
        return c * 0.999 + loss * 1e-9
    bench("full forward", fwd_body, x0)

    # 6. full forward+backward (grads wrt params, discarded into carry)
    def fwdbwd_body(c):
        def loss_fn(p):
            loss, _ = forward(p, cfg, c, 2000, jax.random.PRNGKey(0))
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(params)
        gsum = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return c * 0.999 + (loss + gsum) * 1e-12
    bench("full forward+backward", fwdbwd_body, x0)

    print("\nsummary:")
    for name, dt in rows:
        print(f"  {name:36s} {dt * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
