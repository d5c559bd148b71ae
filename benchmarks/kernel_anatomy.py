"""Attribute the Pallas compositor's forward cost: weight builds vs
matmuls vs windowed accumulates.

Round-3 context: two optimization attempts (v3 object-chunk batching, E1
bf16 accumulates) were built on *guessed* bottlenecks and moved nothing.
This measures instead. Variants of the v2 forward kernel, delta-timed on
hardware at paper shapes (b32, n=121, 128x128, win=64, bf16 operands):

  base      the shipped kernel
  hoisted   per-object interpolation weights (py, pxt) precomputed OUTSIDE
            the kernel (vectorized over b*n) and streamed in; y0 is
            recomputed in-kernel from boxes (scalar math). Mathematically
            identical to base -- this is the candidate optimization.
  nobuild   py/pxt replaced by constants hoisted out of the object loop
            (wrong result, DCE-safe): deletes build cost, keeps matmuls +
            accumulates. base - nobuild = build share.
  nomatmul  the 5 per-plane matmuls replaced by a broadcast of one t
            column (wrong result): nobuild - nomatmul ~ plane-matmul
            share (the t matmul itself stays).
  noaccum   windowed accumulates shrunk to an 8-row static-offset store
            (wrong result): remaining delta ~ accumulate share.

Run AFTER any other TPU job finishes: python benchmarks/kernel_anatomy.py
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spair_pytorch_tpu.ops.pallas.composite import (
    _EPS, _col_coords, _pack, _row_coords, _window_start, composite_pallas)


def _kernel(boxes_ref, g_ref, num_ref, den_ref, *, n, c, oh, ow, ih, iw,
            win, mm, variant, py_ref=None, pxt_ref=None):
    nc = c + 2
    num_ref[...] = jnp.zeros(num_ref.shape, jnp.float32)
    den_ref[...] = jnp.full(den_ref.shape, n * _EPS, jnp.float32)

    # loop-invariant stand-ins for the ablation variants (cannot be DCE'd
    # into the loop; wrong math, right shapes/dtypes)
    const_py = _row_coords(jnp.int32(0), win, ih, 0.5, 0.2, oh)[1].astype(mm)
    const_pxt = _col_coords(iw, 0.5, 0.2, ow)[1].astype(mm)

    def body(o, _):
        xt, yt = boxes_ref[o, 0], boxes_ref[o, 1]
        xs, ys = boxes_ref[o, 2], boxes_ref[o, 3]
        y0 = _window_start(yt, ys, ih, win, oh)
        if variant == "hoisted":
            py_mm = py_ref[0, o]
            pxt_mm = pxt_ref[0, o]
        elif variant == "base":
            py_mm = _row_coords(y0, win, ih, yt, ys, oh)[1].astype(mm)
            pxt_mm = _col_coords(iw, xt, xs, ow)[1].astype(mm)
        else:
            py_mm, pxt_mm = const_py, const_pxt
        g = g_ref[0, o]
        t = jnp.dot(py_mm, g, preferred_element_type=jnp.float32)
        if variant == "nomatmul":
            planes = [jnp.broadcast_to(
                t[:, k * ow:k * ow + 1].astype(jnp.float32), (win, iw))
                for k in range(nc)]
        else:
            planes = [jnp.dot(t[:, k * ow:(k + 1) * ow].astype(mm), pxt_mm,
                              preferred_element_type=jnp.float32)
                      for k in range(nc)]
        alp, imp = planes[c], planes[c + 1]
        impe = imp + _EPS
        if variant == "noaccum":
            for k in range(c):
                num_ref[0, k, 0:8, :] += (alp * planes[k] * impe)[:8]
            den_ref[0, 0, 0:8, :] += imp[:8]
        else:
            for k in range(c):
                num_ref[0, k, pl.ds(y0, win), :] += alp * planes[k] * impe
            den_ref[0, 0, pl.ds(y0, win), :] += imp
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def run_variant(variant, color, alpha, imp, boxes, image_hw, win, k):
    b, n, c, oh, ow = color.shape
    ih, iw = image_hw
    mm = jnp.bfloat16
    g = _pack(color, alpha, imp).astype(mm)

    operands = [boxes.astype(jnp.float32), g]
    in_specs = [
        pl.BlockSpec((None, n, 4), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, n, oh, (c + 2) * ow), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if variant == "hoisted":
        # vectorized weight build over (b, n): same formulas as the
        # in-kernel _row/_col_coords
        xt, yt = boxes[..., 0], boxes[..., 1]
        xs, ys = boxes[..., 2], boxes[..., 3]
        kk = 1.0 + 2.0 / (oh - 1)
        lo = jnp.floor((yt - ys * (kk * 0.5)) * (ih - 1)).astype(jnp.int32)
        y0 = jnp.clip((lo // 8) * 8, 0, ih - win)                  # (b, n)
        r = jnp.arange(win, dtype=jnp.float32)
        u = 2.0 * (y0[..., None].astype(jnp.float32) + r) / (ih - 1) - 1.0
        src = ((u - (2.0 * yt[..., None] - 1.0)) / ys[..., None] + 1.0) \
            * (oh - 1) / 2.0                                       # (b,n,win)
        a = jnp.arange(oh, dtype=jnp.float32)
        py = jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - a))  # b,n,win,oh
        x = jnp.arange(iw, dtype=jnp.float32)
        ux = 2.0 * x / (iw - 1) - 1.0
        srcx = ((ux - (2.0 * xt[..., None] - 1.0)) / xs[..., None] + 1.0) \
            * (ow - 1) / 2.0                                       # (b,n,iw)
        ax = jnp.arange(ow, dtype=jnp.float32)
        pxt = jnp.maximum(
            0.0, 1.0 - jnp.abs(srcx[..., None, :] - ax[..., None]))
        operands += [py.astype(mm), pxt.astype(mm)]
        in_specs += [
            pl.BlockSpec((1, n, win, oh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, ow, iw), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    kern = functools.partial(_kernel, n=n, c=c, oh=oh, ow=ow, ih=ih, iw=iw,
                             win=win, mm=mm, variant=variant)
    if variant != "hoisted":
        def kern2(b_, g_, nu, de):
            return kern(b_, g_, nu, de)
    else:
        def kern2(b_, g_, py_, pxt_, nu, de):
            return kern(b_, g_, nu, de, py_ref=py_, pxt_ref=pxt_)

    def call(ops):
        return pl.pallas_call(
            kern2,
            grid=(b,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, c, ih, iw), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ih, iw), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, c, ih, iw), jnp.float32),
                jax.ShapeDtypeStruct((b, 1, ih, iw), jnp.float32),
            ],
        )(*ops)

    def scan_fn(carry):
        def body(cv, _):
            num, den = call([operands[0] + cv * 1e-12] + operands[1:])
            return cv * 0.999 + num.mean() * 1e-9 + den.mean() * 1e-9, ()
        return jax.lax.scan(body, carry, None, length=k)[0]

    jitted = jax.jit(scan_fn)
    c0 = jnp.float32(0.0)
    jax.device_get(jitted(c0))

    def run(ncalls):
        t0 = time.perf_counter()
        cv = c0
        for _ in range(ncalls):
            cv = jitted(cv)
        jax.device_get(cv)
        return time.perf_counter() - t0

    best = float("inf")
    for t in range(3):
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
    from spair_pytorch_tpu.config import paper_config
    from spair_pytorch_tpu.models.render import paste_window_rows
    from spair_pytorch_tpu.ops.backbone import grid_geometry

    cfg = paper_config(batch_size=args.batch, compute_dtype="bfloat16")
    image_hw = cfg.image_shape[1:]
    _, (gh, gw), _ = grid_geometry(image_hw, cfg.backbone_topology)
    n = gh * gw
    b, c = args.batch, cfg.image_shape[0]
    oh, ow = cfg.object_shape
    win = paste_window_rows(cfg, image_hw)
    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    color = jax.random.uniform(ks[0], (b, n, c, oh, ow))
    alpha = jax.random.uniform(ks[1], (b, n, 1, oh, ow))
    imp = jax.random.uniform(ks[2], (b, n, 1, oh, ow), minval=0.01)
    xt_yt = jax.random.uniform(ks[3], (b, n, 2), minval=0.05, maxval=0.95)
    xs_ys = jax.random.uniform(ks[4], (b, n, 2), minval=0.05,
                               maxval=cfg.anchor_shape[0] / image_hw[0])
    boxes = jnp.concatenate([xt_yt, xs_ys], -1)

    # parity: hoisted must match base bitwise-ish (same formulas)
    for name in ("base", "hoisted", "nobuild", "nomatmul", "noaccum"):
        dt = run_variant(name, color, alpha, imp, boxes, image_hw, win,
                         args.k)
        print(f"{name:9s} fwd {dt * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
