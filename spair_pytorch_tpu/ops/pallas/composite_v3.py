"""Fused paste-and-composite TPU kernel, v3: object-chunk batched matmuls.

Same contract as composite.py (reference semantics models.py:515-537,
num/den form) but the per-object algebra of v2 — 4 small matmuls per
object, 3,872 serial iterations at b32 — is replaced by per-CHUNK
block-diagonal matmuls over K objects at once:

  * SPAIR's box parameterization confines every object to its grid row's
    STATIC canvas band: yt = cell*(h + cy)/ih with cy in [min_yx, max_yx]
    and ys <= max_hw*anchor/ih (reference models.py:322-381), so all
    objects of grid row h paste inside a fixed BAND-row window whose
    8-aligned start is a per-row constant (band_table). No dynamic
    windowing per object — chunks of K objects from the same row share
    one window.
  * Per chunk, the row-paste of all K objects is ONE matmul
    T = Y_bd (K*BAND, K*OP) @ G (K*OP, nc*OP): Y_bd is the block-diagonal
    stack of the K hat-weight matrices, built directly from iotas (the
    block structure is a mask term — no concatenation), G is the K
    objects' channel-packed glimpses stacked along rows. The column-paste
    per channel is one more matmul T_k_bd (K*BAND, K*OP) @ X (K*OP, iw),
    with T_k_bd an offset-0 lane replication of T_k masked to the
    diagonal blocks (the v2.3-proven Mosaic-clean pattern).
  * The backward is the same graph transposed: ~15 chunk-level matmuls
    replace v2's 3*nc+1 per-object ones, with the analytic hat-weight
    derivatives reduced per object block by masked row/column sums.

The trade: block-diagonal stacking wastes a factor ~K of MXU FLOPs, but
buys K-fold fewer, MXU-shaped (M>=256, K-dim 128) matmul issues — v2.0's
measured floor was issue-bound, not FLOP-bound (docs/DESIGN.md v2.3
post-mortem). bf16 operand mode (matching the model's compute dtype)
keeps the waste cheap; f32 accumulation throughout.

PRECONDITION: boxes must come from the model's parameterization (band
containment). render() only routes model-generated boxes here; the tests
generate band-respecting boxes. Out-of-band boxes would paste clipped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-9


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def band_geometry(image_hw, cell_h: int, min_cy: float, max_cy: float,
                  max_ys: float, oh: int, gh: int):
    """(BAND, starts[gh]) — static per-grid-row paste windows.

    Row h's objects have center yt in cell*(h+[min_cy, max_cy])/ih and
    half-support ys*k/2 with the hat overhang k = 1 + 2/(oh-1)
    (composite.py:_window_start derivation); the union over the row is a
    static interval. BAND = 8-aligned span + 8 slack for the 8-aligned
    start rounding; starts clamped into the canvas.
    """
    ih = image_hw[0]
    khat = 1.0 + 2.0 / (oh - 1)
    half = max_ys * khat * 0.5
    lo = [int(np.floor(((h + min_cy) * cell_h / ih - half) * (ih - 1))) - 1
          for h in range(gh)]
    hi = [int(np.ceil(((h + max_cy) * cell_h / ih + half) * (ih - 1))) + 1
          for h in range(gh)]
    span = max(h2 - l2 + 1 for l2, h2 in zip(lo, hi))
    band = min(_round_up(ih, 8), _round_up(span, 8) + 8)
    if band >= ih:
        return ih, np.zeros(gh, np.int32)
    starts = np.clip([(l2 // 8) * 8 for l2 in lo], 0, ih - band)
    return band, starts.astype(np.int32)


def _prec(mm):
    """Matmul precision: f32 operands get HIGHEST (true f32 multiplies —
    TPU's DEFAULT runs f32 dots as single-pass bf16 products, which costs
    ~1e-2 relative error in the box gradients' large reductions); bf16
    operands keep the native single-pass path."""
    import jax.lax as lax
    return (lax.Precision.HIGHEST if mm == jnp.float32
            else lax.Precision.DEFAULT)


def _hat(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def _row_select(vals_ref, base, count: int, rows: int, per: int, col=None):
    """(rows, 1) vector whose block j (of size ``per``) holds scalar
    vals_ref[base + j, col]; built by K predicated selects (no gather)."""
    rio = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // per
    out = jnp.zeros((rows, 1), jnp.float32)
    for j in range(count):
        v = vals_ref[base + j, col] if col is not None else vals_ref[base + j]
        out = jnp.where(rio == j, v, out)
    return out


def _build_y(boxes_ref, base, y0, *, k: int, band: int, op: int, oh: int,
             ih: int):
    """Block-diagonal row hat weights Y_bd (K*BAND, K*OP) + src (K*BAND, 1).

    Row r = j*BAND + rr -> canvas row y0+rr of object base+j; column
    a = j'*OP + aa -> glimpse row aa of object j'. Nonzero only j == j'
    and aa < oh (OP-padding columns are structurally zero)."""
    rows = k * band
    t = _row_select(boxes_ref, base, k, rows, band, 1)   # yt per row
    s = _row_select(boxes_ref, base, k, rows, band, 3)   # ys per row
    rr = (jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % band
          ).astype(jnp.float32)
    u = 2.0 * (y0.astype(jnp.float32) + rr) / (ih - 1) - 1.0
    src = ((u - (2.0 * t - 1.0)) / s + 1.0) * (oh - 1) / 2.0  # (rows, 1)
    cio = jax.lax.broadcasted_iota(jnp.int32, (rows, k * op), 1)
    aa = (cio % op).astype(jnp.float32)
    rj = jax.lax.broadcasted_iota(jnp.int32, (rows, k * op), 0) // band
    blockmask = (rj == cio // op) & (cio % op < oh)
    y = _hat(src - aa) * blockmask.astype(jnp.float32)
    return y, src, blockmask


def _build_x(boxes_ref, base, *, k: int, op: int, ow: int, iw: int):
    """Stacked column hat weights X (K*OP, iw) + src (K*OP, iw).

    Row r = j*OP + aa -> glimpse column aa of object base+j; column x is
    the canvas column. Rows with aa >= ow are structurally zero."""
    rows = k * op
    t = _row_select(boxes_ref, base, k, rows, op, 0)     # xt per row
    s = _row_select(boxes_ref, base, k, rows, op, 2)     # xs per row
    x = jax.lax.broadcasted_iota(jnp.int32, (rows, iw), 1).astype(
        jnp.float32)
    u = 2.0 * x / (iw - 1) - 1.0
    src = ((u - (2.0 * t - 1.0)) / s + 1.0) * (ow - 1) / 2.0  # (rows, iw)
    aa = (jax.lax.broadcasted_iota(jnp.int32, (rows, iw), 0) % op
          ).astype(jnp.float32)
    live = (jax.lax.broadcasted_iota(jnp.int32, (rows, iw), 0) % op) < ow
    xw = _hat(src - aa) * live.astype(jnp.float32)
    return xw, src, live


def _lane_tile(t, k: int):
    """(M, OP) -> (M, K*OP) by offset-0 lane replication."""
    return jnp.concatenate([t] * k, axis=1)


def _fwd_kernel(starts_ref, boxes_ref, g_ref, num_ref, den_ref, *,
                n_real: int, c: int, oh: int, ow: int, ih: int, iw: int,
                band: int, k: int, op: int, gw_pad: int, n_chunks: int,
                mm):
    nc = c + 2
    cpr = gw_pad // k  # chunks per grid row
    num_ref[...] = jnp.zeros(num_ref.shape, jnp.float32)
    den_ref[...] = jnp.full(den_ref.shape, n_real * _EPS, jnp.float32)

    def chunk(ci, _):
        h = ci // cpr
        base = h * gw_pad + (ci % cpr) * k
        y0 = starts_ref[h]
        y, _, _ = _build_y(boxes_ref, base, y0, k=k, band=band, op=op,
                           oh=oh, ih=ih)
        xw, _, _ = _build_x(boxes_ref, base, k=k, op=op, ow=ow, iw=iw)
        g = g_ref[0, pl.ds(base, k)].reshape(k * op, nc * op)
        t = jnp.dot(y.astype(mm), g.astype(mm),
                    preferred_element_type=jnp.float32,
                    precision=_prec(mm))  # (K*BAND, nc*OP)

        mask2 = ((jax.lax.broadcasted_iota(jnp.int32, (k * band, k * op), 0)
                  // band) ==
                 (jax.lax.broadcasted_iota(jnp.int32, (k * band, k * op), 1)
                  // op)).astype(jnp.float32)
        xw_mm = xw.astype(mm)
        planes = []
        for kk in range(nc):
            t_k = t[:, kk * op:(kk + 1) * op]
            t_bd = _lane_tile(t_k, k) * mask2
            planes.append(jnp.dot(t_bd.astype(mm), xw_mm,
                                  preferred_element_type=jnp.float32,
                                  precision=_prec(mm)))

        alp, imp = planes[c], planes[c + 1]
        num_acc = [jnp.zeros((band, iw), jnp.float32) for _ in range(c)]
        den_acc = jnp.zeros((band, iw), jnp.float32)
        for j in range(k):
            rows = slice(j * band, (j + 1) * band)
            alp_j, imp_j = alp[rows], imp[rows]
            impe = imp_j + _EPS
            for ch in range(c):
                num_acc[ch] += alp_j * planes[ch][rows] * impe
            den_acc += imp_j
        for ch in range(c):
            num_ref[0, ch, pl.ds(y0, band), :] += num_acc[ch]
        den_ref[0, 0, pl.ds(y0, band), :] += den_acc
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk, 0)


def _bwd_kernel(starts_ref, boxes_ref, g_ref, dnum_ref, dden_ref,
                dg_ref, dbox_ref, *, n_real: int, c: int, oh: int, ow: int,
                ih: int, iw: int, band: int, k: int, op: int, gw_pad: int,
                n_chunks: int, mm):
    nc = c + 2
    cpr = gw_pad // k

    def chunk(ci, _):
        h = ci // cpr
        base = h * gw_pad + (ci % cpr) * k
        y0 = starts_ref[h]
        y, src_y, ymask = _build_y(boxes_ref, base, y0, k=k, band=band,
                                   op=op, oh=oh, ih=ih)
        xw, src_x, xlive = _build_x(boxes_ref, base, k=k, op=op, ow=ow,
                                    iw=iw)
        g = g_ref[0, pl.ds(base, k)].reshape(k * op, nc * op)
        y_mm, xw_mm, g_mm = y.astype(mm), xw.astype(mm), g.astype(mm)
        t = jnp.dot(y_mm, g_mm, preferred_element_type=jnp.float32,
                    precision=_prec(mm))

        mask2 = ((jax.lax.broadcasted_iota(jnp.int32, (k * band, k * op), 0)
                  // band) ==
                 (jax.lax.broadcasted_iota(jnp.int32, (k * band, k * op), 1)
                  // op)).astype(jnp.float32)
        t_bds, planes = [], []
        for kk in range(nc):
            t_bd = _lane_tile(t[:, kk * op:(kk + 1) * op], k) * mask2
            t_bds.append(t_bd)
            planes.append(jnp.dot(t_bd.astype(mm), xw_mm,
                                  preferred_element_type=jnp.float32,
                                  precision=_prec(mm)))
        alp, imp = planes[c], planes[c + 1]

        # cotangent windows, tiled to each object's row block
        dnum_w = [_vstack_k(dnum_ref[0, ch, pl.ds(y0, band), :], k)
                  for ch in range(c)]
        dden_w = _vstack_k(dden_ref[0, 0, pl.ds(y0, band), :], k)
        impe = imp + _EPS
        dplanes = [dnum_w[ch] * alp * impe for ch in range(c)]
        dalp = sum(dnum_w[ch] * planes[ch] * impe for ch in range(c))
        dimp = sum(dnum_w[ch] * alp * planes[ch] for ch in range(c)) \
            + dden_w
        dplanes = dplanes + [dalp, dimp]

        # selection matrix U (K*OP, OP): U[r, cc] = (r % OP == cc) —
        # collapses the masked lane replication back to one block.
        u_sel = ((jax.lax.broadcasted_iota(jnp.int32, (k * op, op), 0) % op)
                 == jax.lax.broadcasted_iota(jnp.int32, (k * op, op), 1)
                 ).astype(mm)

        dt_ks = []
        dx = jnp.zeros((k * op, iw), jnp.float32)
        for kk in range(nc):
            dp_mm = dplanes[kk].astype(mm)
            # dT_k_bd = dP_k @ X^T (contract canvas columns)
            dt_bd = jax.lax.dot_general(
                dp_mm, xw_mm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec(mm))      # (K*BAND, K*OP)
            dt_ks.append(jnp.dot((dt_bd * mask2).astype(mm), u_sel,
                                 preferred_element_type=jnp.float32,
                                 precision=_prec(mm)))
            # dX += T_k_bd^T @ dP_k (contract stacked rows)
            dx += jax.lax.dot_general(
                t_bds[kk].astype(mm), dp_mm, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec(mm))      # (K*OP, iw)
        dt = jnp.concatenate(dt_ks, axis=1)              # (K*BAND, nc*OP)

        dt_mm = dt.astype(mm)
        # dG = Y^T @ dT (contract stacked canvas rows)
        dg_c = jax.lax.dot_general(
            y_mm, dt_mm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=_prec(mm))          # (K*OP, nc*OP)
        dg_ref[0, pl.ds(base, k)] = dg_c.reshape(k, op, nc * op).astype(
            dg_ref.dtype)
        # dY = dT @ G^T (contract glimpse lanes), masked to real blocks
        dy = jax.lax.dot_general(
            dt_mm, g_mm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
                precision=_prec(mm))          # (K*BAND, K*OP)
        ymaskf = ymask.astype(jnp.float32)
        dy = dy * ymaskf

        # analytic hat derivatives -> per-object box grads.
        # rows: w = relu(1 - |src - a|), dw/dsrc = -sign(src - a) on live
        aa_y = (jax.lax.broadcasted_iota(jnp.int32, (k * band, k * op), 1)
                % op).astype(jnp.float32)
        live_y = (y > 0.0).astype(jnp.float32)
        zy = dy * (-jnp.sign(src_y - aa_y)) * live_y
        zy_sum = jnp.sum(zy, axis=1, keepdims=True)          # (K*BAND, 1)
        zys_sum = jnp.sum(zy * (src_y - (oh - 1) * 0.5), axis=1,
                          keepdims=True)
        sel_y = ((jax.lax.broadcasted_iota(jnp.int32, (k * band, k), 0)
                  // band) ==
                 jax.lax.broadcasted_iota(jnp.int32, (k * band, k), 1)
                 ).astype(jnp.float32)
        hi = jax.lax.Precision.HIGHEST
        gy = jax.lax.dot_general(zy_sum, sel_y, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=hi)
        gys = jax.lax.dot_general(zys_sum, sel_y, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=hi)

        aa_x = (jax.lax.broadcasted_iota(jnp.int32, (k * op, iw), 0)
                % op).astype(jnp.float32)
        live_x = (xw > 0.0).astype(jnp.float32)
        zx = dx * (-jnp.sign(src_x - aa_x)) * live_x
        zx_sum = jnp.sum(zx, axis=1, keepdims=True)          # (K*OP, 1)
        zxs_sum = jnp.sum(zx * (src_x - (ow - 1) * 0.5), axis=1,
                          keepdims=True)
        sel_x = ((jax.lax.broadcasted_iota(jnp.int32, (k * op, k), 0)
                  // op) ==
                 jax.lax.broadcasted_iota(jnp.int32, (k * op, k), 1)
                 ).astype(jnp.float32)
        gx = jax.lax.dot_general(zx_sum, sel_x, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=hi)
        gxs = jax.lax.dot_general(zxs_sum, sel_x, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=hi)

        for j in range(k):
            ys_j = boxes_ref[base + j, 3]
            xs_j = boxes_ref[base + j, 2]
            dbox_ref[base + j, 0] = gx[0, j] * (-(ow - 1.0) / xs_j)
            dbox_ref[base + j, 1] = gy[0, j] * (-(oh - 1.0) / ys_j)
            dbox_ref[base + j, 2] = gxs[0, j] * (-1.0 / xs_j)
            dbox_ref[base + j, 3] = gys[0, j] * (-1.0 / ys_j)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk, 0)


def _vstack_k(t, k: int):
    """(BAND, iw) -> (K*BAND, iw) by offset-0 sublane replication."""
    return jnp.concatenate([t] * k, axis=0)


def _prepack(color, alpha, importance, boxes, gh: int, gw: int, k: int,
             op: int, cell_h: int, ih: int, mm):
    """Model-layout glimpses -> kernel layout.

    (B, N, c, oh, ow) x3 + (B, N, 4) ->
      g (B, n_pad, OP, nc*OP) channel-packed, OP-padded, row-grouped with
      gw padded to a multiple of K; boxes (B, n_pad, 4) f32 with band-safe
      cell-center boxes for the padding objects.
    """
    b, n, c, oh, ow = color.shape
    gw_pad = _round_up(gw, k)
    g = jnp.concatenate([color.astype(mm), alpha.astype(mm),
                         importance.astype(mm)], axis=2)  # (B,N,nc,oh,ow)
    g = jnp.moveaxis(g, 2, 3)                             # (B,N,oh,nc,ow)
    g = jnp.pad(g, ((0, 0), (0, 0), (0, op - oh), (0, 0), (0, op - ow)))
    g = g.reshape(b, n, op, (c + 2) * op)
    boxes = boxes.astype(jnp.float32)
    if gw_pad != gw:
        g = g.reshape(b, gh, gw, op, (c + 2) * op)
        g = jnp.pad(g, ((0, 0), (0, 0), (0, gw_pad - gw), (0, 0), (0, 0)))
        g = g.reshape(b, gh * gw_pad, op, (c + 2) * op)
        # pad boxes: band-safe cell-center box per grid row (zero glimpse)
        ytc = (jnp.arange(gh, dtype=jnp.float32) + 0.5) * cell_h / ih
        padbox = jnp.stack([jnp.full((gh,), 0.5), ytc,
                            jnp.full((gh,), 0.25), jnp.full((gh,), 0.25)],
                           axis=-1)                        # (gh, 4)
        padbox = jnp.broadcast_to(padbox[None, :, None, :],
                                  (b, gh, gw_pad - gw, 4))
        boxes = jnp.concatenate(
            [boxes.reshape(b, gh, gw, 4), padbox], axis=2
        ).reshape(b, gh * gw_pad, 4)
    return g, boxes, gw_pad


def _interpret():
    return jax.default_backend() == "cpu"


def composite_pallas_v3(color, alpha, importance, boxes, image_hw,
                        cell_h: int, grid_hw, box_bounds, chunk_k: int = 4):
    """Drop-in for composite_xla under the banding PRECONDITION (see
    module docstring): returns (num, den).

    cell_h / grid_hw / box_bounds (min_cy, max_cy, max_ys) describe the
    model's box parameterization (render.py derives them from cfg) and
    determine the static per-row bands.
    """
    return _v3_call(color, alpha, importance, boxes, image_hw, cell_h,
                    tuple(grid_hw), tuple(box_bounds), chunk_k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _v3_call(color, alpha, importance, boxes, image_hw, cell_h, grid_hw,
             box_bounds, chunk_k):
    num, den, _ = _v3_fwd_impl(color, alpha, importance, boxes, image_hw,
                               cell_h, grid_hw, box_bounds, chunk_k)
    return num, den


def _v3_geom(color, image_hw, cell_h, grid_hw, box_bounds, chunk_k):
    b, n, c, oh, ow = color.shape
    gh, gw = grid_hw
    min_cy, max_cy, max_ys = box_bounds
    op = _round_up(max(oh, ow), 8)
    band, starts = band_geometry(image_hw, cell_h, min_cy, max_cy, max_ys,
                                 oh, gh)
    k = max(1, min(chunk_k, gw))
    return b, n, c, oh, ow, gh, gw, op, band, starts, k


def _v3_fwd_impl(color, alpha, importance, boxes, image_hw, cell_h,
                 grid_hw, box_bounds, chunk_k):
    from spair_pytorch_tpu.ops.pallas.composite import _mm_dtype
    b, n, c, oh, ow, gh, gw, op, band, starts, k = _v3_geom(
        color, image_hw, cell_h, grid_hw, box_bounds, chunk_k)
    ih, iw = image_hw
    mm = _mm_dtype(color)
    g, boxes_p, gw_pad = _prepack(color, alpha, importance, boxes, gh, gw,
                                  k, op, cell_h, ih, mm)
    n_pad = gh * gw_pad
    n_chunks = n_pad // k
    nc = c + 2

    kernel = functools.partial(
        _fwd_kernel, n_real=n, c=c, oh=oh, ow=ow, ih=ih, iw=iw, band=band,
        k=k, op=op, gw_pad=gw_pad, n_chunks=n_chunks, mm=mm)
    num, den = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # starts (gh,)
            pl.BlockSpec((None, n_pad, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_pad, op, nc * op), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
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
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_chunks * (
                k * band * k * op * nc * op
                + nc * k * band * k * op * iw),
            bytes_accessed=4 * b * (n_pad * op * nc * op
                                    + (c + 3) * ih * iw),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(jnp.asarray(starts), boxes_p, g)
    return num, den, (g, boxes_p, gw_pad)


def _v3_fwd(color, alpha, importance, boxes, image_hw, cell_h, grid_hw,
            box_bounds, chunk_k):
    num, den, _ = _v3_fwd_impl(color, alpha, importance, boxes, image_hw,
                               cell_h, grid_hw, box_bounds, chunk_k)
    return (num, den), (color, alpha, importance, boxes)


def _v3_bwd(image_hw, cell_h, grid_hw, box_bounds, chunk_k, residuals,
            cotangents):
    color, alpha, importance, boxes = residuals
    dnum, dden = cotangents
    from spair_pytorch_tpu.ops.pallas.composite import _mm_dtype
    b, n, c, oh, ow, gh, gw, op, band, starts, k = _v3_geom(
        color, image_hw, cell_h, grid_hw, box_bounds, chunk_k)
    ih, iw = image_hw
    mm = _mm_dtype(color)
    g, boxes_p, gw_pad = _prepack(color, alpha, importance, boxes, gh, gw,
                                  k, op, cell_h, ih, mm)
    n_pad = gh * gw_pad
    n_chunks = n_pad // k
    nc = c + 2

    kernel = functools.partial(
        _bwd_kernel, n_real=n, c=c, oh=oh, ow=ow, ih=ih, iw=iw, band=band,
        k=k, op=op, gw_pad=gw_pad, n_chunks=n_chunks, mm=mm)
    dg, dbox = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, n_pad, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_pad, op, nc * op), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, ih, iw), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ih, iw), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n_pad, op, nc * op), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n_pad, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, op, nc * op), mm),
            jax.ShapeDtypeStruct((b, n_pad, 4), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * n_chunks * (
                k * band * k * op * nc * op
                + nc * k * band * k * op * iw),
            bytes_accessed=4 * b * (2 * n_pad * op * nc * op
                                    + (c + 3) * ih * iw),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(jnp.asarray(starts), boxes_p,
      g, dnum.astype(jnp.float32), dden.astype(jnp.float32))

    # unpack: (B, n_pad, OP, nc*OP) -> per-input (B, N, c, oh, ow)
    dg = dg.astype(jnp.float32).reshape(b, gh, gw_pad, op, nc, op)
    dg = dg[:, :, :gw].reshape(b, n, op, nc, op)
    dg = jnp.moveaxis(dg, 3, 2)[:, :, :, :oh, :ow]       # (B,N,nc,oh,ow)
    dcolor = dg[:, :, :c].astype(color.dtype)
    dalpha = dg[:, :, c:c + 1].astype(alpha.dtype)
    dimp = dg[:, :, c + 1:].astype(importance.dtype)
    dbox = dbox.reshape(b, gh, gw_pad, 4)[:, :, :gw].reshape(b, n, 4)
    return dcolor, dalpha, dimp, dbox.astype(boxes.dtype)


_v3_call.defvjp(_v3_fwd, _v3_bwd)
