"""Pallas TPU kernels for the gaussian-splat tile compositing stage
(fwd + hand-derived bwd), replacing the CUDA rasterizer's per-tile
warp loops (diff-gaussian-rasterization; SURVEY.md §2.2).

K-on-lanes design: a naive kernel walks gaussians one at a time — K
sequential VPU steps per tile (the CUDA kernel's structure). These kernels
put K on the LANE axis instead:

  * alpha for a whole 128-gaussian block computed at once as (256 px, 128);
  * the order-dependent transmittance product becomes a log2(128)-step
    Hillis-Steele prefix scan of lane rolls;
  * color/depth accumulation (fwd) and the color/field gradient reductions
    (bwd) become (256, 128) x (128, 4) MXU contractions;
  * the backward's suffix sums S_k = sum_{j>k} dw_j w_j become one reverse
    lane scan per block instead of K sequential accumulations.

Sequential depth (the only part that cannot parallelize) drops from K steps
to K/128 block steps.

Field layout (T, 12, K) fp32 rows: 0 x, 1 y, 2-4 conic(a,b,c), 5 opacity,
6-8 rgb, 9 depth, 10 ok, 11 pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NFIELD = 12


def _lane_prefix_prods(one_minus: jnp.ndarray, kb: int):
    """Inclusive→exclusive prefix product along the lane axis.

    Returns (T_exclusive (PX, kb), total (PX, 1))."""
    lane = jax.lax.broadcasted_iota(jnp.int32, one_minus.shape, 1)
    p = one_minus
    s = 1
    while s < kb:
        shifted = pltpu.roll(p, s, 1)
        p = p * jnp.where(lane >= s, shifted, 1.0)
        s *= 2
    excl = jnp.where(lane >= 1, pltpu.roll(p, 1, 1), 1.0)
    total = p[:, kb - 1:kb]
    return excl, total


def _lane_suffix_sums(v: jnp.ndarray, kb: int):
    """Inclusive suffix sum along lanes: out_i = Σ_{j≥i} v_j.

    Returns (suffix_inclusive (PX, kb), total (PX, 1))."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    q = v
    s = 1
    while s < kb:
        shifted = pltpu.roll(q, kb - s, 1)  # circular left-shift by s
        q = q + jnp.where(lane < kb - s, shifted, 0.0)
        s *= 2
    total = q[:, 0:1]
    return q, total


def _block_alpha(fields_ref, gi, sl, gx, gy, kb, alpha_min, alpha_max):
    """(PX, kb) gated alpha for one gaussian block (+ intermediates for bwd)."""
    row = lambda i: fields_ref[gi, i, sl].reshape(1, kb)
    dx = row(0) - gx
    dy = row(1) - gy
    ca, cb_, cc = row(2), row(3), row(4)
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb_ * dx * dy
    e = jnp.exp(power)
    raw = row(5) * e
    alpha = jnp.minimum(alpha_max, raw)
    live = jnp.logical_and(power <= 0.0, alpha >= alpha_min)
    live = jnp.logical_and(live, row(10) > 0.0)
    alpha = jnp.where(live, alpha, 0.0)
    return alpha, (dx, dy, ca, cb_, cc, e, raw, live)


def _composite_fields_kernel(origins_ref, fields_ref, out_ref, *, k_total: int,
                             tile: int, alpha_min: float, alpha_max: float,
                             g_tiles: int, kb: int):
    px_count = tile * tile
    f32 = jnp.float32
    for gi in range(g_tiles):
        lin = jax.lax.broadcasted_iota(jnp.int32, (px_count, 1), 0)
        gx = jnp.mod(lin, tile).astype(f32) + origins_ref[gi, 0]
        gy = (lin // tile).astype(f32) + origins_ref[gi, 1]

        t_carry = jnp.ones((px_count, 1), f32)
        rgbd = jnp.zeros((px_count, 4), f32)
        a_acc = jnp.zeros((px_count, 1), f32)
        for b in range(k_total // kb):
            sl = pl.ds(b * kb, kb)
            alpha, _ = _block_alpha(fields_ref, gi, sl, gx, gy, kb,
                                    alpha_min, alpha_max)
            excl, tot = _lane_prefix_prods(1.0 - alpha, kb)
            w = alpha * excl * t_carry  # (PX, kb)
            cm = fields_ref[gi, 6:10, sl]  # (4, kb): r, g, b, depth
            rgbd = rgbd + jax.lax.dot_general(
                w, cm, (((1,), (1,)), ((), ())), preferred_element_type=f32)
            a_acc = a_acc + jnp.sum(w, axis=1, keepdims=True)
            t_carry = t_carry * tot

        zeros = jnp.zeros((px_count,), f32)
        out_ref[gi, 0, :] = rgbd[:, 0]
        out_ref[gi, 1, :] = rgbd[:, 1]
        out_ref[gi, 2, :] = rgbd[:, 2]
        out_ref[gi, 3, :] = a_acc[:, 0]
        out_ref[gi, 4, :] = rgbd[:, 3]
        out_ref[gi, 5, :] = t_carry[:, 0]
        out_ref[gi, 6, :] = zeros
        out_ref[gi, 7, :] = zeros


@functools.partial(jax.jit, static_argnames=("tile", "alpha_min", "alpha_max",
                                             "tiles_per_program", "interpret"))
def composite_fields_pallas(
    origins: jnp.ndarray,  # (T, 2) float32 tile pixel origins (x0, y0)
    fields: jnp.ndarray,  # (T, 12, K) float32
    tile: int = 16,
    alpha_min: float = 1.0 / 255.0,
    alpha_max: float = 0.99,
    tiles_per_program: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """→ (T, 8, PX) channel planes [r, g, b, alpha, depth, T_final, 0, 0]."""
    t, nf, k = fields.shape
    assert nf == NFIELD
    kb = min(k, 128)
    assert k % kb == 0, (k, kb)
    g = tiles_per_program
    pad = (-t) % g
    if pad:
        origins = jnp.pad(origins, ((0, pad), (0, 0)))
        fields = jnp.pad(fields, ((0, pad), (0, 0), (0, 0)))
    tp = origins.shape[0]
    px_count = tile * tile

    out = pl.pallas_call(
        functools.partial(_composite_fields_kernel, k_total=k, tile=tile,
                          alpha_min=alpha_min, alpha_max=alpha_max,
                          g_tiles=g, kb=kb),
        grid=(tp // g,),
        in_specs=[
            pl.BlockSpec((g, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, NFIELD, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, 8, px_count), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, 8, px_count), jnp.float32),
        interpret=interpret,
    )(origins, fields)
    return out[:t]


def _composite_fields_bwd_kernel(origins_ref, fields_ref, cot_ref, grad_ref,
                                 alpha_buf, t_buf, *, k_total: int, tile: int,
                                 alpha_min: float, alpha_max: float,
                                 g_tiles: int, kb: int):
    px_count = tile * tile
    f32 = jnp.float32
    nblocks = k_total // kb
    for gi in range(g_tiles):
        lin = jax.lax.broadcasted_iota(jnp.int32, (px_count, 1), 0)
        gx = jnp.mod(lin, tile).astype(f32) + origins_ref[gi, 0]
        gy = (lin // tile).astype(f32) + origins_ref[gi, 1]

        # pass 1: forward recompute of alpha and per-gaussian transmittance
        t_carry = jnp.ones((px_count, 1), f32)
        for b in range(nblocks):
            sl = pl.ds(b * kb, kb)
            alpha, _ = _block_alpha(fields_ref, gi, sl, gx, gy, kb,
                                    alpha_min, alpha_max)
            excl, tot = _lane_prefix_prods(1.0 - alpha, kb)
            alpha_buf[:, sl] = alpha
            t_buf[:, sl] = excl * t_carry
            t_carry = t_carry * tot
        tfinal = t_carry  # (PX, 1)

        col = lambda i: cot_ref[gi, i, :].reshape(px_count, 1)
        gr, gg, gb, ga, gd, g_t = (col(i) for i in range(6))
        g_t_tf = g_t * tfinal

        # pass 2: reverse over blocks
        s_carry = jnp.zeros((px_count, 1), f32)
        for b in range(nblocks - 1, -1, -1):
            sl = pl.ds(b * kb, kb)
            alpha = alpha_buf[:, sl]
            t_k = t_buf[:, sl]
            w = alpha * t_k
            row = lambda i: fields_ref[gi, i, sl].reshape(1, kb)
            dw = (gr * row(6) + gg * row(7) + gb * row(8) + gd * row(9) + ga)
            dww = dw * w
            suffix_incl, block_total = _lane_suffix_sums(dww, kb)
            s_k = suffix_incl - dww + s_carry
            dalpha = dw * t_k - (s_k + g_t_tf) / (1.0 - alpha)

            _, (dx, dy, ca, cb_, cc, e, raw, live) = _block_alpha(
                fields_ref, gi, sl, gx, gy, kb, alpha_min, alpha_max)
            pass_th = jnp.where(jnp.logical_and(live, raw <= alpha_max),
                                1.0, 0.0)
            dop = dalpha * e * pass_th  # (PX, kb)
            dpow = dalpha * raw * pass_th

            red = lambda v: jnp.sum(v, axis=0)  # (kb,)
            grad_ref[gi, 0, sl] = red(dpow * (-ca * dx - cb_ * dy))
            grad_ref[gi, 1, sl] = red(dpow * (-cc * dy - cb_ * dx))
            grad_ref[gi, 2, sl] = red(dpow * (-0.5 * dx * dx))
            grad_ref[gi, 3, sl] = red(dpow * (-dx * dy))
            grad_ref[gi, 4, sl] = red(dpow * (-0.5 * dy * dy))
            grad_ref[gi, 5, sl] = red(dop)
            grad_ref[gi, 6, sl] = red(w * gr)
            grad_ref[gi, 7, sl] = red(w * gg)
            grad_ref[gi, 8, sl] = red(w * gb)
            grad_ref[gi, 9, sl] = red(w * gd)
            zeros = jnp.zeros((kb,), f32)
            grad_ref[gi, 10, sl] = zeros
            grad_ref[gi, 11, sl] = zeros

            s_carry = s_carry + block_total


@functools.partial(jax.jit, static_argnames=("tile", "alpha_min", "alpha_max",
                                             "tiles_per_program", "interpret"))
def composite_fields_pallas_bwd(
    origins: jnp.ndarray,  # (T, 2)
    fields: jnp.ndarray,  # (T, 12, K)
    cotangents: jnp.ndarray,  # (T, 8, PX)
    tile: int = 16,
    alpha_min: float = 1.0 / 255.0,
    alpha_max: float = 0.99,
    tiles_per_program: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """→ grad fields (T, 12, K)."""
    t, nf, k = fields.shape
    assert nf == NFIELD
    kb = min(k, 128)
    assert k % kb == 0, (k, kb)
    g = tiles_per_program
    pad = (-t) % g
    if pad:
        origins = jnp.pad(origins, ((0, pad), (0, 0)))
        fields = jnp.pad(fields, ((0, pad), (0, 0), (0, 0)))
        cotangents = jnp.pad(cotangents, ((0, pad), (0, 0), (0, 0)))
    tp = origins.shape[0]
    px_count = tile * tile

    out = pl.pallas_call(
        functools.partial(_composite_fields_bwd_kernel, k_total=k, tile=tile,
                          alpha_min=alpha_min, alpha_max=alpha_max,
                          g_tiles=g, kb=kb),
        grid=(tp // g,),
        in_specs=[
            pl.BlockSpec((g, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, NFIELD, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 8, px_count), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, NFIELD, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, NFIELD, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((px_count, k), jnp.float32),  # alpha
            pltpu.VMEM((px_count, k), jnp.float32),  # per-gaussian T
        ],
        interpret=interpret,
    )(origins, fields, cotangents)
    return out[:t]


# ---------------------------------------------------------------------------
# Coarse-direct compositing: one program per COARSE tile — the parent's
# depth-sorted candidate fields (NFIELD, kc) load into VMEM once and all
# cs×cs fine tiles composite straight off them. The alpha gates (power ≤ 0,
# alpha ≥ 1/255) subsume the per-fine-tile hit test, so the fine binning
# pass and its (T, kc, K) one-hot/field traffic disappear entirely —
# per-view HBM drops from ~550 MB to ~40 MB at 1024².


def _tile_hit(fields_ref, sl, kb, tx0, ty0, tile):
    """(1, kb) AABB-overlaps-this-fine-tile gate (row 11 = 3σ radius) —
    reproduces the CUDA kernel's per-tile list semantics: a gaussian whose
    AABB misses the tile contributes nothing even where alpha ≥ 1/255."""
    xb = fields_ref[0, 0, sl].reshape(1, kb)
    yb = fields_ref[0, 1, sl].reshape(1, kb)
    rb = fields_ref[0, 11, sl].reshape(1, kb)
    return ((xb + rb >= tx0) & (xb - rb < tx0 + tile)
            & (yb + rb >= ty0) & (yb - rb < ty0 + tile))


def _composite_coarse_kernel(corig_ref, fields_ref, out_ref, *, kc: int,
                             tile: int, cs: int, alpha_min: float,
                             alpha_max: float, kb: int):
    px_count = tile * tile
    f32 = jnp.float32
    nblocks = kc // kb
    ci = pl.program_id(0)

    # fori_loop over the cs*cs fine tiles (a python unroll of 16 tiles blew
    # the VMEM temporaries stack on real hardware)
    def body(local, _):
        fx = jnp.mod(local, cs)
        fy = local // cs
        tx0 = corig_ref[ci, 0] + fx.astype(f32) * tile
        ty0 = corig_ref[ci, 1] + fy.astype(f32) * tile
        lin = jax.lax.broadcasted_iota(jnp.int32, (px_count, 1), 0)
        gx = jnp.mod(lin, tile).astype(f32) + tx0
        gy = (lin // tile).astype(f32) + ty0

        def blk(b, carry):
            t_carry, rgbd, a_acc = carry
            sl = pl.ds(b * kb, kb)
            hit = _tile_hit(fields_ref, sl, kb, tx0, ty0, tile)
            # skip blocks with no AABB hits for this fine tile (sparse at
            # high res) or once every pixel's transmittance is exhausted
            # (the CUDA kernel's early termination)
            live = jnp.logical_and(jnp.any(hit), jnp.max(t_carry) > 1e-4)

            def compute(c):
                t_carry, rgbd, a_acc = c
                alpha, _ = _block_alpha(fields_ref, 0, sl, gx, gy, kb,
                                        alpha_min, alpha_max)
                alpha = jnp.where(hit, alpha, 0.0)
                excl, tot = _lane_prefix_prods(1.0 - alpha, kb)
                w = alpha * excl * t_carry
                cm = fields_ref[0, 6:10, sl]
                rgbd = rgbd + jax.lax.dot_general(
                    w, cm, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                a_acc = a_acc + jnp.sum(w, axis=1, keepdims=True)
                return (t_carry * tot, rgbd, a_acc)

            return jax.lax.cond(live, compute, lambda c: c, carry)

        t_carry, rgbd, a_acc = jax.lax.fori_loop(
            0, nblocks, blk,
            (jnp.ones((px_count, 1), f32), jnp.zeros((px_count, 4), f32),
             jnp.zeros((px_count, 1), f32)))

        out = jnp.concatenate(
            [rgbd[:, 0:3].T, a_acc.T, rgbd[:, 3:4].T, t_carry.T,
             jnp.zeros((2, px_count), f32)], axis=0)  # (8, PX)
        out_ref[0, local] = out
        return 0

    jax.lax.fori_loop(0, cs * cs, body, 0)


@functools.partial(jax.jit, static_argnames=("tile", "cs", "alpha_min",
                                             "alpha_max", "interpret"))
def composite_coarse_pallas(
    corigins: jnp.ndarray,  # (n_ct, 2) f32 coarse-tile pixel origins
    fields: jnp.ndarray,  # (n_ct, NFIELD, kc) f32 depth-sorted candidates
    tile: int = 16,
    cs: int = 4,
    alpha_min: float = 1.0 / 255.0,
    alpha_max: float = 0.99,
    interpret: bool = False,
) -> jnp.ndarray:
    """→ (n_ct, cs², 8, PX) channel planes per fine tile (coarse-major)."""
    n_ct, nf, kc = fields.shape
    assert nf == NFIELD
    kb = min(kc, 128)
    assert kc % kb == 0, (kc, kb)
    px_count = tile * tile
    return pl.pallas_call(
        functools.partial(_composite_coarse_kernel, kc=kc, tile=tile, cs=cs,
                          alpha_min=alpha_min, alpha_max=alpha_max, kb=kb),
        grid=(n_ct,),
        in_specs=[
            pl.BlockSpec((n_ct, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NFIELD, kc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cs * cs, 8, px_count),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_ct, cs * cs, 8, px_count),
                                       jnp.float32),
        interpret=interpret,
    )(corigins, fields)


def _composite_coarse_bwd_kernel(corig_ref, fields_ref, cot_ref, grad_ref,
                                 alpha_buf, t_buf, *, kc: int, tile: int,
                                 cs: int, alpha_min: float, alpha_max: float,
                                 kb: int):
    px_count = tile * tile
    f32 = jnp.float32
    nblocks = kc // kb
    ci = pl.program_id(0)
    # field grads accumulate straight into the output block across fine
    # tiles; fori_loop instead of unrolling (the unrolled 16-tile version
    # blew the VMEM temporaries stack on hardware)
    grad_ref[0] = jnp.zeros((NFIELD, kc), f32)

    def body(local, _):
        fx = jnp.mod(local, cs)
        fy = local // cs
        tx0 = corig_ref[ci, 0] + fx.astype(f32) * tile
        ty0 = corig_ref[ci, 1] + fy.astype(f32) * tile
        lin = jax.lax.broadcasted_iota(jnp.int32, (px_count, 1), 0)
        gx = jnp.mod(lin, tile).astype(f32) + tx0
        gy = (lin // tile).astype(f32) + ty0

        # pass 1: forward recompute of alpha and per-gaussian transmittance
        # (skipped blocks write zero alpha so pass 2's gates see them dead)
        def blk1(b, t_carry):
            sl = pl.ds(b * kb, kb)
            hit = _tile_hit(fields_ref, sl, kb, tx0, ty0, tile)
            can = jnp.logical_and(jnp.any(hit), jnp.max(t_carry) > 1e-4)

            def compute(tc):
                alpha, _ = _block_alpha(fields_ref, 0, sl, gx, gy, kb,
                                        alpha_min, alpha_max)
                alpha = jnp.where(hit, alpha, 0.0)
                excl, tot = _lane_prefix_prods(1.0 - alpha, kb)
                return alpha, excl * tc, tc * tot

            def skip(tc):
                z = jnp.zeros((px_count, kb), f32)
                return z, z, tc

            alpha, tk, tc2 = jax.lax.cond(can, compute, skip, t_carry)
            alpha_buf[:, sl] = alpha
            t_buf[:, sl] = tk
            return tc2

        tfinal = jax.lax.fori_loop(0, nblocks, blk1,
                                   jnp.ones((px_count, 1), f32))

        col = lambda i: cot_ref[0, local, i, :].reshape(px_count, 1)
        gr, gg, gb, ga, gd, g_t = (col(i) for i in range(6))
        g_t_tf = g_t * tfinal

        # pass 2: reverse over blocks, accumulating into grad_ref; blocks
        # whose recomputed alpha is identically zero contribute nothing
        def blk2(bi, s_carry):
            b = nblocks - 1 - bi
            sl = pl.ds(b * kb, kb)
            alpha = alpha_buf[:, sl]
            can = jnp.max(alpha) > 0.0

            def compute(s):
                t_k = t_buf[:, sl]
                w = alpha * t_k
                row = lambda i: fields_ref[0, i, sl].reshape(1, kb)
                dw = (gr * row(6) + gg * row(7) + gb * row(8)
                      + gd * row(9) + ga)
                dww = dw * w
                suffix_incl, block_total = _lane_suffix_sums(dww, kb)
                s_k = suffix_incl - dww + s
                dalpha = dw * t_k - (s_k + g_t_tf) / (1.0 - alpha)

                _, (dx, dy, ca, cb_, cc, e, raw, live) = _block_alpha(
                    fields_ref, 0, sl, gx, gy, kb, alpha_min, alpha_max)
                pass_th = jnp.where(jnp.logical_and(live, raw <= alpha_max),
                                    1.0, 0.0)
                pass_th = jnp.where(
                    _tile_hit(fields_ref, sl, kb, tx0, ty0, tile),
                    pass_th, 0.0)
                dop = dalpha * e * pass_th
                dpow = dalpha * raw * pass_th

                red = lambda v: jnp.sum(v, axis=0)[None, :]  # (1, kb)
                rows = jnp.concatenate([
                    red(dpow * (-ca * dx - cb_ * dy)),
                    red(dpow * (-cc * dy - cb_ * dx)),
                    red(dpow * (-0.5 * dx * dx)),
                    red(dpow * (-dx * dy)),
                    red(dpow * (-0.5 * dy * dy)),
                    red(dop),
                    red(w * gr),
                    red(w * gg),
                    red(w * gb),
                    red(w * gd),
                ], axis=0)  # (10, kb)
                return rows, s + block_total

            def skip(s):
                return jnp.zeros((10, kb), f32), s

            rows, s2 = jax.lax.cond(can, compute, skip, s_carry)
            grad_ref[0, 0:10, sl] = grad_ref[0, 0:10, sl] + rows
            return s2

        jax.lax.fori_loop(0, nblocks, blk2, jnp.zeros((px_count, 1), f32))
        return 0

    jax.lax.fori_loop(0, cs * cs, body, 0)


@functools.partial(jax.jit, static_argnames=("tile", "cs", "alpha_min",
                                             "alpha_max", "interpret"))
def composite_coarse_pallas_bwd(
    corigins: jnp.ndarray,  # (n_ct, 2)
    fields: jnp.ndarray,  # (n_ct, NFIELD, kc)
    cotangents: jnp.ndarray,  # (n_ct, cs², 8, PX)
    tile: int = 16,
    cs: int = 4,
    alpha_min: float = 1.0 / 255.0,
    alpha_max: float = 0.99,
    interpret: bool = False,
) -> jnp.ndarray:
    """→ grad fields (n_ct, NFIELD, kc)."""
    n_ct, nf, kc = fields.shape
    assert nf == NFIELD
    kb = min(kc, 128)
    assert kc % kb == 0, (kc, kb)
    px_count = tile * tile
    return pl.pallas_call(
        functools.partial(_composite_coarse_bwd_kernel, kc=kc, tile=tile,
                          cs=cs, alpha_min=alpha_min, alpha_max=alpha_max,
                          kb=kb),
        grid=(n_ct,),
        in_specs=[
            pl.BlockSpec((n_ct, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NFIELD, kc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cs * cs, 8, px_count), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NFIELD, kc), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_ct, NFIELD, kc), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((px_count, kc), jnp.float32),  # alpha
            pltpu.VMEM((px_count, kc), jnp.float32),  # per-gaussian T
        ],
        interpret=interpret,
    )(corigins, fields, cotangents)


def pack_fields(proj, colors: jnp.ndarray, opacity: jnp.ndarray,
                idx: jnp.ndarray, ok: jnp.ndarray) -> jnp.ndarray:
    """Gather per-tile gaussian fields in the (T, 12, K) K-on-lanes layout.

    Separate per-field (N,) → (T, K) gathers keep K on the 128-lane axis
    (a packed (T, K, 12) gather would pad the 12-wide trailing dim to 128)."""
    g = lambda v: v[idx]  # (T, K)
    rows = [
        g(proj.mean2d[:, 0]), g(proj.mean2d[:, 1]),
        g(proj.conic[:, 0]), g(proj.conic[:, 1]), g(proj.conic[:, 2]),
        g(opacity),
        g(colors[:, 0]), g(colors[:, 1]), g(colors[:, 2]),
        g(proj.depth),
        ok.astype(jnp.float32),
        jnp.zeros_like(ok, dtype=jnp.float32),
    ]
    return jnp.stack(rows, axis=1)
