"""Pallas TPU kernel for the gaussian-splat tile compositing stage.

Replaces the XLA `_composite` in ops/rasterize.py on TPU: each program
composites G image tiles over their K depth-sorted gaussians entirely in
VMEM — the (pixels × K) alpha matrices never round-trip to HBM, and the
sequential transmittance product runs as a fori_loop over K with (G, 256)
pixel vectors on the VPU (the TPU analogue of the CUDA kernel's
warp-per-pixel loop).

Inputs are the packed per-tile records produced by the XLA binning stage
(one gather): [x, y, conic_a, conic_b, conic_c, opacity, r, g, b, depth, ok].

Gradients: the public entry pairs this forward with the differentiable XLA
compositor as the backward (jax.custom_vjp) — identical math, so gradients
match rasterize()'s autodiff exactly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RECORD = 12  # padded record width (11 used)
PX = 256  # pixels per 16x16 tile


def _composite_kernel(origins_ref, records_ref, out_ref, *, k_max: int,
                      tile: int, alpha_min: float, alpha_max: float):
    """One program: G tiles × K gaussians → (G, 8, PX) channel planes."""
    g = records_ref.shape[0]

    # pixel coordinates (G, PX): tile-local grid + per-tile origin
    lin = jax.lax.broadcasted_iota(jnp.int32, (g, PX), 1)
    px = jnp.mod(lin, tile).astype(jnp.float32)
    py = (lin // tile).astype(jnp.float32)
    ox = origins_ref[:, 0].reshape(g, 1)
    oy = origins_ref[:, 1].reshape(g, 1)
    gx = ox + px
    gy = oy + py

    def body(k, carry):
        r, gc, b, acc_a, acc_d, T = carry
        rec = records_ref[:, k, :]  # (G, RECORD)
        col = lambda i: rec[:, i].reshape(g, 1)
        dx = col(0) - gx
        dy = col(1) - gy
        power = -0.5 * (col(2) * dx * dx + col(4) * dy * dy) - col(3) * dx * dy
        alpha = jnp.minimum(alpha_max, col(5) * jnp.exp(power))
        alpha = jnp.where(power > 0.0, 0.0, alpha)
        alpha = jnp.where(alpha < alpha_min, 0.0, alpha)
        alpha = alpha * col(10)  # ok flag
        w = alpha * T
        r = r + w * col(6)
        gc = gc + w * col(7)
        b = b + w * col(8)
        acc_d = acc_d + w * col(9)
        acc_a = acc_a + w
        T = T * (1.0 - alpha)
        return r, gc, b, acc_a, acc_d, T

    zeros = jnp.zeros((g, PX), jnp.float32)
    init = (zeros, zeros, zeros, zeros, zeros, jnp.ones((g, PX), jnp.float32))
    r, gc, b, acc_a, acc_d, T = jax.lax.fori_loop(0, k_max, body, init)

    out_ref[:, 0, :] = r
    out_ref[:, 1, :] = gc
    out_ref[:, 2, :] = b
    out_ref[:, 3, :] = acc_a
    out_ref[:, 4, :] = acc_d
    out_ref[:, 5, :] = T
    out_ref[:, 6, :] = zeros
    out_ref[:, 7, :] = zeros


@functools.partial(jax.jit, static_argnames=("tile", "alpha_min", "alpha_max",
                                             "tiles_per_program", "interpret"))
def composite_tiles_pallas(
    origins: jnp.ndarray,  # (T, 2) float32 tile pixel origins (x0, y0)
    records: jnp.ndarray,  # (T, K, RECORD) float32 packed per-tile gaussians
    tile: int = 16,
    alpha_min: float = 1.0 / 255.0,
    alpha_max: float = 0.99,
    tiles_per_program: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """→ (T, 8, PX) channel planes [r, g, b, alpha, depth, T_final, 0, 0]."""
    t, k, rec = records.shape
    assert rec == RECORD
    g = tiles_per_program
    pad = (-t) % g
    if pad:
        origins = jnp.pad(origins, ((0, pad), (0, 0)))
        records = jnp.pad(records, ((0, pad), (0, 0), (0, 0)))
    tp = origins.shape[0]

    out = pl.pallas_call(
        functools.partial(_composite_kernel, k_max=k, tile=tile,
                          alpha_min=alpha_min, alpha_max=alpha_max),
        grid=(tp // g,),
        in_specs=[
            pl.BlockSpec((g, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, k, RECORD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, 8, PX), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, 8, PX), jnp.float32),
        interpret=interpret,
    )(origins, records)
    return out[:t]


def _composite_bwd_kernel(origins_ref, records_ref, tfinal_ref, cot_ref,
                          grad_ref, *, k_max: int, tile: int,
                          alpha_min: float, alpha_max: float):
    """Backward: reverse walk over gaussians, recomputing alpha from records.

    For w_k = α_k·T_k, T_k = Π_{j<k}(1−α_j):
      ∂L/∂α_k = dw_k·T_k − (S_k + g_T·T_final)/(1−α_k),
      S_k = Σ_{j>k} dw_j·w_j  (accumulated during the reverse loop),
    the same recurrence the CUDA kernel's back-to-front pass uses.
    """
    g = records_ref.shape[0]
    lin = jax.lax.broadcasted_iota(jnp.int32, (g, PX), 1)
    px = jnp.mod(lin, tile).astype(jnp.float32)
    py = (lin // tile).astype(jnp.float32)
    gx = origins_ref[:, 0].reshape(g, 1) + px
    gy = origins_ref[:, 1].reshape(g, 1) + py

    gr = cot_ref[:, 0, :]
    gg = cot_ref[:, 1, :]
    gb = cot_ref[:, 2, :]
    ga = cot_ref[:, 3, :]
    gd = cot_ref[:, 4, :]
    gT = cot_ref[:, 5, :]
    tfinal = tfinal_ref[:, 0, :]
    gT_tf = gT * tfinal

    def body(i, carry):
        S, T_next = carry
        k = k_max - 1 - i
        rec = records_ref[:, k, :]
        col = lambda j: rec[:, j].reshape(g, 1)
        dx = col(0) - gx
        dy = col(1) - gy
        ca, cb, cc = col(2), col(3), col(4)
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        e = jnp.exp(power)
        raw = col(5) * e
        clamped = raw > alpha_max
        alpha = jnp.minimum(alpha_max, raw)
        live = jnp.logical_and(power <= 0.0, alpha >= alpha_min)
        live = jnp.logical_and(live, col(10) > 0.0)
        alpha = jnp.where(live, alpha, 0.0)

        one_minus = 1.0 - alpha
        T_k = T_next / one_minus  # α ≤ 0.99 ⇒ safe
        w_k = alpha * T_k

        dw = gr * col(6) + gg * col(7) + gb * col(8) + gd * col(9) + ga
        dalpha = dw * T_k - (S + gT_tf) / one_minus

        # chain into the record fields (masked & clamp-aware)
        pass_through = jnp.where(jnp.logical_and(live, ~clamped), 1.0, 0.0)
        dop = dalpha * e * pass_through
        dpow = dalpha * raw * pass_through
        dxr = dpow * (-ca * dx - cb * dy)
        dyr = dpow * (-cc * dy - cb * dx)
        dca = dpow * (-0.5 * dx * dx)
        dcb = dpow * (-dx * dy)
        dcc = dpow * (-0.5 * dy * dy)
        dcr = gr * w_k
        dcg = gg * w_k
        dcb_col = gb * w_k
        ddep = gd * w_k

        zero = jnp.zeros((g, PX), jnp.float32)
        # one reduction + one write per step: stack the 12 field terms on the
        # sublane axis (G·12, PX), reduce lanes once, store (G, 12)
        stacked = jnp.concatenate(
            [dxr, dyr, dca, dcb, dcc, dop, dcr, dcg, dcb_col, ddep, zero, zero],
            axis=0)  # (12·G, PX)
        reduced = jnp.sum(stacked, axis=1).reshape(RECORD, g).T  # (G, RECORD)
        grad_ref[:, k, :] = reduced

        return S + dw * w_k, T_k

    init = (jnp.zeros((g, PX), jnp.float32), tfinal)
    jax.lax.fori_loop(0, k_max, body, init)


@functools.partial(jax.jit, static_argnames=("tile", "alpha_min", "alpha_max",
                                             "tiles_per_program", "interpret"))
def composite_tiles_pallas_bwd(
    origins: jnp.ndarray,  # (T, 2)
    records: jnp.ndarray,  # (T, K, RECORD)
    tfinal: jnp.ndarray,  # (T, PX) forward final transmittance
    cotangents: jnp.ndarray,  # (T, 8, PX)
    tile: int = 16,
    alpha_min: float = 1.0 / 255.0,
    alpha_max: float = 0.99,
    tiles_per_program: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """→ grad records (T, K, RECORD)."""
    t, k, rec = records.shape
    g = tiles_per_program
    pad = (-t) % g
    if pad:
        origins = jnp.pad(origins, ((0, pad), (0, 0)))
        records = jnp.pad(records, ((0, pad), (0, 0), (0, 0)))
        tfinal = jnp.pad(tfinal, ((0, pad), (0, 0)), constant_values=1.0)
        cotangents = jnp.pad(cotangents, ((0, pad), (0, 0), (0, 0)))
    tp = origins.shape[0]
    tf3 = tfinal[:, None, :]  # (T, 1, PX)

    out = pl.pallas_call(
        functools.partial(_composite_bwd_kernel, k_max=k, tile=tile,
                          alpha_min=alpha_min, alpha_max=alpha_max),
        grid=(tp // g,),
        in_specs=[
            pl.BlockSpec((g, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, k, RECORD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, PX), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 8, PX), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, k, RECORD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, k, RECORD), jnp.float32),
        interpret=interpret,
    )(origins, records, tf3, cotangents)
    return out[:t]


def pack_records(proj, colors: jnp.ndarray, opacity: jnp.ndarray,
                 idx: jnp.ndarray, ok: jnp.ndarray) -> jnp.ndarray:
    """Gather the per-tile gaussian records for the kernel.

    Packs the per-gaussian table (N, 12) FIRST so the tile binning is a
    single gather (and its backward a single scatter) instead of six narrow
    ones — narrow trailing dims pad to the 128-lane width on TPU."""
    n = proj.mean2d.shape[0]
    table = jnp.concatenate(
        [proj.mean2d, proj.conic, opacity[:, None], colors,
         proj.depth[:, None], jnp.zeros((n, 2), proj.mean2d.dtype)], axis=-1)
    rec = table[idx]  # (T, K, 12)
    okf = ok.astype(rec.dtype)[..., None]
    # slot 10 carries the ok flag; slot 11 stays zero
    return jnp.concatenate(
        [rec[..., :10], okf, rec[..., 11:]], axis=-1)
