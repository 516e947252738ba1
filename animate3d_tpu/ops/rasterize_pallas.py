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
    tiles_per_program: int = 8,
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


def pack_records(proj, colors: jnp.ndarray, opacity: jnp.ndarray,
                 idx: jnp.ndarray, ok: jnp.ndarray) -> jnp.ndarray:
    """Gather the per-tile gaussian records for the kernel (one XLA gather)."""
    m2d = proj.mean2d[idx]  # (T, K, 2)
    con = proj.conic[idx]  # (T, K, 3)
    op = opacity[idx][..., None]  # (T, K, 1)
    col = colors[idx]  # (T, K, 3)
    dep = proj.depth[idx][..., None]
    okf = ok[..., None].astype(jnp.float32)
    padz = jnp.zeros_like(okf)
    return jnp.concatenate(
        [m2d, con, op, col, dep, okf, padz], axis=-1)  # (T, K, 12)
