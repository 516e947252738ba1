"""K-planes 4D factorized deformation grid.

Parity target: gaussian_4d.py:101-174 (init_grid_param) and :450-484
(interpolate_ms_features): per scale, one 2D plane for each of the six
2-combinations of (x, y, z, t); features are bilinearly sampled per plane
(align_corners=True, border padding), multiplied across planes, and
concatenated across scales. Time planes init to 1, space planes U(0.1, 0.5).

TPU design: sampling is a gather + lerp, fully vmapped; all six planes of a
scale are evaluated in one fused pass.
"""

from __future__ import annotations

import itertools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

# 2-combinations of (x, y, z, t) in the reference's itertools order
COO_COMBS: Tuple[Tuple[int, int], ...] = tuple(itertools.combinations(range(4), 2))


def init_grid_params(
    key: jax.Array,
    grid_sizes: Sequence[Sequence[int]],
    out_dim: int = 16,
    a: float = 0.1,
    b: float = 0.5,
) -> List[List[jnp.ndarray]]:
    """[[plane (out_dim, reso[c1], reso[c0]) per combo] per scale]."""
    grids = []
    for reso in grid_sizes:
        assert len(reso) == 4
        planes = []
        for combo in COO_COMBS:
            key, sub = jax.random.split(key)
            # plane laid out (C, H=reso[combo[1]], W=reso[combo[0]])
            shape = (out_dim, reso[combo[1]], reso[combo[0]])
            if 3 in combo:  # time plane → ones
                planes.append(jnp.ones(shape, jnp.float32))
            else:
                planes.append(jax.random.uniform(sub, shape, jnp.float32, a, b))
        grids.append(planes)
    return grids


def grid_sample_2d(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample: plane (C, H, W), coords (N, 2) in [-1, 1] with
    (x, y) order; align_corners=True, border padding (grid_sample parity,
    gaussian_4d.py:39-64)."""
    c, h, w = plane.shape
    x = (coords[:, 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y = jnp.clip(y, 0.0, h - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    p = plane.transpose(1, 2, 0)  # (H, W, C) for gathers
    c00 = p[y0, x0]
    c01 = p[y0, x1]
    c10 = p[y1, x0]
    c11 = p[y1, x1]
    return (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy


def interpolate_ms_features(pts: jnp.ndarray,
                            grids: List[List[jnp.ndarray]]) -> jnp.ndarray:
    """pts (N, 4) in [-1, 1] → (N, out_dim · n_scales) features:
    product over planes, concat over scales (gaussian_4d.py:450-484)."""
    outs = []
    for planes in grids:
        interp = None
        for ci, combo in enumerate(COO_COMBS):
            feat = grid_sample_2d(planes[ci], pts[:, list(combo)])
            interp = feat if interp is None else interp * feat
        outs.append(interp)
    return jnp.concatenate(outs, axis=-1)


def axis_weights(coord: jnp.ndarray, reso: int) -> jnp.ndarray:
    """coord (M,) in [-1, 1] → dense bilinear interpolation matrix (M, reso)
    with ≤2 nonzeros per row (align_corners=True, border clamp).

    Sampling becomes a matmul against these, so the BACKWARD is a matmul
    too — the TPU-native replacement for gather fwd + scatter-add bwd (XLA
    scatters serialize on TPU and dominated the deformation step)."""
    x = jnp.clip((coord + 1.0) * 0.5 * (reso - 1), 0.0, reso - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, reso - 1)
    x1 = jnp.minimum(x0 + 1, reso - 1)
    fx = x - x0
    cells = jnp.arange(reso, dtype=jnp.int32)
    w0 = jnp.where(cells[None, :] == x0[:, None], (1.0 - fx)[:, None], 0.0)
    w1 = jnp.where(cells[None, :] == x1[:, None], fx[:, None], 0.0)
    return w0 + w1  # x0 == x1 at the border ⇒ (1-fx) + fx = 1 on that cell


def interpolate_ms_features_frames(
    xyz: jnp.ndarray,  # (N, 3) in [-1, 1]
    ts: jnp.ndarray,  # (F,) in [-1, 1]
    grids: List[List[jnp.ndarray]],
) -> jnp.ndarray:
    """(F, N, out_dim · n_scales) features for all N points at all F frames.

    Time-factorized: the three spatial planes (xy, xz, yz) do not depend on
    t, so their product is computed ONCE per point instead of per frame
    (the naive per-frame evaluation redoes 6F plane samples; this does
    3 + 3F, and every sample is a separable weight-matrix contraction with
    matmul gradients — no gathers/scatters anywhere)."""
    outs = []
    for planes in grids:
        # per-axis weight matrices for this scale's resolutions
        reso = {}  # axis -> resolution (consistent within a scale by constr.)
        for ci, (c0, c1) in enumerate(COO_COMBS):
            c, h, w = planes[ci].shape
            reso[c0] = w
            reso[c1] = h
        wx = axis_weights(xyz[:, 0], reso[0])
        wy = axis_weights(xyz[:, 1], reso[1])
        wz = axis_weights(xyz[:, 2], reso[2])
        wt = axis_weights(ts, reso[3])
        waxes = {0: wx, 1: wy, 2: wz}

        spatial = None  # (N, C)
        temporal = None  # (F, N, C)
        for ci, (c0, c1) in enumerate(COO_COMBS):
            if c1 != 3:
                feat = jnp.einsum("chw,nw,nh->nc", planes[ci],
                                  waxes[c0], waxes[c1])
                spatial = feat if spatial is None else spatial * feat
            else:
                feat = jnp.einsum("ctw,nw->nct", planes[ci], waxes[c0])
                feat = jnp.einsum("nct,ft->fnc", feat, wt)
                temporal = feat if temporal is None else temporal * feat
        outs.append(spatial[None, :, :] * temporal)
    return jnp.concatenate(outs, axis=-1)
