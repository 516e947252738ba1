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
