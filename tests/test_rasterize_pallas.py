"""Pallas compositing kernel vs the XLA compositor (interpret mode on CPU)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from animate3d_tpu.ops import rasterize as rz
from animate3d_tpu.utils import camera as camu


def make_scene(n=30, H=32, W=32, seed=0):
    rng = np.random.default_rng(seed)
    c2w = camu.generate_c2w(10.0, 30.0, distance=3.0)[0]
    fov = math.radians(40)
    cam = rz.camera_arrays(camu.gs_camera(c2w, fov, fov, H, W))
    cfg = rz.RasterConfig(height=H, width=W, tile=16, max_per_tile=32,
                          tile_chunk=4)
    means = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    scales = (0.08 * (0.5 + rng.uniform(size=(n, 3)))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    op = rng.uniform(0.3, 0.95, n).astype(np.float32)
    col = rng.uniform(size=(n, 3)).astype(np.float32)
    return cam, cfg, (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                      jnp.asarray(op), jnp.asarray(col))


def test_pallas_matches_xla_forward():
    cam, cfg, (means, scales, q, op, col) = make_scene()
    bg = jnp.asarray([0.3, 0.5, 0.7])
    out_x = rz.rasterize(means, scales, q, op, cam, cfg, colors_precomp=col,
                         bg=bg, backend="xla")
    out_p = rz.rasterize(means, scales, q, op, cam, cfg, colors_precomp=col,
                         bg=bg, backend="pallas")
    np.testing.assert_allclose(np.asarray(out_p.rgb), np.asarray(out_x.rgb),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_p.alpha), np.asarray(out_x.alpha),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_p.depth), np.asarray(out_x.depth),
                               atol=1e-4)


def test_pallas_gradients_match_xla():
    cam, cfg, (means, scales, q, op, col) = make_scene(n=12)
    bg = jnp.zeros((3,))

    def loss(backend):
        def fn(means, scales, q, op, col):
            out = rz.rasterize(means, scales, q, op, cam, cfg,
                               colors_precomp=col, bg=bg, backend=backend)
            return jnp.mean(out.rgb ** 2) + jnp.mean(out.alpha)

        return fn

    gx = jax.grad(loss("xla"), argnums=(0, 1, 2, 3, 4))(means, scales, q, op, col)
    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3, 4))(means, scales, q, op, col)
    for a, b, name in zip(gx, gp, ["means", "scales", "rot", "op", "col"]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5,
                                   rtol=1e-3, err_msg=name)
