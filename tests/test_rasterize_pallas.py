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


class TestCoarseDirectCompositing:
    """The coarse-direct kernel (one program per coarse parent, alpha-gated
    fine tiles, no fine binning) vs the XLA compositor at a resolution where
    the hierarchical path engages (>16 tiles)."""

    def _scene(self, n=300, H=128, W=128, seed=3):
        rng = np.random.default_rng(seed)
        c2w = camu.generate_c2w(10.0, 30.0, distance=3.0)[0]
        fov = math.radians(40)
        cam = rz.camera_arrays(camu.gs_camera(c2w, fov, fov, H, W))
        cfg = rz.RasterConfig(height=H, width=W, tile=16, max_per_tile=256,
                              tile_chunk=8, coarse=4, coarse_k=256,
                              approx_binning=False)
        means = rng.uniform(-0.45, 0.45, (n, 3)).astype(np.float32)
        scales = (0.05 * (0.5 + rng.uniform(size=(n, 3)))).astype(np.float32)
        q = rng.normal(size=(n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        op = rng.uniform(0.3, 0.95, n).astype(np.float32)
        col = rng.uniform(size=(n, 3)).astype(np.float32)
        return cam, cfg, (jnp.asarray(means), jnp.asarray(scales),
                          jnp.asarray(q), jnp.asarray(op), jnp.asarray(col))

    def test_forward_matches_xla(self):
        cam, cfg, (means, scales, q, op, col) = self._scene()
        bg = jnp.asarray([0.2, 0.4, 0.9])
        out_x = rz.rasterize(means, scales, q, op, cam, cfg,
                             colors_precomp=col, bg=bg, backend="xla")
        out_p = rz.rasterize(means, scales, q, op, cam, cfg,
                             colors_precomp=col, bg=bg, backend="pallas")
        assert np.abs(np.asarray(out_p.rgb)).max() > 0.05
        np.testing.assert_allclose(np.asarray(out_p.rgb),
                                   np.asarray(out_x.rgb), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_p.alpha),
                                   np.asarray(out_x.alpha), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out_p.depth),
                                   np.asarray(out_x.depth), atol=2e-4)

    def test_gradients_match_xla(self):
        cam, cfg, (means, scales, q, op, col) = self._scene(n=120)

        def make_loss(backend):
            def loss(m, s, qq, o, c):
                out = rz.rasterize(m, s, qq, o, cam, cfg, colors_precomp=c,
                                   backend=backend)
                return (jnp.mean(out.rgb ** 2) + jnp.mean(out.alpha)
                        + 0.01 * jnp.mean(out.depth))
            return loss

        g_x = jax.grad(make_loss("xla"), argnums=(0, 1, 2, 3, 4))(
            means, scales, q, op, col)
        g_p = jax.grad(make_loss("pallas"), argnums=(0, 1, 2, 3, 4))(
            means, scales, q, op, col)
        for a, b, name in zip(g_p, g_x, "msqoc"):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(a).all(), name
            scale = np.abs(b).max() + 1e-8
            np.testing.assert_allclose(a / scale, b / scale, atol=3e-4,
                                       err_msg=name)

    def test_overflow_counts_coarse_truncation_only(self):
        cam, cfg, arrs = self._scene()
        out = rz.rasterize(*arrs[:4], cam, cfg, colors_precomp=arrs[4],
                           backend="pallas")
        assert int(out.overflow) == 0
        cfg_tiny = cfg._replace(coarse_k=16)
        out2 = rz.rasterize(*arrs[:4], cam, cfg_tiny, colors_precomp=arrs[4],
                            backend="pallas")
        assert int(out2.overflow) > 0
