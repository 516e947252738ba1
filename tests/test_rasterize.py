import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from animate3d_tpu.ops import rasterize as rz
from animate3d_tpu.utils import camera as camu


def make_camera(H=64, W=64, dist=3.0, elev=0.0, azim=0.0, fov_deg=40.0):
    c2w = camu.generate_c2w(elev, azim, distance=dist)[0]
    fov = math.radians(fov_deg)
    cam = camu.gs_camera(c2w, fov, fov, H, W)
    return rz.camera_arrays(cam), rz.RasterConfig(height=H, width=W, tile=16,
                                                  max_per_tile=64, tile_chunk=8)


def dense_reference(means3d, scales, rotations, opacity, colors, camera, cfg, bg):
    """Naive per-pixel all-gaussians compositor (no tiles, no K cap)."""
    cov3d = rz.build_cov3d(jnp.asarray(means3d), jnp.asarray(rotations) * 1.0, 1.0)
    cov3d = rz.build_cov3d(jnp.asarray(scales), jnp.asarray(rotations), 1.0)
    proj = rz.project_gaussians(jnp.asarray(means3d), cov3d, camera, cfg)
    order = np.argsort(np.where(np.asarray(proj.valid), np.asarray(proj.depth), 1e10))
    m2d = np.asarray(proj.mean2d)[order]
    con = np.asarray(proj.conic)[order]
    dep = np.asarray(proj.depth)[order]
    val = np.asarray(proj.valid)[order]
    col = np.asarray(colors)[order]
    op = np.asarray(opacity).reshape(-1)[order]

    H, W = cfg.height, cfg.width
    rgb = np.zeros((H, W, 3))
    acc = np.zeros((H, W))
    depth_im = np.zeros((H, W))
    T = np.ones((H, W))
    for g in range(len(order)):
        if not val[g]:
            continue
        ys, xs = np.meshgrid(np.arange(H, dtype=np.float64),
                             np.arange(W, dtype=np.float64), indexing="ij")
        dx = m2d[g, 0] - xs
        dy = m2d[g, 1] - ys
        power = -0.5 * (con[g, 0] * dx * dx + con[g, 2] * dy * dy) - con[g, 1] * dx * dy
        alpha = np.minimum(0.99, op[g] * np.exp(power))
        alpha[power > 0] = 0.0
        alpha[alpha < 1 / 255] = 0.0
        w = alpha * T
        rgb += w[..., None] * col[g]
        acc += w
        depth_im += w * dep[g]
        T *= 1 - alpha
    rgb += T[..., None] * np.asarray(bg)
    return rgb, depth_im, acc


def random_scene(n=40, seed=0, spread=0.5, scale=0.05):
    rng = np.random.default_rng(seed)
    means = (rng.uniform(-spread, spread, size=(n, 3))).astype(np.float32)
    scales = (scale * (0.5 + rng.uniform(size=(n, 3)))).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opacity = rng.uniform(0.3, 0.9, size=(n,)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    return means, scales, q, opacity, colors


def test_single_gaussian_center():
    cam, cfg = make_camera()
    means = np.zeros((1, 3), np.float32)
    scales = np.full((1, 3), 0.1, np.float32)
    q = np.array([[1, 0, 0, 0]], np.float32)
    op = np.array([0.8], np.float32)
    col = np.array([[1.0, 0.0, 0.0]], np.float32)
    bg = jnp.zeros((3,))
    out = rz.rasterize(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                       jnp.asarray(op), cam, cfg, colors_precomp=jnp.asarray(col), bg=bg)
    # gaussian projects to image center with alpha≈opacity
    H, W = cfg.height, cfg.width
    center_alpha = np.asarray(out.alpha)[H // 2 - 1: H // 2 + 1, W // 2 - 1: W // 2 + 1]
    assert center_alpha.max() > 0.75
    # red in center, black (bg) at corners
    assert np.asarray(out.rgb)[H // 2, W // 2, 0] > 0.7
    assert np.asarray(out.rgb)[0, 0].max() < 1e-3
    # depth at center ≈ camera distance
    d = np.asarray(out.depth)[H // 2, W // 2] / max(center_alpha.max(), 1e-6)
    assert abs(d - 3.0) < 0.1
    assert np.asarray(out.radii)[0] > 0


def test_matches_dense_reference():
    cam, cfg = make_camera(H=48, W=48)
    means, scales, q, op, col = random_scene(n=40)
    bg = jnp.asarray([0.2, 0.3, 0.4], jnp.float32)
    out = rz.rasterize(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                       jnp.asarray(op), cam, cfg, colors_precomp=jnp.asarray(col), bg=bg)
    ref_rgb, ref_depth, ref_acc = dense_reference(means, scales, q, op, col, cam, cfg, bg)
    np.testing.assert_allclose(np.asarray(out.rgb), ref_rgb, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.alpha), ref_acc, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.depth), ref_depth, atol=2e-2)


def test_occlusion_order():
    cam, cfg = make_camera()
    # camera at (3,0,0) looking -x: gaussian at x=0.5 is in front of x=-0.5
    means = np.array([[0.5, 0, 0], [-0.5, 0, 0]], np.float32)
    scales = np.full((2, 3), 0.2, np.float32)
    q = np.tile(np.array([[1, 0, 0, 0]], np.float32), (2, 1))
    op = np.array([0.95, 0.95], np.float32)
    col = np.array([[0, 1, 0], [1, 0, 0]], np.float32)
    out = rz.rasterize(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                       jnp.asarray(op), cam, cfg, colors_precomp=jnp.asarray(col),
                       bg=jnp.zeros((3,)))
    c = np.asarray(out.rgb)[cfg.height // 2, cfg.width // 2]
    assert c[1] > 0.85  # front gaussian (green) dominates
    assert c[0] < 0.1


def test_behind_camera_culled():
    cam, cfg = make_camera()
    means = np.array([[10.0, 0, 0]], np.float32)  # behind camera at (3,0,0) looking -x
    scales = np.full((1, 3), 0.3, np.float32)
    q = np.array([[1, 0, 0, 0]], np.float32)
    out = rz.rasterize(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                       jnp.asarray(np.array([0.9], np.float32)), cam, cfg,
                       colors_precomp=jnp.ones((1, 3)), bg=jnp.zeros((3,)))
    assert np.asarray(out.alpha).max() == 0.0
    assert np.asarray(out.radii)[0] == 0.0


def test_sh_color_path():
    cam, cfg = make_camera()
    from animate3d_tpu.utils.sh import rgb_to_sh

    means = np.zeros((1, 3), np.float32)
    shs = np.zeros((1, 1, 3), np.float32)
    shs[0, 0] = rgb_to_sh(np.array([0.9, 0.1, 0.5]))
    out = rz.rasterize(jnp.zeros((1, 3)), jnp.full((1, 3), 0.1), jnp.asarray([[1., 0, 0, 0]]),
                       jnp.asarray([5.0]), cam, cfg, shs=jnp.asarray(shs),
                       bg=jnp.zeros((3,)), active_sh_degree=0)
    c = np.asarray(out.rgb)[cfg.height // 2, cfg.width // 2]
    # opacity 5.0 → alpha clamped 0.99 at center; color ≈ (0.9,0.1,0.5)*0.99ish
    np.testing.assert_allclose(c, [0.9, 0.1, 0.5], atol=0.02)


def test_gradients_nonzero_and_finite():
    cam, cfg = make_camera(H=32, W=32)
    means, scales, q, op, col = random_scene(n=10, spread=0.3, scale=0.1)

    def loss_fn(means, scales, q, op, col):
        out = rz.rasterize(means, scales, q, op, cam, cfg,
                           colors_precomp=col, bg=jnp.zeros((3,)))
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha)

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
        jnp.asarray(op), jnp.asarray(col))
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    assert any(np.abs(np.asarray(g)).max() > 0 for g in grads)


def dense_jnp(means3d, scales, rotations, opacity, colors, camera, cfg, bg, order):
    """Dense differentiable compositor (all gaussians, every pixel)."""
    cov3d = rz.build_cov3d(scales, rotations, 1.0)
    proj = rz.project_gaussians(means3d, cov3d, camera, cfg)
    m2d = proj.mean2d[order]
    con = proj.conic[order]
    dep = proj.depth[order]
    val = proj.valid[order]
    col = colors[order]
    op = opacity.reshape(-1)[order]

    H, W = cfg.height, cfg.width
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    dx = m2d[:, None, None, 0] - xs[None]
    dy = m2d[:, None, None, 1] - ys[None]
    power = -0.5 * (con[:, None, None, 0] * dx ** 2 + con[:, None, None, 2] * dy ** 2) \
        - con[:, None, None, 1] * dx * dy
    alpha = jnp.minimum(0.99, op[:, None, None] * jnp.exp(power))
    alpha = jnp.where(power > 0, 0.0, alpha)
    alpha = jnp.where(alpha < 1 / 255, 0.0, alpha)
    alpha = jnp.where(val[:, None, None], alpha, 0.0)
    T_incl = jnp.cumprod(1 - alpha, axis=0)
    T_excl = jnp.concatenate([jnp.ones_like(T_incl[:1]), T_incl[:-1]], axis=0)
    w = alpha * T_excl
    rgb = jnp.einsum("ghw,gc->hwc", w, col) + T_incl[-1][..., None] * bg
    return rgb


def test_grads_match_dense_reference():
    cam, cfg = make_camera(H=32, W=32)
    means, scales, q, op, col = random_scene(n=8, spread=0.25, scale=0.12)
    target = jnp.zeros((32, 32, 3), jnp.float32)

    # fixed front-to-back order (precomputed outside the grad path)
    cov3d = rz.build_cov3d(jnp.asarray(scales), jnp.asarray(q), 1.0)
    proj = rz.project_gaussians(jnp.asarray(means), cov3d, cam, cfg)
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, 1e10))

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
            jnp.asarray(op), jnp.asarray(col))

    def loss_tiled(*a):
        out = rz.rasterize(*a[:4], cam, cfg, colors_precomp=a[4], bg=jnp.zeros((3,)))
        return jnp.mean((out.rgb - target) ** 2)

    def loss_dense(*a):
        rgb = dense_jnp(*a[:4], a[4], cam, cfg, jnp.zeros((3,)), order)
        return jnp.mean((rgb - target) ** 2)

    g_tiled = jax.grad(loss_tiled, argnums=tuple(range(5)))(*args)
    g_dense = jax.grad(loss_dense, argnums=tuple(range(5)))(*args)
    for gt, gd, name in zip(g_tiled, g_dense,
                            ["means", "scales", "rot", "opacity", "colors"]):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gd),
                                   atol=5e-5, rtol=5e-3, err_msg=name)


def test_vmap_over_views():
    H = W = 32
    cams = []
    for azim in [0, 90, 180, 270]:
        cam, cfg = make_camera(H=H, W=W, azim=azim)
        cams.append(cam)
    cam_batch = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *cams)
    means, scales, q, op, col = random_scene(n=20)

    def render_one(cam):
        return rz.rasterize(jnp.asarray(means), jnp.asarray(scales), jnp.asarray(q),
                            jnp.asarray(op), cam, cfg,
                            colors_precomp=jnp.asarray(col), bg=jnp.ones((3,))).rgb

    imgs = jax.vmap(render_one)(cam_batch)
    assert imgs.shape == (4, H, W, 3)
    assert np.all(np.isfinite(np.asarray(imgs)))
    # different views give different images
    assert np.abs(np.asarray(imgs[0]) - np.asarray(imgs[1])).max() > 1e-3


class TestHierarchicalBinning:
    def _scene(self, n=400, seed=5):
        rng = np.random.default_rng(seed)
        means = rng.normal(size=(n, 3)) * 0.3
        scales = np.exp(rng.normal(size=(n, 3)) * 0.3 - 3.5)
        quats = rng.normal(size=(n, 4))
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        opacity = rng.uniform(0.3, 0.9, size=(n,))
        colors = rng.uniform(size=(n, 3))
        return tuple(jnp.asarray(a, jnp.float32)
                     for a in (means, scales, quats, opacity, colors))

    def test_hier_matches_flat_when_uncapped(self):
        """coarse→fine binning renders identically to the flat top_k when
        neither level truncates."""
        means, scales, quats, opacity, colors = self._scene()
        cam, _ = make_camera(H=128, W=128)
        cfg_flat = rz.RasterConfig(height=128, width=128, max_per_tile=400,
                                   tile_chunk=8, coarse=0)
        cfg_hier = rz.RasterConfig(height=128, width=128, max_per_tile=400,
                                   tile_chunk=8, coarse=2, coarse_k=400)
        out_f = rz.rasterize(means, scales, quats, opacity, cam, cfg_flat,
                             colors_precomp=colors, backend="xla")
        out_h = rz.rasterize(means, scales, quats, opacity, cam, cfg_hier,
                             colors_precomp=colors, backend="xla")
        np.testing.assert_allclose(np.asarray(out_h.rgb), np.asarray(out_f.rgb),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_h.alpha),
                                   np.asarray(out_f.alpha), atol=1e-5)
        assert int(out_f.overflow) == 0 and int(out_h.overflow) == 0

    def test_overflow_counter_reports_truncation(self):
        """A tiny K cap on a dense scene must be *reported*, not silent
        (SURVEY §7 'overflow handling'; round-1 VERDICT weak #4)."""
        means, scales, quats, opacity, colors = self._scene()
        cam, _ = make_camera(H=128, W=128)
        cfg = rz.RasterConfig(height=128, width=128, max_per_tile=8,
                              tile_chunk=8, coarse=2, coarse_k=16)
        out = rz.rasterize(means, scales, quats, opacity, cam, cfg,
                           colors_precomp=colors, backend="xla")
        assert int(out.overflow) > 0

    def test_hier_gradients_match_flat(self):
        means, scales, quats, opacity, colors = self._scene(n=100)
        cam, _ = make_camera(H=64, W=64)

        def loss(cfg):
            def f(m):
                out = rz.rasterize(m, scales, quats, opacity, cam, cfg,
                                   colors_precomp=colors, backend="xla")
                return jnp.sum(out.rgb ** 2)
            return jax.grad(f)(means)

        cfg_flat = rz.RasterConfig(height=64, width=64, max_per_tile=100,
                                   tile_chunk=8, coarse=0)
        cfg_hier = rz.RasterConfig(height=64, width=64, max_per_tile=100,
                                   tile_chunk=8, coarse=2, coarse_k=100)
        np.testing.assert_allclose(np.asarray(loss(cfg_hier)),
                                   np.asarray(loss(cfg_flat)), atol=1e-5)
