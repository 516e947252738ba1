#!/usr/bin/env python
"""Microbenchmarks for the rasterizer stages on the current device.

Times (per call, averaged over iters):
  * tile binning: current masked-top_k vs hierarchical coarse→fine
  * compositing: current record-kernel fwd/bwd vs K-on-lanes kernel
  * end-to-end rasterize fwd and grad at 256² and 512²

Usage: python scripts/profile_raster.py [--n 20000] [--iters 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=20000)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--res", type=int, default=256)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    import math

    from animate3d_tpu.ops.rasterize import (
        RasterConfig,
        build_cov3d,
        project_gaussians,
        _tile_select,
        camera_arrays,
        rasterize,
    )
    from animate3d_tpu.utils import camera as camu

    rng = np.random.default_rng(0)
    n = args.n
    means = jnp.asarray(rng.normal(size=(n, 3)) * 0.3, jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(size=(n, 3)) * 0.3 - 4.5), jnp.float32)
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    quats = jnp.asarray(quats, jnp.float32)
    opacity = jnp.asarray(rng.uniform(0.3, 0.9, size=(n,)), jnp.float32)
    colors = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)

    c2w = camu.generate_c2w(15.0, 30.0, distance=3.0)[0]
    fov = math.radians(40.0)
    cam = camera_arrays(camu.gs_camera(c2w, fov, fov, args.res, args.res))
    cfg = RasterConfig(height=args.res, width=args.res)

    proj = jax.jit(lambda m, s, q: project_gaussians(
        m, build_cov3d(s, q), cam, cfg))(means, scales, quats)

    from animate3d_tpu.ops.rasterize import _tile_select_hier

    projfn = jax.jit(lambda m, s, q: project_gaussians(
        m, build_cov3d(s, q), cam, cfg))
    t = timeit(projfn, means, scales, quats, iters=args.iters)
    print(f"project                 : {t*1e3:8.3f} ms")

    sel = jax.jit(lambda p: _tile_select(p, cfg))
    t = timeit(sel, proj, iters=args.iters)
    print(f"tile_select (flat topk) : {t*1e3:8.3f} ms")
    for chunk in (128, 256):
        cfg_c = cfg._replace(tile_chunk=chunk)
        sel_c = jax.jit(lambda p: _tile_select(p, cfg_c))
        t = timeit(sel_c, proj, iters=args.iters)
        print(f"tile_select (chunk={chunk:4d}): {t*1e3:8.3f} ms")
    sel_h = jax.jit(lambda p: _tile_select_hier(p, cfg))
    t = timeit(sel_h, proj, iters=args.iters)
    print(f"tile_select (hier)      : {t*1e3:8.3f} ms")

    # approx_max_k variant of the flat path
    def sel_approx(p):
        ty, tx_, tt = cfg.tiles_y, cfg.tiles_x, cfg.tile
        ids = jnp.arange(ty * tx_, dtype=jnp.int32)
        x0 = ((ids % tx_) * tt).astype(jnp.float32)
        y0 = ((ids // tx_) * tt).astype(jnp.float32)
        big = jnp.float32(1e10)
        depth = jnp.where(p.valid, p.depth, big)
        x, y = p.mean2d[:, 0], p.mean2d[:, 1]
        r = p.radius
        def per_chunk(a):
            cx0, cy0 = a
            ov = ((x[None] + r[None] >= cx0[:, None])
                  & (x[None] - r[None] < cx0[:, None] + tt)
                  & (y[None] + r[None] >= cy0[:, None])
                  & (y[None] - r[None] < cy0[:, None] + tt)
                  & p.valid[None])
            score = jnp.where(ov, depth[None], big)
            neg, idx = jax.lax.approx_max_k(-score, cfg.max_per_tile,
                                            recall_target=0.99)
            return idx.astype(jnp.int32), (-neg) < big
        c = 64
        return jax.lax.map(per_chunk, (x0.reshape(-1, c), y0.reshape(-1, c)))

    sel_a = jax.jit(sel_approx)
    t = timeit(sel_a, proj, iters=args.iters)
    print(f"tile_select (approx)    : {t*1e3:8.3f} ms")

    # compositing kernel alone
    from animate3d_tpu.ops.rasterize import _composite_fields, _tile_select
    from animate3d_tpu.ops.rasterize_pallas import pack_fields

    idx, ok, _ = jax.jit(lambda p: _tile_select(p, cfg))(proj)

    def kern(p, c_, o_):
        f = pack_fields(p, c_, o_, idx, ok)
        tids = jnp.arange(f.shape[0], dtype=jnp.float32)
        org = jnp.stack([(tids % cfg.tiles_x) * cfg.tile,
                         (tids // cfg.tiles_x) * cfg.tile], axis=1)
        return _composite_fields(f, org, cfg.tile, cfg.alpha_min, cfg.alpha_max)

    kj = jax.jit(kern)
    t = timeit(kj, proj, colors, opacity, iters=args.iters)
    print(f"pack+composite fwd      : {t*1e3:8.3f} ms")

    gk = jax.jit(jax.grad(lambda c_: jnp.sum(kern(proj, c_, opacity) ** 2)))
    t = timeit(gk, colors, iters=args.iters)
    print(f"pack+composite grad     : {t*1e3:8.3f} ms")

    # end-to-end fwd
    fwd = jax.jit(lambda m, s, q, o, c: rasterize(
        m, s, q, o, cam, cfg, colors_precomp=c).rgb)
    t = timeit(fwd, means, scales, quats, opacity, colors, iters=args.iters)
    print(f"rasterize fwd           : {t*1e3:8.3f} ms")

    def loss(m, s, q, o, c):
        out = rasterize(m, s, q, o, cam, cfg, colors_precomp=c)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha) + jnp.sum(out.depth)

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    t = timeit(grad, means, scales, quats, opacity, colors, iters=args.iters)
    print(f"rasterize grad          : {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
