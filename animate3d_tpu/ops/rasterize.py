"""Differentiable 3D gaussian-splat rasterizer (TPU-native).

Replaces the reference's CUDA ``diff-gaussian-rasterization`` dependency
(SURVEY.md §2.2; renderer/diff_gaussian_rasterizer_advanced_4d.py:8-11,161-170)
with an XLA/Pallas design built around *fixed shapes*:

  1. Project all N gaussians (EWA splatting: view transform, perspective
     Jacobian, 2D covariance + 0.3 px dilation, 3σ radius) — one fused
     elementwise pass.
  2. Tile binning: hierarchical coarse→fine selection of up to K
     intersecting gaussians per 16×16 tile, front-to-back — fixed K (with
     overflow accounting) instead of the CUDA version's variable-length
     per-tile lists. Selection uses ``approx_max_k`` by default (TPU sort is
     ~30× slower; see RasterConfig.approx_binning).
  3. Composite each tile over its K gaussians, front to back. On TPU this is
     the K-on-lanes Pallas kernel pair in ops/rasterize_pallas.py (fwd +
     hand-derived bwd, prefix-scan transmittance, MXU accumulation); the
     XLA compositor below is the CPU/debug mirror with identical math, so
     gradients agree between backends.

Semantics (culling thresholds, dilation, alpha clamps, ndc2pix convention,
SH evaluation, depth/alpha accumulation) follow the Inria kernel + ashawkey
depth/alpha fork the reference installs (docs/install.md:18-20). All math fp32.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from animate3d_tpu.utils.sh import sh_color


class RasterConfig(NamedTuple):
    """Static rasterization parameters (hashable; passed as static arg)."""

    height: int
    width: int
    tile: int = 16
    max_per_tile: int = 256
    tile_chunk: int = 32  # tiles composited per lax.map step (memory knob)
    znear_cull: float = 0.2
    dilate: float = 0.3
    alpha_min: float = 1.0 / 255.0
    alpha_max: float = 0.99
    sh_degree: int = 0
    # hierarchical binning: coarse tiles of (coarse × tile)² pixels pre-select
    # coarse_k depth-nearest gaussians; fine tiles then compact their first
    # max_per_tile hits from the (already depth-sorted) coarse list. 0 ⇒ flat
    # per-tile top_k over all N.
    coarse: int = 4
    coarse_k: int = 512  # 1024→512 saves ~0.5 s/recon-step (measured); the
    # overflow counter reports if a denser scene ever truncates
    # TPU sort is slow (~10-20 ms per top_k call at these shapes);
    # approx_max_k runs ~30× faster and still returns an exactly-sorted list,
    # just sampled at `recall_target` recall — a ≤(1−recall) random subset of
    # per-tile gaussians may be dropped (counted by `overflow` only when the
    # K cap truncates). Set approx_binning=False for bit-exact parity tests.
    approx_binning: bool = True
    recall_target: float = 0.99

    @property
    def tiles_x(self) -> int:
        return (self.width + self.tile - 1) // self.tile

    @property
    def tiles_y(self) -> int:
        return (self.height + self.tile - 1) // self.tile


class GSCameraArrays(NamedTuple):
    """Per-view camera tensors (row-vector layout as in the reference's
    get_cam_info_gaussian, threestudio/utils/ops.py:344-359)."""

    world_view: jnp.ndarray  # (4, 4)
    full_proj: jnp.ndarray  # (4, 4)
    camera_center: jnp.ndarray  # (3,)
    tanfovx: jnp.ndarray  # ()
    tanfovy: jnp.ndarray  # ()


def camera_arrays(cam) -> GSCameraArrays:
    """From a utils.camera.GSCamera (host) to device arrays."""
    return GSCameraArrays(
        world_view=jnp.asarray(cam.world_view, jnp.float32),
        full_proj=jnp.asarray(cam.full_proj, jnp.float32),
        camera_center=jnp.asarray(cam.camera_center, jnp.float32),
        tanfovx=jnp.asarray(cam.tanfovx, jnp.float32),
        tanfovy=jnp.asarray(cam.tanfovy, jnp.float32),
    )


def build_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray,
                modifier: float = 1.0) -> jnp.ndarray:
    """(N,3,3) world covariance = R S Sᵀ Rᵀ from linear scales + wxyz quats."""
    from animate3d_tpu.utils.rotation import quat_to_matrix

    R = quat_to_matrix(rotations)
    s = scales * modifier
    RS = R * s[:, None, :]
    return jnp.einsum("nij,nkj->nik", RS, RS, precision=jax.lax.Precision.HIGHEST)


class Projected(NamedTuple):
    mean2d: jnp.ndarray  # (N, 2) pixel coords
    depth: jnp.ndarray  # (N,)
    conic: jnp.ndarray  # (N, 3) inverse 2D covariance (a, b, c)
    radius: jnp.ndarray  # (N,) float, 0 for culled
    valid: jnp.ndarray  # (N,) bool


def project_gaussians(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    camera: GSCameraArrays,
    cfg: RasterConfig,
) -> Projected:
    n = means3d.shape[0]
    ones = jnp.ones((n, 1), means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=1)

    p_view = hom @ camera.world_view  # row-vector convention
    p_hom = hom @ camera.full_proj
    w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_ndc = p_hom[:, :3] * w[:, None]

    depth = p_view[:, 2]
    in_front = depth > cfg.znear_cull

    # EWA: J @ W @ Σ @ Wᵀ @ Jᵀ  (upper-left 2x2)
    fx = cfg.width / (2.0 * camera.tanfovx)
    fy = cfg.height / (2.0 * camera.tanfovy)
    tz = jnp.where(in_front, depth, 1.0)
    lim_x = 1.3 * camera.tanfovx
    lim_y = 1.3 * camera.tanfovy
    txtz = jnp.clip(p_view[:, 0] / tz, -lim_x, lim_x)
    tytz = jnp.clip(p_view[:, 1] / tz, -lim_y, lim_y)
    tx = txtz * tz
    ty = tytz * tz

    # W: world→view rotation. world_view is transposed w2c, so rows of its
    # upper 3x3 are the w2c columns; J is (2x3).
    Wm = camera.world_view[:3, :3]  # maps row-vectors: x_view = x_world @ Wm
    j00 = fx / tz
    j02 = -fx * tx / (tz * tz)
    j11 = fy / tz
    j12 = -fy * ty / (tz * tz)
    # T = Wᵀ?? — express as row-vector chain: cov_view = Aᵀ Σ A with A = Wm @ Jᵀ
    # A: (N, 3, 2); A[:, k, 0] = Wm[k,0]*j00 + Wm[k,2]*j02 etc.
    A = jnp.stack(
        [
            Wm[None, :, 0] * j00[:, None] + Wm[None, :, 2] * j02[:, None],
            Wm[None, :, 1] * j11[:, None] + Wm[None, :, 2] * j12[:, None],
        ],
        axis=-1,
    )  # (N, 3, 2)
    cov2d = jnp.einsum("nki,nkl,nlj->nij", A, cov3d, A,
                       precision=jax.lax.Precision.HIGHEST)
    c00 = cov2d[:, 0, 0] + cfg.dilate
    c01 = cov2d[:, 0, 1]
    c11 = cov2d[:, 1, 1] + cfg.dilate

    det = c00 * c11 - c01 * c01
    det_ok = det > 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c11 / det_safe, -c01 / det_safe, c00 / det_safe], axis=1)

    mid = 0.5 * (c00 + c11)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))

    mean2d = jnp.stack(
        [
            ((p_ndc[:, 0] + 1.0) * cfg.width - 1.0) * 0.5,
            ((p_ndc[:, 1] + 1.0) * cfg.height - 1.0) * 0.5,
        ],
        axis=1,
    )

    valid = in_front & det_ok & (radius > 0)
    radius = jnp.where(valid, radius, 0.0)
    return Projected(mean2d=mean2d, depth=depth, conic=conic, radius=radius, valid=valid)



def _select_k(neg_score: jnp.ndarray, k: int, cfg: RasterConfig):
    """Top-k by descending neg_score (ascending depth), exactly sorted.

    approx_max_k (default) runs a fast partial reduction then an exact
    aggregation — output order is exact, membership has `recall_target`
    recall. Exact top_k is the bit-exact fallback."""
    if cfg.approx_binning and neg_score.shape[-1] > 4 * k:
        return jax.lax.approx_max_k(neg_score, k,
                                    recall_target=cfg.recall_target)
    return jax.lax.top_k(neg_score, k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _composite_coarse_fields(fields, corigins, tile, cs, alpha_min, alpha_max):
    """Coarse-direct Pallas compositing: every program loads ONE coarse
    parent's depth-sorted candidate fields (NFIELD, kc) into VMEM and
    composites its cs×cs fine tiles straight off them — the alpha gates
    subsume the per-fine-tile hit test, so no fine binning pass or per-tile
    field compaction exists at all (ops/rasterize_pallas.py)."""
    from animate3d_tpu.ops.rasterize_pallas import composite_coarse_pallas

    interpret = jax.default_backend() != "tpu"
    return composite_coarse_pallas(corigins, fields, tile=tile, cs=cs,
                                   alpha_min=alpha_min, alpha_max=alpha_max,
                                   interpret=interpret)


def _composite_coarse_fwd(fields, corigins, tile, cs, alpha_min, alpha_max):
    out = _composite_coarse_fields(fields, corigins, tile, cs, alpha_min,
                                   alpha_max)
    return out, (fields, corigins)


def _composite_coarse_bwd(tile, cs, alpha_min, alpha_max, res, g):
    fields, corigins = res
    from animate3d_tpu.ops.rasterize_pallas import composite_coarse_pallas_bwd

    interpret = jax.default_backend() != "tpu"
    grad = composite_coarse_pallas_bwd(corigins, fields, g, tile=tile, cs=cs,
                                       alpha_min=alpha_min,
                                       alpha_max=alpha_max,
                                       interpret=interpret)
    return grad, jnp.zeros_like(corigins)


_composite_coarse_fields.defvjp(_composite_coarse_fwd, _composite_coarse_bwd)


def _coarse_select(proj: Projected, cfg: RasterConfig):
    """Coarse binning only: per coarse tile, the kc depth-nearest overlapping
    gaussians, sorted front-to-back. → (cidx (n_ct, kc), cok, c_count)."""
    t = cfg.tile
    ty, tx = cfg.tiles_y, cfg.tiles_x
    cs = cfg.coarse
    cty = -(-ty // cs)
    ctx_ = -(-tx // cs)
    n = proj.depth.shape[0]
    big = jnp.float32(1e10)
    depth = jnp.where(proj.valid, proj.depth, big)

    x, y = proj.mean2d[:, 0], proj.mean2d[:, 1]
    r = proj.radius
    gx0, gx1 = x - r, x + r
    gy0, gy1 = y - r, y + r

    kc = min(cfg.coarse_k, n)
    c_ids = jnp.arange(cty * ctx_, dtype=jnp.int32)
    c_x0 = (c_ids % ctx_) * (cs * t)
    c_y0 = (c_ids // ctx_) * (cs * t)
    ext = cs * t

    def coarse_chunk(args):
        cx0, cy0 = args
        ov = (
            (gx1[None, :] >= cx0[:, None])
            & (gx0[None, :] < (cx0[:, None] + ext))
            & (gy1[None, :] >= cy0[:, None])
            & (gy0[None, :] < (cy0[:, None] + ext))
            & proj.valid[None, :]
        )
        score = jnp.where(ov, depth[None, :], big)
        neg, idx = _select_k(-score, kc, cfg)
        return (idx.astype(jnp.int32), (-neg) < big,
                jnp.sum(ov, axis=1).astype(jnp.int32))

    cchunk = max(1, min(cfg.tile_chunk, cty * ctx_))
    n_ct = cty * ctx_
    padc = (-n_ct) % cchunk
    cx0p = jnp.pad(c_x0, (0, padc)).reshape(-1, cchunk)
    cy0p = jnp.pad(c_y0, (0, padc)).reshape(-1, cchunk)
    cidx, cok, c_count = jax.lax.map(coarse_chunk, (cx0p, cy0p))
    cidx = cidx.reshape(-1, kc)[:n_ct]
    cok = cok.reshape(-1, kc)[:n_ct]
    c_count = c_count.reshape(-1)[:n_ct]
    return cidx, cok, c_count, (c_x0.astype(jnp.float32),
                                c_y0.astype(jnp.float32))


def _tile_select_hier(proj: Projected, cfg: RasterConfig):
    """Hierarchical tile binning: coarse depth-sorted candidate lists
    (via ``_coarse_select``), then per-fine-tile first-K compaction.

    The flat version runs one masked ``top_k`` over all N per fine tile —
    the dominant binning cost. Here each coarse tile (``cfg.coarse``² fine
    tiles) runs ONE top_k over N keeping its ``coarse_k`` nearest gaussians
    (sorted front-to-back); each fine tile then selects the first
    ``max_per_tile`` *hits* from its coarse list via sort-free one-hot
    compaction (order already depth-sorted). ~coarse²× less top_k work over N.

    Returns (idx (T, K) int32, ok (T, K) bool, overflow () int32 — dropped
    gaussian·tile pairs from either the fine K cap or coarse_k truncation,
    the accounting the CUDA rasterizer's unbounded lists never need)."""
    t = cfg.tile
    ty, tx = cfg.tiles_y, cfg.tiles_x
    cs = cfg.coarse
    cty = -(-ty // cs)
    ctx_ = -(-tx // cs)

    x, y = proj.mean2d[:, 0], proj.mean2d[:, 1]
    r = proj.radius
    gx0, gx1 = x - r, x + r
    gy0, gy1 = y - r, y + r

    cidx, cok, c_count, _ = _coarse_select(proj, cfg)
    kc = cidx.shape[1]

    # --- fine pass: first-K hits from the (sorted) coarse candidates ---
    # candidate AABBs are gathered ONCE per coarse tile ((n_ct, kc) — small);
    # fine tiles then index whole parent ROWS (contiguous), avoiding the
    # (T·kc)-element random gathers from N that dominated this pass
    c_x0g = gx0[cidx]  # (n_ct, kc)
    c_x1g = gx1[cidx]
    c_y0g = gy0[cidx]
    c_y1g = gy1[cidx]

    f_ids = jnp.arange(ty * tx, dtype=jnp.int32)
    f_x0 = ((f_ids % tx) * t).astype(jnp.float32)
    f_y0 = ((f_ids // tx) * t).astype(jnp.float32)
    c_of_f = ((f_ids // tx) // cs) * ctx_ + (f_ids % tx) // cs

    kk = min(cfg.max_per_tile, kc)

    def fine_chunk(args):
        cf, fx0, fy0 = args  # (C,) coarse parent ids, (C,), (C,)
        fc = cidx[cf]  # (C, kc) — contiguous row gathers
        fok = cok[cf]
        ov = (
            (c_x1g[cf] >= fx0[:, None])
            & (c_x0g[cf] < (fx0[:, None] + t))
            & (c_y1g[cf] >= fy0[:, None])
            & (c_y0g[cf] < (fy0[:, None] + t))
            & fok
        )
        # sort-free first-K compaction: candidates are already depth-sorted,
        # so the hit-rank (cumsum) IS the output position; scatter by
        # one-hot contraction (MXU) instead of top_k (TPU sort is the
        # dominant binning cost at these shapes)
        gpos = jnp.cumsum(ov.astype(jnp.int32), axis=1) - 1  # (C, kc)
        keep = ov & (gpos < kk)
        onehot = ((gpos[:, :, None] == jnp.arange(kk, dtype=jnp.int32))
                  & keep[:, :, None]).astype(jnp.float32)  # (C, kc, K)
        idx = jnp.einsum("tc,tck->tk", fc.astype(jnp.float32), onehot,
                         precision=jax.lax.Precision.HIGHEST
                         ).astype(jnp.int32)
        count = jnp.sum(ov, axis=1).astype(jnp.int32)
        ok = jnp.arange(kk, dtype=jnp.int32)[None, :] < jnp.minimum(count, kk)[:, None]
        return idx, ok, count

    # chunk so the (fchunk, kc, K) one-hot stays ≤ ~8M elements — at 1024²
    # (4096 tiles) an unbounded chunk under the renderer's view-vmap
    # materializes beyond HBM (the renderer also shrinks its view chunk as
    # tiles grow, renderer4d.py)
    fchunk = max(1, min(cfg.tile_chunk * 4, ty * tx,
                        (1 << 23) // max(kc * kk, 1)))
    n_t = ty * tx
    padf = (-n_t) % fchunk
    idx, ok, f_count = jax.lax.map(
        fine_chunk,
        (jnp.pad(c_of_f, (0, padf)).reshape(-1, fchunk),
         jnp.pad(f_x0, (0, padf)).reshape(-1, fchunk),
         jnp.pad(f_y0, (0, padf)).reshape(-1, fchunk)))
    idx = idx.reshape(-1, kk)[:n_t]
    ok = ok.reshape(-1, kk)[:n_t]
    f_count = f_count.reshape(-1)[:n_t]

    if kk < cfg.max_per_tile:
        padk = cfg.max_per_tile - kk
        idx = jnp.pad(idx, ((0, 0), (0, padk)))
        ok = jnp.pad(ok, ((0, 0), (0, padk)))

    overflow = (jnp.sum(jnp.maximum(f_count - kk, 0))
                + jnp.sum(jnp.maximum(c_count - kc, 0)))
    return idx, ok, overflow


def _tile_select(proj: Projected, cfg: RasterConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each tile, indices of ≤K front-to-back gaussians + validity mask
    (flat variant: one masked top_k over all N per tile).

    Returns (idx (T, K) int32, ok (T, K) bool, overflow () int32)."""
    ty = cfg.tiles_y
    tx = cfg.tiles_x
    t = cfg.tile
    tile_ids = jnp.arange(ty * tx, dtype=jnp.int32)
    tile_x0 = (tile_ids % tx) * t
    tile_y0 = (tile_ids // tx) * t

    x, y = proj.mean2d[:, 0], proj.mean2d[:, 1]
    r = proj.radius
    gx0, gx1 = x - r, x + r
    gy0, gy1 = y - r, y + r

    big = jnp.float32(1e10)
    depth = jnp.where(proj.valid, proj.depth, big)

    kk = min(cfg.max_per_tile, proj.depth.shape[0])

    def per_chunk(chunk):
        cx0, cy0 = chunk  # (C,)
        overlap = (
            (gx1[None, :] >= cx0[:, None])
            & (gx0[None, :] < (cx0[:, None] + t))
            & (gy1[None, :] >= cy0[:, None])
            & (gy0[None, :] < (cy0[:, None] + t))
            & proj.valid[None, :]
        )
        score = jnp.where(overlap, depth[None, :], big)
        neg, idx = _select_k(-score, kk, cfg)
        ok = (-neg) < big
        if kk < cfg.max_per_tile:
            padk = cfg.max_per_tile - kk
            idx = jnp.pad(idx, ((0, 0), (0, padk)))
            ok = jnp.pad(ok, ((0, 0), (0, padk)))
        return idx.astype(jnp.int32), ok, jnp.sum(overlap, axis=1).astype(jnp.int32)

    c = cfg.tile_chunk
    n_tiles = ty * tx
    pad = (-n_tiles) % c
    cx0 = jnp.pad(tile_x0, (0, pad)).reshape(-1, c)
    cy0 = jnp.pad(tile_y0, (0, pad)).reshape(-1, c)
    idx, ok, count = jax.lax.map(per_chunk, (cx0, cy0))
    idx = idx.reshape(-1, cfg.max_per_tile)[:n_tiles]
    ok = ok.reshape(-1, cfg.max_per_tile)[:n_tiles]
    count = count.reshape(-1)[:n_tiles]
    overflow = jnp.sum(jnp.maximum(count - kk, 0))
    return idx, ok, overflow


def _composite(
    proj: Projected,
    colors: jnp.ndarray,
    opacity: jnp.ndarray,
    bg: jnp.ndarray,
    idx: jnp.ndarray,
    ok: jnp.ndarray,
    cfg: RasterConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Alpha-composite every tile; returns (rgb (H,W,3), depth (H,W), alpha (H,W))."""
    t = cfg.tile
    ty, tx = cfg.tiles_y, cfg.tiles_x
    n_tiles = ty * tx

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_x0 = ((tile_ids % tx) * t).astype(jnp.float32)
    tile_y0 = ((tile_ids // tx) * t).astype(jnp.float32)

    px = jnp.arange(t, dtype=jnp.float32)
    pyy, pxx = jnp.meshgrid(px, px, indexing="ij")  # (t, t): row=y, col=x

    def per_chunk(args):
        cidx, cok, cx0, cy0 = args  # (C,K), (C,K), (C,), (C,)
        m2d = proj.mean2d[cidx]  # (C, K, 2)
        conic = proj.conic[cidx]  # (C, K, 3)
        dep = proj.depth[cidx]  # (C, K)
        col = colors[cidx]  # (C, K, 3)
        op = opacity[cidx]  # (C, K)

        gx = cx0[:, None, None, None] + pxx[None, :, :, None]  # (C, t, t, 1)
        gy = cy0[:, None, None, None] + pyy[None, :, :, None]
        dx = m2d[:, None, None, :, 0] - gx  # (C, t, t, K)
        dy = m2d[:, None, None, :, 1] - gy
        a = conic[:, None, None, :, 0]
        b = conic[:, None, None, :, 1]
        cc = conic[:, None, None, :, 2]
        power = -0.5 * (a * dx * dx + cc * dy * dy) - b * dx * dy
        alpha = jnp.minimum(cfg.alpha_max, op[:, None, None, :] * jnp.exp(power))
        alpha = jnp.where(power > 0.0, 0.0, alpha)
        alpha = jnp.where(alpha < cfg.alpha_min, 0.0, alpha)
        alpha = jnp.where(cok[:, None, None, :], alpha, 0.0)

        one_minus = 1.0 - alpha
        T_incl = jnp.cumprod(one_minus, axis=-1)
        # exclusive transmittance product (shifted inclusive cumprod)
        T_excl = jnp.concatenate(
            [jnp.ones_like(T_incl[..., :1]), T_incl[..., :-1]], axis=-1
        )
        w = alpha * T_excl  # (C, t, t, K)

        rgb = jnp.einsum("cijk,ckr->cijr", w, col)
        acc_alpha = jnp.sum(w, axis=-1)
        depth_im = jnp.einsum("cijk,ck->cij", w, dep)
        T_final = T_incl[..., -1]
        rgb = rgb + T_final[..., None] * bg[None, None, None, :]
        return rgb, depth_im, acc_alpha

    c = cfg.tile_chunk
    pad = (-n_tiles) % c
    cidx = jnp.pad(idx, ((0, pad), (0, 0))).reshape(-1, c, cfg.max_per_tile)
    cok = jnp.pad(ok, ((0, pad), (0, 0))).reshape(-1, c, cfg.max_per_tile)
    cx0 = jnp.pad(tile_x0, (0, pad)).reshape(-1, c)
    cy0 = jnp.pad(tile_y0, (0, pad)).reshape(-1, c)

    rgb, depth_im, acc = jax.lax.map(per_chunk, (cidx, cok, cx0, cy0))
    # (n_chunks, C, t, t, ...) → (ty, tx, t, t, ...) → (H, W, ...)
    def untile(a):
        a = a.reshape((n_tiles + pad,) + a.shape[2:])[:n_tiles]
        a = a.reshape((ty, tx, t, t) + a.shape[3:])
        a = jnp.moveaxis(a, 2, 1).reshape((ty * t, tx * t) + a.shape[4:])
        return a[: cfg.height, : cfg.width]

    return untile(rgb), untile(depth_im), untile(acc)




@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _composite_fields(fields, origins, tile, alpha_min, alpha_max):
    """Pallas K-on-lanes compositing (fwd + hand-derived bwd kernels over the
    (T, 12, K) per-tile field layout; ops/rasterize_pallas.py)."""
    from animate3d_tpu.ops.rasterize_pallas import composite_fields_pallas

    interpret = jax.default_backend() != "tpu"
    return composite_fields_pallas(origins, fields, tile=tile,
                                   alpha_min=alpha_min, alpha_max=alpha_max,
                                   interpret=interpret)


def _composite_fields_fwd(fields, origins, tile, alpha_min, alpha_max):
    out = _composite_fields(fields, origins, tile, alpha_min, alpha_max)
    return out, (fields, origins)


def _composite_fields_bwd(tile, alpha_min, alpha_max, res, g):
    fields, origins = res
    from animate3d_tpu.ops.rasterize_pallas import composite_fields_pallas_bwd

    interpret = jax.default_backend() != "tpu"
    grad = composite_fields_pallas_bwd(origins, fields, g, tile=tile,
                                       alpha_min=alpha_min, alpha_max=alpha_max,
                                       interpret=interpret)
    return grad, jnp.zeros_like(origins)


_composite_fields.defvjp(_composite_fields_fwd, _composite_fields_bwd)


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray  # (H, W, 3)
    depth: jnp.ndarray  # (H, W)
    alpha: jnp.ndarray  # (H, W)
    radii: jnp.ndarray  # (N,)
    mean2d: jnp.ndarray  # (N, 2) pixel coords (screenspace grads source)
    overflow: jnp.ndarray = jnp.zeros((), jnp.int32)  # dropped gaussian·tile
    # pairs (K-cap/coarse-k truncation) — 0 means the fixed-K render is exact


@functools.partial(jax.jit, static_argnames=("cfg", "active_sh_degree", "backend"))
def rasterize(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacity: jnp.ndarray,
    camera: GSCameraArrays,
    cfg: RasterConfig,
    shs: Optional[jnp.ndarray] = None,
    colors_precomp: Optional[jnp.ndarray] = None,
    bg: Optional[jnp.ndarray] = None,
    scale_modifier: float = 1.0,
    active_sh_degree: int = 0,
    backend: str = "auto",  # auto | xla | pallas
) -> RenderOutput:
    """Render one view. Differentiable in all gaussian inputs.

    Mirrors the CUDA GaussianRasterizer call surface
    (diff_gaussian_rasterizer_advanced_4d.py:161-170): provide either ``shs``
    (N, K, 3) or ``colors_precomp`` (N, 3). On TPU the compositing stage runs
    as a Pallas kernel (ops/rasterize_pallas.py); gradients flow through the
    matching XLA math either way.
    """
    if bg is None:
        bg = jnp.ones((3,), jnp.float32)
    opacity = opacity.reshape(-1)
    cov3d = build_cov3d(scales, rotations, scale_modifier)
    proj = project_gaussians(means3d, cov3d, camera, cfg)

    if colors_precomp is None:
        assert shs is not None, "need shs or colors_precomp"
        dirs = means3d - camera.camera_center[None, :]
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-9)
        colors = sh_color(active_sh_degree, shs, dirs)
    else:
        colors = colors_precomp

    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu" and cfg.tile == 16)
    use_hier = cfg.coarse > 0 and cfg.tiles_x * cfg.tiles_y > cfg.coarse ** 2

    planes = None
    if use_pallas and use_hier:
        # coarse-direct path: composite every fine tile straight from its
        # coarse parent's depth-sorted candidate list — the alpha gates do
        # the per-fine-tile rejection, so there is no fine binning pass and
        # no per-tile field compaction at all. The only capacity cap is
        # coarse_k (counted below), matching the CUDA kernel's semantics
        # more closely than the old per-fine-tile K cap.
        cidx, cok, c_count, (c_x0, c_y0) = _coarse_select(proj, cfg)
        kc = cidx.shape[1]
        rows10 = jnp.stack([
            proj.mean2d[:, 0], proj.mean2d[:, 1],
            proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
            opacity, colors[:, 0], colors[:, 1], colors[:, 2], proj.depth,
        ])
        cand = rows10[:, cidx]  # (10, n_ct, kc) — small coarse-level gathers
        okrow = cok.astype(jnp.float32)[None]
        # row 11 = 3σ radius: the kernel's per-fine-tile AABB gate (CUDA
        # per-tile list semantics; non-differentiable selection)
        radrow = jax.lax.stop_gradient(proj.radius[cidx])[None]
        fields_c = jnp.concatenate(
            [cand, jax.lax.stop_gradient(okrow), radrow],
            axis=0).transpose(1, 0, 2)  # (n_ct, 12, kc)
        pad_kc = (-kc) % 128
        if pad_kc:
            fields_c = jnp.pad(fields_c, ((0, 0), (0, 0), (0, pad_kc)))
        corigins = jnp.stack([c_x0, c_y0], axis=1)
        planes4 = _composite_coarse_fields(fields_c, corigins, cfg.tile,
                                           cfg.coarse, cfg.alpha_min,
                                           cfg.alpha_max)
        cs = cfg.coarse
        cty = -(-cfg.tiles_y // cs)
        ctx_ = -(-cfg.tiles_x // cs)
        px = cfg.tile * cfg.tile
        p = planes4.reshape(cty, ctx_, cs, cs, 8, px)
        p = p.transpose(0, 2, 1, 3, 4, 5).reshape(cty * cs, ctx_ * cs, 8, px)
        planes = p[: cfg.tiles_y, : cfg.tiles_x].reshape(-1, 8, px)
        overflow = jnp.sum(jnp.maximum(c_count - kc, 0))
    elif use_hier:
        idx, ok, overflow = _tile_select_hier(proj, cfg)
    else:
        idx, ok, overflow = _tile_select(proj, cfg)

    if use_pallas:
        if planes is None:
            from animate3d_tpu.ops.rasterize_pallas import pack_fields

            fields = pack_fields(proj, colors, opacity, idx, ok)
            t_tiles = fields.shape[0]
            tile_ids = jnp.arange(t_tiles, dtype=jnp.float32)
            origins = jnp.stack([(tile_ids % cfg.tiles_x) * cfg.tile,
                                 (tile_ids // cfg.tiles_x) * cfg.tile], axis=1)
            planes = _composite_fields(fields, origins, cfg.tile,
                                       cfg.alpha_min, cfg.alpha_max)

        def untile(a):  # (T, PX) → (H, W)
            a = a.reshape(cfg.tiles_y, cfg.tiles_x, cfg.tile, cfg.tile)
            a = jnp.moveaxis(a, 2, 1).reshape(cfg.tiles_y * cfg.tile,
                                              cfg.tiles_x * cfg.tile)
            return a[: cfg.height, : cfg.width]

        t_final = untile(planes[:, 5])
        rgb = jnp.stack([untile(planes[:, i]) for i in range(3)], axis=-1)
        rgb = rgb + t_final[..., None] * bg[None, None, :]
        alpha = untile(planes[:, 3])
        depth = untile(planes[:, 4])
    else:
        rgb, depth, alpha = _composite(proj, colors, opacity, bg, idx, ok, cfg)
    return RenderOutput(rgb=rgb, depth=depth, alpha=alpha, radii=proj.radius,
                        mean2d=proj.mean2d, overflow=overflow)
