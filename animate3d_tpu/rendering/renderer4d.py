"""4D gaussian batch renderer: deform → rasterize, vmapped over view·frame.

Parity target: custom/threestudio-animate3d/renderer/
diff_gaussian_rasterizer_advanced_4d.py + gaussian_batch_renderer_4d.py —

  * timestamp == −1 renders the static (undeformed) asset
    (diff_gaussian_rasterizer_advanced_4d.py:77-83);
  * reconstruction mode applies a per-gaussian 10% straight-through gradient
    mask to means/scales/rotations (:147-159);
  * guidance mode additionally deforms scales (:130-135);
  * outputs rgb/depth/alpha plus the deformed means/scales/rotations per
    frame for ARAP and trajectory export (:179-191).

TPU design: the reference's 64-iteration Python loop over view-frame pairs
(gaussian_batch_renderer_4d.py:27) becomes one vmap; the static-frame branch
is a jnp.where on the deformation output (no data-dependent control flow).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from animate3d_tpu.gaussians.state import GaussianState
from animate3d_tpu.ops.rasterize import (
    GSCameraArrays,
    RasterConfig,
    RenderOutput,
    rasterize,
)


@dataclass(frozen=True)
class Renderer4DConfig:
    height: int = 256
    width: int = 256
    back_ground_color: tuple = (1.0, 1.0, 1.0)
    invert_bg_prob: float = 1.0  # P(keep bg) — matches reference semantics
    first_frame_trainable: bool = False
    straight_through_prob: float = 0.1
    max_per_tile: int = 256
    tile_chunk: int = 32
    # views composited per lax.map step: bounds the padded gather buffers of
    # the tile binning (narrow trailing dims pad to the 128-lane width, so a
    # full 64-view vmap would allocate ~64× the logical bytes)
    view_chunk: int = 8
    # False ⇒ exact top_k binning (no approx_max_k recall loss) — used for
    # final --test renders so evaluation images are bit-faithful
    approx_binning: bool = True

    def raster_config(self, sh_degree: int = 0) -> RasterConfig:
        return RasterConfig(
            height=self.height, width=self.width,
            max_per_tile=self.max_per_tile, tile_chunk=self.tile_chunk,
            sh_degree=sh_degree, approx_binning=self.approx_binning,
        )


class Render4DOutput(NamedTuple):
    rgb: jnp.ndarray  # (B, H, W, 3)
    depth: jnp.ndarray  # (B, H, W)
    alpha: jnp.ndarray  # (B, H, W)
    radii: jnp.ndarray  # (B, N)
    means3d: jnp.ndarray  # (B, N, 3) deformed positions (trajectory export)
    rotations: jnp.ndarray  # (B, N, 4)
    scales: jnp.ndarray  # (B, N, 3)
    overflow: jnp.ndarray = jnp.zeros((), jnp.int32)  # total dropped
    # gaussian·tile pairs across the batch (binning K-cap truncation);
    # 0 ⇒ the fixed-capacity render was exact for every view


def render_batch(
    state: GaussianState,
    deform_fn: Optional[Callable],  # (state, t, deform_scales) -> (xyz, rot, scales, feats)
    cameras: GSCameraArrays,  # stacked (B, ...) camera pytree
    timestamps: jnp.ndarray,  # (B,) in [-1, 1]; -1 ⇒ static frame
    cfg: Renderer4DConfig,
    key: Optional[jax.Array] = None,
    do_reconstruction: bool = True,
    do_guidance: bool = False,
    bg_color: Optional[jnp.ndarray] = None,
) -> Render4DOutput:
    b = timestamps.shape[0]
    raster_cfg = cfg.raster_config(sh_degree=state.sh_degree)
    opacity = state.get_opacity().reshape(-1)
    shs = state.get_features()
    if bg_color is None:
        bg_color = jnp.asarray(cfg.back_ground_color, jnp.float32)
    if do_reconstruction and key is not None and cfg.invert_bg_prob < 1.0:
        # training-only background inversion with prob 1 − invert_bg_prob
        # (diff_gaussian_rasterizer_advanced_4d.py:64-70: invert when
        # rand() > invert_bg_prob; prob 1.0 ⇒ never inverted)
        key, k_bg = jax.random.split(key)
        invert = jax.random.uniform(k_bg, ()) > cfg.invert_bg_prob
        bg_color = jnp.where(invert, 1.0 - bg_color, bg_color)

    static_scales = state.get_scaling()
    static_rot = state.get_rotation()

    keys = (jax.random.split(key, b) if key is not None
            else jnp.zeros((b, 2), jnp.uint32))

    def render_one(camera, t, k):
        if deform_fn is not None:
            xyz_d, rot_d, scales_d, _ = deform_fn(state, t, do_guidance)
            is_static = jnp.logical_and(t == -1.0,
                                        not cfg.first_frame_trainable)
            xyz = jnp.where(is_static, state.xyz, xyz_d)
            rot = jnp.where(is_static, static_rot, rot_d)
            scales = jnp.where(is_static, static_scales, scales_d)
        else:
            xyz, rot, scales = state.xyz, static_rot, static_scales

        if do_reconstruction and not do_guidance and key is not None:
            # 10% straight-through gradient mask (:147-159)
            mask = (jax.random.uniform(k, (xyz.shape[0], 1))
                    < cfg.straight_through_prob).astype(xyz.dtype)
            st = lambda v, m: v * m + jax.lax.stop_gradient(v) * (1 - m)
            xyz_in = st(xyz, mask)
            scales_in = st(scales, mask)
            rot_in = st(rot, mask)
        else:
            xyz_in, scales_in, rot_in = xyz, scales, rot

        if not do_reconstruction:
            xyz_in = jax.lax.stop_gradient(xyz_in)

        out = rasterize(
            xyz_in, scales_in, rot_in, opacity, camera, raster_cfg,
            shs=shs, bg=bg_color, active_sh_degree=state.active_sh_degree,
        )
        return (jnp.clip(out.rgb, 0.0, 1.0), out.depth, out.alpha, out.radii,
                xyz, rot, scales, out.overflow)

    # shrink the per-chunk view count as tile count grows so the per-view
    # channel planes (tiles · 8 · px) stay modest under the vmap; the
    # coarse-direct compositing path (ops/rasterize.py) keeps per-view
    # residuals at ~6 MB even at 1024², so no remat is needed
    rcfg0 = cfg.raster_config()
    tiles = rcfg0.tiles_x * rcfg0.tiles_y
    mem_cap = max(1, (1 << 26) // max(tiles * 8 * rcfg0.tile ** 2, 1))
    c = min(cfg.view_chunk, mem_cap, b)
    pad = (-b) % c

    def pad_chunk(x):
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
        return x.reshape((-1, c) + x.shape[1:])

    chunked = jax.tree_util.tree_map(pad_chunk, (cameras, timestamps, keys))
    outs = jax.lax.map(lambda args: jax.vmap(render_one)(*args), chunked)
    rgb, depth, alpha, radii, means, rots, scales, ovf = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:])[:b], outs)
    return Render4DOutput(rgb=rgb, depth=depth, alpha=alpha, radii=radii,
                          means3d=means, rotations=rots, scales=scales,
                          overflow=jnp.sum(ovf))
