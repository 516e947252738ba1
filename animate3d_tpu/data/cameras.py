"""Camera batch samplers (host-side NumPy).

Parity targets:
  * hybrid random-camera sampler — MVDream-style 4-view azimuth coverage with
    a shared random offset, uniform-or-sphere elevation sampling, fov/zoom/
    distance ranges, progressive view widening, and a time axis of
    ``linspace(-1, 1, F)`` per item
    (custom/threestudio-animate3d/data/uncond_hybrid.py:177-268, 399-406);
  * fixed 4-view conditioning cameras (elev 15°, azim 0/90/180/270, dist 3,
    fovy 40°) used by the multi-image dataset
    (data/simple_multi_image.py:120-190 + configs);
  * deterministic val orbit / 3-elevation × 4-azimuth test grid
    (uncond_hybrid.py:426-700).

Each sampler returns a dict of numpy arrays with leading axis
B = batch · n_view · total_frame (view-major, frame-minor) containing c2w,
fovy, timestamps, rays, mvp — superset of the reference batch contract.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from animate3d_tpu.utils import camera as camu


@dataclass
class RandomCameraConfig:
    batch_size: int = 64
    n_view: int = 4
    total_frame: int = 16
    width: int = 256
    height: int = 256
    eval_width: int = 512
    eval_height: int = 512
    elevation_range: Tuple[float, float] = (0.0, 30.0)
    azimuth_range: Tuple[float, float] = (-180.0, 180.0)
    camera_distance_range: Tuple[float, float] = (0.8, 1.0)  # relative
    fovy_range: Tuple[float, float] = (15.0, 60.0)
    zoom_range: Tuple[float, float] = (1.0, 1.0)
    relative_radius: bool = True
    camera_perturb: float = 0.0
    center_perturb: float = 0.0
    up_perturb: float = 0.0
    light_distance_range: Tuple[float, float] = (7.5, 10.0)
    eval_elevation_deg: float = 15.0
    eval_camera_distance: float = 3.0
    eval_fovy_deg: float = 40.0
    n_val_views: int = 128
    n_test_views: int = 120
    progressive_until: int = 0
    rays_d_normalize: bool = True


def _camera_batch(
    c2w: np.ndarray,
    fovy_deg: np.ndarray,
    height: int,
    width: int,
    timestamps: np.ndarray,
    elevation_deg: np.ndarray,
    azimuth_deg: np.ndarray,
    camera_distances: np.ndarray,
    rays_d_normalize: bool = True,
) -> Dict[str, np.ndarray]:
    b = c2w.shape[0]
    fovy = np.deg2rad(fovy_deg)
    focal = 0.5 * height / np.tan(0.5 * fovy)
    dirs = camu.get_ray_directions(height, width, 1.0)  # unit focal
    dirs = np.tile(dirs[None], (b, 1, 1, 1))
    dirs[:, :, :, :2] /= focal[:, None, None, None]
    rays_o, rays_d = camu.get_rays(dirs, c2w.astype(np.float32), keepdim=True,
                                   normalize=rays_d_normalize)
    proj = camu.get_projection_matrix(fovy, width / height, 0.01, 100.0)
    mvp = camu.get_mvp_matrix(c2w.astype(np.float32), proj)
    return {
        "c2w": c2w.astype(np.float32),
        "fovy": fovy.astype(np.float32),
        "rays_o": rays_o,
        "rays_d": rays_d,
        "mvp_mtx": mvp,
        "camera_positions": c2w[:, :3, 3].astype(np.float32),
        "elevation": elevation_deg.astype(np.float32),
        "azimuth": azimuth_deg.astype(np.float32),
        "camera_distances": camera_distances.astype(np.float32),
        "timestamps": timestamps.astype(np.float32),
        "height": height,
        "width": width,
    }


from animate3d_tpu.core.registry import register


@register("hybrid-random-camera-datamodule")
class HybridRandomCameraSampler:
    """Random 4-view × F-frame camera batches for SDS."""

    def __init__(self, cfg: RandomCameraConfig, seed: int = 0):
        self.cfg = cfg
        self.rng = np.random.default_rng(seed)
        self.elevation_range = list(cfg.elevation_range)
        self.azimuth_range = list(cfg.azimuth_range)

    def update_step(self, global_step: int) -> None:
        """Progressive view widening (uncond_hybrid.py:176-186)."""
        cfg = self.cfg
        r = min(1.0, global_step / (cfg.progressive_until + 1))
        self.elevation_range = [
            (1 - r) * cfg.eval_elevation_deg + r * cfg.elevation_range[0],
            (1 - r) * cfg.eval_elevation_deg + r * cfg.elevation_range[1],
        ]
        self.azimuth_range = [r * cfg.azimuth_range[0], r * cfg.azimuth_range[1]]

    def sample(self) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        rng = self.rng
        nv, nf = cfg.n_view, cfg.total_frame
        nvf = nv * nf
        assert cfg.batch_size % nvf == 0
        rb = cfg.batch_size // nvf

        # elevation: uniform-in-angle or uniform-on-sphere, 50/50
        if rng.random() < 0.5:
            elev_deg = rng.uniform(*self.elevation_range, size=rb)
        else:
            lo, hi = np.deg2rad(self.elevation_range)
            elev = np.arcsin(rng.uniform(np.sin(lo), np.sin(hi), size=rb))
            elev_deg = np.rad2deg(elev)
        elev_deg = np.repeat(elev_deg, nvf)

        # azimuth: evenly cover the range with a shared random offset per item
        az_span = self.azimuth_range[1] - self.azimuth_range[0]
        azim_deg = (
            (rng.random(rb)[:, None] + np.arange(nv)[None, :]) / nv * az_span
            + self.azimuth_range[0]
        ).reshape(-1)
        azim_deg = np.repeat(azim_deg, nf)

        fovy_deg = np.repeat(rng.uniform(*cfg.fovy_range, size=rb), nvf)
        dist = np.repeat(rng.uniform(*cfg.camera_distance_range, size=rb), nvf)
        if cfg.relative_radius:
            dist = dist / np.tan(0.5 * np.deg2rad(fovy_deg))
        zoom = np.repeat(rng.uniform(*cfg.zoom_range, size=rb), nvf)
        fovy_deg = fovy_deg * zoom

        pos = camu.spherical_camera_position(elev_deg, azim_deg, dist)
        pos = pos + rng.uniform(-cfg.camera_perturb, cfg.camera_perturb,
                                size=pos.shape)
        center = rng.normal(0, cfg.center_perturb, size=pos.shape) \
            if cfg.center_perturb > 0 else np.zeros_like(pos)
        up = np.array([0.0, 0.0, 1.0]) + (
            rng.normal(0, cfg.up_perturb, size=3) if cfg.up_perturb > 0 else 0.0)
        c2w = camu.look_at_c2w(pos, center=center, up=tuple(up))

        timestamps = np.tile(np.linspace(-1.0, 1.0, nf), rb * nv)
        return _camera_batch(c2w, fovy_deg, cfg.height, cfg.width, timestamps,
                             elev_deg, azim_deg, dist,
                             rays_d_normalize=cfg.rays_d_normalize)


def fixed_view_cameras(
    elevation_deg: float = 15.0,
    azimuths_deg: Tuple[float, ...] = (0.0, 90.0, 180.0, 270.0),
    distance: float = 3.0,
    fovy_deg: float = 40.0,
    height: int = 256,
    width: int = 256,
    total_frame: int = 16,
    rays_d_normalize: bool = True,
) -> Dict[str, np.ndarray]:
    """The fixed 4 training views × F frames, view-major (simple_multi_image)."""
    nv = len(azimuths_deg)
    elev = np.repeat(np.full(nv, elevation_deg), total_frame)
    azim = np.repeat(np.asarray(azimuths_deg, np.float64), total_frame)
    dist = np.full(nv * total_frame, distance)
    pos = camu.spherical_camera_position(elev, azim, dist)
    c2w = camu.look_at_c2w(pos)
    fovy = np.full(nv * total_frame, fovy_deg)
    timestamps = np.tile(np.linspace(-1.0, 1.0, total_frame), nv)
    return _camera_batch(c2w, fovy, height, width, timestamps, elev, azim, dist,
                         rays_d_normalize=rays_d_normalize)


def orbit_eval_cameras(
    n_views: int,
    elevation_deg: float = 15.0,
    distance: float = 3.0,
    fovy_deg: float = 40.0,
    height: int = 512,
    width: int = 512,
    total_frame: int = 16,
    azimuth_start: float = 0.0,
) -> Dict[str, np.ndarray]:
    """Deterministic validation orbit: n_views azimuths × F timestamps,
    view-major (uncond_hybrid.py val dataset)."""
    azim1 = (np.linspace(0, 360.0, n_views, endpoint=False) + azimuth_start)
    elev = np.repeat(np.full(n_views, elevation_deg), total_frame)
    azim = np.repeat(azim1, total_frame)
    dist = np.full(n_views * total_frame, distance)
    pos = camu.spherical_camera_position(elev, azim, dist)
    c2w = camu.look_at_c2w(pos)
    fovy = np.full(n_views * total_frame, fovy_deg)
    timestamps = np.tile(np.linspace(-1.0, 1.0, total_frame), n_views)
    return _camera_batch(c2w, fovy, height, width, timestamps, elev, azim, dist)


def val_orbit_cameras(
    n_views: int = 120,
    elevation_deg: float = 15.0,
    distance: float = 3.0,
    fovy_deg: float = 40.0,
    height: int = 512,
    width: int = 512,
    total_frame: int = 16,
) -> Dict[str, np.ndarray]:
    """Validation orbit VIDEO: azimuth sweeps 0→360° while the animation time
    sweeps −1→1 in lockstep — one n_views-frame clip of the moving asset seen
    from a rotating camera (uncond_hybrid.py:426-559 val dataset semantics;
    timestamps cycle through the F animation frames as the camera orbits)."""
    azim = np.linspace(0.0, 360.0, n_views, endpoint=False)
    elev = np.full(n_views, elevation_deg)
    dist = np.full(n_views, distance)
    pos = camu.spherical_camera_position(elev, azim, dist)
    c2w = camu.look_at_c2w(pos)
    fovy = np.full(n_views, fovy_deg)
    frame_idx = np.arange(n_views) % total_frame
    timestamps = np.linspace(-1.0, 1.0, total_frame)[frame_idx]
    return _camera_batch(c2w, fovy, height, width, timestamps, elev, azim, dist)


def testset_grid_cameras(
    elevations_deg: Tuple[float, ...] = (15.0, 0.0, 30.0),
    azimuth_sets_deg: Tuple[Tuple[float, ...], ...] = (
        (0.0, 90.0, 180.0, 270.0),
        (30.0, 120.0, 210.0, 300.0),
        (-45.0, 45.0, 135.0, 225.0),
    ),
    distance: float = 3.0,
    fovy_deg: float = 40.0,
    height: int = 512,
    width: int = 512,
    total_frame: int = 16,
) -> Dict[str, np.ndarray]:
    """3-elevation × 4-azimuth evaluation grid — the paper-metrics render
    surface. Each elevation is paired with its OWN azimuth set (reference
    uncond_hybrid.py:576-580: ``azimuth = eval_azimuth_deg.reshape(-1)``,
    ``elevation = eval_elevation_deg.repeat_interleave(len(sets[0]))`` —
    NOT a Cartesian product), defaults from
    visualize_testset_frame_16.yaml:38-39."""
    if len(azimuth_sets_deg) != len(elevations_deg):
        raise ValueError(
            f"eval_azimuth_deg needs one azimuth set per elevation "
            f"({len(elevations_deg)} elevations, {len(azimuth_sets_deg)} sets)")
    views = [(e, a) for e, s in zip(elevations_deg, azimuth_sets_deg)
             for a in s]
    elev = np.repeat(np.asarray([v[0] for v in views]), total_frame)
    azim = np.repeat(np.asarray([v[1] for v in views]), total_frame)
    n = len(views) * total_frame
    dist = np.full(n, distance)
    pos = camu.spherical_camera_position(elev, azim, dist)
    c2w = camu.look_at_c2w(pos)
    fovy = np.full(n, fovy_deg)
    timestamps = np.tile(np.linspace(-1.0, 1.0, total_frame), len(views))
    return _camera_batch(c2w, fovy, height, width, timestamps, elev, azim, dist)


def gs_cameras_from_batch(batch: Dict[str, np.ndarray],
                          znear: float = 0.1, zfar: float = 100.0):
    """Batch dict → stacked GSCameraArrays for the rasterizer (the reference's
    per-item get_cam_info_gaussian loop, gaussian_batch_renderer_4d.py:27-49,
    becomes one stacked pytree)."""
    import jax.numpy as jnp
    from animate3d_tpu.ops.rasterize import GSCameraArrays

    c2w = batch["c2w"]
    fovy = batch["fovy"]
    h, w = batch["height"], batch["width"]
    wvs, fps, ccs, tfx, tfy = [], [], [], [], []
    for i in range(c2w.shape[0]):
        fy = float(fovy[i])
        fx = 2.0 * math.atan(math.tan(0.5 * fy) * (w / h))
        wv, fp, cc = camu.gs_camera_info(c2w[i], fx, fy, znear, zfar)
        wvs.append(wv)
        fps.append(fp)
        ccs.append(cc)
        tfx.append(math.tan(0.5 * fx))
        tfy.append(math.tan(0.5 * fy))
    return GSCameraArrays(
        world_view=jnp.asarray(np.stack(wvs)),
        full_proj=jnp.asarray(np.stack(fps)),
        camera_center=jnp.asarray(np.stack(ccs)),
        tanfovx=jnp.asarray(np.asarray(tfx, np.float32)),
        tanfovy=jnp.asarray(np.asarray(tfy, np.float32)),
    )
