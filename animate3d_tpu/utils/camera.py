"""Camera math (host-side NumPy).

Conventions follow the reference exactly so conditioning embeddings and
renders are comparable:

  * World: +z up, scene centered at origin.
  * c2w (OpenGL-style): columns are (right, up, -lookat), translation = camera
    position (reference: animatediff/pipelines/pipeline.py:137-175).
  * The MV-VDM camera embedding input is the *unit-translation-normalized*
    flattened 4x4 c2w → 16-d (pipeline.py:127-190).
  * The gaussian rasterizer uses the COLMAP-style convention (x right,
    y down, z forward), reached by flipping the y/z axes of the c2w
    (threestudio/utils/ops.py:307-313), with row-vector (transposed)
    view/projection matrices (ops.py:316-359).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple, Union

import numpy as np


def spherical_camera_position(
    elevation_deg: np.ndarray, azimuth_deg: np.ndarray, distance: np.ndarray
) -> np.ndarray:
    """Camera positions on a sphere; elevation from the xy-plane, azimuth about +z."""
    elev = np.deg2rad(np.asarray(elevation_deg, dtype=np.float64))
    azim = np.deg2rad(np.asarray(azimuth_deg, dtype=np.float64))
    dist = np.asarray(distance, dtype=np.float64)
    return np.stack(
        [
            dist * np.cos(elev) * np.cos(azim),
            dist * np.cos(elev) * np.sin(azim),
            dist * np.sin(elev),
        ],
        axis=-1,
    )


def look_at_c2w(
    camera_position: np.ndarray,
    center: Optional[np.ndarray] = None,
    up: Tuple[float, float, float] = (0.0, 0.0, 1.0),
) -> np.ndarray:
    """Batched look-at c2w (..., 4, 4), OpenGL column convention."""
    pos = np.asarray(camera_position, dtype=np.float64)
    if center is None:
        center = np.zeros_like(pos)
    up_v = np.broadcast_to(np.asarray(up, dtype=np.float64), pos.shape)

    def _norm(v):
        return v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)

    lookat = _norm(center - pos)
    right = _norm(np.cross(lookat, up_v))
    up_o = _norm(np.cross(right, lookat))
    rot = np.stack([right, up_o, -lookat], axis=-1)  # columns
    c2w = np.zeros(pos.shape[:-1] + (4, 4), dtype=np.float64)
    c2w[..., :3, :3] = rot
    c2w[..., :3, 3] = pos
    c2w[..., 3, 3] = 1.0
    return c2w


def generate_c2w(elevation_deg: float, azimuth_deg: float, distance: float = 1.0) -> np.ndarray:
    """(1, 4, 4) c2w (reference: pipeline.py:137-175)."""
    pos = spherical_camera_position(elevation_deg, azimuth_deg, distance)
    return look_at_c2w(np.atleast_2d(pos))


def normalize_c2w(c2w: np.ndarray) -> np.ndarray:
    """Normalize the camera location onto the unit sphere (pipeline.py:178-190)."""
    c2w = np.array(c2w, dtype=np.float64).reshape(-1, 4, 4)
    t = c2w[:, :3, 3]
    c2w[:, :3, 3] = t / (np.linalg.norm(t, axis=1, keepdims=True) + 1e-8)
    return c2w


def get_camera(
    num_views: int,
    elevation: float = 15.0,
    azimuth_start: float = 0.0,
    azimuth_span: float = 360.0,
) -> np.ndarray:
    """MV-VDM conditioning cameras: (num_views, 16) float32 flattened
    unit-translation c2w (reference: pipeline.py:127-135)."""
    gap = azimuth_span / num_views
    azimuths = np.arange(azimuth_start, azimuth_span + azimuth_start, gap)[:num_views]
    mats = [normalize_c2w(generate_c2w(elevation, float(a))).reshape(16) for a in azimuths]
    return np.stack(mats, axis=0).astype(np.float32)


def camera_16d(c2w: np.ndarray) -> np.ndarray:
    """Flatten arbitrary (..., 4, 4) c2w to the normalized 16-d embedding input."""
    c2w = np.asarray(c2w, dtype=np.float64)
    flat = normalize_c2w(c2w.reshape(-1, 4, 4)).reshape(c2w.shape[:-2] + (16,))
    return flat.astype(np.float32)


# ---------------------------------------------------------------------------
# Ray generation (for data samplers / parity with threestudio ops)
# ---------------------------------------------------------------------------


def get_ray_directions(
    H: int,
    W: int,
    focal: Union[float, Tuple[float, float]],
    principal: Optional[Tuple[float, float]] = None,
    use_pixel_centers: bool = True,
) -> np.ndarray:
    """(H, W, 3) camera-frame ray directions (ops.py:180-217)."""
    pc = 0.5 if use_pixel_centers else 0.0
    if isinstance(focal, (int, float)):
        fx = fy = float(focal)
        cx, cy = W / 2, H / 2
    else:
        fx, fy = focal
        assert principal is not None
        cx, cy = principal
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32) + pc,
        np.arange(H, dtype=np.float32) + pc,
        indexing="xy",
    )
    return np.stack([(i - cx) / fx, -(j - cy) / fy, -np.ones_like(i)], axis=-1)


def get_rays(
    directions: np.ndarray,
    c2w: np.ndarray,
    keepdim: bool = False,
    normalize: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """World-frame rays from camera-frame directions (ops.py:219-267).

    Supports directions (H,W,3) w/ c2w (4,4) or (B,4,4), and (B,H,W,3) w/ (B,4,4).
    """
    directions = np.asarray(directions, dtype=np.float32)
    c2w = np.asarray(c2w, dtype=np.float32)
    if directions.ndim == 3 and c2w.ndim == 2:
        rays_d = np.einsum("hwc,rc->hwr", directions, c2w[:3, :3])
        rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape).copy()
    elif directions.ndim == 3 and c2w.ndim == 3:
        rays_d = np.einsum("hwc,brc->bhwr", directions, c2w[:, :3, :3])
        rays_o = np.broadcast_to(c2w[:, None, None, :3, 3], rays_d.shape).copy()
    elif directions.ndim == 4 and c2w.ndim == 3:
        rays_d = np.einsum("bhwc,brc->bhwr", directions, c2w[:, :3, :3])
        rays_o = np.broadcast_to(c2w[:, None, None, :3, 3], rays_d.shape).copy()
    else:
        raise ValueError(f"Unsupported shapes {directions.shape}, {c2w.shape}")
    if normalize:
        rays_d = rays_d / (np.linalg.norm(rays_d, axis=-1, keepdims=True) + 1e-12)
    if not keepdim:
        rays_o, rays_d = rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)
    return rays_o.astype(np.float32), rays_d.astype(np.float32)


def get_projection_matrix(fovy_rad: np.ndarray, aspect_wh: float, near: float, far: float) -> np.ndarray:
    """(B,4,4) perspective projection, y-flipped (ops.py:270-283)."""
    fovy = np.atleast_1d(np.asarray(fovy_rad, dtype=np.float32))
    B = fovy.shape[0]
    proj = np.zeros((B, 4, 4), dtype=np.float32)
    proj[:, 0, 0] = 1.0 / (np.tan(fovy / 2.0) * aspect_wh)
    proj[:, 1, 1] = -1.0 / np.tan(fovy / 2.0)
    proj[:, 2, 2] = -(far + near) / (far - near)
    proj[:, 2, 3] = -2.0 * far * near / (far - near)
    proj[:, 3, 2] = -1.0
    return proj


def get_mvp_matrix(c2w: np.ndarray, proj: np.ndarray) -> np.ndarray:
    """(B,4,4) model-view-projection (ops.py:286-297)."""
    c2w = np.asarray(c2w, dtype=np.float32)
    w2c = np.zeros_like(c2w)
    rT = np.swapaxes(c2w[:, :3, :3], -1, -2)
    w2c[:, :3, :3] = rT
    w2c[:, :3, 3] = -np.einsum("bij,bj->bi", rT, c2w[:, :3, 3])
    w2c[:, 3, 3] = 1.0
    return proj @ w2c


# ---------------------------------------------------------------------------
# Gaussian-splatting camera (COLMAP convention, row-vector matrices)
# ---------------------------------------------------------------------------


def convert_pose(c2w: np.ndarray) -> np.ndarray:
    """OpenGL → COLMAP: flip camera y and z axes (ops.py:307-313)."""
    flip = np.eye(4, dtype=np.float64)
    flip[1, 1] = -1.0
    flip[2, 2] = -1.0
    return np.asarray(c2w, dtype=np.float64) @ flip


def gs_projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Gaussian-splatting projection matrix (column convention; ops.py:316-334)."""
    tan_y = math.tan(fovy / 2)
    tan_x = math.tan(fovx / 2)
    top = tan_y * znear
    right = tan_x * znear
    P = np.zeros((4, 4), dtype=np.float64)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


class GSCamera(NamedTuple):
    """Everything the rasterizer needs, float32. Matrices are in the
    reference's row-vector (transposed) layout: ``x_view = x_world @ world_view``."""

    world_view: np.ndarray  # (4,4) transposed w2c
    full_proj: np.ndarray  # (4,4) world_view @ proj^T
    camera_center: np.ndarray  # (3,)
    tanfovx: float
    tanfovy: float
    fovx: float
    fovy: float
    height: int
    width: int


def gs_camera_info(
    c2w: np.ndarray, fovx: float, fovy: float, znear: float = 0.1, zfar: float = 100.0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(world_view^T, full_proj^T, camera_center) as in ops.py:344-359."""
    c2w_cv = convert_pose(c2w)
    w2c = np.linalg.inv(c2w_cv)
    world_view = w2c.T
    proj = gs_projection_matrix(znear, zfar, fovx, fovy).T
    full_proj = world_view @ proj
    camera_center = np.linalg.inv(world_view)[3, :3]
    return (
        world_view.astype(np.float32),
        full_proj.astype(np.float32),
        camera_center.astype(np.float32),
    )


def gs_camera(
    c2w: np.ndarray,
    fovx: float,
    fovy: float,
    height: int,
    width: int,
    znear: float = 0.1,
    zfar: float = 100.0,
) -> GSCamera:
    wv, fp, cc = gs_camera_info(c2w, fovx, fovy, znear, zfar)
    return GSCamera(
        world_view=wv,
        full_proj=fp,
        camera_center=cc,
        tanfovx=math.tan(fovx * 0.5),
        tanfovy=math.tan(fovy * 0.5),
        fovx=float(fovx),
        fovy=float(fovy),
        height=int(height),
        width=int(width),
    )


def fov_from_intrinsics(focal: float, size: float) -> float:
    return 2.0 * math.atan(size / (2.0 * focal))


def focal_from_fov(fov: float, size: float) -> float:
    return 0.5 * size / math.tan(0.5 * fov)
