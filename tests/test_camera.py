import math

import numpy as np
import pytest

from animate3d_tpu.utils import camera as cam


def test_generate_c2w_frontal():
    # elevation 0, azimuth 0: camera at (1,0,0) looking at origin; up = +z
    c2w = cam.generate_c2w(0.0, 0.0)[0]
    np.testing.assert_allclose(c2w[:3, 3], [1, 0, 0], atol=1e-12)
    # -lookat column (3rd rotation column) points away from origin: +x
    np.testing.assert_allclose(c2w[:3, 2], [1, 0, 0], atol=1e-12)
    # up column is world +z
    np.testing.assert_allclose(c2w[:3, 1], [0, 0, 1], atol=1e-12)
    # right column: lookat=(-1,0,0), up=+z -> right = lookat x up = (0,1,0)... sign check
    np.testing.assert_allclose(c2w[:3, 0], np.cross([-1, 0, 0], [0, 0, 1]), atol=1e-12)


def test_c2w_orthonormal():
    rng = np.random.default_rng(1)
    for _ in range(10):
        elev = rng.uniform(-80, 80)
        azim = rng.uniform(0, 360)
        R = cam.generate_c2w(elev, azim)[0][:3, :3]
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-10)
        assert np.linalg.det(R) == pytest.approx(1.0)


def test_get_camera_shape_and_normalization():
    cams = cam.get_camera(4, elevation=15.0)
    assert cams.shape == (4, 16)
    assert cams.dtype == np.float32
    t = cams.reshape(4, 4, 4)[:, :3, 3]
    np.testing.assert_allclose(np.linalg.norm(t, axis=1), 1.0, atol=1e-5)
    # azimuths 0/90/180/270: positions related by 90° z-rotations
    p = t
    rot90 = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float64)
    np.testing.assert_allclose(rot90 @ p[0], p[1], atol=1e-5)


def test_get_camera_elevation():
    cams = cam.get_camera(1, elevation=90.0)
    t = cams.reshape(4, 4)[:3, 3]
    np.testing.assert_allclose(t, [0, 0, 1], atol=1e-6)


def test_gs_camera_center_matches_c2w():
    c2w = cam.generate_c2w(20.0, 40.0, distance=3.0)[0]
    wv, fp, center = cam.gs_camera_info(c2w, math.radians(40), math.radians(40))
    np.testing.assert_allclose(center, c2w[:3, 3], atol=1e-5)


def test_gs_projection_depth_range():
    znear, zfar = 0.1, 100.0
    P = cam.gs_projection_matrix(znear, zfar, math.radians(60), math.radians(60))
    # point at z=znear maps to ndc z=0; z=zfar maps to 1 (after /w)
    for z, expect in [(znear, 0.0), (zfar, 1.0)]:
        v = P @ np.array([0, 0, z, 1.0])
        assert v[2] / v[3] == pytest.approx(expect, abs=1e-6)


def test_world_point_projects_to_center():
    # camera at distance 3 on +x axis looking at origin: origin should project
    # to NDC (0, 0), depth ~3
    c2w = cam.generate_c2w(0.0, 0.0, distance=3.0)[0]
    gscam = cam.gs_camera(c2w, math.radians(40), math.radians(40), 64, 64)
    p = np.array([0.0, 0.0, 0.0, 1.0], dtype=np.float32)
    h = p @ gscam.full_proj
    ndc = h[:3] / h[3]
    np.testing.assert_allclose(ndc[:2], [0, 0], atol=1e-6)
    pv = p @ gscam.world_view
    assert pv[2] == pytest.approx(3.0, abs=1e-5)


def test_rays_through_center_pixel():
    H = W = 9
    focal = cam.focal_from_fov(math.radians(60), H)
    dirs = cam.get_ray_directions(H, W, focal, use_pixel_centers=True)
    c2w = cam.generate_c2w(0.0, 0.0, distance=2.0)[0]
    rays_o, rays_d = cam.get_rays(dirs, c2w.astype(np.float32), keepdim=True)
    center = rays_d[H // 2, W // 2]
    np.testing.assert_allclose(center, [-1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(rays_o[0, 0], c2w[:3, 3], atol=1e-6)


def test_mvp_matrix_roundtrip():
    c2w = cam.generate_c2w(10.0, 30.0, distance=2.5).astype(np.float32)
    proj = cam.get_projection_matrix(np.array([math.radians(40)]), 1.0, 0.1, 1000.0)
    mvp = cam.get_mvp_matrix(c2w, proj)
    # origin must land at ndc x,y = 0
    h = mvp[0] @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(h[:2] / h[3], [0, 0], atol=1e-5)


def test_testset_grid_pairs_elevation_with_its_own_azimuth_set():
    """The paper-metrics grid pairs elevation i with azimuth-set i
    (uncond_hybrid.py:576-580 reshape/repeat_interleave), NOT a Cartesian
    product; defaults mirror visualize_testset_frame_16.yaml:38-39."""
    from animate3d_tpu.data.cameras import testset_grid_cameras

    F = 2
    batch = testset_grid_cameras(total_frame=F, height=8, width=8)
    elev = batch["elevation"][::F]
    azim = batch["azimuth"][::F]
    assert len(elev) == 12
    np.testing.assert_allclose(elev, [15.0] * 4 + [0.0] * 4 + [30.0] * 4)
    np.testing.assert_allclose(
        azim, [0, 90, 180, 270, 30, 120, 210, 300, -45, 45, 135, 225])
    # one timestamp sweep per view
    np.testing.assert_allclose(batch["timestamps"][:F],
                               np.linspace(-1.0, 1.0, F))

    with pytest.raises(ValueError):
        testset_grid_cameras(elevations_deg=(0.0, 15.0),
                             azimuth_sets_deg=((0.0,),))
