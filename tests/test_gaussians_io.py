import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from animate3d_tpu.gaussians.ply import (
    read_gaussian_ply,
    write_gaussian_ply,
    load_gaussians,
    asset_transform_matrix,
)
from animate3d_tpu.gaussians.state import GaussianState, from_point_cloud, BasicPointCloud
from animate3d_tpu.tools import mesh2gaussian
from animate3d_tpu.utils import rotation as rotu


def make_state(n=10, sh_degree=0, seed=0):
    rng = np.random.default_rng(seed)
    k = (sh_degree + 1) ** 2
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return GaussianState(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        features_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
        features_rest=rng.normal(size=(n, k - 1, 3)).astype(np.float32),
        opacity=rng.normal(size=(n, 1)).astype(np.float32),
        scaling=rng.normal(size=(n, 3)).astype(np.float32),
        rotation=q,
        sh_degree=sh_degree,
    )


@pytest.mark.parametrize("sh_degree", [0, 3])
def test_ply_roundtrip(tmp_path, sh_degree):
    state = make_state(17, sh_degree=sh_degree)
    p = str(tmp_path / "test.ply")
    write_gaussian_ply(p, state)
    loaded = read_gaussian_ply(p, max_sh_degree=sh_degree)
    for a, b in [
        (state.xyz, loaded.xyz),
        (state.features_dc, loaded.features_dc),
        (state.features_rest, loaded.features_rest),
        (state.opacity, loaded.opacity),
        (state.scaling, loaded.scaling),
        (state.rotation, loaded.rotation),
    ]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_load_gaussians_transform(tmp_path):
    state = make_state(8)
    p = str(tmp_path / "asset.ply")
    write_gaussian_ply(p, state)
    loaded = load_gaussians(p, rot_x_degree=90.0, rot_z_degree=45.0, scale_factor=2.0)
    rot = asset_transform_matrix(90.0, 45.0)
    np.testing.assert_allclose(
        np.asarray(loaded.xyz), (rot @ np.asarray(state.xyz).T).T * 2.0, atol=1e-5
    )
    # scales multiply in linear space
    np.testing.assert_allclose(
        np.exp(np.asarray(loaded.scaling)), np.exp(np.asarray(state.scaling)) * 2.0, rtol=1e-5
    )
    # quaternions rotated by the world rotation
    m_exp = rot @ rotu.quat_to_matrix_np(np.asarray(state.rotation, np.float64))
    m_got = rotu.quat_to_matrix_np(np.asarray(loaded.rotation, np.float64))
    np.testing.assert_allclose(m_got, m_exp, atol=1e-4)


def test_state_activations():
    state = make_state(5)
    assert np.all(np.asarray(state.get_opacity()) > 0)
    assert np.all(np.asarray(state.get_opacity()) < 1)
    assert np.all(np.asarray(state.get_scaling()) > 0)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(state.get_rotation()), axis=1), 1.0, atol=1e-5
    )
    assert state.get_features().shape == (5, 1, 3)


def test_state_is_pytree():
    import jax

    state = make_state(5)
    leaves = jax.tree_util.tree_leaves(state)
    assert len(leaves) == 6
    doubled = jax.tree_util.tree_map(lambda x: x * 2, state)
    np.testing.assert_allclose(np.asarray(doubled.xyz), 2 * np.asarray(state.xyz))


def test_from_point_cloud():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    colors = rng.uniform(size=(50, 3)).astype(np.float32)
    pcd = BasicPointCloud(pts, colors, np.zeros_like(pts))
    state = from_point_cloud(pcd, sh_degree=0, opacity_init=0.1)
    assert state.num_points == 50
    np.testing.assert_allclose(np.asarray(state.get_opacity()), 0.1, atol=1e-5)
    assert np.all(np.isfinite(np.asarray(state.scaling)))


TEST_OBJ = """
mtllib cube.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
usemtl Material
f 1/1 2/2 3/3
f 1/1 3/3 4/4
"""


def test_mesh2gaussian_pipeline(tmp_path):
    obj = tmp_path / "quad.obj"
    obj.write_text(TEST_OBJ)
    mesh2gaussian.run(str(obj), str(tmp_path), "quad")

    state = read_gaussian_ply(str(tmp_path / "quad.ply"))
    assert state.xyz.shape == (4, 3)
    # opacity ≈ 1 (inverse_sigmoid(1-1e-5))
    op = 1 / (1 + np.exp(-np.asarray(state.opacity)))
    np.testing.assert_allclose(op, 1.0, atol=1e-4)
    # identity rotations
    np.testing.assert_allclose(np.asarray(state.rotation)[:, 0], 1.0)
    np.testing.assert_allclose(np.asarray(state.rotation)[:, 1:], 0.0)

    conn = json.load(open(tmp_path / "quad.json"))
    # vertex 0 is connected to 1, 2, 3; vertex 1 to 0, 2
    assert set(conn["0"].keys()) == {"1", "2", "3"}
    assert set(conn["1"].keys()) == {"0", "2"}
    assert conn["0"]["1"] == pytest.approx(1.0)
    assert conn["0"]["2"] == pytest.approx(np.sqrt(2), abs=1e-6)


def test_mean_edge_scale_semantics(tmp_path):
    # vertex 1's neighbors (0 and 2): |edges| = (1,0,0) and (0,1,0) → mean (0.5,0.5,0)
    obj = tmp_path / "quad.obj"
    obj.write_text(TEST_OBJ)
    state = mesh2gaussian.mesh_to_gaussians(str(obj), edge_shrink=1.1)
    scales = np.exp(np.asarray(state.scaling))
    np.testing.assert_allclose(scales[1][:2], np.array([0.5, 0.5]) / 1.1, atol=1e-5)
