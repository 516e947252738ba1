import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from animate3d_tpu.utils import rotation as rot
from animate3d_tpu.utils import sh


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_quat_to_matrix_vs_scipy():
    q = random_quats(64)
    ours = rot.quat_to_matrix_np(q)
    theirs = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()  # scipy xyzw
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


def test_matrix_to_quat_roundtrip():
    q = random_quats(256, seed=1)
    m = rot.quat_to_matrix_np(q)
    q2 = rot.matrix_to_quat_np(m)
    # quaternion double cover: compare up to sign
    dots = np.abs(np.sum(q * q2, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-6)


def test_matrix_to_quat_edge_cases():
    # 180° rotations hit the non-trace pivots
    mats = [
        np.diag([1.0, -1.0, -1.0]),  # 180 about x
        np.diag([-1.0, 1.0, -1.0]),  # 180 about y
        np.diag([-1.0, -1.0, 1.0]),  # 180 about z
        np.eye(3),
    ]
    for m in mats:
        q = rot.matrix_to_quat_np(np.asarray(m)[None])
        m2 = rot.quat_to_matrix_np(q)[0]
        np.testing.assert_allclose(m2, m, atol=1e-5)


def test_euler_to_matrix_vs_scipy():
    angles = np.array([0.3, -0.7, 1.2])
    ours = np.asarray(rot.euler_to_matrix(jnp.asarray(angles)))
    theirs = R.from_euler("xyz", angles).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_rotate_quaternions_composition():
    q = random_quats(32, seed=2)
    world = R.from_euler("xyz", [0.2, 0.1, -0.4]).as_matrix()
    q2 = np.asarray(rot.rotate_quaternions(jnp.asarray(q), jnp.asarray(world)))
    m2 = rot.quat_to_matrix_np(q2)
    expected = world[None] @ rot.quat_to_matrix_np(q)
    np.testing.assert_allclose(m2, expected, atol=1e-5)


def test_sh_degree0_constant():
    coeff = np.zeros((5, 1, 3), dtype=np.float32)
    coeff[:, 0, :] = sh.rgb_to_sh(np.array([0.25, 0.5, 0.75], dtype=np.float32))
    dirs = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    col = np.asarray(sh.sh_color(0, jnp.asarray(coeff), jnp.asarray(dirs)))
    np.testing.assert_allclose(col, np.tile([0.25, 0.5, 0.75], (5, 1)), atol=1e-6)


def test_sh_higher_degree_orthogonality():
    # numerically integrate eval_sh over sphere: mean should equal C0*sh0 term
    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(20000, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    coeffs = rng.normal(size=(1, 16, 3)).astype(np.float32)
    vals = np.asarray(
        sh.eval_sh(3, jnp.asarray(np.tile(coeffs, (dirs.shape[0], 1, 1))), jnp.asarray(dirs, jnp.float32))
    )
    mean = vals.mean(axis=0)
    np.testing.assert_allclose(mean, sh.C0 * coeffs[0, 0], atol=0.02)


def test_rgb_sh_roundtrip():
    rgb = np.array([[0.1, 0.6, 0.9]])
    np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, atol=1e-12)
