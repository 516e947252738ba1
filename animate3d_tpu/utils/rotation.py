"""Quaternion / rotation-matrix utilities (jit-safe, branchless).

Quaternions are (w, x, y, z) as in the gaussian-splatting convention.
Behavior parity: custom/threestudio-animate3d/geometry/utils.py in the
reference (build_rotation / extract_rotation_* / euler_angles_to_rotation_matrix),
rewritten branchless so they are usable inside jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion → (..., 3, 3) rotation matrix."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix → (..., 4) wxyz quaternion, branchless.

    Computes the four classic candidate solutions and selects the numerically
    best (largest pivot) with jnp.where, so it works under jit/vmap (the
    reference's torch version branches on boolean masks, utils.py:75-120).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # case 0: trace pivot
    t0 = safe_sqrt(tr + 1.0) * 2
    q0 = jnp.stack([0.25 * t0, (m21 - m12) / t0, (m02 - m20) / t0, (m10 - m01) / t0], -1)
    # case 1: m00 pivot
    t1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2
    q1 = jnp.stack([(m21 - m12) / t1, 0.25 * t1, (m01 + m10) / t1, (m02 + m20) / t1], -1)
    # case 2: m11 pivot
    t2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2
    q2 = jnp.stack([(m02 - m20) / t2, (m01 + m10) / t2, 0.25 * t2, (m12 + m21) / t2], -1)
    # case 3: m22 pivot
    t3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2
    q3 = jnp.stack([(m10 - m01) / t3, (m02 + m20) / t3, (m12 + m21) / t3, 0.25 * t3], -1)

    cond1 = tr > 0
    cond2 = jnp.logical_and(~cond1, jnp.logical_and(m00 > m11, m00 > m22))
    cond3 = jnp.logical_and(~cond1, jnp.logical_and(~jnp.logical_and(m00 > m11, m00 > m22), m11 > m22))

    q = jnp.where(cond3[..., None], q2, q3)
    q = jnp.where(cond2[..., None], q1, q)
    q = jnp.where(cond1[..., None], q0, q)
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    return q


def euler_to_matrix(angles: jnp.ndarray) -> jnp.ndarray:
    """XYZ-intrinsic euler angles (3,) → (3, 3) rotation matrix
    (Rz @ Ry @ Rx, matching the reference's euler_angles_to_rotation_matrix)."""
    rx, ry, rz = angles[0], angles[1], angles[2]
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    # Rz @ Ry @ Rx expanded analytically (avoids low-precision tiny matmuls)
    return jnp.stack(
        [
            jnp.stack([cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx]),
            jnp.stack([sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx]),
            jnp.stack([-sy, cy * sx, cy * cx]),
        ]
    )


def rotate_quaternions(q: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """Left-apply a world rotation matrix to per-gaussian quaternions.

    Reference gaussian_4d.py:257-260 ("WITHOUT this step leading to blurry
    renderings"): q → quat(rot @ R(q))."""
    import jax

    m = jnp.einsum(
        "ij,njk->nik", rot, quat_to_matrix(q), precision=jax.lax.Precision.HIGHEST
    )
    return matrix_to_quat(m)


# --- numpy mirrors for host-side preprocessing (float64, no jit) ---


def quat_to_matrix_np(q: np.ndarray) -> np.ndarray:
    q = np.asarray(q, dtype=np.float64)
    q = q / (np.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    m = np.empty(q.shape[:-1] + (3, 3), dtype=np.float64)
    m[..., 0, 0] = 1 - 2 * (y * y + z * z)
    m[..., 0, 1] = 2 * (x * y - r * z)
    m[..., 0, 2] = 2 * (x * z + r * y)
    m[..., 1, 0] = 2 * (x * y + r * z)
    m[..., 1, 1] = 1 - 2 * (x * x + z * z)
    m[..., 1, 2] = 2 * (y * z - r * x)
    m[..., 2, 0] = 2 * (x * z - r * y)
    m[..., 2, 1] = 2 * (y * z + r * x)
    m[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return m


def matrix_to_quat_np(m: np.ndarray) -> np.ndarray:
    from scipy.spatial.transform import Rotation as _R

    m = np.asarray(m, dtype=np.float64)
    flat = m.reshape(-1, 3, 3)
    q_xyzw = _R.from_matrix(flat).as_quat()
    q = q_xyzw[:, [3, 0, 1, 2]]
    return q.reshape(m.shape[:-2] + (4,))
