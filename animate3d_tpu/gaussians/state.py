"""Gaussian-splat state as a JAX pytree.

Replaces the reference's ``GaussianBaseModel`` attribute surface
(SURVEY.md §2.4; threestudio-3dgs plugin) with an immutable pytree that jit /
grad / shard cleanly:

  state fields: xyz, features_dc, features_rest, opacity (pre-sigmoid),
  scaling (log), rotation (unnormalized wxyz quat); metadata: sh_degree.

Activations match the reference: opacity=sigmoid, scaling=exp,
rotation=normalize, features = concat(dc, rest).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from animate3d_tpu.utils.sh import rgb_to_sh


class BasicPointCloud(NamedTuple):
    """Reference parity: threestudio-3dgs BasicPointCloud (animate3d.py:106-110)."""

    points: np.ndarray  # (N, 3)
    colors: np.ndarray  # (N, 3) in [0, 1]
    normals: np.ndarray  # (N, 3)


@jax.tree_util.register_pytree_node_class
class GaussianState:
    """Raw (pre-activation) gaussian attributes.

    Mirrors _xyz/_features_dc/_features_rest/_opacity/_scaling/_rotation of
    the reference base model (gaussian_4d.py:262-304)."""

    def __init__(self, xyz, features_dc, features_rest, opacity, scaling, rotation,
                 sh_degree: int = 0, active_sh_degree: Optional[int] = None):
        self.xyz = xyz                    # (N, 3)
        self.features_dc = features_dc    # (N, 1, 3)
        self.features_rest = features_rest  # (N, K-1, 3)
        self.opacity = opacity            # (N, 1) pre-sigmoid
        self.scaling = scaling            # (N, 3) log-scale
        self.rotation = rotation          # (N, 4) wxyz
        self.sh_degree = int(sh_degree)
        self.active_sh_degree = int(sh_degree if active_sh_degree is None else active_sh_degree)

    # --- pytree protocol ---
    def tree_flatten(self):
        children = (self.xyz, self.features_dc, self.features_rest,
                    self.opacity, self.scaling, self.rotation)
        aux = (self.sh_degree, self.active_sh_degree)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, sh_degree=aux[0], active_sh_degree=aux[1])

    # --- derived quantities (activations per reference) ---
    @property
    def num_points(self) -> int:
        return self.xyz.shape[0]

    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def get_rotation(self) -> jnp.ndarray:
        return self.rotation / (jnp.linalg.norm(self.rotation, axis=-1, keepdims=True) + 1e-12)

    def get_features(self) -> jnp.ndarray:
        """(N, K, 3) concatenated SH coefficients."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def replace(self, **kw) -> "GaussianState":
        d = dict(
            xyz=self.xyz, features_dc=self.features_dc, features_rest=self.features_rest,
            opacity=self.opacity, scaling=self.scaling, rotation=self.rotation,
            sh_degree=self.sh_degree, active_sh_degree=self.active_sh_degree,
        )
        d.update(kw)
        return GaussianState(**d)

    def __repr__(self):
        return f"GaussianState(N={self.xyz.shape[0]}, sh_degree={self.sh_degree})"


def inverse_sigmoid(x):
    x = np.asarray(x, dtype=np.float64)
    return np.log(x / (1 - x))


def from_point_cloud(
    pcd: BasicPointCloud,
    sh_degree: int = 0,
    initial_scale: Optional[np.ndarray] = None,
    opacity_init: float = 0.1,
) -> GaussianState:
    """Build a GaussianState from a point cloud (create_from_pcd parity).

    ``initial_scale``: (N,) or (N,3) linear scales; defaults to sqrt(mean
    squared distance to the 3 nearest neighbors) as simple-knn's distCUDA2
    provides in the reference.
    """
    n = pcd.points.shape[0]
    if initial_scale is None:
        from animate3d_tpu.ops.knn import mean_sq_dist_to_knn

        d2 = np.asarray(mean_sq_dist_to_knn(jnp.asarray(pcd.points, jnp.float32), k=3))
        initial_scale = np.sqrt(np.clip(d2, 1e-7, None))
    initial_scale = np.asarray(initial_scale, dtype=np.float32)
    if initial_scale.ndim == 1:
        initial_scale = np.repeat(initial_scale[:, None], 3, axis=1)

    k = (sh_degree + 1) ** 2
    features_dc = rgb_to_sh(np.asarray(pcd.colors, np.float32))[:, None, :]
    features_rest = np.zeros((n, k - 1, 3), dtype=np.float32)
    rotation = np.zeros((n, 4), dtype=np.float32)
    rotation[:, 0] = 1.0
    opacity = inverse_sigmoid(opacity_init * np.ones((n, 1))).astype(np.float32)
    return GaussianState(
        xyz=jnp.asarray(pcd.points, jnp.float32),
        features_dc=jnp.asarray(features_dc),
        features_rest=jnp.asarray(features_rest),
        opacity=jnp.asarray(opacity),
        scaling=jnp.log(jnp.asarray(initial_scale)),
        rotation=jnp.asarray(rotation),
        sh_degree=sh_degree,
    )


def random_state(key, n: int, radius: float = 0.5, sh_degree: int = 0,
                 opacity_init: float = 0.1) -> GaussianState:
    """Random init inside a sphere (init_num_pts/pc_init_radius parity)."""
    k1, k2 = jax.random.split(key)
    pts = jax.random.normal(k1, (n, 3))
    pts = pts / (jnp.linalg.norm(pts, axis=-1, keepdims=True) + 1e-9)
    pts = pts * radius * jax.random.uniform(k2, (n, 1)) ** (1.0 / 3.0)
    colors = np.full((n, 3), 0.5, dtype=np.float32)
    pcd = BasicPointCloud(np.asarray(pts), colors, np.zeros((n, 3), np.float32))
    return from_point_cloud(pcd, sh_degree=sh_degree, opacity_init=opacity_init)
