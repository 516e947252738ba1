import numpy as np
import jax.numpy as jnp
import pytest

from animate3d_tpu.gaussians.densify import (
    DensifyConfig,
    DensifyStats,
    densify_and_prune,
    reset_opacity,
)
from animate3d_tpu.gaussians.state import GaussianState


def make_state(n=10, scale=0.01, opacity=3.0):
    rng = np.random.default_rng(0)
    q = np.zeros((n, 4), np.float32)
    q[:, 0] = 1.0
    return GaussianState(
        xyz=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        features_dc=jnp.zeros((n, 1, 3)),
        features_rest=jnp.zeros((n, 0, 3)),
        opacity=jnp.full((n, 1), opacity),
        scaling=jnp.full((n, 3), np.log(scale)),
        rotation=jnp.asarray(q),
        sh_degree=0,
    )


def test_clone_small_high_grad():
    state = make_state(n=10, scale=0.001)
    stats = DensifyStats.zero(10)
    grads = np.zeros((10, 2))
    grads[:3] = 1.0  # high gradient on 3 gaussians
    stats = stats.update(grads, np.ones(10))
    cfg = DensifyConfig(densify_grad_threshold=0.5)
    new, new_stats = densify_and_prune(state, stats, cfg, scene_extent=1.0,
                                       rng=np.random.default_rng(0))
    assert new.num_points == 13  # 3 clones added
    assert new_stats.grad_accum.shape[0] == 13


def test_split_large_high_grad():
    state = make_state(n=10, scale=0.5)  # large gaussians
    stats = DensifyStats.zero(10).update(
        np.ones((10, 2)), np.ones(10))
    cfg = DensifyConfig(densify_grad_threshold=0.5, max_world_scale_rel=10.0)
    new, _ = densify_and_prune(state, stats, cfg, scene_extent=1.0,
                               rng=np.random.default_rng(0))
    # every parent replaced by 2 children → 20 points
    assert new.num_points == 20
    # children shrink
    assert np.exp(np.asarray(new.scaling)).max() < 0.5


def test_prune_transparent():
    state = make_state(n=10, opacity=-10.0)  # sigmoid ≈ 0
    stats = DensifyStats.zero(10)
    cfg = DensifyConfig()
    new, _ = densify_and_prune(state, stats, cfg, scene_extent=1.0,
                               rng=np.random.default_rng(0))
    assert new.num_points == 0


def test_reset_opacity():
    state = make_state(n=5, opacity=5.0)
    new = reset_opacity(state, 0.01)
    op = 1 / (1 + np.exp(-np.asarray(new.opacity)))
    assert np.all(op <= 0.011)
