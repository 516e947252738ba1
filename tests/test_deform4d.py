import numpy as np
import jax
import jax.numpy as jnp
import pytest

from animate3d_tpu.gaussians.kplanes import (
    COO_COMBS,
    grid_sample_2d,
    init_grid_params,
    interpolate_ms_features,
)
from animate3d_tpu.gaussians.deform import DeformationField, DeformConfig
from animate3d_tpu.gaussians import arap
from animate3d_tpu.gaussians.state import GaussianState


def test_grid_sample_bilinear_matches_manual():
    plane = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4))
    # corners with align_corners=True
    out = grid_sample_2d(plane, jnp.asarray([[-1.0, -1.0], [1.0, 1.0], [0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(out[:, 0]), [0.0, 11.0, 5.5], atol=1e-6)
    # border padding: out-of-range clamps
    out2 = grid_sample_2d(plane, jnp.asarray([[-2.0, -2.0], [5.0, 5.0]]))
    np.testing.assert_allclose(np.asarray(out2[:, 0]), [0.0, 11.0], atol=1e-6)


def test_init_grid_param_time_planes_ones():
    grids = init_grid_params(jax.random.PRNGKey(0), [(5, 5, 5, 3)], out_dim=4)
    for ci, combo in enumerate(COO_COMBS):
        plane = np.asarray(grids[0][ci])
        if 3 in combo:
            np.testing.assert_allclose(plane, 1.0)
        else:
            assert plane.min() >= 0.1 and plane.max() <= 0.5


def test_interpolate_product_and_concat():
    grids = init_grid_params(jax.random.PRNGKey(0), [(4, 4, 4, 2), (8, 8, 8, 4)],
                             out_dim=3)
    pts = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, size=(10, 4)),
                      jnp.float32)
    feats = interpolate_ms_features(pts, grids)
    assert feats.shape == (10, 6)
    # manual check for first scale
    manual = np.ones((10, 3), np.float32)
    for ci, combo in enumerate(COO_COMBS):
        manual *= np.asarray(grid_sample_2d(grids[0][ci], pts[:, list(combo)]))
    np.testing.assert_allclose(np.asarray(feats[:, :3]), manual, rtol=1e-5)


def make_state(n=20, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return GaussianState(
        xyz=jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32),
        features_dc=jnp.asarray(rng.normal(size=(n, 1, 3)), jnp.float32),
        features_rest=jnp.zeros((n, 0, 3)),
        opacity=jnp.asarray(rng.normal(size=(n, 1)), jnp.float32),
        scaling=jnp.asarray(rng.normal(size=(n, 3)) - 3, jnp.float32),
        rotation=jnp.asarray(q),
        sh_degree=0,
    )


class TestDeformationField:
    def setup_method(self):
        self.cfg = DeformConfig(grid_sizes=((8, 8, 8, 3), (12, 12, 12, 5)),
                                grid_feature_dim=4)
        self.field = DeformationField(self.cfg)
        self.state = make_state()
        self.params = self.field.init(
            jax.random.PRNGKey(0), self.state, jnp.asarray(0.5))

    def test_zero_init_deformation_is_identity(self):
        xyz, rot, scales, feats = self.field.apply(
            self.params, self.state, jnp.asarray(0.3))
        np.testing.assert_allclose(np.asarray(xyz), np.asarray(self.state.xyz),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(rot),
                                   np.asarray(self.state.get_rotation()), atol=1e-5)
        np.testing.assert_allclose(np.asarray(scales),
                                   np.asarray(self.state.get_scaling()), rtol=1e-5)
        assert feats.shape == (20, 8)

    def test_nonzero_mlp_moves_points_time_dependently(self):
        # fill the zero-init output kernels so deformation becomes active, and
        # perturb the (constant-1) time planes so features vary with t
        key = jax.random.PRNGKey(7)

        def perturb(p):
            nonlocal key
            key, sub = jax.random.split(key)
            if p.ndim == 2 and p.shape[-1] in (3, 4):
                return p + 0.05
            if p.ndim == 3:  # grid planes
                return p + 0.1 * jax.random.normal(sub, p.shape)
            return p

        params = jax.tree_util.tree_map(perturb, self.params)
        xyz1, *_ = self.field.apply(params, self.state, jnp.asarray(-1.0))
        xyz2, *_ = self.field.apply(params, self.state, jnp.asarray(1.0))
        assert np.abs(np.asarray(xyz1) - np.asarray(xyz2)).max() > 1e-5

    def test_gradients_flow_to_grids(self):
        def loss(params):
            xyz, rot, scales, _ = self.field.apply(
                params, self.state, jnp.asarray(0.2), True,
                method=DeformationField.deform)
            return jnp.sum(xyz ** 2) + jnp.sum(rot ** 2) + jnp.sum(scales ** 2)

        g = jax.grad(loss)(self.params)
        leaves = jax.tree_util.tree_leaves(g)
        assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


class TestARAP:
    def make_trajectory(self, rigid=True, n=40, frames=4, seed=0):
        rng = np.random.default_rng(seed)
        pts = rng.uniform(-0.5, 0.5, size=(n, 3)).astype(np.float32)
        seq = [pts]
        for f in range(1, frames):
            angle = 0.2 * f
            R = np.array([[np.cos(angle), -np.sin(angle), 0],
                          [np.sin(angle), np.cos(angle), 0],
                          [0, 0, 1]], np.float32)
            moved = pts @ R.T + np.array([0.1 * f, 0, 0], np.float32)
            if not rigid:
                moved = moved + rng.normal(0, 0.05, size=moved.shape).astype(np.float32)
            seq.append(moved)
        return jnp.asarray(np.stack(seq))

    def test_rigid_motion_has_near_zero_energy(self):
        traj = self.make_trajectory(rigid=True)
        conn = arap.connectivity_from_points(traj, radius=0.4, K=6)
        err = float(arap.arap_error(traj, conn, jax.random.PRNGKey(0)))
        assert err < 1e-6

    def test_nonrigid_motion_penalized(self):
        rigid = self.make_trajectory(rigid=True)
        nonrigid = self.make_trajectory(rigid=False)
        conn = arap.connectivity_from_points(rigid, radius=0.4, K=6)
        e_rigid = float(arap.arap_error(rigid, conn, jax.random.PRNGKey(0)))
        e_non = float(arap.arap_error(nonrigid, conn, jax.random.PRNGKey(0)))
        assert e_non > e_rigid * 100 + 1e-4

    def test_estimate_rotations_recovers_rotation(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-1, 1, size=(30, 3)).astype(np.float32)
        angle = 0.7
        R_true = np.array([[np.cos(angle), -np.sin(angle), 0],
                           [np.sin(angle), np.cos(angle), 0],
                           [0, 0, 1]], np.float32)
        traj = jnp.asarray(np.stack([pts, pts @ R_true.T]))
        conn = arap.connectivity_from_points(traj[:1], radius=2.0, K=8)
        src = np.asarray(traj[0])
        nbr = np.clip(np.asarray(conn.nn_idx), 0, None)
        e0 = (src[:, None, :] - src[nbr]) * (np.asarray(conn.nn_idx) >= 0)[..., None]
        e1 = (np.asarray(traj[1])[:, None, :] - np.asarray(traj[1])[nbr]) \
            * (np.asarray(conn.nn_idx) >= 0)[..., None]
        R = np.asarray(arap.estimate_rotations(jnp.asarray(e0), jnp.asarray(e1),
                                               conn.weight))
        np.testing.assert_allclose(R, np.tile(R_true.T[None].transpose(0, 2, 1),
                                              (30, 1, 1)), atol=1e-3)

    def test_rotation_gradient_blocked(self):
        traj = self.make_trajectory(rigid=False)
        conn = arap.connectivity_from_points(traj, radius=0.4, K=6)

        def loss(t):
            return arap.arap_error(t, conn, jax.random.PRNGKey(0))

        g = np.asarray(jax.grad(loss)(traj))
        assert np.all(np.isfinite(g))
        assert np.abs(g).max() > 0

    def test_mesh_connectivity_ingestion(self):
        conn_json = {"0": {"1": 1.0, "2": 1.4}, "1": {"0": 1.0}, "2": {"0": 1.4}}
        nn_idx, valid = arap.connectivity_from_mesh_edges(conn_json)
        assert nn_idx.shape == (3, 2)
        assert set(nn_idx[0].tolist()) == {1, 2}
        assert nn_idx[1, 0] == 0 and nn_idx[1, 1] == -1
        assert valid.sum() == 4

    def test_sample_neighbor_subset(self):
        nn_idx = jnp.asarray([[1, 2, 3, -1], [0, -1, -1, -1]])
        valid = nn_idx >= 0
        picked = np.asarray(arap.sample_neighbor_subset(
            jax.random.PRNGKey(0), nn_idx, valid, P=2))
        assert picked.shape == (2, 2)
        assert set(picked[0].tolist()).issubset({1, 2, 3})
        assert picked[1, 0] == 0 and picked[1, 1] == -1


class TestARAPVariants:
    def test_floyd_geodesic_respects_graph(self):
        import jax.numpy as jnp
        # points on a line: geodesic distance 0↔3 must be the chain length
        pts = jnp.asarray([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0.0]])
        d = np.asarray(arap.geodesic_distance_floyd(pts, K=1))
        assert d[0, 1] == pytest.approx(1.0, abs=1e-4)
        assert d[0, 3] == pytest.approx(3.0, abs=1e-4)

    def test_trajectory_connectivity(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        traj = jnp.asarray(rng.normal(size=(20, 4, 3)), jnp.float32)
        conn = arap.connectivity_from_trajectory(traj, radius=10.0, K=4)
        assert conn.nn_idx.shape == (20, 4)
        np.testing.assert_allclose(np.asarray(conn.weight).sum(-1), 1.0,
                                   atol=1e-5)

    def test_points_connectivity_floyd(self):
        import jax.numpy as jnp
        # chain of points: with graph_K=1 the geodesic K=2 neighbors of node 0
        # must be the chain nodes 1 and 2 (not the euclidean-nearest off-chain
        # point), matching the reference's floyd points branch (util.py:66-73)
        pts = jnp.asarray([[[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0.0]]])
        conn = arap.connectivity_from_points(pts, radius=10.0, K=2,
                                             least_edge_num=1, mode="floyd",
                                             graph_K=1)
        assert conn.nn_idx.shape == (4, 2)
        assert set(np.asarray(conn.nn_idx)[0].tolist()) == {1, 2}
        np.testing.assert_allclose(np.asarray(conn.weight).sum(-1), 1.0,
                                   atol=1e-5)

    def test_trajectory_connectivity_floyd(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(1)
        traj = jnp.asarray(rng.normal(size=(12, 2, 3)), jnp.float32)
        conn = arap.connectivity_from_trajectory(traj, radius=10.0, K=3,
                                                 mode="floyd")
        assert conn.nn_idx.shape == (12, 3)
        assert np.all(np.asarray(conn.nn_idx) >= 0)


class TestFrameFactorizedSampler:
    """Time-factorized matmul K-planes sampler (kplanes.py
    interpolate_ms_features_frames / deform_frames) vs the pointwise path."""

    def test_axis_weights_rows_sum_to_one(self):
        import jax.numpy as jnp
        from animate3d_tpu.gaussians.kplanes import axis_weights

        coords = jnp.asarray([-1.0, -0.37, 0.0, 0.9999, 1.0])
        w = axis_weights(coords, 7)
        np.testing.assert_allclose(np.asarray(w.sum(axis=1)),
                                   np.ones(5), atol=1e-6)
        assert (np.asarray(w) >= 0).all()
        # border rows are one-hot
        assert np.asarray(w)[0, 0] == 1.0 and np.asarray(w)[-1, -1] == 1.0

    def test_frames_sampler_matches_pointwise(self):
        import jax
        import jax.numpy as jnp
        from animate3d_tpu.gaussians.kplanes import (
            init_grid_params,
            interpolate_ms_features,
            interpolate_ms_features_frames,
        )

        rng = np.random.default_rng(0)
        grids = init_grid_params(jax.random.PRNGKey(0),
                                 [(5, 6, 7, 3), (9, 10, 11, 4)], out_dim=4)
        # break the all-ones time planes so time actually matters
        grids = [[p + 0.3 * jnp.sin(jnp.arange(p.size).reshape(p.shape) * 0.7)
                  for p in planes] for planes in grids]
        xyz = jnp.asarray(rng.uniform(-1, 1, size=(40, 3)), jnp.float32)
        ts = jnp.asarray([-1.0, -0.2, 0.55, 1.0], jnp.float32)

        fast = interpolate_ms_features_frames(xyz, ts, grids)
        slow = jnp.stack([
            interpolate_ms_features(
                jnp.concatenate([xyz, jnp.full((40, 1), t)], axis=1), grids)
            for t in ts])
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                                   atol=1e-5, rtol=1e-5)

    def test_deform_frames_matches_vmapped_deform(self):
        import jax
        import jax.numpy as jnp
        from animate3d_tpu.gaussians.deform import DeformationField, DeformConfig
        from animate3d_tpu.gaussians.state import random_state

        state = random_state(jax.random.PRNGKey(0), 30, radius=0.4)
        field = DeformationField(DeformConfig(
            grid_sizes=((6, 6, 6, 3), (8, 8, 8, 4)), grid_feature_dim=4,
            mlp_width=8))
        params = field.init(jax.random.PRNGKey(1), state, jnp.asarray(0.3))
        # non-zero output layers so the deformation is non-trivial
        params = jax.tree_util.tree_map(
            lambda p: p + 0.05 * jnp.ones_like(p), params)
        ts = jnp.asarray([-1.0, 0.0, 0.7], jnp.float32)

        fast = field.apply(params, state, ts, True,
                           method=DeformationField.deform_frames)
        slow = jax.vmap(lambda t: field.apply(
            params, state, t, True, method=DeformationField.deform)[:3])(ts)
        for a, b in zip(fast, slow):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4)

    def test_deform_frames_gradients_flow_to_grids(self):
        import jax
        import jax.numpy as jnp
        from animate3d_tpu.gaussians.deform import DeformationField, DeformConfig
        from animate3d_tpu.gaussians.state import random_state

        state = random_state(jax.random.PRNGKey(0), 20, radius=0.4)
        field = DeformationField(DeformConfig(
            grid_sizes=((6, 6, 6, 3),), grid_feature_dim=4, mlp_width=8))
        params = field.init(jax.random.PRNGKey(1), state, jnp.asarray(0.3))
        params = jax.tree_util.tree_map(
            lambda p: p + 0.05 * jnp.ones_like(p), params)
        ts = jnp.asarray([-1.0, 0.5], jnp.float32)

        def loss(p):
            xyz, rot, sc = field.apply(p, state, ts, True,
                                       method=DeformationField.deform_frames)
            return jnp.sum(xyz ** 2) + jnp.sum(rot ** 2) + jnp.sum(sc ** 2)

        g = jax.grad(loss)(params)
        leaves = {"/".join(str(k) for k in path): v
                  for path, v in jax.tree_util.tree_flatten_with_path(g)[0]}
        grid_gs = [v for k, v in leaves.items() if "grid_" in k]
        assert grid_gs and all(np.isfinite(np.asarray(v)).all() for v in grid_gs)
        assert any(np.abs(np.asarray(v)).max() > 0 for v in grid_gs)
