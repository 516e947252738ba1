import numpy as np
import jax.numpy as jnp

from animate3d_tpu.ops.knn import knn, ball_query, mean_sq_dist_to_knn, knn_gather


def brute_knn(q, p, k):
    d2 = ((q[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return np.take_along_axis(d2, idx, axis=1), idx


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(0)
    p = rng.normal(size=(500, 3)).astype(np.float32)
    q = rng.normal(size=(123, 3)).astype(np.float32)
    d2, idx = knn(jnp.asarray(q), jnp.asarray(p), k=4, chunk=64)
    ed2, _ = brute_knn(q, p, 4)
    np.testing.assert_allclose(np.asarray(d2), ed2, atol=1e-4)
    # verify gathered distances match indices
    g = np.asarray(knn_gather(jnp.asarray(p), idx))
    d2_check = ((np.asarray(q)[:, None, :] - g) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(d2), d2_check, atol=1e-4)


def test_knn_exclude_self():
    rng = np.random.default_rng(1)
    p = rng.normal(size=(64, 3)).astype(np.float32)
    d2, idx = knn(jnp.asarray(p), jnp.asarray(p), k=3, exclude_self=True, chunk=64)
    assert not np.any(idx == np.arange(64)[:, None])
    assert np.all(np.asarray(d2) > 0)


def test_ball_query_radius():
    p = np.array([[0, 0, 0], [1, 0, 0], [0.1, 0, 0], [5, 5, 5]], dtype=np.float32)
    q = np.array([[0, 0, 0]], dtype=np.float32)
    d2, idx, valid = ball_query(jnp.asarray(q), jnp.asarray(p), radius=0.5, k=4)
    v = np.asarray(valid[0])
    assert v.sum() == 2  # self + the 0.1 point
    assert np.all(np.asarray(idx[0])[~v] == -1)


def test_mean_sq_dist_grid():
    # unit grid: each interior point's 3 NNs are at distance 1
    xs = np.arange(5, dtype=np.float32)
    grid = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    d2 = np.asarray(mean_sq_dist_to_knn(jnp.asarray(grid), k=3))
    np.testing.assert_allclose(d2, 1.0, atol=1e-5)
