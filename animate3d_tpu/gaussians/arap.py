"""As-rigid-as-possible regularization over gaussian trajectories.

Parity target: custom/threestudio-animate3d/systems/util.py —
  * connectivity from the first frame's KNN, filtered by a per-neighbor
    radius test over the rest frames (util.py:58-117);
  * adaptive edge weights exp(−d²/mean d²), row-normalized (:102-109);
  * per-node rotation estimation via weighted covariance + SVD with the
    det-flip correction, rotations stop-gradiented (:137-174, :205-206);
  * ARAP energy Σ_t Σ_edges w‖e_t − R e_0‖² with fixed-size point
    subsampling (:185-215);
  * mesh-edge connectivity ingestion + random K-subset sampling for mesh
    mode (:300-343).

TPU design: edges are a fixed (Nv, K) neighbor matrix with a validity mask
(idx −1 → masked) instead of flattened ragged lists; the frame loop is a
lax.scan; the 3×3 SVD is jnp.linalg.svd in fp32 (batched on the VPU).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from animate3d_tpu.ops.knn import knn, knn_gather


class Connectivity(NamedTuple):
    nn_idx: jnp.ndarray  # (Nv, K) int32, -1 = invalid
    weight: jnp.ndarray  # (Nv, K) float32, row-normalized over valid slots


def connectivity_from_points(
    points: jnp.ndarray,  # (F, Nv, 3) trajectory; frame 0 defines the graph
    radius: float,
    K: int = 10,
    least_edge_num: int = 3,
    adaptive_weighting: bool = True,
    mode: str = "nn",
    graph_K: int = 4,
) -> Connectivity:
    """KNN on frame 0; a neighbor survives only if it stays within ``radius``
    of the node across every later frame; the first ``least_edge_num``
    neighbors are always kept (util.py:58-117). ``mode="floyd"`` instead
    picks the K geodesically-nearest nodes over the frame-0 ``graph_K``-NN
    graph (util.py:66-73; O(N³) — small control-node sets only) and skips
    the rest-frame radius filter, exactly as the reference's floyd branch
    does."""
    first = points[0]
    if mode == "floyd":
        nv = first.shape[0]
        dist = geodesic_distance_floyd(first, K=graph_K) ** 2
        dist = dist.at[jnp.arange(nv), jnp.arange(nv)].set(jnp.inf)
        neg_dist, nn_idx = jax.lax.top_k(-dist, K)
        return _finalize_connectivity(-neg_dist, nn_idx, radius,
                                      least_edge_num, adaptive_weighting)
    nn_dist, nn_idx = knn(first, first, k=K, exclude_self=True)

    if points.shape[0] > 1:
        rest = points[1:]  # (F-1, Nv, 3)
        rest_nn = jax.vmap(lambda p: knn_gather(p, nn_idx))(rest)  # (F-1, Nv, K, 3)
        rest_d2 = jnp.sum((rest_nn - first[None, :, None, :]) ** 2, axis=-1)
        stays_close = jnp.all(rest_d2 < radius ** 2, axis=0)  # (Nv, K)
        nn_dist = jnp.where(stays_close, nn_dist, jnp.inf)

    return _finalize_connectivity(nn_dist, nn_idx, radius, least_edge_num,
                                  adaptive_weighting)


def _finalize_connectivity(nn_dist, nn_idx, radius, least_edge_num,
                           adaptive_weighting=True) -> Connectivity:
    """Shared tail of all connectivity builders: radius gate (keeping the
    first ``least_edge_num`` slots), adaptive exp weights, row norm
    (util.py:100-117)."""
    K = nn_idx.shape[1]
    keep = jnp.arange(K)[None, :] < least_edge_num
    valid = keep | (nn_dist < radius ** 2)
    nn_idx = jnp.where(valid, nn_idx, -1)
    masked_dist = jnp.where(valid, nn_dist, jnp.inf)

    if adaptive_weighting:
        finite = jnp.where(jnp.isfinite(masked_dist), masked_dist, 0.0)
        denom = jnp.sum(finite) / jnp.maximum(jnp.sum(valid), 1)
        w = jnp.exp(-masked_dist / jnp.maximum(denom, 1e-12))
    else:
        w = jnp.exp(-masked_dist)
    w = jnp.where(valid, w, 0.0)
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    return Connectivity(nn_idx=nn_idx.astype(jnp.int32), weight=w)


def geodesic_distance_floyd(points: jnp.ndarray, K: int = 8) -> jnp.ndarray:
    """All-pairs geodesic distances over the KNN graph via Floyd-Warshall
    (util.py:47-56). O(N³) scan — for small control-node sets."""
    n = points.shape[0]
    d, idx = knn(points, points, k=K, exclude_self=True)
    dist = jnp.full((n, n), jnp.inf)
    rows = jnp.repeat(jnp.arange(n), K)
    dist = dist.at[rows, idx.reshape(-1)].set(jnp.sqrt(d.reshape(-1)))
    dist = jnp.minimum(dist, dist.T)

    def body(dist, i):
        return jnp.minimum(dist[:, i, None] + dist[None, i, :], dist), None

    dist, _ = jax.lax.scan(body, dist, jnp.arange(n))
    return dist


def connectivity_from_trajectory(
    trajectory: jnp.ndarray,  # (Nv, F·3) or (Nv, F, 3)
    radius: float,
    K: int = 10,
    least_edge_num: int = 3,
    mode: str = "nn",
) -> Connectivity:
    """Connectivity in trajectory space: neighbors whose whole trajectories
    stay close (util.py:85-97), optionally through the floyd geodesic graph."""
    nv = trajectory.shape[0]
    traj = trajectory.reshape(nv, -1)
    traj = traj / traj.shape[1]  # average distance normalization (util.py:86)
    if mode == "floyd":
        dist = geodesic_distance_floyd(traj) ** 2
        dist = dist.at[jnp.arange(nv), jnp.arange(nv)].set(jnp.inf)
        nn_dist, nn_idx = jax.lax.top_k(-dist, K)
        nn_dist = -nn_dist
    else:
        nn_dist, nn_idx = knn(traj, traj, k=K, exclude_self=True)

    return _finalize_connectivity(nn_dist, nn_idx, radius, least_edge_num)


def connectivity_from_mesh_edges(
    connected_vertices: Dict[str, Dict[str, float]],
    max_neighbors: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Mesh-edge JSON → padded (Nv, Kmax) neighbor matrix + valid mask
    (util.py:300-318). Host-side numpy."""
    nv = len(connected_vertices)
    kmax = max(len(v) for v in connected_vertices.values())
    if max_neighbors is not None:
        kmax = max(kmax, max_neighbors)
    nn_idx = -np.ones((nv, kmax), dtype=np.int64)
    for key, val in connected_vertices.items():
        ids = [int(k) for k in val.keys()]
        nn_idx[int(key), : len(ids)] = ids
    return nn_idx, nn_idx != -1


def sample_neighbor_subset(key: jax.Array, nn_idx: jnp.ndarray,
                           valid: jnp.ndarray, P: int) -> jnp.ndarray:
    """Random P-subset of each row's valid neighbors (−1 padding when a row
    has fewer than P); mesh-mode ARAP sampler (util.py:320-343)."""
    n, k = nn_idx.shape
    scores = jax.random.uniform(key, (n, k)) + jnp.where(valid, 0.0, 1000.0)
    order = jnp.argsort(scores, axis=1)[:, :P]
    picked = jnp.take_along_axis(nn_idx, order, axis=1)
    picked_valid = jnp.take_along_axis(valid, order, axis=1)
    return jnp.where(picked_valid, picked, -1)


def _edge_vectors(verts: jnp.ndarray, nn_idx: jnp.ndarray) -> jnp.ndarray:
    """(Nv, K, 3) p_i − p_j with invalid slots zeroed (util.py:38-45)."""
    nbrs = verts[jnp.clip(nn_idx, 0, None)]
    e = verts[:, None, :] - nbrs
    return jnp.where((nn_idx >= 0)[..., None], e, 0.0)


def estimate_rotations(
    source: jnp.ndarray,  # (Nv', K, 3) source edges (subsampled)
    target: jnp.ndarray,  # (Nv', K, 3) target edges
    weight: jnp.ndarray,  # (Nv', K)
) -> jnp.ndarray:
    """Per-node best-fit rotations via weighted covariance + SVD with the
    det(R)≤0 column flip (util.py:137-174). fp32; caller stop-gradients."""
    src = source.astype(jnp.float32)
    tgt = target.astype(jnp.float32)
    S = jnp.einsum("nki,nk,nkj->nij", src, weight.astype(jnp.float32), tgt)
    # undeformed nodes → S=0 → R=I (util.py:155-157)
    unchanged = jnp.all(src == tgt, axis=(1, 2))
    S = jnp.where(unchanged[:, None, None], 0.0, S)

    U, sig, Vt = jnp.linalg.svd(S)
    W = jnp.swapaxes(Vt, -1, -2)
    R = jnp.einsum("nij,nkj->nik", W, U)
    det = jnp.linalg.det(R)
    flip_col = jnp.argmin(sig, axis=-1)
    col_mask = jax.nn.one_hot(flip_col, 3, dtype=U.dtype)  # (N, 3)
    U_flipped = U * jnp.where(col_mask[:, None, :] > 0, -1.0, 1.0)
    R_flipped = jnp.einsum("nij,nkj->nik", W, U_flipped)
    return jnp.where((det <= 0)[:, None, None], R_flipped, R)


def arap_error(
    nodes_sequence: jnp.ndarray,  # (Nt, Nv, 3)
    conn: Connectivity,
    key: Optional[jax.Array] = None,
    sample_num: int = 512,
    frame_weights: Optional[jnp.ndarray] = None,  # (Nt-1,) mask/weights
) -> jnp.ndarray:
    """Σ_t Σ w‖e_t − R_t e_0‖² with ≤sample_num nodes (util.py:185-215).
    ``frame_weights`` lets the progressive frame schedule run at a fixed
    shape (inactive frames weighted 0 instead of sliced away)."""
    nt, nv, _ = nodes_sequence.shape
    if nv > sample_num:
        assert key is not None
        sample_idx = jax.random.choice(key, nv, (sample_num,), replace=True)
    else:
        sample_idx = jnp.arange(nv)

    nn_idx = conn.nn_idx[sample_idx]
    weight = conn.weight[sample_idx]
    valid = (nn_idx >= 0)[..., None]

    def source_edges(verts):
        nbrs = verts[jnp.clip(nn_idx, 0, None)]
        e = verts[sample_idx][:, None, :] - nbrs
        return jnp.where(valid, e, 0.0)

    src = source_edges(nodes_sequence[0])
    if frame_weights is None:
        frame_weights = jnp.ones((nt - 1,), jnp.float32)

    def per_frame(carry, frame_and_w):
        frame, fw = frame_and_w
        tgt = source_edges(frame)
        R = jax.lax.stop_gradient(
            estimate_rotations(jax.lax.stop_gradient(src),
                               jax.lax.stop_gradient(tgt), weight))
        rot_rigid = jnp.einsum("nij,nkj->nki", R, src)
        stretch = jnp.sum((tgt - rot_rigid) ** 2, axis=-1)
        return carry + fw * jnp.sum(weight * stretch), None

    total, _ = jax.lax.scan(per_frame, jnp.float32(0.0),
                            (nodes_sequence[1:], frame_weights))
    return total
