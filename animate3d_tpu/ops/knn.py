"""Brute-force KNN / ball-query on TPU.

Replaces the reference's CUDA deps simple-knn (distCUDA2) and pytorch3d
(knn_points / knn_gather / ball_query; SURVEY.md §2.2). At gaussian-splat
scale (N ≈ 1e4–1e5) the O(N²) distance matrix is a single MXU matmul and is
faster than any tree on TPU. Chunked over queries to bound memory.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _pairwise_sq_dists(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """(Nq, Np) squared euclidean distances (one matmul on the MXU)."""
    q2 = jnp.sum(q * q, axis=-1, keepdims=True)
    p2 = jnp.sum(p * p, axis=-1, keepdims=True).T
    qp = jnp.dot(
        q, p.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    d2 = q2 + p2 - 2.0 * qp
    return jnp.maximum(d2, 0.0)


@functools.partial(jax.jit, static_argnames=("k", "exclude_self", "chunk"))
def knn(
    query: jnp.ndarray,
    points: jnp.ndarray,
    k: int,
    exclude_self: bool = False,
    chunk: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors of each query point.

    Returns (dists², idx) of shape (Nq, k) — matching pytorch3d.knn_points
    semantics (squared distances, ascending).
    ``exclude_self`` drops a zero-distance self match (query == points case).
    """
    nq = query.shape[0]
    kk = k + 1 if exclude_self else k
    pad = (-nq) % chunk
    qp = jnp.pad(query, ((0, pad), (0, 0)))
    qc = qp.reshape(-1, chunk, query.shape[-1])

    def body(q):
        d2 = _pairwise_sq_dists(q, points)
        neg, idx = jax.lax.top_k(-d2, kk)
        return -neg, idx

    d2, idx = jax.lax.map(body, qc)
    d2 = d2.reshape(-1, kk)[:nq]
    idx = idx.reshape(-1, kk)[:nq]
    if exclude_self:
        d2, idx = d2[:, 1:], idx[:, 1:]
    return d2, idx


def knn_gather(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather features by knn indices: x (Np, C), idx (Nq, K) → (Nq, K, C)."""
    return x[idx]


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def ball_query(
    query: jnp.ndarray,
    points: jnp.ndarray,
    radius: float,
    k: int,
    chunk: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Up to k neighbors within ``radius``; invalid slots get idx=-1, dist=inf.

    Matches pytorch3d.ball_query's (dists², idx) contract closely enough for
    the ARAP connectivity filter (systems/util.py:76-97)."""
    d2, idx = knn(query, points, k=k, chunk=chunk)
    valid = d2 <= radius * radius
    idx = jnp.where(valid, idx, -1)
    d2 = jnp.where(valid, d2, jnp.inf)
    return d2, idx, valid


def mean_sq_dist_to_knn(points: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """simple-knn distCUDA2 parity: mean squared distance to the k nearest
    neighbors of each point (excluding self), clamped ≥ 1e-7 by callers."""
    d2, _ = knn(points, points, k=k, exclude_self=True)
    return jnp.mean(d2, axis=-1)
