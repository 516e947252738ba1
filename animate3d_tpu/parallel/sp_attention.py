"""Sequence-parallel (view-sharded) ring attention over the sp mesh axis.

The reference's cross-view attention runs on one GPU over (n_views·tokens)
sequences (attention_processor.py:54 — ≤4096 tokens at 256²) and has no
sequence parallelism at all (SURVEY §5 long-context). On TPU, scaling to
more views / frames / resolution wants the token axis sharded across chips
with K/V rotating over ICI — ring attention:

  * every device keeps its local Q shard and a running online-softmax state
    (max m, denom l, accumulator acc);
  * K/V shards hop around the ring via ``jax.lax.ppermute`` each step, so
    after ``sp`` steps every Q block has attended to every K/V block;
  * communication overlaps the next step's compute inside one jitted
    shard_map program (XLA schedules the permute alongside the local block).

Use under ``jax.shard_map`` with the token axis sharded on ``sp``
(``ring_attention_sharded`` wraps this), or inside a larger shard_mapped
model. Numerics match dense attention exactly (same online-softmax algebra
as the flash kernel)."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attend(q, k, v, scale):
    """One Q-block × K/V-block partial: returns (scores-max m, exp-sum l,
    weighted acc) for online-softmax merging. Shapes (B, H, Sq|Sk, D)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)  # (B, H, Sq, 1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(jnp.float32)
    return m, l, acc


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: float, axis_name: str = "sp") -> jnp.ndarray:
    """Inside shard_map: q/k/v are the LOCAL (B, H, S_local, D) shards of a
    sequence sharded over ``axis_name``; returns the local output shard."""
    n = jax.lax.psum(1, axis_name)

    def step(i, carry):
        m_run, l_run, acc_run, k_cur, v_cur = carry
        m_blk, l_blk, acc_blk = _block_attend(q, k_cur, v_cur, scale)
        m_new = jnp.maximum(m_run, m_blk)
        a_run = jnp.exp(m_run - m_new)
        a_blk = jnp.exp(m_blk - m_new)
        l_new = l_run * a_run + l_blk * a_blk
        acc_new = acc_run * a_run + acc_blk * a_blk
        # rotate K/V to the next device (no-op payload on the last step)
        perm = [(j, (j + 1) % n) for j in range(n)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return m_new, l_new, acc_new, k_nxt, v_nxt

    b, h, s, d = q.shape
    init = (jnp.full((b, h, s, 1), -jnp.inf, jnp.float32),
            jnp.zeros((b, h, s, 1), jnp.float32),
            jnp.zeros((b, h, s, d), jnp.float32),
            k, v)
    m, l, acc, _, _ = jax.lax.fori_loop(0, n, step, init)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention_sharded(mesh: Mesh, q: jnp.ndarray, k: jnp.ndarray,
                           v: jnp.ndarray, num_heads: int,
                           scale: Optional[float] = None,
                           axis_name: str = "sp") -> jnp.ndarray:
    """Merged-head convenience wrapper: q/k/v (B, S, H·D) global arrays;
    shards S over ``axis_name``, runs the ring, returns the global output.

    This is the sp upgrade path for >4-view / >16-frame MV attention: shard
    the (n·l) axis so each chip holds S/sp tokens and K/V ride the ICI ring
    instead of replicating the whole sequence."""
    try:
        from jax import shard_map as _sm

        def shard_map(f, **kw):  # renamed: check_rep → check_vma
            kw["check_vma"] = kw.pop("check_rep", False)
            return _sm(f, **kw)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    b, s, c = q.shape
    d = c // num_heads
    if scale is None:
        scale = d ** -0.5
    sp = mesh.shape[axis_name]
    assert s % sp == 0, (s, sp)

    def split(x):
        return x.reshape(b, s, num_heads, d).transpose(0, 2, 1, 3)

    def local(qh, kh, vh):
        return ring_attention(qh, kh, vh, scale, axis_name)

    spec = P(None, None, axis_name, None)
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec, check_rep=False)
    out = fn(split(q), split(k), split(v))
    return out.transpose(0, 2, 1, 3).reshape(b, s, c)
