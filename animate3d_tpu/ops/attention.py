"""Multi-head attention for the MV-VDM (Pallas flash attention + XLA fallback).

Replaces xformers ``memory_efficient_attention`` (used by every attention
processor in the reference, attention_processor.py:103,233,268,405,416,656,691).

Two paths:
  * ``attention_xla`` — einsum + fp32 softmax; always correct; used on CPU
    and for small sequences.
  * ``flash_attention`` — Pallas TPU kernels with online softmax, never
    materializing the (Sq, Sk) score matrix in HBM: forward saves the
    log-sum-exp; backward is the FlashAttention-2 recurrence as two kernels
    (dq streaming k-blocks; dk/dv streaming q-blocks, probabilities rebuilt
    in VMEM from the lse). Head dims (40/80/160 for SD1.5 heads) are
    zero-padded to the 128-lane width inside the kernels.

The public entry is :func:`multi_head_attention` which takes merged-head
inputs (B, S, H*D) like the reference's Attention module, picks a backend,
and is differentiable end-to-end via ``jax.custom_vjp``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, s, c = x.shape
    return x.reshape(b, s, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def attention_xla(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """(B, H, S, D) attention with fp32 softmax."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _packed_small_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int,
    scale: float, pack_to: int = 128,
) -> jnp.ndarray:
    """Attention over many tiny sequences, packed to MXU width.

    The motion modules' temporal attention (reference
    animatediff/models/motion_module.py VersatileAttention, temporal mode)
    runs (B·N·H·W) independent 16-token sequences: XLA lowers that as ~65k
    per-head (16×40)·(40×16) matmuls, each occupying a sliver of one
    128×128 MXU tile. Pack P = pack_to//S sequences along the token axis
    and mask cross-sequence scores with a -inf block-diagonal bias: P×
    fewer, full-width matmuls for the same result.
    """
    B, S, C = q.shape
    P = max(1, pack_to // S)
    pad_b = (-B) % P
    if pad_b:
        q, k, v = (jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
                   for x in (q, k, v))
    Bp = B + pad_b
    qh, kh, vh = (_split_heads(x.reshape(Bp // P, P * S, C), num_heads)
                  for x in (q, k, v))
    blk = jnp.arange(P * S, dtype=jnp.int32) // S
    bias = jnp.where(blk[:, None] == blk[None, :], 0.0,
                     -jnp.inf).astype(jnp.float32)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits + bias, axis=-1).astype(qh.dtype)
    out = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", probs, vh))
    out = out.reshape(Bp, S, C)
    return out[:B] if pad_b else out


def _packed_temporal_kernel(q_ref, k_ref, v_ref, o_ref, *, seq: int,
                            scale: float, group_block: int):
    """One grid cell: ``group_block`` packed groups of one head. Each group
    is a (pack, seq)-packed 128-token block; scores are masked to the
    block-diagonal (cross-sequence scores → −inf) and the softmax+PV never
    leave VMEM."""
    log2e = 1.4426950408889634
    pack_to = q_ref.shape[2]
    blk = jax.lax.broadcasted_iota(jnp.int32, (pack_to, pack_to), 0) // seq
    blk_t = jax.lax.broadcasted_iota(jnp.int32, (pack_to, pack_to), 1) // seq
    neg = jnp.where(blk == blk_t, 0.0, -1e30).astype(jnp.float32)
    for g in range(group_block):
        q = q_ref[g, 0]
        k = k_ref[g, 0]
        v = v_ref[g, 0]
        # scale AFTER the dot, in f32: pre-scaling q would round the scaled
        # values back to bf16 before the MXU (≈2-ulp output error vs the XLA
        # packed path); here the scores are only (128, 128) per group, so the
        # post-dot multiply-add is one cheap fused VPU pass
        s = (jnp.dot(q, k.T, preferred_element_type=jnp.float32)
             * (scale * log2e) + neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        acc = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[g, 0] = (acc / l).astype(o_ref.dtype)


def _packed_temporal_fwd_impl(q, k, v, num_heads: int, scale: float,
                              pack_to: int = 128, group_block: int = 8):
    """Fused packed tiny-sequence attention forward (B, S, C) → (B, S, C).

    The XLA packed path (:func:`_packed_small_attention`) materializes the
    packed (B/P, H, 128, 128) f32 logits AND probabilities in HBM — ~1 GB of
    traffic per L0 temporal call. This kernel keeps both in VMEM: HBM
    traffic is just q/k/v/out plus one XLA head-split transpose each.

    Measured OUTCOME (docs/flash_tune.json, v5e): despite the HBM saving it
    is ~13% slower than the XLA packed path at the production L0 shape
    (5.6 vs 4.97 ms) — the per-head (128, d=40) blocks drive the MXU/VPU at
    40/128 lane occupancy, where XLA's packed layout keeps the full 320-lane
    channel axis. Kept for explicit A/B (``backend="packed_flash"``), not
    routed by ``auto``.
    """
    B, S, C = q.shape
    P = pack_to // S
    D = C // num_heads
    pad_b = (-B) % (P * group_block)
    if pad_b:
        q, k, v = (jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
                   for x in (q, k, v))
    G = (B + pad_b) // P

    def to_gh(x):  # (B, S, C) -> (G, H, P·S, D)
        return (x.reshape(G, P * S, num_heads, D).transpose(0, 2, 1, 3))

    qh, kh, vh = to_gh(q), to_gh(k), to_gh(v)
    spec = pl.BlockSpec((group_block, 1, P * S, D),
                        lambda i, h: (i, h, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_packed_temporal_kernel, seq=S, scale=scale,
                          group_block=group_block),
        grid=(G // group_block, num_heads),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((G, num_heads, P * S, D), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qh, kh, vh)
    out = out.transpose(0, 2, 1, 3).reshape(G * P, S, C)
    return out[:B] if pad_b else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def packed_temporal_flash(q, k, v, num_heads: int, scale: float):
    """Differentiable fused packed attention over many tiny sequences.

    Forward runs the Pallas kernel (probabilities stay in VMEM); backward
    recomputes through :func:`_packed_small_attention`'s XLA graph — the
    training/guidance paths already pay the materialized-probability cost
    there, and the recompute keeps this kernel a drop-in for them."""
    return _packed_temporal_fwd_impl(q, k, v, num_heads, scale)


def _packed_temporal_fwd(q, k, v, num_heads, scale):
    return _packed_temporal_fwd_impl(q, k, v, num_heads, scale), (q, k, v)


def _packed_temporal_bwd(num_heads, scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: _packed_small_attention(q, k, v, num_heads, scale),
        q, k, v)
    return vjp(g)


packed_temporal_flash.defvjp(_packed_temporal_fwd, _packed_temporal_bwd)


# ---------------------------------------------------------------------------
# Pallas flash attention (non-causal, no mask — the MV-VDM never masks)
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
                  *, scale: float):
    """Grid (bh, q_block, k_block): K/V stream through VMEM one block at a
    time (k innermost, sequential on-core); online-softmax state lives in
    scratch that persists across the k iterations of one (bh, q) cell."""
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (BQ, D) — input dtype so the MXU runs native bf16
    k_blk = k_ref[0]  # (BK, D)
    v_blk = v_ref[0]

    s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
    m_prev = m_ref[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    # p in the INPUT dtype for the PV dot (f32×f32 matmuls run the MXU at
    # 1/4 bf16 rate); accumulation stays f32 via the acc scratch
    acc_ref[:] = acc_ref[:] * alpha + jnp.dot(p.astype(v_blk.dtype), v_blk,
                                              preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(k_idx == nk - 1)
    def _():
        l_safe = jnp.maximum(l_ref[:], 1e-30)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        lse_ref[0] = m_ref[:] + jnp.log(l_safe)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _flash_kernel_wholek(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                         skip_max: bool = False):
    """Dense one-pass variant: whole K/V in VMEM AND the (block_q, Sk) score
    block fits VMEM, so the online-softmax state machine is pure overhead —
    one full-width QKᵀ dot, an exact row softmax (3 VPU passes over the
    scores instead of the streaming recurrence's ~12), one PV dot. This is
    the hot path for the MV-VDM's level-0 cross-view attention
    (Sq = Sk = n·l = 4096).

    Two VPU-pass-saving tricks (each elementwise pass over the
    (block_q, Sk) scores costs ~as much as the whole QKᵀ MXU time at D=40):
    the softmax scale × log2(e) is folded into q BEFORE the dot (a
    (block_q, D) pass instead of (block_q, Sk)), and the exponential runs
    as native exp2 in base 2. lse is converted back to natural log for the
    backward kernels. (A third trick — a ones-column planted in V's zero
    padding so the PV dot yields the denominator on the MXU — measured
    SLOWER on v5e: the unaligned lane extraction at column D beats the
    row-sum pass it saves.)"""
    log2e = 1.4426950408889634
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    qs = (q.astype(jnp.float32) * (scale * log2e)).astype(q.dtype)
    s = jnp.dot(qs, k.T, preferred_element_type=jnp.float32)
    if skip_max:
        # bounded-logit softmax: drop the row-max reduce + subtract (a VPU
        # reduction pass over the (block_q, Sk) scores — measured ~7% of the
        # kernel at Sk=4096, docs/flash_tune.json bq256_skipmax). exp2
        # overflows f32 only past 2^127, i.e. an attention logit of ~88 nats
        # — unreachable for trained nets (|logit| ≲ 30); the clamp (fused
        # into the exp2 pass, not a separate sweep) keeps adversarial inputs
        # finite, and Σp ≤ Sk·2^110 = 2^122 stays representable. Exact (same
        # float ratios) whenever the clamp doesn't bind. Two OOD-only
        # deviations from the row-max path: (a) when the clamp binds, the
        # ratios among clamped logits flatten; (b) a row whose logits are ALL
        # below ~−126 base-2 (~−87 nats) underflows every p to 0 and returns
        # output 0 via the l_safe floor, where the row-max path would still
        # be exact. The backward kernels apply the same clamp so fwd/bwd stay
        # consistent in regime (a).
        m = jnp.zeros((q.shape[0], 1), jnp.float32)
        p = jnp.exp2(jnp.minimum(s, 110.0))
    else:
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
    l_safe = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    # bf16 p for the PV dot (f32 matmuls run at 1/4 bf16 MXU rate); f32 acc
    acc = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = (m + jnp.log2(l_safe)) * (1.0 / log2e)


def _flash_attention_fwd_impl(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    block_q: int = 256, block_k: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H, S, D) flash attention forward on TPU → (out, lse (B, H, S))."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    dp_est = 128 * ((d + 127) // 128)
    kv_bytes = 2 * sk * dp_est * k.dtype.itemsize
    # long-KV rows use the bounded-logit softmax (skip the row-max pass —
    # see _flash_kernel_wholek), and with that VPU reduction gone a taller
    # 512-row q block wins another ~4% (docs/flash_tune.json: 15.7 vs
    # 16.6 ms at L0) — as long as the (block_q, Sk) f32 scores still fit
    # VMEM next to K/V (≤ 8 MB + 4 MB of ~16 MB/core)
    skip_max = sk >= 2048
    bumped_512 = (skip_max and sq >= 512 and kv_bytes <= 4 * 1024 * 1024
                  and 512 * sk * 4 <= 8 * 1024 * 1024)
    if bumped_512:
        block_q = 512
    # fold batch and heads; pad D to lane width, S to block multiples
    qf = _pad_to(_pad_to(q.reshape(b * h, sq, d), 2, 128), 1, block_q)
    kf = _pad_to(k.reshape(b * h, sk, d), 2, 128)
    vf = _pad_to(v.reshape(b * h, sk, d), 2, 128)
    if (-sk) % block_k:
        # padded zero-keys would take softmax weight; callers gate on this
        raise ValueError("flash_attention requires Sk % block_k == 0; use XLA fallback")

    sq_p = qf.shape[1]
    dp = qf.shape[2]
    interpret = jax.default_backend() != "tpu"
    out_shapes = [
        jax.ShapeDtypeStruct((b * h, sq_p, dp), q.dtype),
        jax.ShapeDtypeStruct((b * h, sq_p, 1), jnp.float32),  # log-sum-exp
    ]
    lse_spec = pl.BlockSpec((1, block_q, 1), lambda i, j, *_: (i, j, 0),
                            memory_space=pltpu.VMEM)

    # dense variant when K/V AND the (block_q, Sk) f32 score block fit in
    # VMEM together (~10 MB of the ~16 MB/core at 256×4096; the 512-row
    # skip-max blocks were sized to the same total above)
    kv_bytes = 2 * sk * dp * kf.dtype.itemsize
    score_bytes = block_q * sk * 4
    # the relaxed 8 MB score budget was sized for the auto-bumped skip-max
    # 512-row blocks (whose kv fits 4 MB by construction); a caller-supplied
    # block_q=512 keeps the conservative 4 MB gate (ADVICE r4)
    if kv_bytes <= 4 * 1024 * 1024 and score_bytes <= 8 * 1024 * 1024 and (
            bumped_512 or score_bytes <= 4 * 1024 * 1024):
        out, lse = pl.pallas_call(
            functools.partial(_flash_kernel_wholek, scale=scale,
                              skip_max=skip_max),
            grid=(b * h, sq_p // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                lse_spec,
            ],
            out_shape=out_shapes,
            interpret=interpret,
        )(qf, kf, vf)
        return (out[:, :sq, :d].reshape(b, h, sq, d),
                lse[:, :sq, 0].reshape(b, h, sq))

    grid = (b * h, sq_p // block_q, sk // block_k)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dp), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            lse_spec,
        ],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((block_q, dp), jnp.float32),  # acc
            pltpu.VMEM((block_q, 1), jnp.float32),  # running max
            pltpu.VMEM((block_q, 1), jnp.float32),  # running denom
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return (out[:, :sq, :d].reshape(b, h, sq, d),
            lse[:, :sq, 0].reshape(b, h, sq))


# ---------------------------------------------------------------------------
# Flash attention backward (FlashAttention-2 recurrences, two Pallas kernels)
#
#   S = qkᵀ·scale,  P = exp(S − lse),  dP = dO vᵀ,
#   dS = P ⊙ (dP − Δ)  with  Δ_i = Σ_d dO_id O_id,
#   dq = dS k·scale,  dk = dSᵀ q·scale,  dv = Pᵀ dO.
#
# Never materializes (Sq, Sk) in HBM: each program rebuilds P for one
# (q-block, k-block) cell in VMEM from q/k and the forward's lse. Zero-padded
# q rows (dO = 0 there) contribute nothing to dk/dv.
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, acc_ref, *, scale: float):
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (BQ, D)
    k_blk = k_ref[0]  # (BK, D)
    v_blk = v_ref[0]
    do = do_ref[0]  # (BQ, D)
    lse = lse_ref[0]  # (BQ, 1)
    delta = delta_ref[0]  # (BQ, 1)

    # fwd's VPU-pass trick (see _flash_kernel_wholek): fold scale·log2(e)
    # into the (BQ, D) q rows instead of multiplying the (BQ, BK) scores,
    # and rebuild p with native exp2 against the base-2 lse. The 110-clamp
    # mirrors the skip-max forward so a bound clamp can't overflow the
    # rebuilt p to inf here (it only binds past ~76-nat logits, where the
    # row-max forward regime is equally OOD).
    log2e = 1.4426950408889634
    qs = (q.astype(jnp.float32) * (scale * log2e)).astype(q.dtype)
    s2 = jnp.dot(qs, k_blk.T, preferred_element_type=jnp.float32)
    p = jnp.exp2(jnp.minimum(s2, 110.0) - lse * log2e)
    dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    acc_ref[:] = acc_ref[:] + jnp.dot(
        ds.astype(q.dtype), k_blk, preferred_element_type=jnp.float32)

    @pl.when(k_idx == nk - 1)
    def _():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float):
    q_idx = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(q_idx == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]  # (BQ, D)
    k_blk = k_ref[0]  # (BK, D)
    v_blk = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]  # (BQ, 1)
    delta = delta_ref[0]  # (BQ, 1)

    # same scale-fold + exp2 rebuild (and fwd-matching 110-clamp) as dq
    log2e = 1.4426950408889634
    qs = (q.astype(jnp.float32) * (scale * log2e)).astype(q.dtype)
    s2 = jnp.dot(qs, k_blk.T, preferred_element_type=jnp.float32)
    p = jnp.exp2(jnp.minimum(s2, 110.0) - lse * log2e)  # (BQ, BK)
    dv_acc[:] = dv_acc[:] + jnp.dot(p.astype(do.dtype).T, do,
                                    preferred_element_type=jnp.float32)
    dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dk_acc[:] = dk_acc[:] + jnp.dot(ds.astype(q.dtype).T, q,
                                    preferred_element_type=jnp.float32)

    @pl.when(q_idx == nq - 1)
    def _():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_attention_bwd_impl(q, k, v, out, lse, g, scale: float,
                              block_q: int = 256, block_k: int = 512):
    """(dq, dk, dv) via the two Pallas kernels; shapes as (B, H, S, D)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    qf = _pad_to(_pad_to(q.reshape(b * h, sq, d), 2, 128), 1, block_q)
    dof = _pad_to(_pad_to(g.reshape(b * h, sq, d).astype(q.dtype), 2, 128),
                  1, block_q)
    kf = _pad_to(k.reshape(b * h, sk, d), 2, 128)
    vf = _pad_to(v.reshape(b * h, sk, d), 2, 128)
    # lse for padded q rows must stay finite (exp(0 − lse) must not overflow)
    lsef = _pad_to(lse.reshape(b * h, sq, 1), 1, block_q)
    deltaf = _pad_to(delta.reshape(b * h, sq, 1), 1, block_q)

    sq_p = qf.shape[1]
    dp_ = qf.shape[2]
    interpret = jax.default_backend() != "tpu"
    bh = b * h
    nq = sq_p // block_q
    nk = sk // block_k

    q_spec = pl.BlockSpec((1, block_q, dp_), lambda i, j, kk: (i, j, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, dp_), lambda i, j, kk: (i, kk, 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_q, 1), lambda i, j, kk: (i, j, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale),
        grid=(bh, nq, nk),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, dp_), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dp_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qf, kf, vf, dof, lsef, deltaf)

    # dk/dv: iterate q blocks innermost, k blocks parallel
    q_spec2 = pl.BlockSpec((1, block_q, dp_), lambda i, kk, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, block_k, dp_), lambda i, kk, j: (i, kk, 0),
                            memory_space=pltpu.VMEM)
    row_spec2 = pl.BlockSpec((1, block_q, 1), lambda i, kk, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        grid=(bh, nk, nq),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, row_spec2, row_spec2],
        out_specs=[kv_spec2, kv_spec2],
        out_shape=[jax.ShapeDtypeStruct((bh, sk, dp_), k.dtype),
                   jax.ShapeDtypeStruct((bh, sk, dp_), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, dp_), jnp.float32),
                        pltpu.VMEM((block_k, dp_), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qf, kf, vf, dof, lsef, deltaf)

    dq = dq[:, :sq, :d].reshape(b, h, sq, d)
    dk = dk[:, :, :d].reshape(b, h, sk, d)
    dv = dv[:, :, :d].reshape(b, h, sk, d)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_attention(q, k, v, scale):
    out, _ = _flash_attention_fwd_impl(q, k, v, scale)
    return out


def _flash_fwd(q, k, v, scale):
    out, lse = _flash_attention_fwd_impl(q, k, v, scale)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, res, g):
    q, k, v, out, lse = res
    return _flash_attention_bwd_impl(q, k, v, out, lse, g, scale)


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Lane-padded merged-head flash attention ("(B, S, H·128)" layout)
#
# The production UNet attention layers project q/k/v with per-head
# lane-padded weights (models/attention_layers.py::_padded_head_proj): the
# projection matmul itself emits each head's D columns zero-padded to the
# 128-lane width, so its (B, S, H·128) output IS the kernel-ready layout —
# no HBM pad, no head-split transpose, no reshape copies (the xprof trace
# measured ~166 ms/step of pad/transpose/reshape around the attention
# sites, docs/denoise_profile.json). The kernels below are the SAME bodies
# as the (B, H, S, D) path; only the BlockSpecs change: the flattened grid
# index g enumerates (batch, head) and the index maps slice head g%H's 128
# lanes off the last axis.
# ---------------------------------------------------------------------------

DP = 128  # lane width every padded head occupies in the merged layout


def _flash_fwd_impl_merged(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int,
    scale: float, block_q: int = 256, block_k: int = 512,
) -> "Tuple[jnp.ndarray, jnp.ndarray]":
    """(B, S, H·128) flash forward → (out (B, Sq, H·128), lse (B, Sq, H))."""
    b, sq, chd = q.shape
    h = num_heads
    assert chd == h * DP, (chd, h)
    sk = k.shape[1]
    kv_bytes = 2 * sk * DP * k.dtype.itemsize
    skip_max = sk >= 2048
    bumped_512 = (skip_max and sq >= 512 and kv_bytes <= 4 * 1024 * 1024
                  and 512 * sk * 4 <= 8 * 1024 * 1024)
    if bumped_512:
        block_q = 512
    qf = _pad_to(q, 1, block_q)
    sq_p = qf.shape[1]
    interpret = jax.default_backend() != "tpu"
    # lse stays in the flat (b·h, sq_p, 1) layout: a (…, h)-trailing layout
    # would need a block last-dim of 1 ≠ h, which TPU tiling rejects; flat
    # rows match the (B, H, S, D) path and the bwd row specs unchanged
    out_shapes = [
        jax.ShapeDtypeStruct((b, sq_p, chd), q.dtype),
        jax.ShapeDtypeStruct((b * h, sq_p, 1), jnp.float32),
    ]
    score_bytes = block_q * sk * 4
    wholek = (kv_bytes <= 4 * 1024 * 1024 and score_bytes <= 8 * 1024 * 1024
              and (bumped_512 or score_bytes <= 4 * 1024 * 1024))
    if not wholek and (-sk) % block_k:
        # the streaming path partitions K (padded zero-keys would take
        # softmax weight); whole-K loads it unpartitioned, so only the
        # streaming fallback needs the divisibility
        raise ValueError("flash_attention requires Sk % block_k == 0")
    if wholek:
        out, lse = pl.pallas_call(
            functools.partial(_flash_kernel_wholek, scale=scale,
                              skip_max=skip_max),
            grid=(b * h, sq_p // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, DP), lambda g, j: (g // h, j, g % h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, DP), lambda g, j: (g // h, 0, g % h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, DP), lambda g, j: (g // h, 0, g % h),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, DP), lambda g, j: (g // h, j, g % h),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1), lambda g, j: (g, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=out_shapes,
            interpret=interpret,
        )(qf, k, v)
        return out[:, :sq], lse[:, :sq]

    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=(b * h, sq_p // block_q, sk // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, DP), lambda g, j, kk: (g // h, j, g % h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, DP), lambda g, j, kk: (g // h, kk, g % h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, DP), lambda g, j, kk: (g // h, kk, g % h),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, DP), lambda g, j, kk: (g // h, j, g % h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda g, j, kk: (g, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((block_q, DP), jnp.float32),  # acc
            pltpu.VMEM((block_q, 1), jnp.float32),  # running max
            pltpu.VMEM((block_q, 1), jnp.float32),  # running denom
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, k, v)
    return out[:, :sq], lse[:, :sq]


def _flash_bwd_impl_merged(q, k, v, out, lse, g, num_heads: int, scale: float,
                           block_q: int = 256, block_k: int = 512):
    """(dq, dk, dv) in the merged (B, S, H·128) layout."""
    b, sq, chd = q.shape
    h = num_heads
    sk = k.shape[1]
    # delta per (row, head) then to the flat (b·h, sq, 1) row layout the
    # kernels' row specs expect (pad lanes are exact zeros, see fwd)
    delta = jnp.sum(
        (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
            b, sq, h, DP), axis=-1)
    delta = delta.transpose(0, 2, 1).reshape(b * h, sq, 1)

    qf = _pad_to(q, 1, block_q)
    dof = _pad_to(g.astype(q.dtype), 1, block_q)
    lsef = _pad_to(lse, 1, block_q)
    deltaf = _pad_to(delta, 1, block_q)
    sq_p = qf.shape[1]
    interpret = jax.default_backend() != "tpu"
    nq = sq_p // block_q
    nk = sk // block_k
    if (-sk) % block_k:
        raise ValueError("flash bwd requires Sk % block_k == 0")

    q_spec = pl.BlockSpec((1, block_q, DP), lambda g_, j, kk: (g_ // h, j, g_ % h),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, DP), lambda g_, j, kk: (g_ // h, kk, g_ % h),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_q, 1), lambda g_, j, kk: (g_, j, 0),
                            memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale),
        grid=(b * h, nq, nk),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, sq_p, chd), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, DP), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qf, k, v, dof, lsef, deltaf)

    q_spec2 = pl.BlockSpec((1, block_q, DP), lambda g_, kk, j: (g_ // h, j, g_ % h),
                           memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, block_k, DP), lambda g_, kk, j: (g_ // h, kk, g_ % h),
                            memory_space=pltpu.VMEM)
    row_spec2 = pl.BlockSpec((1, block_q, 1), lambda g_, kk, j: (g_, j, 0),
                             memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale),
        grid=(b * h, nk, nq),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, row_spec2, row_spec2],
        out_specs=[kv_spec2, kv_spec2],
        out_shape=[jax.ShapeDtypeStruct((b, sk, chd), k.dtype),
                   jax.ShapeDtypeStruct((b, sk, chd), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, DP), jnp.float32),
                        pltpu.VMEM((block_k, DP), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qf, k, v, dof, lsef, deltaf)
    return dq[:, :sq], dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_padded(q, k, v, num_heads: int, scale: float):
    """Flash attention on lane-padded merged heads.

    q (B, Sq, H·128), k/v (B, Sk, H·128) where head i's D real values occupy
    lanes [i·128, i·128+D) and the rest are zeros (produced directly by
    lane-padded projection weights) → out (B, Sq, H·128) with the same
    convention (pad lanes exactly zero). Differentiable; numerics identical
    to the (B, H, S, D) path — zero lanes contribute nothing to any dot."""
    out, _ = _flash_fwd_impl_merged(q, k, v, num_heads, scale)
    return out


def _flash_padded_fwd(q, k, v, num_heads, scale):
    out, lse = _flash_fwd_impl_merged(q, k, v, num_heads, scale)
    return out, (q, k, v, out, lse)


def _flash_padded_bwd(num_heads, scale, res, g):
    q, k, v, out, lse = res
    return _flash_bwd_impl_merged(q, k, v, out, lse, g, num_heads, scale)


flash_attention_padded.defvjp(_flash_padded_fwd, _flash_padded_bwd)


def _packed_padded_kernel(q_ref, k_ref, v_ref, o_ref, *, seq: int,
                          scale: float, num_heads: int):
    """One grid cell: ONE packed group of 128 tokens (128//seq tiny
    sequences), ALL heads. Heads live side-by-side on the lane axis in the
    merged (·, 128, H·128) layout, so each head's block is a 128-aligned
    lane slice — full-width MXU dots (the zero pad lanes contribute nothing)
    with no lane rotations, unlike the per-head (128, D) blocks of
    :func:`_packed_temporal_kernel` that idle (128−D)/128 of the VPU/MXU.
    Cross-sequence scores are masked to the block-diagonal; the (128, 128)
    f32 scores and probabilities never leave VMEM (the XLA packed path
    round-trips ~1 GB of them through HBM per L0 temporal call)."""
    log2e = 1.4426950408889634
    ps = q_ref.shape[1]
    blk = jax.lax.broadcasted_iota(jnp.int32, (ps, ps), 0) // seq
    blk_t = jax.lax.broadcasted_iota(jnp.int32, (ps, ps), 1) // seq
    neg = jnp.where(blk == blk_t, 0.0, -1e30).astype(jnp.float32)
    for h in range(num_heads):
        sl = slice(h * DP, (h + 1) * DP)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        # scale AFTER the dot in f32 (pre-scaling q would round through bf16
        # before the MXU); base-2 softmax via native exp2
        s = (jnp.dot(q, k.T, preferred_element_type=jnp.float32)
             * (scale * log2e) + neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        acc = jnp.dot((p / l).astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = acc.astype(o_ref.dtype)


def _packed_padded_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref,
                              dv_ref, *, seq: int, scale: float,
                              num_heads: int):
    """Fused backward for :func:`_packed_padded_kernel`: the whole group's
    scores fit VMEM, so one cell recomputes p and emits dq/dk/dv for its
    group outright — no cross-cell accumulation, no HBM probabilities (the
    XLA-recompute backward the old packed path used materializes the packed
    (G, H, 128, 128) f32 logits AND probs in the guidance/trainer grads)."""
    log2e = 1.4426950408889634
    ps = q_ref.shape[1]
    blk = jax.lax.broadcasted_iota(jnp.int32, (ps, ps), 0) // seq
    blk_t = jax.lax.broadcasted_iota(jnp.int32, (ps, ps), 1) // seq
    neg = jnp.where(blk == blk_t, 0.0, -1e30).astype(jnp.float32)
    for h in range(num_heads):
        sl = slice(h * DP, (h + 1) * DP)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        g = g_ref[0, :, sl]
        s = (jnp.dot(q, k.T, preferred_element_type=jnp.float32)
             * (scale * log2e) + neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        pt = p / l  # normalized probs, f32
        ptc = pt.astype(v.dtype)
        o = jnp.dot(ptc, v, preferred_element_type=jnp.float32)
        dpt = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
        delta = jnp.sum(g.astype(jnp.float32) * o, axis=-1, keepdims=True)
        ds = pt * (dpt - delta)
        dsc = ds.astype(q.dtype)
        dq_ref[0, :, sl] = (jnp.dot(dsc, k, preferred_element_type=jnp.float32)
                            * scale).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = (jnp.dot(dsc.T, q, preferred_element_type=jnp.float32)
                            * scale).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = jnp.dot(ptc.T, g, preferred_element_type=jnp.float32
                                   ).astype(dv_ref.dtype)


def _pack_padded_groups(xs, seq: int):
    """(B, S, CHD) arrays → (G, 128, CHD) packed groups (zero-padded B)."""
    B = xs[0].shape[0]
    P = 128 // seq
    pad_b = (-B) % P
    if pad_b:
        xs = [jnp.pad(x, ((0, pad_b), (0, 0), (0, 0))) for x in xs]
    G = (B + pad_b) // P
    return [x.reshape(G, P * seq, x.shape[-1]) for x in xs], G


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def packed_temporal_flash_padded(q, k, v, num_heads: int, scale: float):
    """Fused packed tiny-sequence attention in the lane-padded merged-head
    layout: q/k/v (B, S, H·128) with head i's D real values at lanes
    [i·128, i·128+D) and exact zeros elsewhere (produced directly by
    lane-padded projection weights, models/attention_layers.py::
    _padded_head_proj) → out (B, S, H·128), same convention.

    This is the production temporal-attention path (reference
    animatediff/models/motion_module.py VersatileAttention, temporal mode —
    (B·N·H·W) independent 16-token sequences): sequences pack 128//S per
    group, heads stay side-by-side on lanes, and both softmax directions run
    fused in VMEM, forward AND backward. Differentiable."""
    return _packed_padded_fwd_impl(q, k, v, num_heads, scale)


def _packed_padded_fwd_impl(q, k, v, num_heads: int, scale: float):
    B, S, chd = q.shape
    assert chd == num_heads * DP, (chd, num_heads)
    assert 128 % S == 0, S
    (qg, kg, vg), G = _pack_padded_groups([q, k, v], S)
    spec = pl.BlockSpec((1, 128, chd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_packed_padded_kernel, seq=S, scale=scale,
                          num_heads=num_heads),
        grid=(G,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((G, 128, chd), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qg, kg, vg)
    return out.reshape(G * (128 // S), S, chd)[:B]


def _packed_padded_fwd(q, k, v, num_heads, scale):
    return _packed_padded_fwd_impl(q, k, v, num_heads, scale), (q, k, v)


def _packed_padded_bwd(num_heads, scale, res, g):
    q, k, v = res
    B, S, chd = q.shape
    (qg, kg, vg, gg), G = _pack_padded_groups(
        [q, k, v, g.astype(q.dtype)], S)
    spec = pl.BlockSpec((1, 128, chd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((G, 128, chd), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_packed_padded_bwd_kernel, seq=S, scale=scale,
                          num_heads=num_heads),
        grid=(G,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[shape, shape, shape],
        interpret=jax.default_backend() != "tpu",
    )(qg, kg, vg, gg)
    P = 128 // S
    return tuple(x.reshape(G * P, S, chd)[:B] for x in (dq, dk, dv))


packed_temporal_flash_padded.defvjp(_packed_padded_fwd, _packed_padded_bwd)


def padded_packed_plan(batch: int, seq: int, channels: int,
                       num_heads: int) -> bool:
    """True when a tiny-sequence self-attention should take
    :func:`packed_temporal_flash_padded` — callers then pre-pad heads via
    projection weights, skipping the packed XLA path's HBM logits and
    head-split transposes. Mirrors :func:`padded_flash_plan`'s override/sp
    gating (non-flash backend overrides and an sp ring that would claim the
    sequence both consume the unpadded (B, S, C) layout)."""
    d = channels // num_heads
    if d >= DP or jax.default_backend() != "tpu":
        return False
    if seq > 32 or 128 % seq != 0:
        return False
    if batch < 2 * (128 // seq):  # same gate as the packable check below
        return False
    override = getattr(_backend_override, "name", None)
    if override not in (None, "flash", "auto"):
        return False
    sp = getattr(_backend_override, "sp", None)
    if sp is not None:
        mesh, axis_name, min_seq = sp
        n_sp = mesh.shape[axis_name]
        if seq % n_sp == 0 and seq >= max(2 * n_sp, min_seq):
            return False
    return True


def padded_flash_plan(batch: int, sq: int, sk: int, channels: int,
                      num_heads: int) -> bool:
    """True when ``multi_head_attention("auto")`` would route this shape to
    the Pallas flash kernels on this backend — callers then pre-pad heads via
    projection weights and call :func:`flash_attention_padded`, skipping the
    HBM pad/head-split glue entirely. Must stay in lockstep with the auto
    routing below (incl. the thread-local overrides: an ``attention_backend``
    override other than flash/auto, or an ``sp_ring`` scope whose ring would
    take this sequence, disable the padded path — those paths consume the
    unpadded (B, S, C) layout)."""
    d = channels // num_heads
    if d >= DP or jax.default_backend() != "tpu":
        return False
    override = getattr(_backend_override, "name", None)
    if override not in (None, "flash", "auto"):
        return False
    sp = getattr(_backend_override, "sp", None)
    if sp is not None:
        mesh, axis_name, min_seq = sp
        n_sp = mesh.shape[axis_name]
        if sq == sk and sq % n_sp == 0 and sq >= max(2 * n_sp, min_seq):
            return False
    if sk % 512 != 0:
        return False
    logits_bytes = batch * num_heads * sq * sk * 4
    return override == "flash" or logits_bytes > 512 * 1024 * 1024


def _flash_supported(q: jnp.ndarray, k: jnp.ndarray, block_k: int = 512) -> bool:
    # K/V stream through VMEM one block at a time; only the block sizes must
    # divide (zero-padded keys would otherwise take softmax weight)
    return k.shape[2] % block_k == 0


import contextlib
import threading

_backend_override = threading.local()

# minimum sequence length for the sp ring (see multi_head_attention): chosen
# so only the spatial/cross-view sequences (≥1024 tokens at 128²+ latents)
# shard; per-hop the ring moves Sk/n_sp · C keys+values over ICI while each
# chip computes a (Sq/n_sp, Sk/n_sp) block — compute/comm stays ≥ D/2 flops
# per byte only when the local block is MXU-sized
SP_MIN_SEQ = 512


@contextlib.contextmanager
def attention_backend(name: str):
    """Force a backend for every multi_head_attention traced in this scope.

    Used to trace the frozen guidance UNet with the flash kernel: inside a
    gradient program XLA materializes the XLA path's (S, S) f32 logits (16 GB
    at S=4096 × 32 batch), while flash never leaves VMEM."""
    prev = getattr(_backend_override, "name", None)
    _backend_override.name = name
    try:
        yield
    finally:
        _backend_override.name = prev


@contextlib.contextmanager
def sp_ring(mesh, axis_name: str = "sp", min_seq: Optional[int] = None):
    """Route self-attention traced in this scope through sequence-parallel
    ring attention over ``mesh``'s ``axis_name`` (parallel/sp_attention.py):
    the token axis is sharded across chips and K/V rotate over the ICI ring.

    The >reference-scale path (more views / frames / resolution than fits one
    chip); sequences not divisible by the axis size fall back to the local
    backends transparently (e.g. the 77-token text cross-attention), as do
    sequences shorter than ``min_seq`` (default SP_MIN_SEQ) where the ring's
    ppermute hops would dominate — e.g. the 16-token temporal attention.
    Tests/dryruns pass a small ``min_seq`` so tiny shapes still exercise the
    collective path."""
    prev = getattr(_backend_override, "sp", None)
    _backend_override.sp = (mesh, axis_name,
                            SP_MIN_SEQ if min_seq is None else min_seq)
    try:
        yield
    finally:
        _backend_override.sp = prev


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    scale: Optional[float] = None,
    backend: str = "auto",
) -> jnp.ndarray:
    """Merged-head attention: q (B, Sq, C), k/v (B, Sk, C) → (B, Sq, C)."""
    override = getattr(_backend_override, "name", None)
    if override is not None and backend == "auto":
        backend = override
    d = q.shape[-1] // num_heads
    if scale is None:
        scale = d ** -0.5
    sp = getattr(_backend_override, "sp", None)
    if sp is not None:
        mesh, axis_name, min_seq = sp
        n_sp = mesh.shape[axis_name]
        # ring only sequences long enough that sharding wins: below min_seq
        # tokens the n_sp ppermute hops per layer cost more than the whole
        # local attention (e.g. the 16-token temporal attention at sp=8
        # would run 2 tokens/chip with 8 ICI hops) — those stay local
        if (q.shape == k.shape and q.shape[1] % n_sp == 0
                and q.shape[1] >= max(2 * n_sp, min_seq)):
            from animate3d_tpu.parallel import sp_attention as _spa

            return _spa.ring_attention_sharded(mesh, q, k, v, num_heads,
                                               scale, axis_name)
    packable = (q.shape == k.shape == v.shape and q.shape[1] <= 32
                and q.shape[0] >= 2 * (128 // q.shape[1]))
    # measured (docs/denoise_microbench.json): packing wins at 40- and
    # 160-dim heads (temporal L0 7.0→5.8 ms, L2 0.34→0.12) but narrowly
    # loses at 80 (L1 1.05→1.18 — XLA's unpadded 80-dim contraction is
    # already MXU-friendly), so auto skips d=80; backend="packed" forces
    if backend == "auto" and d == 80:
        packable = False
    if packable and (backend in ("packed", "packed_flash") or (
            backend == "auto" and jax.default_backend() == "tpu")):
        # tiny-sequence self/temporal attention: pack to MXU width.  The
        # fused Pallas variant (probabilities stay in VMEM) measured SLOWER
        # than this XLA packed path at the production temporal L0 shape
        # (docs/flash_tune.json: 5.6 vs 4.97 ms — its (…, 40)-lane blocks
        # waste 69% of the VPU/MXU lane width that XLA's (…, 320) packed
        # layout keeps full), so auto keeps XLA packing; the kernel remains
        # available for explicit A/B via backend="packed_flash".
        if (backend == "packed_flash" and jax.default_backend() == "tpu"
                and 128 % q.shape[1] == 0):
            return packed_temporal_flash(q, k, v, num_heads, scale)
        return _packed_small_attention(q, k, v, num_heads, scale)
    qh, kh, vh = (_split_heads(x, num_heads) for x in (q, k, v))
    use_flash = False
    if backend == "flash":
        use_flash = _flash_supported(qh, kh)  # xla fallback for ragged K (77 text tokens etc.)
    elif backend == "auto":
        # flash when the (B·H, Sq, Sk) logits would be HBM-significant —
        # XLA materializes them inside larger programs; below that XLA's
        # unpadded head-dim contractions win (SD1.5 heads are 40/80/160 wide,
        # which the flash kernel pads to the 128-lane width)
        on_tpu = jax.default_backend() == "tpu"
        logits_bytes = q.shape[0] * num_heads * q.shape[1] * k.shape[1] * 4
        use_flash = (on_tpu and logits_bytes > 512 * 1024 * 1024
                     and _flash_supported(qh, kh))
    if use_flash:
        out = _flash_attention(qh, kh, vh, scale)
    else:
        out = attention_xla(qh, kh, vh, scale)
    return _merge_heads(out)
