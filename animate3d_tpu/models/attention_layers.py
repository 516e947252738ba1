"""MV-VDM attention behaviors as explicit Flax modules.

The reference implements these as diffusers attention *processors* injected by
name (animatediff/models/attention_processor.py; installation map
inference.py:107-174). Here each behavior is an explicit module — idiomatic
for a functional framework and jit-stable:

  * :class:`CrossViewSelfAttention` — spatial attn1. Dense cross-view 3D
    attention per frame: ``(b n f) l c → (b f) (n l) c`` (processor (a),
    attention_processor.py:22-126), with the optional I2V branch whose
    queries come from ``to_q_i2v`` and whose K/V are the *clean first
    frame's* keys/values broadcast to every frame (processor (c), :302-445).
  * :class:`TextCrossAttention` — attn2. Text cross-attention plus the
    IP-Adapter branch with separate ``to_k_ip/to_v_ip`` over the 4 image
    tokens, scale-weighted sum (processor (b), :129-298).
  * :class:`SpatioTemporalAttention` — motion-module attention over frames
    (layout ``(b n h w) f c``) with optional cross-view spatial branch
    (``to_*_sp`` + 2D sine/learned positional and camera encodings) and
    image branch (``to_*_i2v`` against frame-0 tokens), merged by zero-init
    add or a learned alpha blender (processor (d), :448-743).

All Linear layers mirror the reference's bias pattern (q/k/v bias-free,
out-projections biased) so torch→flax weight conversion is 1:1.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from animate3d_tpu.ops.attention import (
    DP as _LANE,
    flash_attention_padded,
    multi_head_attention,
    packed_temporal_flash_padded,
    padded_flash_plan,
    padded_packed_plan,
)
from animate3d_tpu.ops.geglu import geglu_ff
from animate3d_tpu.models.embeddings import (
    add_temporal_positional_embedding,
    sine_positional_encoding_2d,
    sinusoidal_positions,
    LearnedPositionalEncoding2D,
)


class _ProjKernel(nn.Module):
    """Declares a Dense-compatible bias-free projection kernel
    (``params/<name>/kernel``, lecun-normal init — identical tree and RNG
    stream to ``nn.Dense(name=<name>, use_bias=False)``) and returns it.
    Kept (instead of plain nn.Dense) purely for :func:`_shared_input_proj`'s
    one-call-site brevity; the checkpoint layout stays 1:1 with the
    reference's per-projection Linears."""

    in_dim: int
    features: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_dim, self.features)
        )


def _shared_input_proj(x: jnp.ndarray, names, features: int, dtype) -> list:
    """Shared-input projections ``[x @ W_a, x @ W_b, ...]``, one matmul each.

    Mirrors nn.Dense semantics (input and kernels promoted to ``dtype``
    before the dot). Measured on v5e (docs/denoise_microbench.json
    qkv_L0_*): the single concatenated ``x @ [W_a|W_b|W_c]`` matmul is
    *slower* than separate matmuls (0.87 vs 0.62 ms at the L0 cross-view
    shape) — the jnp.split of the packed output materializes copies that
    outweigh re-reading ``x`` — so this intentionally issues one matmul per
    kernel. The param tree (``<name>/kernel``) is unchanged either way."""
    c = x.shape[-1]
    # auto-parented to the calling compact module (same mechanism as the
    # `dense = lambda ...` helpers below)
    xd = x.astype(dtype)
    return [
        xd @ _ProjKernel(in_dim=c, features=features, name=nm)().astype(dtype)
        for nm in names
    ]


def _pad_head_cols(w: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(in, H·D) → (in, H·128): zero-pad each head's D output columns to the
    lane width. Applied to q/k/v projection WEIGHTS so the projection matmul
    itself emits the flash kernels' lane-padded layout — replacing the
    measured ~11 ms/site of HBM pad/head-split-transpose/reshape around each
    flash call (docs/denoise_profile.json) with ~1 ms of extra MXU work on
    zero columns."""
    in_dim, hd = w.shape
    d = hd // num_heads
    return jnp.pad(w.reshape(in_dim, num_heads, d),
                   ((0, 0), (0, 0), (0, _LANE - d))).reshape(
                       in_dim, num_heads * _LANE)


def _pad_head_rows(w: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(H·D, out) → (H·128, out): zero rows under each head's pad lanes, so
    the out-projection consumes the kernels' padded output directly."""
    hd, out = w.shape
    d = hd // num_heads
    return jnp.pad(w.reshape(num_heads, d, out),
                   ((0, 0), (0, _LANE - d), (0, 0))).reshape(
                       num_heads * _LANE, out)


def _padded_head_proj(x: jnp.ndarray, names, channels: int, num_heads: int,
                      dtype) -> list:
    """:func:`_shared_input_proj` variant emitting lane-padded heads: each
    result is (B, S, H·128) with head i's real D values at lanes
    [i·128, i·128+D) and exact zeros elsewhere. Param tree identical."""
    xd = x.astype(dtype)
    return [
        xd @ _pad_head_cols(
            _ProjKernel(in_dim=x.shape[-1], features=channels,
                        name=nm)().astype(dtype), num_heads)
        for nm in names
    ]


class CrossViewSelfAttention(nn.Module):
    channels: int
    num_heads: int
    num_views: int
    image_attn: bool = False  # MVDream-I2V variant
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        """x: (B·N·F, L, C) post-norm hidden states; returns same shape."""
        bnf, l, c = x.shape
        n, f = self.num_views, num_frames
        b = bnf // (n * f)
        # (b n f) l c -> (b f) (n l) c
        xr = x.reshape(b, n, f, l, c).transpose(0, 2, 1, 3, 4).reshape(b * f, n * l, c)

        dense = lambda feats, use_bias, name: nn.Dense(
            feats, use_bias=use_bias, dtype=self.dtype, name=name
        )
        proj_names = (("to_q", "to_k", "to_v", "to_q_i2v") if self.image_attn
                      else ("to_q", "to_k", "to_v"))
        if padded_flash_plan(b * f, n * l, n * l, c, self.num_heads):
            # lane-padded fast path: projections emit the flash kernels'
            # (B, S, H·128) layout directly; out-projections consume it via
            # row-padded weights. Same params, same math (pad lanes are
            # exact zeros), none of the HBM pad/transpose/reshape glue.
            scale = (c // self.num_heads) ** -0.5
            projs = _padded_head_proj(xr, proj_names, c, self.num_heads,
                                      self.dtype)
            q, k, v = projs[:3]
            h = flash_attention_padded(q, k, v, self.num_heads, scale)
            w0, b0 = _DenseParams(c, c, name="to_out_0")()
            w0 = w0.astype(self.dtype)
            out = h @ _pad_head_rows(w0, self.num_heads) + b0.astype(self.dtype)
            if self.image_attn:
                qi = projs[3]
                cp = q.shape[-1]
                k0 = k.reshape(b, f, n * l, cp)[:, 0]
                v0 = v.reshape(b, f, n * l, cp)[:, 0]
                k0 = jnp.broadcast_to(k0[:, None], (b, f, n * l, cp)).reshape(b * f, n * l, cp)
                v0 = jnp.broadcast_to(v0[:, None], (b, f, n * l, cp)).reshape(b * f, n * l, cp)
                hi = flash_attention_padded(qi, k0, v0, self.num_heads, scale)
                wi, bi = _DenseParams(c, c, name="to_out_i2v",
                                      kernel_init=nn.initializers.zeros)()
                wi = wi.astype(self.dtype)
                # reference order is to_out_0(h + to_out_i2v(hi))
                # (attention_processor.py:424-430); the two chained linears
                # fold into one padded-input matmul: hi @ (Wi2v_p · W0)
                out = (out + hi @ (_pad_head_rows(wi, self.num_heads) @ w0)
                       + bi.astype(self.dtype) @ w0)
            h = out
            return h.reshape(b, f, n, l, c).transpose(0, 2, 1, 3, 4).reshape(bnf, l, c)

        if self.image_attn:
            q, k, v, qi = _shared_input_proj(xr, proj_names, c, self.dtype)
        else:
            q, k, v = _shared_input_proj(xr, proj_names, c, self.dtype)
        h = multi_head_attention(q, k, v, self.num_heads)

        if self.image_attn:
            # K/V from the first frame only, broadcast over frames
            k0 = k.reshape(b, f, n * l, c)[:, 0]
            v0 = v.reshape(b, f, n * l, c)[:, 0]
            k0 = jnp.broadcast_to(k0[:, None], (b, f, n * l, c)).reshape(b * f, n * l, c)
            v0 = jnp.broadcast_to(v0[:, None], (b, f, n * l, c)).reshape(b * f, n * l, c)
            hi = multi_head_attention(qi, k0, v0, self.num_heads)
            # zero-init out-projection: the I2V branch is an exact no-op at
            # install time (reference inference.py:160-168; to_q_i2v is
            # additionally seeded from to_q by adapter_init_parity)
            hi = nn.Dense(c, use_bias=True, dtype=self.dtype, name="to_out_i2v",
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros)(hi)
            h = h + hi

        h = dense(c, True, "to_out_0")(h)
        # (b f) (n l) c -> (b n f) l c
        return h.reshape(b, f, n, l, c).transpose(0, 2, 1, 3, 4).reshape(bnf, l, c)


class TextCrossAttention(nn.Module):
    channels: int
    num_heads: int
    context_dim: int = 768
    ip_enabled: bool = True
    ip_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        ip_context: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """x: (B, L, C); context: (B, 77, context_dim); ip: (B, 4, context_dim)."""
        c = self.channels
        dense = lambda feats, use_bias, name: nn.Dense(
            feats, use_bias=use_bias, dtype=self.dtype, name=name
        )
        q = dense(c, False, "to_q")(x)
        k, v = _shared_input_proj(context, ("to_k", "to_v"), c, self.dtype)
        h = multi_head_attention(q, k, v, self.num_heads)

        if self.ip_enabled and ip_context is not None:
            ip_k, ip_v = _shared_input_proj(ip_context, ("to_k_ip", "to_v_ip"), c, self.dtype)
            h_ip = multi_head_attention(q, ip_k, ip_v, self.num_heads)
            h = h + self.ip_scale * h_ip

        return dense(c, True, "to_out_0")(h)


class AlphaBlender(nn.Module):
    """Learned sigmoid mix of two streams (diffusers AlphaBlender, merge
    strategy 'learned'; init alpha=0 → 0.5/0.5)."""

    @nn.compact
    def __call__(self, x_a: jnp.ndarray, x_b: jnp.ndarray) -> jnp.ndarray:
        mix = self.param("mix_factor", nn.initializers.zeros, (1,))
        alpha = jax.nn.sigmoid(mix.astype(jnp.float32))[0]
        return (alpha * x_a.astype(jnp.float32)
                + (1.0 - alpha) * x_b.astype(jnp.float32)).astype(x_a.dtype)


class SoftmaxAlphaBlender(nn.Module):
    """3-way softmax mix (reference attention_processor.py:727-743)."""

    @nn.compact
    def __call__(self, x_sp, x_temp, x_img) -> jnp.ndarray:
        mix = self.param("mix_factor", nn.initializers.zeros, (3,))
        a = jax.nn.softmax(mix.astype(jnp.float32))
        out = a[0] * x_sp.astype(jnp.float32) + a[1] * x_temp.astype(jnp.float32) \
            + a[2] * x_img.astype(jnp.float32)
        return out.astype(x_sp.dtype)


class SpatioTemporalAttention(nn.Module):
    channels: int
    num_heads: int
    num_views: int
    spatial_attn: bool = True
    image_attn: bool = False
    use_alpha_blender: bool = True
    spatial_encoding: Optional[str] = "sinusoid"  # sinusoid|learnable|None
    camera_encoding: Optional[str] = None  # sinusoid|learnable|None
    max_seq_length: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
        """x: (B·N·h·w, F, C) post-norm tokens; feature dims passed explicitly
        (the reference hard-codes feature_size per block, inference.py:93-105 —
        here it is derived from the caller's conv shape)."""
        bl, f, c = x.shape
        n = self.num_views
        hw = height * width
        b = bl // (n * hw)
        dense = lambda feats, use_bias, name: nn.Dense(
            feats, use_bias=use_bias, dtype=self.dtype, name=name
        )

        use_extra_encoding = self.spatial_attn and (
            self.spatial_encoding is not None or self.camera_encoding is not None
        )

        # ---- spatial branch input: (b f) (n h w) c, from pre-time-PE tokens
        if self.spatial_attn:
            xs = x.reshape(b, n * hw, f, c).transpose(0, 2, 1, 3).reshape(b * f, n * hw, c)
            if self.spatial_encoding == "sinusoid":
                pe = sine_positional_encoding_2d(height, width, c // 2)  # (h, w, c)
                xs = xs + jnp.tile(pe.reshape(1, hw, c), (1, n, 1)).astype(xs.dtype)
            elif self.spatial_encoding == "learnable":
                pe = LearnedPositionalEncoding2D(
                    c // 2, row_num_embed=height, col_num_embed=width,
                    name="spatial_pos_embed",
                )(height, width)
                xs = xs + jnp.tile(pe.reshape(1, hw, c), (1, n, 1)).astype(xs.dtype)
            if self.camera_encoding == "sinusoid":
                cam_pe = sinusoidal_positions(n, c)  # (n, c)
                xs = xs + jnp.repeat(cam_pe, hw, axis=0)[None].astype(xs.dtype)
            elif self.camera_encoding == "learnable":
                table = self.param("camera_embed", nn.initializers.normal(0.02), (n, c))
                xs = xs + jnp.repeat(table, hw, axis=0)[None].astype(xs.dtype)

        # ---- image branch input: (b·n, f) grouped per-view tokens (b·n f) (h·w) c
        if self.image_attn:
            xi = x.reshape(b * n, hw, f, c).transpose(0, 2, 1, 3).reshape(b * n * f, hw, c)

        # ---- temporal branch: restore the nulled block PE manually
        if use_extra_encoding:
            x = add_temporal_positional_embedding(x, self.max_seq_length)

        if padded_packed_plan(bl, f, c, self.num_heads):
            # lane-padded fused temporal path: projections emit the packed
            # kernel's (B, F, H·128) layout directly; softmax stays in VMEM
            # both directions (fwd + bwd), replacing the XLA packed path's
            # HBM logits and head-split transposes
            q, k, v = _padded_head_proj(x, ("to_q", "to_k", "to_v"), c,
                                        self.num_heads, self.dtype)
            h_t = packed_temporal_flash_padded(
                q, k, v, self.num_heads, (c // self.num_heads) ** -0.5)
            w0, b0 = _DenseParams(c, c, name="to_out_0")()
            h_t = (h_t @ _pad_head_rows(w0.astype(self.dtype), self.num_heads)
                   + b0.astype(self.dtype))
        else:
            q, k, v = _shared_input_proj(x, ("to_q", "to_k", "to_v"), c, self.dtype)
            h_t = multi_head_attention(q, k, v, self.num_heads)
            h_t = dense(c, True, "to_out_0")(h_t)

        out_init = (nn.initializers.zeros if not self.use_alpha_blender
                    else nn.initializers.lecun_normal())
        scale = (c // self.num_heads) ** -0.5

        h_sp = None
        if self.spatial_attn:
            if padded_flash_plan(b * f, n * hw, n * hw, c, self.num_heads):
                qs, ks, vs = _padded_head_proj(
                    xs, ("to_q_sp", "to_k_sp", "to_v_sp"), c, self.num_heads,
                    self.dtype)
                hs_p = flash_attention_padded(qs, ks, vs, self.num_heads, scale)
                ws, bs_ = _DenseParams(c, c, name="to_out_sp",
                                       kernel_init=out_init)()
                hs = (hs_p @ _pad_head_rows(ws.astype(self.dtype), self.num_heads)
                      + bs_.astype(self.dtype))
            else:
                qs, ks, vs = _shared_input_proj(
                    xs, ("to_q_sp", "to_k_sp", "to_v_sp"), c, self.dtype)
                hs = multi_head_attention(qs, ks, vs, self.num_heads)
                hs = nn.Dense(c, use_bias=True, dtype=self.dtype, name="to_out_sp",
                              kernel_init=out_init,
                              bias_init=nn.initializers.zeros)(hs)
            # (b f) (n h w) c -> (b n h w) f c
            h_sp = hs.reshape(b, f, n * hw, c).transpose(0, 2, 1, 3).reshape(bl, f, c)

        h_img = None
        if self.image_attn:
            x0 = xi.reshape(b * n, f, hw, c)[:, 0]  # first frame tokens
            if padded_flash_plan(b * n * f, hw, hw, c, self.num_heads):
                qi = _padded_head_proj(xi, ("to_q_i2v",), c, self.num_heads,
                                       self.dtype)[0]
                ki, vi = _padded_head_proj(
                    x0, ("to_k_i2v", "to_v_i2v"), c, self.num_heads, self.dtype)
                cp = qi.shape[-1]
                ki = jnp.broadcast_to(ki[:, None], (b * n, f, hw, cp)).reshape(b * n * f, hw, cp)
                vi = jnp.broadcast_to(vi[:, None], (b * n, f, hw, cp)).reshape(b * n * f, hw, cp)
                hi_p = flash_attention_padded(qi, ki, vi, self.num_heads, scale)
                wi, bi = _DenseParams(c, c, name="to_out_i2v",
                                      kernel_init=out_init)()
                hi = (hi_p @ _pad_head_rows(wi.astype(self.dtype), self.num_heads)
                      + bi.astype(self.dtype))
            else:
                qi = dense(c, False, "to_q_i2v")(xi)
                ki, vi = _shared_input_proj(x0, ("to_k_i2v", "to_v_i2v"), c, self.dtype)
                ki = jnp.broadcast_to(ki[:, None], (b * n, f, hw, c)).reshape(b * n * f, hw, c)
                vi = jnp.broadcast_to(vi[:, None], (b * n, f, hw, c)).reshape(b * n * f, hw, c)
                hi = multi_head_attention(qi, ki, vi, self.num_heads)
                hi = nn.Dense(c, use_bias=True, dtype=self.dtype, name="to_out_i2v",
                              kernel_init=out_init,
                              bias_init=nn.initializers.zeros)(hi)
            h_img = hi.reshape(b * n, f, hw, c).transpose(0, 2, 1, 3).reshape(bl, f, c)

        if not self.use_alpha_blender:
            h = h_t
            if h_sp is not None:
                h = h + h_sp
            if h_img is not None:
                h = h + h_img
            return h
        if h_sp is not None and h_img is None:
            return AlphaBlender(name="alpha_blender")(h_sp, h_t)
        if h_img is not None and h_sp is None:
            return AlphaBlender(name="alpha_blender")(h_img, h_t)
        if h_sp is not None and h_img is not None:
            return SoftmaxAlphaBlender(name="alpha_blender")(h_sp, h_t, h_img)
        return h_t


class TemporalSelfAttention(nn.Module):
    """Plain AnimateDiff temporal self-attention (motion_module_attn_cfg
    disabled path — no spatial/image branches)."""

    channels: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.channels
        if padded_packed_plan(x.shape[0], x.shape[1], c, self.num_heads):
            q, k, v = _padded_head_proj(x, ("to_q", "to_k", "to_v"), c,
                                        self.num_heads, self.dtype)
            h = packed_temporal_flash_padded(
                q, k, v, self.num_heads, (c // self.num_heads) ** -0.5)
            w0, b0 = _DenseParams(c, c, name="to_out_0")()
            return (h @ _pad_head_rows(w0.astype(self.dtype), self.num_heads)
                    + b0.astype(self.dtype))
        q, k, v = _shared_input_proj(x, ("to_q", "to_k", "to_v"), c, self.dtype)
        h = multi_head_attention(q, k, v, self.num_heads)
        return nn.Dense(c, use_bias=True, dtype=self.dtype, name="to_out_0")(h)


class _DenseParams(nn.Module):
    """Dense-compatible kernel+bias declaration (``<name>/{kernel,bias}``)
    returning the raw params, for ops that fuse several Dense layers into
    one kernel (ops/geglu.py) while keeping the checkpoint layout."""

    in_dim: int
    features: int
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init,
                       (self.in_dim, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class FeedForwardGEGLU(nn.Module):
    channels: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # GEGLU with exact (erf) GELU — torch F.gelu default used by
        # diffusers GEGLU; flax's tanh approximation drifts ~1e-3 relative
        # (caught by the reference-derived goldens, tests/test_golden_ref.py).
        # Runs as one fused Pallas kernel on TPU (ops/geglu.py) — the
        # projection and gated hidden never leave VMEM.
        inner = self.channels * self.mult
        w1, b1 = _DenseParams(x.shape[-1], inner * 2, name="net_0_proj")()
        w2, b2 = _DenseParams(inner, self.channels, name="net_2")()
        return geglu_ff(x, w1, b1, w2, b2, dtype=self.dtype)
