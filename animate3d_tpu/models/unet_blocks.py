"""UNet building blocks (Flax linen, NHWC).

SD1.5 topology blocks extended with motion modules, mirroring the reference's
diffusers blocks (unet_motion_mv_model.py down/mid/up construction,
:158-257) but as explicit composition:

  ResnetBlock2D → SpatialTransformer (cross-view attn1 + text/IP attn2 + FF)
  → MotionModule (temporal transformer with spatiotemporal attention).

Tensor layout: conv tensors are (B·N·F, H, W, C) NHWC (TPU-native); token
tensors are reshaped per attention behavior (see attention_layers.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from animate3d_tpu.models.attention_layers import (
    CrossViewSelfAttention,
    FeedForwardGEGLU,
    SpatioTemporalAttention,
    TemporalSelfAttention,
    TextCrossAttention,
    _DenseParams,
)
from animate3d_tpu.models.embeddings import add_temporal_positional_embedding

# Fuse the MotionModule's (b f) x c ↔ (b x) f c layout moves into the
# proj_in/proj_out matmuls (permuted-output einsums) when the spatial token
# count is at least this large. Measured (docs/denoise_microbench.json
# motion_layout_*): the fused einsum wins at L0 (hw=1024: 1.56 → 0.36 ms)
# and L1 (hw=256: 0.27 → 0.22) but loses at L2 (hw=64: 0.04 → 0.27), where
# XLA already folds the tiny transpose into neighbors.
_FUSE_LAYOUT_MIN_HW = 256


@dataclass(frozen=True)
class MotionAttnConfig:
    """Motion-module attention behavior (configs/inference/inference.yaml:13-24)."""

    enabled: bool = True
    spatial_attn: bool = True
    image_attn: bool = False
    use_alpha_blender: bool = True
    spatial_encoding: Optional[str] = "sinusoid"
    camera_encoding: Optional[str] = None


class ResnetBlock2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        residual = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="conv_shortcut")(residual)
        return h + residual


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class SpatialTransformerBlock(nn.Module):
    """BasicTransformerBlock: cross-view attn1, text/IP attn2, GEGLU FF."""

    channels: int
    num_heads: int
    num_views: int
    context_dim: int = 768
    mv_image_attn: bool = True  # MVDream-I2V attn1 variant
    ip_enabled: bool = True
    ip_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, ip_context, num_frames: int):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + CrossViewSelfAttention(
            self.channels, self.num_heads, self.num_views,
            image_attn=self.mv_image_attn, dtype=self.dtype, name="attn1",
        )(h, num_frames)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + TextCrossAttention(
            self.channels, self.num_heads, self.context_dim,
            ip_enabled=self.ip_enabled, ip_scale=self.ip_scale,
            dtype=self.dtype, name="attn2",
        )(h, context, ip_context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForwardGEGLU(self.channels, dtype=self.dtype, name="ff")(h)
        return x


class SpatialTransformer(nn.Module):
    """Transformer2DModel with conv projections (use_linear_projection=False)."""

    channels: int
    num_heads: int
    num_views: int
    context_dim: int = 768
    mv_image_attn: bool = True
    ip_enabled: bool = True
    ip_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, ip_context, num_frames: int):
        b, hh, ww, c = x.shape
        residual = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(b, hh * ww, self.channels)
        h = SpatialTransformerBlock(
            self.channels, self.num_heads, self.num_views, self.context_dim,
            self.mv_image_attn, self.ip_enabled, self.ip_scale,
            dtype=self.dtype, name="transformer_blocks_0",
        )(h, context, ip_context, num_frames)
        h = h.reshape(b, hh, ww, self.channels)
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual


class MotionTransformerBlock(nn.Module):
    """Temporal BasicTransformerBlock with *two* self-attentions (AnimateDiff
    motion blocks: attention_blocks Temporal_Self ×2 → diffusers attn1/attn2)."""

    channels: int
    num_heads: int
    num_views: int
    attn_cfg: MotionAttnConfig
    max_seq_length: int = 32
    dtype: jnp.dtype = jnp.float32

    def _attn(self, name: str):
        cfg = self.attn_cfg
        if cfg.enabled and (cfg.spatial_attn or cfg.image_attn):
            return SpatioTemporalAttention(
                self.channels, self.num_heads, self.num_views,
                spatial_attn=cfg.spatial_attn, image_attn=cfg.image_attn,
                use_alpha_blender=cfg.use_alpha_blender,
                spatial_encoding=cfg.spatial_encoding if cfg.spatial_attn else None,
                camera_encoding=cfg.camera_encoding if cfg.spatial_attn else None,
                max_seq_length=self.max_seq_length, dtype=self.dtype, name=name,
            )
        return TemporalSelfAttention(self.channels, self.num_heads,
                                     dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
        """x: (B·N·h·w, F, C) tokens."""
        cfg = self.attn_cfg
        # The block-level sinusoidal PE is "nulled" when spatiotemporal
        # attention re-applies it internally (inference.py:177-192).
        extra_enc = cfg.enabled and cfg.spatial_attn and (
            cfg.spatial_encoding is not None or cfg.camera_encoding is not None
        )

        def maybe_pe(h):
            return h if extra_enc else add_temporal_positional_embedding(
                h, self.max_seq_length)

        use_st = cfg.enabled and (cfg.spatial_attn or cfg.image_attn)

        h = maybe_pe(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x))
        a1 = self._attn("attn1")
        x = x + (a1(h, height, width) if use_st else a1(h))
        h = maybe_pe(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x))
        a2 = self._attn("attn2")
        x = x + (a2(h, height, width) if use_st else a2(h))
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForwardGEGLU(self.channels, dtype=self.dtype, name="ff")(h)
        return x


class MotionModule(nn.Module):
    """TransformerTemporalModel over the frame axis.

    Input (B·N·F, H, W, C); group-norm stats over (F, H, W) per sample as in
    diffusers' TransformerTemporalModel; tokens laid out (B·N·H·W, F, C)."""

    channels: int
    num_heads: int
    num_views: int
    attn_cfg: MotionAttnConfig
    max_seq_length: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int) -> jnp.ndarray:
        bnf, hh, ww, c = x.shape
        bn = bnf // num_frames
        hw = hh * ww
        residual = x
        h = x.reshape(bn, num_frames, hh, ww, c)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        if hw >= _FUSE_LAYOUT_MIN_HW:
            # ride the (b f) x c → (b x) f c layout move on the projection:
            # the permuted-output einsum makes the transpose the dot's output
            # layout instead of a separate HBM pass (and symmetrically on the
            # way out). Same params (<name>/{kernel,bias}), same math.
            w_in, b_in = _DenseParams(c, self.channels, name="proj_in")()
            h = (jnp.einsum("bfxc,cd->bxfd",
                            h.reshape(bn, num_frames, hw, c).astype(self.dtype),
                            w_in.astype(self.dtype))
                 + b_in.astype(self.dtype)).reshape(bn * hw, num_frames,
                                                    self.channels)
            h = MotionTransformerBlock(
                self.channels, self.num_heads, self.num_views, self.attn_cfg,
                self.max_seq_length, dtype=self.dtype, name="transformer_blocks_0",
            )(h, hh, ww)
            w_out, b_out = _DenseParams(self.channels, c, name="proj_out")()
            h = (jnp.einsum("bxfd,dc->bfxc",
                            h.reshape(bn, hw, num_frames, self.channels),
                            w_out.astype(self.dtype))
                 + b_out.astype(self.dtype))
            return h.reshape(bnf, hh, ww, c) + residual
        h = h.transpose(0, 2, 3, 1, 4).reshape(bn * hh * ww, num_frames, c)
        h = nn.Dense(self.channels, dtype=self.dtype, name="proj_in")(h)
        h = MotionTransformerBlock(
            self.channels, self.num_heads, self.num_views, self.attn_cfg,
            self.max_seq_length, dtype=self.dtype, name="transformer_blocks_0",
        )(h, hh, ww)
        h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
        h = h.reshape(bn, hh, ww, num_frames, c).transpose(0, 3, 1, 2, 4)
        return h.reshape(bnf, hh, ww, c) + residual
