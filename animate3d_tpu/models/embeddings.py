"""Embedding layers for the MV-VDM UNet (Flax linen).

Parity targets in the reference:
  * get_timestep_embedding / TimestepEmbedding — diffusers semantics used by
    unet_motion_mv_model.py:131-146 (time + 16-d camera embedding);
  * SinusoidalPositionalEmbedding — temporal position added inside motion
    blocks (attention_processor.py:497,508,584);
  * SinePositionalEncoding2D / LearnedPositionalEncoding2D — the spatial
    branch's 2D encodings (animatediff/models/embeddings.py:8-157);
  * ImageProjection — IP-Adapter global-image-embed → 4 context tokens.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """(B,) → (B, embedding_dim) sinusoidal features (diffusers Timesteps)."""
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if embedding_dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    """linear → silu → linear (diffusers TimestepEmbedding)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim_out, dtype=self.dtype, name="linear_1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.dim_out, dtype=self.dtype, name="linear_2")(x)
        return x


def compose_frame_time_embeddings(emb: jnp.ndarray,
                                  cond_emb,
                                  num_frames: int) -> jnp.ndarray:
    """Per-frame embedding layout (unet_motion_mv_model.py:747-752):
    repeat_interleave over frames (frame-minor); with ``cond_emb`` (the t=0
    i2v_cond_time_zero embedding) frame-0 rows are substituted."""
    bn = emb.shape[0]
    out = jnp.repeat(emb, num_frames, axis=0)
    if cond_emb is not None:
        out = out.reshape(bn, num_frames, -1)
        out = jnp.concatenate([cond_emb[:, None], out[:, 1:]], axis=1)
        out = out.reshape(bn * num_frames, -1)
    return out


def sinusoidal_positions(num_positions: int, dim: int) -> jnp.ndarray:
    """(num_positions, dim) classic transformer PE table
    (diffusers SinusoidalPositionalEmbedding: sin on even, cos on odd)."""
    position = jnp.arange(num_positions, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim))
    pe = jnp.zeros((num_positions, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div))
    return pe


def add_temporal_positional_embedding(x: jnp.ndarray, max_seq_length: int = 32) -> jnp.ndarray:
    """x (..., F, C) + PE[:F] — the temporal pos-embed motion blocks use."""
    f, c = x.shape[-2], x.shape[-1]
    pe = sinusoidal_positions(max_seq_length, c)[:f]
    return x + pe.astype(x.dtype)


def sine_positional_encoding_2d(
    h: int,
    w: int,
    num_feats: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
    eps: float = 1e-6,
    offset: float = 0.0,
) -> jnp.ndarray:
    """(h, w, 2*num_feats) DETR-style sine encoding, channels ordered (y, x)
    (reference embeddings.py:59-96 with an all-valid mask)."""
    y_embed = jnp.tile(jnp.arange(1, h + 1, dtype=jnp.float32)[:, None], (1, w))
    x_embed = jnp.tile(jnp.arange(1, w + 1, dtype=jnp.float32)[None, :], (h, 1))
    if normalize:
        y_embed = (y_embed + offset) / (y_embed[-1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, -1:] + eps) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3
                      ).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3
                      ).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=2)


class LearnedPositionalEncoding2D(nn.Module):
    """Row/col embedding tables (reference embeddings.py:99-157)."""

    num_feats: int
    row_num_embed: int = 50
    col_num_embed: int = 50

    @nn.compact
    def __call__(self, h: int, w: int) -> jnp.ndarray:
        row = self.param("row_embed", nn.initializers.uniform(1.0),
                         (self.row_num_embed, self.num_feats))
        col = self.param("col_embed", nn.initializers.uniform(1.0),
                         (self.col_num_embed, self.num_feats))
        x_embed = jnp.tile(col[None, :w], (h, 1, 1))
        y_embed = jnp.tile(row[:h, None], (1, w, 1))
        return jnp.concatenate([x_embed, y_embed], axis=-1)  # (h, w, 2*num_feats)


class ImageProjection(nn.Module):
    """IP-Adapter: global CLIP image embed → num_tokens context tokens
    (diffusers ImageProjection: linear to tokens*dim, reshape, layernorm)."""

    cross_attention_dim: int = 768
    num_tokens: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        b = image_embeds.shape[0]
        x = nn.Dense(self.num_tokens * self.cross_attention_dim, dtype=self.dtype,
                     name="image_embeds")(image_embeds)
        x = x.reshape(b, self.num_tokens, self.cross_attention_dim)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
