"""SD1.5 AutoencoderKL (Flax linen, NHWC).

Capability parity with the diffusers AutoencoderKL the reference loads from
`yanqinJiang/mvdream-sd1.5-diffusers` (inference.py:65): encoder/decoder with
block_out_channels (128, 256, 512, 512), 2 layers/block, mid-block single-head
attention, latent scaling factor 0.18215. Used for conditioning-image
encoding (pipeline.py:540-562), video decode (:565-577), and the 4D-SDS
guidance's render encoding (animatemv_guidance.py:531-542).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215

    @staticmethod
    def tiny(**kw) -> "VAEConfig":
        d = dict(block_out_channels=(32, 64), norm_num_groups=8)
        d.update(kw)
        return VAEConfig(**d)


class VAEResnet(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="conv_shortcut")(residual)
        return h + residual


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial tokens (VAE mid block)."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        logits = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) * (c ** -0.5)
        attn = jax.nn.softmax(logits, axis=-1).astype(y.dtype)
        y = jnp.einsum("bqk,bkc->bqc", attn, v)
        y = nn.Dense(c, dtype=self.dtype, name="to_out_0")(y)
        return y.reshape(b, h, w, c) + residual


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        boc = cfg.block_out_channels
        g = cfg.norm_num_groups
        h = nn.Conv(boc[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(boc):
            for j in range(cfg.layers_per_block):
                h = VAEResnet(ch, g, self.dtype,
                              name=f"down_blocks_{i}_resnets_{j}")(h)
            if i < len(boc) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)),  # diffusers pads asymmetric
                            dtype=self.dtype,
                            name=f"down_blocks_{i}_downsamplers_0_conv")(h)
        h = VAEResnet(boc[-1], g, self.dtype, name="mid_block_resnets_0")(h)
        h = VAEAttention(boc[-1], g, self.dtype, name="mid_block_attentions_0")(h)
        h = VAEResnet(boc[-1], g, self.dtype, name="mid_block_resnets_1")(h)
        h = nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        boc = cfg.block_out_channels
        g = cfg.norm_num_groups
        rev = list(reversed(boc))
        h = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = VAEResnet(rev[0], g, self.dtype, name="mid_block_resnets_0")(h)
        h = VAEAttention(rev[0], g, self.dtype, name="mid_block_attentions_0")(h)
        h = VAEResnet(rev[0], g, self.dtype, name="mid_block_resnets_1")(h)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnet(ch, g, self.dtype, name=f"up_blocks_{i}_resnets_{j}")(h)
            if i < len(rev) - 1:
                b, hh, ww, c = h.shape
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_blocks_{i}_upsamplers_0_conv")(h)
        h = nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """encode(x) → (mean, logvar); decode(z) → image. Images in [-1, 1] NHWC;
    latents scaled by config.scaling_factor at the pipeline level."""

    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype, name="post_quant_conv")

    def encode(self, x: jnp.ndarray):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_mode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Deterministic latents (the reference samples the posterior mode for
        conditioning, pipeline.py:556: .mode())."""
        return self.encode(x)[0]

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode_mode(x))
