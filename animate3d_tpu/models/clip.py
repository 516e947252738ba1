"""CLIP text/vision encoders (Flax linen), self-contained.

Capability parity with the HF models the reference loads:
  * CLIPTextModel (SD1.5 text tower: vocab 49408, width 768, 12 layers,
    quick-gelu, causal mask) — prompt encoding (pipeline.py:345-524);
  * CLIPVisionModelWithProjection (OpenCLIP ViT-H/14, width 1280, 32 layers,
    projection 1024) — the IP-Adapter image encoder
    (animatediff/utils/util.py:49-170).

Architecture/naming mirrors HF CLIP so torch checkpoints convert 1:1
(convert/torch_to_flax.py). Tokenization: a full CLIP BPE tokenizer is
provided in utils/tokenizer.py when a vocab file is available; the pipeline
also accepts precomputed prompt embeddings (mirroring threestudio's cached
prompt processor, threestudio/models/prompt_processors/base.py:175-414).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"

    @staticmethod
    def tiny(**kw) -> "CLIPTextConfig":
        d = dict(vocab_size=64, hidden_size=32, num_layers=2, num_heads=2,
                 intermediate_size=64, max_position_embeddings=16)
        d.update(kw)
        return CLIPTextConfig(**d)


@dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    intermediate_size: int = 5120
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 1024
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"

    @staticmethod
    def tiny(**kw) -> "CLIPVisionConfig":
        d = dict(hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
                 image_size=28, patch_size=14, projection_dim=16)
        d.update(kw)
        return CLIPVisionConfig(**d)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    # transformers "gelu" = exact erf GELU (flax defaults to the tanh
    # approximation, which drifts ~1e-3 relative)
    return lambda x: nn.gelu(x, approximate=False)


class CLIPAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        c, h = self.hidden_size, self.num_heads
        d = c // h
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x) * (d ** -0.5)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x)
        b, s, _ = x.shape
        q = q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    hidden_act: str
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.hidden_size, self.num_heads, self.dtype,
                              name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = _act(self.hidden_act)(h)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """(B, S) int32 → (B, S, hidden) last hidden state (what SD uses)."""
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (cfg.max_position_embeddings, cfg.hidden_size))
        x = tok + pos[None, :s].astype(self.dtype)
        causal = jnp.triu(jnp.full((s, s), -1e9, jnp.float32), k=1)[None, None]
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg.hidden_size, cfg.num_heads,
                                 cfg.intermediate_size, cfg.hidden_act,
                                 cfg.layer_norm_eps, self.dtype,
                                 name=f"layers_{i}")(x, causal)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="final_layer_norm")(x)


class CLIPVisionModelWithProjection(nn.Module):
    config: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) normalized images → (B, projection_dim) image_embeds."""
        cfg = self.config
        b = pixel_values.shape[0]
        patches = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
                          dtype=self.dtype, name="patch_embedding")(pixel_values)
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)).astype(self.dtype),
             patches], axis=1)
        n_pos = x.shape[1]
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         ((cfg.image_size // cfg.patch_size) ** 2 + 1,
                          cfg.hidden_size))
        x = x + pos[None, :n_pos].astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="pre_layrnorm")(x)
        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg.hidden_size, cfg.num_heads,
                                 cfg.intermediate_size, cfg.hidden_act,
                                 cfg.layer_norm_eps, self.dtype,
                                 name=f"layers_{i}")(x)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="post_layernorm")(x[:, 0])
        return nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype,
                        name="visual_projection")(pooled)


CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_clip_image(images_uint8: jnp.ndarray) -> jnp.ndarray:
    """(B, 224, 224, 3) uint8 → normalized float (IPAdapterImageProcessor
    parity, util.py:268-287; resize happens host-side)."""
    x = images_uint8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std


def encode_ip_adapter_images(vision_model: CLIPVisionModelWithProjection,
                             params, images: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) float images in [0, 1] → (B, projection_dim) IP-Adapter
    image embeds: bilinear resize to the encoder resolution + CLIP
    normalization + vision forward (the reference's PIL round-trip +
    IPAdapterImageProcessor + CLIPVisionModelWithProjection,
    animatemv_guidance.py:546-555, pipeline.py:527-538). Traceable, so the
    guidance can recompute embeds from rendered first frames every step."""
    s = vision_model.config.image_size
    if images.shape[1] != s or images.shape[2] != s:
        images = jax.image.resize(images, (images.shape[0], s, s, 3), "bilinear")
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return vision_model.apply(params, (images - mean) / std)
