"""MV-VDM denoiser: multi-view motion UNet (Flax linen).

One explicit Flax model replacing the reference's three-way composition
(MVUNet2DConditionModel fork + MotionAdapter grafting + attention-processor
injection; animatediff/models/unet_mv_model.py, unet_motion_mv_model.py,
attention_processor.py):

  * SD1.5 topology (block_out_channels 320/640/1280/1280, layers_per_block 2,
    8 heads, cross_attention_dim 768);
  * MVDream camera conditioning: 16-d flattened c2w → TimestepEmbedding added
    to the time embedding (unet_mv_model.py:281-285, :1195-1198);
  * AnimateDiff motion modules after every spatial block (temporal
    transformers, 2 self-attns each, max_seq 32);
  * spatiotemporal attention + I2V/IP image conditioning per SURVEY.md §2.1
    items 3-6.

Layouts (SURVEY.md Appendix A): input latents are (B·N, F, h, w, C) NHWC with
views folded into the batch axis; spatial blocks run on (B·N·F, h, w, C);
frame 0 of every view carries the clean conditioning latents and (optionally)
a t=0 time embedding (unet_motion_mv_model.py:732-752).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from animate3d_tpu.models.embeddings import (
    ImageProjection,
    TimestepEmbedding,
    compose_frame_time_embeddings,
    get_timestep_embedding,
)
from animate3d_tpu.models.unet_blocks import (
    Downsample2D,
    MotionAttnConfig,
    MotionModule,
    ResnetBlock2D,
    SpatialTransformer,
    Upsample2D,
)


@dataclass(frozen=True)
class MVUNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_heads: int = 8
    cross_attention_dim: int = 768
    motion_num_heads: int = 8
    motion_max_seq_length: int = 32
    camera_embedding_dim: Optional[int] = 16
    num_views: int = 4
    # IP-Adapter
    ip_enabled: bool = True
    ip_num_tokens: int = 4
    ip_scale: float = 1.0
    image_embed_dim: int = 1024
    # MVDream-I2V spatial attn1 image branch (mvdream_attn_cfg.image_attn)
    mv_image_attn: bool = True
    # motion-module attention behavior
    motion_attn: MotionAttnConfig = field(default_factory=MotionAttnConfig)
    # rematerialize every block in the backward pass (the reference's
    # unet.enable_gradient_checkpointing(), train.py:380-382) — trades ~30%
    # recompute FLOPs for activation memory at training time
    gradient_checkpointing: bool = False

    @staticmethod
    def tiny(**kw) -> "MVUNetConfig":
        """Small config for tests/dryruns."""
        defaults = dict(
            block_out_channels=(32, 64),
            num_heads=2,
            motion_num_heads=2,
            cross_attention_dim=32,
            image_embed_dim=16,
        )
        defaults.update(kw)
        return MVUNetConfig(**defaults)


class MVMotionUNet(nn.Module):
    config: MVUNetConfig = field(default_factory=MVUNetConfig)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        latents: jnp.ndarray,  # (B·N, F, h, w, C)
        timesteps: jnp.ndarray,  # () or (B·N,)
        encoder_hidden_states: jnp.ndarray,  # (B·N, 77, cross_attention_dim)
        camera: Optional[jnp.ndarray] = None,  # (B·N, 16)
        image_embeds: Optional[jnp.ndarray] = None,  # (B·N, image_embed_dim)
        i2v_cond_time_zero: bool = False,
    ) -> jnp.ndarray:
        cfg = self.config
        bn, f, hh, ww, c_in = latents.shape
        assert bn % cfg.num_views == 0, "batch must be divisible by num_views"
        boc = cfg.block_out_channels
        time_embed_dim = boc[0] * 4

        # 1. time (+ camera) embedding, per (B·N), then per frame
        ts = jnp.broadcast_to(jnp.atleast_1d(timesteps), (bn,))
        t_emb = get_timestep_embedding(ts, boc[0])
        time_embedding = TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                           name="time_embedding")
        emb = time_embedding(t_emb.astype(self.dtype))
        if i2v_cond_time_zero:
            cond_emb = time_embedding(
                get_timestep_embedding(jnp.zeros((bn,)), boc[0]).astype(self.dtype))
        if camera is not None and cfg.camera_embedding_dim is not None:
            camera_emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                           name="camera_embedding")(
                camera.astype(self.dtype))
            emb = emb + camera_emb
            if i2v_cond_time_zero:
                cond_emb = cond_emb + camera_emb
        emb = compose_frame_time_embeddings(
            emb, cond_emb if i2v_cond_time_zero else None, f)

        # 2. conditioning tokens, per frame
        context = jnp.repeat(encoder_hidden_states.astype(self.dtype), f, axis=0)
        ip_context = None
        if cfg.ip_enabled and image_embeds is not None:
            ip_tokens = ImageProjection(
                cfg.cross_attention_dim, cfg.ip_num_tokens, dtype=self.dtype,
                name="encoder_hid_proj_0",
            )(image_embeds.astype(self.dtype))
            ip_context = jnp.repeat(ip_tokens, f, axis=0)

        # gradient checkpointing: remat each block class so the backward
        # recomputes block activations instead of storing them (num_frames /
        # static ints are marked static; self is argnum 0)
        if cfg.gradient_checkpointing:
            ResnetCls = nn.remat(ResnetBlock2D)
            SpatialCls = nn.remat(SpatialTransformer, static_argnums=(4,))
            MotionCls = nn.remat(MotionModule, static_argnums=(2,))
        else:
            ResnetCls, SpatialCls, MotionCls = (ResnetBlock2D,
                                                SpatialTransformer,
                                                MotionModule)

        def spatial_transformer(channels, name):
            return SpatialCls(
                channels, cfg.num_heads, cfg.num_views, cfg.cross_attention_dim,
                mv_image_attn=cfg.mv_image_attn,
                ip_enabled=cfg.ip_enabled and ip_context is not None,
                ip_scale=cfg.ip_scale, dtype=self.dtype, name=name,
            )

        def motion_module(channels, name):
            return MotionCls(
                channels, cfg.motion_num_heads, cfg.num_views, cfg.motion_attn,
                cfg.motion_max_seq_length, dtype=self.dtype, name=name,
            )

        # 3. UNet
        x = latents.reshape(bn * f, hh, ww, c_in).astype(self.dtype)
        x = nn.Conv(boc[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)

        n_blocks = len(boc)
        skips = [x]
        # down
        for i in range(n_blocks):
            has_cross = i < n_blocks - 1  # last block is DownBlockMotion
            for j in range(cfg.layers_per_block):
                x = ResnetCls(boc[i], dtype=self.dtype,
                                  name=f"down_blocks_{i}_resnets_{j}")(x, emb)
                if has_cross:
                    x = spatial_transformer(
                        boc[i], f"down_blocks_{i}_attentions_{j}"
                    )(x, context, ip_context, f)
                x = motion_module(boc[i], f"down_blocks_{i}_motion_modules_{j}")(x, f)
                skips.append(x)
            if i < n_blocks - 1:
                x = Downsample2D(boc[i], dtype=self.dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(x)
                skips.append(x)

        # mid
        x = ResnetCls(boc[-1], dtype=self.dtype, name="mid_block_resnets_0")(x, emb)
        x = spatial_transformer(boc[-1], "mid_block_attentions_0")(x, context, ip_context, f)
        x = motion_module(boc[-1], "mid_block_motion_modules_0")(x, f)
        x = ResnetCls(boc[-1], dtype=self.dtype, name="mid_block_resnets_1")(x, emb)

        # up
        rev = list(reversed(boc))
        for i in range(n_blocks):
            has_cross = i > 0  # first up block is UpBlockMotion
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetCls(rev[i], dtype=self.dtype,
                                  name=f"up_blocks_{i}_resnets_{j}")(x, emb)
                if has_cross:
                    x = spatial_transformer(
                        rev[i], f"up_blocks_{i}_attentions_{j}"
                    )(x, context, ip_context, f)
                x = motion_module(rev[i], f"up_blocks_{i}_motion_modules_{j}")(x, f)
            if i < n_blocks - 1:
                x = Upsample2D(rev[i], dtype=self.dtype,
                               name=f"up_blocks_{i}_upsamplers_0")(x)

        # out
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(x)
        return x.reshape(bn, f, hh, ww, cfg.out_channels)
