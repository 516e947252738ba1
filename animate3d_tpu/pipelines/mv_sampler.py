"""MV-VDM sampling pipeline: jit-compiled DDIM loop with CFG, first-frame
re-injection, and FreeInit.

Parity target: AnimateDiffMVI2VPipeline (animatediff/pipelines/pipeline.py:
274-1062) —

  * conditioning images → VAE posterior mode → clean frame-0 latents
    (pipeline.py:540-562, 951-973), re-injected after *every* scheduler step
    (:1031);
  * CFG with [uncond, cond] batch ordering (:932, :1008-1025), uncond image
    embeds are zeros (:934-937);
  * MVDream orbit cameras (elev 15°, azimuths 0/90/180/270 → normalized 16-d
    c2w, :984);
  * FreeInit outer loop (:987-999): re-noise the previous result to t=T−1
    with the ORIGINAL initial noise, keep its low frequencies, refresh the
    high band (diffusers FreeInitMixin, butterworth);
  * optional i2v_similarity_init blur-init (:677-733) and i2v_cond_time_zero.

TPU design: the denoise loop is one ``lax.scan`` over timesteps compiled
once; the FreeInit outer loop re-enters the same compiled scan. Everything
runs in a single jit program per FreeInit iteration — no host↔device
round-trips inside the loop.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from animate3d_tpu.models.diffusion import DDIMScheduler, SchedulerConfig, freeinit_blend
from animate3d_tpu.utils.camera import get_camera


@dataclass(frozen=True)
class MVSamplerConfig:
    num_inference_steps: int = 25
    guidance_scale: float = 7.5
    num_views: int = 4
    num_frames: int = 16
    height: int = 256
    width: int = 256
    vae_scale_factor: int = 8
    latent_channels: int = 4
    latent_scaling: float = 0.18215
    freeinit_enabled: bool = True
    freeinit_num_iters: int = 3
    i2v_cond_time_zero: bool = False
    # i2v_similarity_init (pipeline.py:706-733); None disables
    i2v_similarity_strength: Optional[float] = None
    i2v_similarity_origin_prob: float = 0.0
    camera_elevation: float = 15.0

    @property
    def latent_height(self) -> int:
        return self.height // self.vae_scale_factor

    @property
    def latent_width(self) -> int:
        return self.width // self.vae_scale_factor


class MVSampler:
    """Functional sampler around (unet_apply, vae_encode, vae_decode).

    ``unet_apply(params, latents, t, text_ctx, camera, image_embeds,
    i2v_cond_time_zero)`` with latents (B, F, h, w, C).
    """

    def __init__(
        self,
        unet_apply: Callable,
        cfg: MVSamplerConfig = MVSamplerConfig(),
        scheduler: Optional[DDIMScheduler] = None,
    ):
        self.unet_apply = unet_apply
        self.cfg = cfg
        self.scheduler = scheduler or DDIMScheduler.create(SchedulerConfig())
        # jit once; scheduler tables close over as constants. latents are
        # donated — each FreeInit iteration rebinds them from the return
        self._denoise = jax.jit(self._denoise_impl,
                                static_argnames=("num_steps",),
                                donate_argnums=(1,))

    # -- conditioning helpers ------------------------------------------------

    def cameras(self, batch_size: int = 1) -> jnp.ndarray:
        """(B·N, 16) orbit camera embedding inputs (pipeline.py:984)."""
        cam = get_camera(self.cfg.num_views, elevation=self.cfg.camera_elevation)
        return jnp.asarray(np.tile(cam, (batch_size, 1)), jnp.float32)

    # -- core loop -----------------------------------------------------------

    def _denoise_impl(
        self,
        unet_params,
        latents: jnp.ndarray,  # (BN, F, h, w, C) frame 0 = clean cond latents
        first_frame_latents: jnp.ndarray,  # (BN, 1, h, w, C)
        text_ctx: jnp.ndarray,  # (2·BN, 77, D) = [uncond, cond]
        camera: jnp.ndarray,  # (BN, 16)
        image_embeds: Optional[jnp.ndarray],  # (2·BN, D_img) or None
        timesteps: jnp.ndarray,  # (S,)
        num_steps: int,
    ) -> jnp.ndarray:
        cfg = self.cfg
        cam2 = jnp.concatenate([camera, camera], axis=0)

        def step(latents, t):
            latent_in = jnp.concatenate([latents, latents], axis=0)
            eps = self.unet_apply(
                unet_params, latent_in, t, text_ctx, cam2, image_embeds,
                i2v_cond_time_zero=cfg.i2v_cond_time_zero,
            )
            eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
            eps = eps_uncond + cfg.guidance_scale * (eps_text - eps_uncond)
            prev, _ = self.scheduler.step(eps, t, latents, num_steps)
            prev = jnp.concatenate([first_frame_latents, prev[:, 1:]], axis=1)
            return prev, None

        latents, _ = jax.lax.scan(step, latents, timesteps)
        return latents

    # -- public API ----------------------------------------------------------

    def prepare_initial_latents(
        self,
        key: jax.Array,
        first_frame_latents: jnp.ndarray,  # (BN, 1, h, w, C), already scaled
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Noise for frames 1..F-1 (+ optional similarity blur-init); returns
        (full latents incl. clean frame 0, the raw initial noise for FreeInit)."""
        cfg = self.cfg
        bn = first_frame_latents.shape[0]
        shape = (bn, cfg.num_frames - 1, cfg.latent_height, cfg.latent_width,
                 cfg.latent_channels)
        k_noise, k_mask = jax.random.split(key)
        noise = jax.random.normal(k_noise, shape, jnp.float32)
        if cfg.i2v_similarity_strength is not None:
            ts = self.scheduler.timesteps(cfg.num_inference_steps)
            t_start = ts[self._similarity_t_start()]
            cond = jnp.broadcast_to(first_frame_latents,
                                    (bn, cfg.num_frames - 1) + shape[2:])
            blurred = self.scheduler.add_noise(cond, noise, t_start)
            mask = (jax.random.uniform(k_mask, (bn, cfg.num_frames - 1, 1, 1, 1))
                    < cfg.i2v_similarity_origin_prob).astype(jnp.float32)
            rest = mask * cond + (1.0 - mask) * blurred
        else:
            rest = noise
        latents = jnp.concatenate([first_frame_latents, rest], axis=1)
        return latents, noise

    def _similarity_t_start(self) -> int:
        cfg = self.cfg
        init_t = min(int(cfg.num_inference_steps * cfg.i2v_similarity_strength),
                     cfg.num_inference_steps)
        return max(cfg.num_inference_steps - init_t, 0)

    def active_timesteps(self) -> jnp.ndarray:
        ts = self.scheduler.timesteps(self.cfg.num_inference_steps)
        if self.cfg.i2v_similarity_strength is not None:
            ts = ts[self._similarity_t_start():]
        return ts

    def sample(
        self,
        key: jax.Array,
        unet_params,
        first_frame_latents: jnp.ndarray,  # (BN, 1, h, w, C) scaled latents
        text_cond: jnp.ndarray,  # (BN, 77, D)
        text_uncond: jnp.ndarray,  # (BN, 77, D)
        image_embeds: Optional[jnp.ndarray] = None,  # (BN, D_img)
        camera: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Full sampling run → final latents (BN, F, h, w, C)."""
        cfg = self.cfg
        bn = first_frame_latents.shape[0]
        if camera is None:
            camera = self.cameras(bn // cfg.num_views)
        text_ctx = jnp.concatenate([text_uncond, text_cond], axis=0)
        img2 = None
        if image_embeds is not None:
            img2 = jnp.concatenate([jnp.zeros_like(image_embeds), image_embeds], axis=0)

        k_init, key = jax.random.split(key)
        latents, initial_noise = self.prepare_initial_latents(k_init, first_frame_latents)
        timesteps = self.active_timesteps()
        num_iters = cfg.freeinit_num_iters if cfg.freeinit_enabled else 1

        for it in range(num_iters):
            if cfg.freeinit_enabled and it > 0:
                # re-noise frames 1..F-1 of the previous result to t=T−1 with
                # the ORIGINAL initial noise, keep lows, refresh highs
                rest = latents[:, 1:]
                t_max = jnp.asarray(self.scheduler.config.num_train_timesteps - 1)
                diffused = self.scheduler.add_noise(rest, initial_noise, t_max)
                key, k_fresh = jax.random.split(key)
                fresh = jax.random.normal(k_fresh, rest.shape, jnp.float32)
                rest = freeinit_blend(diffused, fresh)
                latents = jnp.concatenate([first_frame_latents, rest], axis=1)
            latents = self._denoise(
                unet_params, latents, first_frame_latents, text_ctx, camera,
                img2, timesteps, int(cfg.num_inference_steps),
            )
        return latents


@functools.lru_cache(maxsize=8)
def _decode_video_jit(vae_decode: Callable, frame_chunk: int, scaling: float):
    @jax.jit
    def run(vae_params, latents):
        bn, f, h, w, c = latents.shape
        flat = (latents / scaling).reshape(bn * f, h, w, c)
        n = flat.shape[0]
        pad = (-n) % frame_chunk
        flat = jnp.pad(flat, ((0, pad), (0, 0), (0, 0), (0, 0)))
        chunks = flat.reshape(-1, frame_chunk, h, w, c)
        imgs = jax.lax.map(lambda z: vae_decode(vae_params, z), chunks)
        imgs = imgs.reshape((-1,) + imgs.shape[2:])[:n]
        imgs = (imgs / 2 + 0.5).clip(0.0, 1.0)
        return imgs.reshape(bn, f, imgs.shape[1], imgs.shape[2], 3)

    return run


def decode_video(vae_decode: Callable, vae_params, latents: jnp.ndarray,
                 scaling: float = 0.18215, frame_chunk: int = 16) -> jnp.ndarray:
    """(BN, F, h, w, C) latents → (BN, F, H, W, 3) images in [0, 1]
    (pipeline.py:565-577; 'VAE slicing' becomes a lax.map chunk).

    The whole decode runs as ONE jit program (cached per decode-fn/chunk):
    eagerly, lax.map plus the pad/scale/clip glue dispatches per-op through
    the device tunnel, which dominated the measured decode wall-clock."""
    return _decode_video_jit(vae_decode, frame_chunk, scaling)(
        vae_params, latents)


def encode_conditioning_images(vae_encode: Callable, vae_params,
                               images: jnp.ndarray,
                               scaling: float = 0.18215) -> jnp.ndarray:
    """(N, H, W, 3) images in [-1, 1] → (N, 1, h, w, 4) scaled mode latents
    (pipeline.py:540-562)."""
    z = vae_encode(vae_params, images) * scaling
    return z[:, None]
