"""4D-SDS guidance: x0-reconstruction loss from the frozen MV-VDM.

Parity target: custom/threestudio-animate3d/guidance/animatemv_guidance.py —
  * renders → bilinear 256² → VAE posterior *sample* × 0.18215 (:531-542,
    :364-373);
  * IP-Adapter image embeds of each view's first frame (:546-555);
  * one random t per video ∈ [min_step, max_step], annealed via C()
    schedules (:558-565, :767-793);
  * noise frames 1..F−1 keeping frame 0 clean, ONE CFG UNet call with
    [cond, uncond] ordering and ``eps_text + s·(eps_text − eps_uncond)``
    (MVDream convention, :418-459);
  * x0-reconstruction via the scheduler's pred_original_sample, MVDream
    recon_std_rescale over frames 1..F−1, frame-0 replacement (:461-494);
  * loss = ½‖latents − recon.detach()‖²_sum / B·N·F · F/(F−1) (:496-501).

The whole computation is one jit (render gradients flow through the VAE
encode only; the UNet branch is stop-gradiented as in the reference's
torch.no_grad block).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from animate3d_tpu.core.schedule import C
from animate3d_tpu.models.diffusion import DDIMScheduler, SchedulerConfig
from animate3d_tpu.utils.camera import normalize_c2w


@dataclass(frozen=True)
class GuidanceConfig:
    guidance_scale: float = 5.0
    n_view: int = 4
    n_frame: int = 16
    recon_std_rescale: float = 0.25
    i2v_cond_time_zero: bool = False
    latent_scaling: float = 0.18215
    num_train_timesteps: int = 1000
    image_size: int = 256  # SDS encode resolution (animatemv_guidance.py:533)
    # VAE-encode the SDS batch in rematerialized chunks: encoding all 64
    # view-frames in one differentiated program keeps every encoder
    # activation live for the backward (~2 GB per 256² conv layer) and OOMs
    # a 16 GB chip; chunking + jax.checkpoint bounds the peak to one chunk
    vae_encode_chunk: int = 8
    # schedulable (C() lists allowed)
    min_step_percent: object = 0.02
    max_step_percent: object = 0.2


from animate3d_tpu.core.registry import register


@register("animatemv-diffusion-guidance")
class AnimateMVGuidance:
    """Functional guidance around a frozen (unet_apply, vae_encode);
    config-driven construction via :func:`build_guidance_from_config`."""

    def __init__(
        self,
        unet_apply: Callable,  # (params, latents(B,F,h,w,C), t(B,), ctx, camera, img) -> eps
        vae_encode: Callable,  # (params, images(B,H,W,3) in [-1,1]) -> (mean, logvar)
        cfg: GuidanceConfig = GuidanceConfig(),
        scheduler: Optional[DDIMScheduler] = None,
        image_encode: Optional[Callable] = None,  # (ie_params, imgs01) -> (B, D)
    ):
        self.unet_apply = unet_apply
        self.vae_encode = vae_encode
        self.cfg = cfg
        self.scheduler = scheduler or DDIMScheduler.create(SchedulerConfig())
        # when an IP-Adapter image encoder is available, the per-view embeds
        # are recomputed from the rendered first frames every step
        # (animatemv_guidance.py:546-555); otherwise callers pass static embeds
        self.image_encode = image_encode
        self._loss = jax.jit(self._loss_impl)
        # (loss, ∂loss/∂rgb) as its own compile unit: the render backward is
        # excluded, so this program is VAE fwd/bwd + one frozen UNet forward
        self._pixel_grad = jax.jit(jax.value_and_grad(self._loss_impl, argnums=2))

    def _chunked_vae_encode(self, vae_params, x):
        """VAE encode in rematerialized chunks (see vae_encode_chunk)."""
        chunk = self.cfg.vae_encode_chunk
        n = x.shape[0]
        if chunk <= 0 or n <= chunk or n % chunk != 0:
            return self.vae_encode(vae_params, x)
        enc = jax.checkpoint(self.vae_encode)
        xs = x.reshape(n // chunk, chunk, *x.shape[1:])
        mean, logvar = jax.lax.map(lambda c: enc(vae_params, c), xs)
        return (mean.reshape((n,) + mean.shape[2:]),
                logvar.reshape((n,) + logvar.shape[2:]))

    def min_max_step(self, global_step: int) -> Tuple[int, int]:
        """Timestep-range annealing (update_step, animatemv_guidance.py:767-793)."""
        cfg = self.cfg
        mn = int(cfg.num_train_timesteps * C(cfg.min_step_percent, 0, global_step))
        mx = int(cfg.num_train_timesteps * C(cfg.max_step_percent, 0, global_step))
        return mn, mx

    def _loss_impl(
        self,
        unet_params,
        vae_params,
        rgb: jnp.ndarray,  # (B·N·F, H, W, 3) in [0, 1], gradients flow
        text_cond: jnp.ndarray,  # (B·N, 77, D)
        text_uncond: jnp.ndarray,  # (B·N, 77, D)
        camera_16d: jnp.ndarray,  # (B·N, 16) normalized flattened c2w (frame 0)
        image_embeds: jnp.ndarray,  # (B·N, D_img) fallback when no encoder
        t_video: jnp.ndarray,  # (B,) int32
        key: jax.Array,
        ie_params=None,  # CLIP vision params when image_encode is set
    ) -> jnp.ndarray:
        cfg = self.cfg
        n, f = cfg.n_view, cfg.n_frame
        bnf = rgb.shape[0]
        bn = bnf // f
        b = bn // n

        if self.image_encode is not None and ie_params is not None:
            # per-view frame-0 IP-Adapter embeds from the current renders,
            # recomputed each step, no grads (the reference's PIL round trip,
            # animatemv_guidance.py:546-555)
            firsts = rgb.reshape(bn, f, *rgb.shape[1:])[:, 0]
            image_embeds = self.image_encode(
                ie_params, jax.lax.stop_gradient(firsts)).astype(jnp.float32)

        # resize to the SDS encode resolution and VAE-encode (posterior sample)
        s = self.cfg.image_size
        if rgb.shape[1] != s or rgb.shape[2] != s:
            rgb = jax.image.resize(rgb, (bnf, s, s, 3), method="bilinear")
        k_post, k_noise = jax.random.split(key)
        mean, logvar = self._chunked_vae_encode(vae_params, rgb * 2.0 - 1.0)
        std = jnp.exp(0.5 * logvar)
        latents = (mean + std * jax.random.normal(k_post, mean.shape)) * cfg.latent_scaling
        lh, lw, lc = latents.shape[1:]
        latents = latents.reshape(bn, f, lh, lw, lc)

        first = latents[:, :1]
        rest = latents[:, 1:]
        t = jnp.repeat(t_video, n)  # (B·N,)

        def unet_branch(rest):
            noise = jax.random.normal(k_noise, rest.shape)
            noisy_rest = self.scheduler.add_noise(rest, noise, t)
            noisy = jnp.concatenate([jax.lax.stop_gradient(first), noisy_rest], axis=1)
            latent_in = jnp.concatenate([noisy, noisy], axis=0)
            ctx = jnp.concatenate([text_cond, text_uncond], axis=0)
            cam2 = jnp.concatenate([camera_16d, camera_16d], axis=0)
            img2 = jnp.concatenate([image_embeds, jnp.zeros_like(image_embeds)], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            eps = self.unet_apply(unet_params, latent_in, t2, ctx, cam2, img2,
                                  i2v_cond_time_zero=cfg.i2v_cond_time_zero)
            eps_text, eps_uncond = jnp.split(eps, 2, axis=0)
            # MVDream convention: text + s·(text − uncond) (:457-459)
            eps_cfg = eps_text + cfg.guidance_scale * (eps_text - eps_uncond)
            return noisy, eps_cfg, eps_text

        noisy, eps_cfg, eps_text = jax.lax.stop_gradient(unet_branch(
            jax.lax.stop_gradient(rest)))

        t_b = t[:, None, None, None, None]
        recon = self.scheduler.pred_original(noisy.reshape(bn * f, lh, lw, lc),
                                             eps_cfg.reshape(bn * f, lh, lw, lc),
                                             jnp.repeat(t, f)).reshape(bn, f, lh, lw, lc)
        if cfg.recon_std_rescale > 0:
            recon_nocfg = self.scheduler.pred_original(
                noisy.reshape(bn * f, lh, lw, lc),
                eps_text.reshape(bn * f, lh, lw, lc),
                jnp.repeat(t, f)).reshape(bn, f, lh, lw, lc)
            # std over (views, frames 1.., h, w, c) per video
            r = recon.reshape(b, n, f, lh, lw, lc)[:, :, 1:]
            rn = recon_nocfg.reshape(b, n, f, lh, lw, lc)[:, :, 1:]
            factor = ((jnp.std(rn, axis=(1, 2, 3, 4, 5), keepdims=True) + 1e-8)
                      / (jnp.std(r, axis=(1, 2, 3, 4, 5), keepdims=True) + 1e-8))
            factor = factor.reshape(b, 1, 1, 1, 1)
            adjust = recon.reshape(b, n, f, lh, lw, lc) * factor[:, None]
            adjust = adjust.reshape(bn, f, lh, lw, lc)
            recon = cfg.recon_std_rescale * adjust + (1 - cfg.recon_std_rescale) * recon

        # clean frame 0 target (no loss on frame 0)
        recon = jnp.concatenate([latents[:, :1], recon[:, 1:]], axis=1)
        recon = jax.lax.stop_gradient(recon)

        loss = 0.5 * jnp.sum((latents - recon) ** 2) / (bn * f) * f / (f - 1)
        return loss

    def preview(self, unet_params, vae_decode, vae_params, latents,
                text_cond, text_uncond, camera_16d, image_embeds,
                t_start: int, key, num_steps: int = 25):
        """Guidance-eval preview sampler (animatemv_guidance.py:668-765):
        noise the current latents to t_start and DDIM-sample back to 0 with
        CFG — a visualization of what the frozen teacher pulls toward.
        latents: (B·N, F, h, w, C) clean; returns decoded frames in [0, 1]."""
        cfg = self.cfg
        bn, f = latents.shape[:2]
        ts_all = self.scheduler.timesteps(num_steps)
        active = ts_all[ts_all <= t_start]
        first = latents[:, :1]
        k_n, key = jax.random.split(key)
        noise = jax.random.normal(k_n, latents[:, 1:].shape)
        rest = self.scheduler.add_noise(latents[:, 1:], noise,
                                        jnp.full((bn,), t_start))
        x = jnp.concatenate([first, rest], axis=1)
        ctx = jnp.concatenate([text_cond, text_uncond], axis=0)
        cam2 = jnp.concatenate([camera_16d, camera_16d], axis=0)
        img2 = jnp.concatenate([image_embeds, jnp.zeros_like(image_embeds)], axis=0)

        def step(x, t):
            eps = self.unet_apply(unet_params, jnp.concatenate([x, x], axis=0),
                                  jnp.full((2 * bn,), t), ctx, cam2, img2,
                                  i2v_cond_time_zero=cfg.i2v_cond_time_zero)
            e_t, e_u = jnp.split(eps, 2, axis=0)
            e = e_t + cfg.guidance_scale * (e_t - e_u)
            prev, _ = self.scheduler.step(e, t, x, num_steps)
            return jnp.concatenate([first, prev[:, 1:]], axis=1), None

        x, _ = jax.lax.scan(step, x, active)
        lh, lw, lc = x.shape[2:]
        imgs = vae_decode(vae_params,
                          (x / cfg.latent_scaling).reshape(bn * f, lh, lw, lc))
        return (imgs / 2 + 0.5).clip(0, 1).reshape(bn, f, *imgs.shape[1:])

    @staticmethod
    def camera16(c2w: jnp.ndarray, bn: int, n_frame: int) -> jnp.ndarray:
        """(B·N·F, 4, 4) → (B·N, 16) frame-0 unit-sphere-normalized flattened
        c2w conditioning (pipeline.py:178-190)."""
        c2w_v = jnp.asarray(c2w).reshape(bn, n_frame, 4, 4)[:, 0]
        t = c2w_v[:, :3, 3]
        t = t / (jnp.linalg.norm(t, axis=1, keepdims=True) + 1e-8)
        return c2w_v.at[:, :3, 3].set(t).reshape(bn, 16).astype(jnp.float32)

    def preview_from_rgb(self, unet_params, vae_params, vae_decode, rgb,
                         text_cond, text_uncond, c2w, image_embeds, t_start,
                         key, ie_params=None, num_steps: int = 25):
        """Guidance-eval from current renders: VAE-encode (deterministic
        mean), then run the 25-step teacher preview (animatemv_guidance.py
        :668-765 — the main visual debugging tool for SDS refinement).
        rgb (B·N·F, H, W, 3) in [0,1]; returns (B·N, F, H', W', 3)."""
        cfg = self.cfg
        f = cfg.n_frame
        bnf = rgb.shape[0]
        bn = bnf // f
        if self.image_encode is not None and ie_params is not None:
            firsts = rgb.reshape(bn, f, *rgb.shape[1:])[:, 0]
            image_embeds = self.image_encode(ie_params, firsts).astype(jnp.float32)
        s = cfg.image_size
        if rgb.shape[1] != s or rgb.shape[2] != s:
            rgb = jax.image.resize(rgb, (bnf, s, s, 3), method="bilinear")
        mean, _ = self.vae_encode(vae_params, rgb * 2.0 - 1.0)
        latents = (mean * cfg.latent_scaling).reshape(bn, f, *mean.shape[1:])
        cam16 = self.camera16(c2w, bn, f)
        return self.preview(unet_params, vae_decode, vae_params, latents,
                            text_cond, text_uncond, cam16, image_embeds,
                            t_start, key, num_steps=num_steps)

    def __call__(self, unet_params, vae_params, rgb, text_cond, text_uncond,
                 c2w, image_embeds, key, global_step: int = 0, t_range=None,
                 ie_params=None):
        """rgb (B·N·F, H, W, 3); c2w (B·N·F, 4, 4) — frame-0 cameras per view
        are extracted and normalized to the 16-d conditioning.

        Under an outer jit, pass ``t_range`` (two traced int scalars) so the
        annealed timestep bounds stay dynamic instead of baking into the
        trace (and retriggering compilation every step)."""
        cfg = self.cfg
        bn = rgb.shape[0] // cfg.n_frame
        cam16 = self.camera16(c2w, bn, cfg.n_frame)
        t_video, key = self._sample_t(key, bn, t_range, global_step)
        return self._loss(unet_params, vae_params, rgb, text_cond, text_uncond,
                          cam16, image_embeds, t_video, key, ie_params)

    def _sample_t(self, key, bn, t_range, global_step):
        if t_range is None:
            mn, mx = self.min_max_step(global_step)
        else:
            mn, mx = t_range
        key, k_t = jax.random.split(key)
        b = bn // self.cfg.n_view
        u = jax.random.uniform(k_t, (b,))
        t_video = jnp.clip((mn + u * (mx + 1 - mn)).astype(jnp.int32), mn, mx)
        return t_video, key

    def pixel_grad(self, unet_params, vae_params, rgb, text_cond, text_uncond,
                   c2w, image_embeds, key, t_range, ie_params=None):
        """(loss, ∂loss/∂rgb) — callers chain the render VJP themselves so the
        UNet and the rasterizer never share one XLA program."""
        cfg = self.cfg
        bn = rgb.shape[0] // cfg.n_frame
        cam16 = self.camera16(c2w, bn, cfg.n_frame)
        t_video, key = self._sample_t(key, bn, t_range, 0)
        return self._pixel_grad(unet_params, vae_params, rgb, text_cond,
                                text_uncond, cam16, image_embeds, t_video, key,
                                ie_params)


def build_guidance_from_config(sys_cfg, acfg):
    """Frozen MV-VDM + VAE (+ CLIP text/image encoders) for 4D-SDS, from the
    experiment config (registered as "animatemv-diffusion-guidance").

    Weight sources (reference animatemv_guidance.py:105-320 builds the full
    pretrained stack): ``guidance.flax_params_dir`` — the converted-weights
    bundle from scripts/convert_weights.py ({unet, vae, text_encoder,
    image_encoder} + tokenizer) — plus ``guidance.pretrained_unet_path`` for
    the torch motion checkpoint (converted on the fly, loaded on top).
    Returns (AnimateMVGuidance, guidance_inputs dict)."""
    import numpy as np

    from animate3d_tpu.models.factory import (
        build_models,
        has_tokenizer,
        init_and_load,
    )
    from animate3d_tpu.models.vae import AutoencoderKL

    g = dict(sys_cfg.get("guidance", {}))
    model_size = g.get("model_size", sys_cfg.get("model_size", "full"))
    unet, vae, text_model, vision_model = build_models(
        model_size, acfg.n_view, dtype=jnp.bfloat16)
    ucfg = unet.config

    n_frame = g.get("n_frame", acfg.n_frame)
    image_size = g.get("image_size", 256)
    (unet_params, vae_params, text_params, vision_params,
     loaded) = init_and_load(unet, vae, text_model, vision_model,
                             image_size, image_size, acfg.n_view,
                             g.get("flax_params_dir"),
                             g.get("pretrained_unet_path"))
    if "unet" not in loaded and "motion_ckpt" not in loaded:
        print("[guidance] WARNING: randomly initialized guidance (smoke mode)")

    # the guidance stack is frozen; keep its weights bf16 like the reference
    # keeps its guidance fp16 (animatemv_guidance.py:105 torch_dtype=float16)
    # — halves the resident HBM next to the trainable 4D stage
    to_bf16 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
    unet_params = to_bf16(unet_params)
    vae_params = to_bf16(vae_params)

    from animate3d_tpu.ops.attention import attention_backend

    def unet_apply(p, lat, t, ctx, cam, ie, i2v_cond_time_zero=False):
        # flash attention keeps the guidance UNet's logits out of HBM inside
        # the pixel-gradient program (docs/architecture.md)
        with attention_backend("flash"):
            return unet.apply(p, lat, t, ctx, cam, ie,
                              i2v_cond_time_zero=i2v_cond_time_zero)

    def vae_encode(p, x):
        return vae.apply(p, x, method=AutoencoderKL.encode)

    def vae_decode(p, z):
        return vae.apply(p, z, method=AutoencoderKL.decode)

    image_encode = None
    if vision_params is not None:
        from animate3d_tpu.models.clip import encode_ip_adapter_images

        def image_encode(ie_params, imgs):
            return encode_ip_adapter_images(vision_model, ie_params, imgs)

    gcfg = GuidanceConfig(
        guidance_scale=g.get("guidance_scale", 5.0),
        n_view=g.get("n_view", acfg.n_view),
        n_frame=n_frame,
        image_size=image_size,
        recon_std_rescale=g.get("recon_std_rescale", 0.25),
        min_step_percent=g.get("min_step_percent", 0.02),
        max_step_percent=g.get("max_step_percent", 0.2),
        i2v_cond_time_zero=g.get("model_config", {}).get("i2v_cond_time_zero", False),
    )
    guidance = AnimateMVGuidance(unet_apply, vae_encode, gcfg,
                                 image_encode=image_encode)

    # text conditioning for the SDS batch (one video = n_view rows): real
    # CLIP encoding through the cached prompt processor when the text tower
    # is loaded (threestudio prompt-processor parity), zeros otherwise.
    bn = acfg.n_view
    pp = dict(sys_cfg.get("prompt_processor", {}))
    prompt = pp.get("prompt", "") or ""
    negative = pp.get("negative_prompt", "") or ""
    text_cond = text_uncond = None
    bundle_dir = g.get("flax_params_dir")
    if text_params is not None and has_tokenizer(bundle_dir):
        from animate3d_tpu.models.prompt_processor import PromptProcessor
        from animate3d_tpu.utils.tokenizer import (
            ClipTokenizer,
            find_tokenizer_files,
        )

        tok = ClipTokenizer(*find_tokenizer_files(bundle_dir), max_length=77)

        def encode_fn(prompts):
            out = text_model.apply(text_params, jnp.asarray(tok(prompts)))
            return np.asarray(out)

        proc = PromptProcessor(encode_fn,
                               cache_dir=pp.get("cache_dir",
                                                ".cache/text_embeddings"))
        embs = proc(prompt, negative)
        text_cond = jnp.tile(jnp.asarray(embs["cond"])[None], (bn, 1, 1))
        text_uncond = jnp.tile(jnp.asarray(embs["uncond"])[None], (bn, 1, 1))
    if text_cond is None:
        from animate3d_tpu.models.prompt_processor import encode_prompt_or_zeros

        text_cond, text_uncond = encode_prompt_or_zeros(
            prompt, negative, bn, hidden_size=ucfg.cross_attention_dim)

    inputs = {
        "unet_params": unet_params,
        "vae_params": vae_params,
        "text_cond": text_cond,
        "text_uncond": text_uncond,
        # static fallback embeds, used only when no image encoder is loaded
        "image_embeds": jnp.zeros((bn, ucfg.image_embed_dim)),
        "ie_params": vision_params,
        # host-side callable for the guidance-eval preview sampler
        # (never enters a jitted program as data)
        "vae_decode": vae_decode,
    }
    return guidance, inputs
