"""MV-VDM sampling CLI (reference inference.py parity).

Builds the Flax MV motion UNet + VAE (+ CLIP text/image encoders when
converted weights are available), loads converted weights, and runs the
jit-scanned DDIM/CFG/FreeInit sampler on the 4 conditioning renders,
exporting the horizontal 4-view GIF.

Weight inputs (all optional; random init otherwise, for smoke runs):
  * --flax_params: converted-weights bundle directory
    (scripts/convert_weights.py output: orbax checkpoints for
    {unet, vae, text_encoder, image_encoder} + copied tokenizer files) —
    the TPU equivalent of the reference's from_pretrained stack
    (inference.py:61-87);
  * --pretrained_unet_path: torch animate3d_motion_modules.ckpt (converted
    on the fly; mirrors the reference's strict=False load + key audit,
    inference.py:214-223).
Text conditioning comes from --prompt through the bundled tokenizer + text
encoder when loaded, from --prompt_embeds_path (npz with cond/uncond arrays,
the cached-prompt-processor path) otherwise. IP-Adapter image conditioning is
CLIP-encoded from the 4 conditioning renders when the image encoder is loaded
(pipeline.py:527-538); zeros only in explicitly-flagged smoke mode.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import numpy as np


from animate3d_tpu.models.factory import (  # noqa: F401 (re-exported API)
    build_models,
    encode_text,
    has_tokenizer as _has_tokenizer,
    init_and_load,
)


def main(argv=None) -> None:
    from animate3d_tpu.core.runtime import honor_jax_platforms_env
    honor_jax_platforms_env()  # $JAX_PLATFORMS wins over plugin backends

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None, help="inference yaml")
    parser.add_argument("--prompt", default="")
    parser.add_argument("--ip_image_root", required=True,
                        help="dir with the 4 conditioning renders {0..3}.png")
    parser.add_argument("--ip_image_name", default="")
    parser.add_argument("--save_name", default="sample")
    parser.add_argument("--output_dir", default="outputs/inference")
    parser.add_argument("--pretrained_unet_path", default=None)
    parser.add_argument("--flax_params", default=None,
                        help="converted-weights bundle dir (convert_weights.py)")
    parser.add_argument("--prompt_embeds_path", default=None)
    parser.add_argument("--model_size", default=None, choices=[None, "full", "tiny"],
                        help="tiny = smoke/test scale (overrides config)")
    parser.add_argument("-W", type=int, default=256)
    parser.add_argument("-H", type=int, default=256)
    parser.add_argument("-L", type=int, default=16)
    parser.add_argument("-N", type=int, default=4)
    parser.add_argument("--steps", type=int, default=25)
    parser.add_argument("--guidance_scale", type=float, default=7.5)
    parser.add_argument("--freeinit_iters", type=int, default=3)
    parser.add_argument("--seed", type=int, default=8673)
    parser.add_argument("--mesh_sp", type=int, default=0,
                        help="shard cross-view attention sequences over N "
                             "chips (K/V ICI ring; >4-view/>16-frame scaling)")
    args = parser.parse_args(argv)

    import yaml

    cfg_yaml = {}
    if args.config:
        cfg_yaml = yaml.safe_load(open(args.config)) or {}

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from animate3d_tpu.models.clip import encode_ip_adapter_images
    from animate3d_tpu.models.diffusion import DDIMScheduler, SchedulerConfig
    from animate3d_tpu.models.vae import AutoencoderKL
    from animate3d_tpu.pipelines.mv_sampler import (
        MVSampler,
        MVSamplerConfig,
        decode_video,
        encode_conditioning_images,
    )
    from animate3d_tpu.utils.saving import export_to_gif_mv

    # 1. models + weights
    model_size = args.model_size or cfg_yaml.get("model_size", "full")
    unet, vae, text_model, vision_model = build_models(model_size, args.N)
    (unet_params, vae_params, text_params, vision_params,
     loaded) = init_and_load(unet, vae, text_model, vision_model,
                             args.H, args.W, args.N,
                             args.flax_params, args.pretrained_unet_path)

    # 2. conditioning images (the static 4-view renders)
    def load_cond(i):
        name = (f"{args.ip_image_name}_{i}.png" if args.ip_image_name
                else f"{i}.png")
        img = Image.open(os.path.join(args.ip_image_root, name)).convert("RGB")
        img = img.resize((args.W, args.H), Image.LANCZOS)
        return np.asarray(img, np.float32) / 255.0

    cond_images = np.stack([load_cond(i) for i in range(args.N)])

    # 3. text + image conditioning
    ctx_dim = unet.config.cross_attention_dim
    if args.prompt_embeds_path:
        z = np.load(args.prompt_embeds_path)
        text_cond = jnp.asarray(np.tile(z["cond"][None], (args.N, 1, 1)))
        text_uncond = jnp.asarray(np.tile(z["uncond"][None], (args.N, 1, 1)))
    elif text_params is not None and _has_tokenizer(args.flax_params):
        text_cond, text_uncond = encode_text(
            args.prompt, "", args.N, text_model, text_params, args.flax_params)
    else:
        from animate3d_tpu.models.prompt_processor import encode_prompt_or_zeros

        text_cond, text_uncond = encode_prompt_or_zeros(
            args.prompt, "", args.N, hidden_size=ctx_dim)

    if vision_params is not None:
        image_embeds = encode_ip_adapter_images(
            vision_model, vision_params, jnp.asarray(cond_images))
        image_embeds = image_embeds.astype(jnp.float32)
    else:
        print("[ip] WARNING: no image encoder — zero image embeds (smoke mode)")
        image_embeds = jnp.zeros((args.N, unet.config.image_embed_dim))

    # 4. sample
    def unet_apply(p, lat, t, ctx, cam, ie, i2v_cond_time_zero=False):
        return unet.apply(p, lat, t, ctx, cam, ie,
                          i2v_cond_time_zero=i2v_cond_time_zero)

    def vae_encode(p, x):
        return vae.apply(p, x, method=AutoencoderKL.encode_mode)

    def vae_decode(p, z):
        return vae.apply(p, z, method=AutoencoderKL.decode)

    sched_kwargs = cfg_yaml.get("noise_scheduler_kwargs", {})
    scheduler = DDIMScheduler.create(SchedulerConfig(
        **{k: v for k, v in sched_kwargs.items()
           if k in SchedulerConfig.__dataclass_fields__}))
    scfg = MVSamplerConfig(
        num_inference_steps=cfg_yaml.get("steps", args.steps),
        guidance_scale=cfg_yaml.get("guidance_scale", args.guidance_scale),
        num_views=args.N, num_frames=args.L, height=args.H, width=args.W,
        vae_scale_factor=2 ** (len(vae.config.block_out_channels) - 1),
        freeinit_enabled=cfg_yaml.get("freeinit_enabled", True),
        freeinit_num_iters=cfg_yaml.get("freeinit_num_iters", args.freeinit_iters),
        i2v_cond_time_zero=cfg_yaml.get("i2v_cond_time_zero", False),
    )
    sampler = MVSampler(unet_apply, scfg, scheduler)

    ffl = encode_conditioning_images(
        lambda p, x: vae_encode(p, x), vae_params,
        jnp.asarray(cond_images * 2.0 - 1.0))

    # optional sequence parallelism: shard the (n_view·tokens) attention axis
    # over a sp mesh so K/V ride the ICI ring (parallel/sp_attention.py) —
    # the TPU-native scaling axis the reference lacks (SURVEY §2.3/§5)
    import contextlib

    mesh_sp = int(cfg_yaml.get("mesh_sp", 0) or args.mesh_sp)
    if mesh_sp > 1:
        from animate3d_tpu.ops.attention import sp_ring
        from animate3d_tpu.parallel.mesh import make_mesh

        assert len(jax.devices()) >= mesh_sp, (
            f"--mesh_sp {mesh_sp} but only {len(jax.devices())} devices")
        mesh = make_mesh(dp=1, sp=mesh_sp, devices=jax.devices()[:mesh_sp])
        print(f"[mesh] sp={mesh_sp}: cross-view attention K/V ride the ICI ring")
        sp_ctx = sp_ring(mesh)
    else:
        sp_ctx = contextlib.nullcontext()

    with sp_ctx:
        latents = sampler.sample(jax.random.PRNGKey(args.seed), unet_params,
                                 ffl, text_cond, text_uncond, image_embeds)
    video = decode_video(vae_decode, vae_params, latents)

    os.makedirs(os.path.join(args.output_dir, args.save_name), exist_ok=True)
    save_name_ = "-".join(args.prompt.replace("/", "").split(" ")[:10]) or "sample"
    out = os.path.join(args.output_dir, args.save_name, f"0-{save_name_}.gif")
    export_to_gif_mv(np.asarray(video), out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
