"""MV-VDM trainer CLI (reference train.py surface, config-driven).

Replaces the torchrun/SLURM + NCCL-DDP bootstrap (train.py:55-84,457) with a
jax Mesh: the (B·N) batch axis is dp-sharded, params replicated, gradient
psum inserted by XLA. Per-step checkpointing, latest-resume, first-batch
sanity dump and periodic validation sampling mirror train.py:486-682.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> None:
    from animate3d_tpu.core.runtime import honor_jax_platforms_env
    honor_jax_platforms_env()  # $JAX_PLATFORMS wins over plugin backends

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
    from animate3d_tpu.models.vae import AutoencoderKL
    from animate3d_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from animate3d_tpu.pipelines.train_mvvdm import (
        MVVDMTrainConfig,
        TrainBatch,
        make_optimizer,
        make_train_step,
    )
    from animate3d_tpu.utils.logging import MetricsLogger

    out_dir = cfg.get("output_dir", "outputs/mvvdm")
    os.makedirs(out_dir, exist_ok=True)

    n_views = cfg.get("num_views", 4)
    n_frames = cfg.get("video_length", 16)
    sample_size = cfg.get("sample_size", 256)

    from animate3d_tpu.cli.inference import build_models, init_and_load

    model_size = cfg.get("model_size", "full")
    unet, vae, text_model, vision_model = build_models(
        model_size, n_views, dtype=jnp.bfloat16)
    if cfg.get("gradient_checkpointing", False):
        # reference train.py:380-382 enable_gradient_checkpointing: remat
        # every UNet block so activation memory stops bounding the per-chip
        # batch at 4 views × 16 frames @256²
        import dataclasses

        from animate3d_tpu.models.unet_mv import MVMotionUNet

        unet = MVMotionUNet(
            dataclasses.replace(unet.config, gradient_checkpointing=True),
            dtype=jnp.bfloat16)
        print("[train] gradient checkpointing (block remat) enabled")
    ucfg = unet.config
    vae_cfg = vae.config
    lat = sample_size // (2 ** (len(vae_cfg.block_out_channels) - 1))
    ctx_dim = ucfg.cross_attention_dim
    img_dim = ucfg.image_embed_dim

    # init + converted-weights bundle (train.py:191-322 builds the full
    # pretrained stack; the bundle comes from scripts/convert_weights.py)
    (unet_params, vae_params, text_params, vision_params,
     loaded) = init_and_load(unet, vae, text_model, vision_model,
                             sample_size, sample_size, n_views,
                             cfg.get("flax_params_dir"), None,
                             seed=cfg.get("global_seed", 42))

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

    dcfg = MVideoConfig(
        manifest_path=cfg["train_data"]["manifest_path"],
        video_root=cfg["train_data"].get("video_root", ""),
        sample_size=sample_size, sample_n_frames=n_frames, num_views=n_views,
        total_frames=cfg["train_data"].get("total_frames", 48),
        elevation=cfg["train_data"].get("elevation", 15.0))
    dataset = MVideoDataset(dcfg, seed=cfg.get("global_seed", 42))
    batch_size = cfg.get("train_batch_size", 1) * max(jax.device_count(), 1)
    # epoch semantics (train.py:422-425): steps default to epochs × dataset
    max_steps = cfg.get("max_train_steps",
                        cfg.get("max_train_epoch", 20) * max(len(dataset), 1))
    tcfg = MVVDMTrainConfig(
        learning_rate=cfg.get("learning_rate", 1e-4),
        cfg_dropout_prob=cfg.get("cfg_random_null_text_ratio", 0.1),
        num_views=n_views,
        i2v_cond_time_zero=cfg.get("i2v_cond_time_zero", False),
        max_grad_norm=cfg.get("max_grad_norm", 1.0),
        lr_scheduler=cfg.get("lr_scheduler", "constant"),
        lr_warmup_steps=cfg.get("lr_warmup_steps", 0),
        max_train_steps=max_steps,
        gradient_accumulation_steps=cfg.get("gradient_accumulation_steps", 1),
        scale_lr=cfg.get("scale_lr", False),
        lr_scale_factor=float(batch_size),
    )
    if cfg.get("cast_frozen_bf16", True):
        # frozen base weights stored bf16 (compute dtype) — no updates ever
        # reach them, trainable params stay fp32 masters
        from animate3d_tpu.pipelines.train_mvvdm import cast_frozen_bf16

        unet_params = cast_frozen_bf16(unet_params)
    tx = make_optimizer(unet_params, tcfg)
    opt_state = tx.init(unet_params)
    # donate params/opt-state: the update happens in place instead of
    # double-buffering ~9 GB across the optimizer step
    train_step = jax.jit(make_train_step(unet_apply, tx, tcfg),
                         donate_argnums=(0, 1))

    mesh = make_mesh()
    unet_params = replicate(mesh, unet_params)
    if cfg.get("zero_sharded_optimizer", False) and mesh.shape["dp"] > 1:
        # ZeRO-1: Adam moments shard over dp (elementwise update — GSPMD
        # slices the replicated grads and all-gathers the updated params);
        # ~1/dp the optimizer memory, no numerics change
        from animate3d_tpu.parallel.mesh import shard_leading_where_divisible

        opt_state = shard_leading_where_divisible(mesh, opt_state)
        print(f"[mesh] ZeRO-1 optimizer sharding over dp={mesh.shape['dp']}")
    else:
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

    # background prefetch: host decodes the next batches while the device
    # runs the current step (reference: 32-worker DataLoader,
    # train.py:391-410); prefetch_depth: 0 disables
    from animate3d_tpu.data.video_dataset import Prefetcher

    it = dataset.iterate(batch_size=batch_size)
    depth = int(cfg.get("prefetch_depth", 2))
    if depth > 0:
        it = Prefetcher(it, depth=depth)

    # posterior *sample* (train.py:527 .sample() — not .mode(), which the
    # sampling pipeline uses for conditioning)
    def _vae_sample(p, x, k):
        mean, logvar = vae.apply(p, x, method=AutoencoderKL.encode)
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(k, mean.shape)

    vae_encode = jax.jit(_vae_sample)

    # caption → CLIP text embeddings, cached per prompt (train.py:459-493);
    # zeros fallback only when no text tower is loaded
    encode_captions = None
    null_ctx_row = None
    if text_params is not None:
        from animate3d_tpu.utils.tokenizer import ClipTokenizer, find_tokenizer_files

        try:
            tok_files = find_tokenizer_files(cfg.get("flax_params_dir", ""))
        except FileNotFoundError:
            tok_files = None
        if tok_files:
            tokenizer = ClipTokenizer(*tok_files, max_length=77)
            text_apply = jax.jit(text_model.apply)
            _cap_cache = {}

            def encode_captions(texts):
                missing = sorted({t for t in texts if t not in _cap_cache})
                if missing:
                    embs = np.asarray(text_apply(text_params,
                                                 jnp.asarray(tokenizer(missing))))
                    _cap_cache.update(zip(missing, embs))
                return np.stack([_cap_cache[t] for t in texts])

            null_ctx_row = encode_captions([""])[0]
    if encode_captions is None:
        print("[text] WARNING: no text encoder/tokenizer — zero text "
              "conditioning (smoke mode)")

    # IP-Adapter frame-0 image embeds (train.py:518-522)
    encode_frame0 = None
    if vision_params is not None:
        from animate3d_tpu.models.clip import encode_ip_adapter_images

        encode_frame0 = jax.jit(lambda imgs: encode_ip_adapter_images(
            vision_model, vision_params, imgs))
    else:
        print("[ip] WARNING: no image encoder — zero image embeds (smoke mode)")

    logger = MetricsLogger(os.path.join(out_dir, "metrics.jsonl"))
    wandb_logger = None
    if cfg.get("use_wandb", False):
        # reference train.py:177-178 wandb.init(project="animatediff", ...);
        # degrades to an offline JSONL when the package is missing
        from animate3d_tpu.utils.logging import WandbLogger

        wandb_logger = WandbLogger(
            "animatediff", os.path.basename(out_dir.rstrip("/")), config=cfg,
            offline_path=os.path.join(out_dir, "wandb_offline.jsonl"))
    key = jax.random.PRNGKey(cfg.get("global_seed", 42))
    ckpt_every = cfg.get("checkpointing_steps", 1000)
    validation_steps = cfg.get("validation_steps", 0)
    validation_tuple = tuple(cfg.get("validation_steps_tuple", ()))

    from animate3d_tpu.utils.saving import export_to_gif_mv, save_videos_grid

    def run_validation(step, params, raw, val_key):
        """Periodic validation sampling on the first video's conditioning
        (train.py:647-676): frame-0 renders → DDIM sample → 4-view GIF."""
        from animate3d_tpu.models.diffusion import DDIMScheduler, SchedulerConfig
        from animate3d_tpu.pipelines.mv_sampler import (
            MVSampler,
            MVSamplerConfig,
            decode_video,
            encode_conditioning_images,
        )

        n, f = raw["pixel_values"].shape[1:3]
        frame0 = jnp.asarray(raw["pixel_values"][0, :, 0])  # (n, H, W, 3) ∈ [-1,1]
        ffl = encode_conditioning_images(
            lambda p, x: vae.apply(p, x, method=AutoencoderKL.encode_mode),
            vae_params, frame0)
        if encode_captions is not None:
            cap = encode_captions([raw["text"][0]])[0]
            text_cond = jnp.asarray(np.tile(cap[None], (n, 1, 1)))
            text_uncond = jnp.asarray(np.tile(null_ctx_row[None], (n, 1, 1)))
        else:
            text_cond = text_uncond = jnp.zeros((n, 77, ctx_dim))
        if encode_frame0 is not None:
            ie = encode_frame0((frame0 + 1.0) / 2.0).astype(jnp.float32)
        else:
            ie = jnp.zeros((n, img_dim))
        scfg = MVSamplerConfig(
            num_inference_steps=cfg.get("validation_num_steps", 25),
            num_views=n, num_frames=f, height=sample_size, width=sample_size,
            vae_scale_factor=2 ** (len(vae_cfg.block_out_channels) - 1),
            freeinit_enabled=False,
            i2v_cond_time_zero=tcfg.i2v_cond_time_zero)
        sampler = MVSampler(unet_apply, scfg, DDIMScheduler.create(SchedulerConfig()))
        latents = sampler.sample(val_key, params, ffl, text_cond, text_uncond, ie)
        video = decode_video(
            lambda p, z: vae.apply(p, z, method=AutoencoderKL.decode),
            vae_params, latents)
        os.makedirs(os.path.join(out_dir, "samples"), exist_ok=True)
        out = os.path.join(out_dir, "samples", f"sample-{step}.gif")
        export_to_gif_mv(np.asarray(video), out)
        print(f"[val] wrote {out}")

    null_text = jnp.zeros((batch_size * n_views, 77, ctx_dim))

    # device-resident metrics, fetched at log cadence so the python loop
    # dispatches ahead of the device instead of syncing every step (same
    # pattern as the 4D loop; the per-step block cost a tunnel round-trip)
    import time as _time

    pending = []
    log_every = int(cfg.get("log_every_n_steps", 10))

    def flush():
        if not pending:
            return
        jax.block_until_ready(pending[-1][1]["loss"])
        window = max(_time.perf_counter() - flush.t0, 0.0) / len(pending)
        for s, m in pending:
            logger.log(s, {**{k: float(v) for k, v in m.items()},
                           "sec_per_step": window})
            if wandb_logger is not None:  # train.py:610-611 wandb.log
                wandb_logger.log({"train_loss": float(m["loss"])}, step=s)
        s, m = pending[-1]
        print(f"[{s}/{max_steps}] loss={float(m['loss']):.5f} "
              f"({window:.2f}s/it avg)")
        pending.clear()
        flush.t0 = _time.perf_counter()

    flush.t0 = _time.perf_counter()
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
        key, k_vae = jax.random.split(key)
        latents = vae_encode(vae_params, jnp.asarray(imgs), k_vae) * 0.18215
        latents = latents.reshape(b * n, f, lat, lat, 4)
        if encode_captions is not None:
            # one caption per video, repeated across its views (view-major)
            cap = encode_captions(list(raw["text"]))
            text_ctx = jnp.asarray(np.repeat(cap, n, axis=0))
            null_ctx = jnp.asarray(np.tile(null_ctx_row[None], (b * n, 1, 1)))
        else:
            text_ctx = jnp.zeros((b * n, 77, ctx_dim))
            null_ctx = null_text[: b * n]
        if encode_frame0 is not None:
            frame0 = jnp.asarray(
                raw["pixel_values"][:, :, 0].reshape(b * n, sample_size,
                                                     sample_size, 3))
            image_embeds = encode_frame0((frame0 + 1.0) / 2.0).astype(jnp.float32)
        else:
            image_embeds = jnp.zeros((b * n, img_dim))
        batch = TrainBatch(
            latents=latents,
            text_ctx=text_ctx,
            null_text_ctx=null_ctx,
            camera=jnp.asarray(raw["cameras"].reshape(b * n, 16)),
            image_embeds=image_embeds,
        )
        batch = shard_batch(mesh, batch)
        key, sub = jax.random.split(key)
        unet_params, opt_state, metrics = train_step(unet_params, opt_state,
                                                     batch, sub)
        pending.append((step, metrics))
        if step % log_every == 0 or step + 1 == max_steps:
            flush()
        if ((validation_steps and (step + 1) % validation_steps == 0)
                or (step + 1) in validation_tuple):
            flush()
            key, k_val = jax.random.split(key)
            run_validation(step + 1, unet_params, raw, k_val)
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
