"""Experiment runner for the 4D stage (reference launch.py parity:
--train / --validate / --test / --export with dotted config overrides).

Pipeline stages (README.md:71-219 of the reference):
  * --train with a motion-recon config: stage-1 reconstruction of the
    generated multi-view video;
  * --train with a refine config (system.load_guidance=true): stage-2
    4D-SDS refinement;
  * --test: render the evaluation cameras (four_view / testset orbit) and
    optionally per-frame gaussian trajectories (save_gaussian_trajectory);
  * --export: trajectory npys for FBX export.
"""

from __future__ import annotations

import argparse
import os
import time
from dataclasses import asdict
from typing import Any, Dict, Optional

import numpy as np


def build_system(cfg, seed: int = 0):
    import jax
    from animate3d_tpu.core.config import parse_structured
    from animate3d_tpu.gaussians.deform import DeformConfig
    from animate3d_tpu.rendering.renderer4d import Renderer4DConfig
    from animate3d_tpu.systems.animate3d import (
        Animate3DConfig,
        Animate3DSystem,
        LossConfig,
    )

    sys_cfg = cfg.system
    geo = dict(sys_cfg.get("geometry", {}))
    load_ply = dict(geo.get("load_ply_cfg", {}))
    grid_size = tuple(tuple(g) for g in geo.get("grid_size",
                                                ((50, 50, 50, 8), (100, 100, 100, 16))))
    renderer = dict(sys_cfg.get("renderer", {}))
    loss = {k: v for k, v in dict(sys_cfg.get("loss", {})).items()
            if k in LossConfig.__dataclass_fields__}

    acfg = Animate3DConfig(
        n_view=sys_cfg.get("n_view", 4),
        n_frame=sys_cfg.get("n_frame", 16),
        progressive_iter_per_frame=sys_cfg.get("progressive_iter_per_frame", 50),
        sample_strategy=sys_cfg.get("sample_strategy", "normal"),
        load_guidance=sys_cfg.get("load_guidance", False),
        geometry_convert_from=geo.get("geometry_convert_from", ""),
        rot_x_degree=load_ply.get("rot_x_degree", 0.0),
        rot_z_degree=load_ply.get("rot_z_degree", 0.0),
        scale_factor=load_ply.get("scale_factor", 1.0),
        connected_vertices_info_path=sys_cfg.get("connected_vertices_info_path", ""),
        delta_xyz_network_lr=geo.get("delta_xyz_network_lr", 1e-4),
        delta_rot_network_lr=geo.get("delta_rot_network_lr", 1e-4),
        delta_scaling_network_lr=geo.get("delta_scaling_network_lr", 1e-4),
        grid_lr=geo.get("grid_lr", 0.01),
        global_trans_lr=geo.get("global_trans_lr", 1e-3),
        deform=DeformConfig(
            grid_sizes=grid_size,
            grid_feature_dim=geo.get("n_grid_dims", 16),
            use_global_trans=geo.get("use_global_trans", False),
        ),
        renderer=Renderer4DConfig(
            height=cfg.data.get("height", 256),
            width=cfg.data.get("width", 256),
            back_ground_color=tuple(renderer.get("back_ground_color", (1, 1, 1))),
            invert_bg_prob=renderer.get("invert_bg_prob", 1.0),
            first_frame_trainable=renderer.get("first_frame_trainable", False),
        ),
        loss=parse_structured(LossConfig, loss),
    )

    guidance = None
    guidance_inputs = None
    if acfg.load_guidance:
        guidance, guidance_inputs = build_guidance(sys_cfg, acfg)
    import jax

    return Animate3DSystem(acfg, key=jax.random.PRNGKey(seed), guidance=guidance,
                           guidance_inputs=guidance_inputs)


def build_guidance(sys_cfg: Dict[str, Any], acfg):
    """Frozen MV-VDM + VAE for 4D-SDS (requires converted weights on disk)."""
    import jax
    import jax.numpy as jnp
    from animate3d_tpu.models.unet_mv import MVMotionUNet, MVUNetConfig
    from animate3d_tpu.models.vae import AutoencoderKL, VAEConfig
    from animate3d_tpu.pipelines.guidance import AnimateMVGuidance, GuidanceConfig

    g = dict(sys_cfg.get("guidance", {}))
    ucfg = MVUNetConfig(num_views=acfg.n_view)
    unet = MVMotionUNet(ucfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)  # half_precision_weights parity

    n_frame = g.get("n_frame", acfg.n_frame)
    lat = jnp.zeros((acfg.n_view, 2, 32, 32, 4))
    text = jnp.zeros((acfg.n_view, 77, 768))
    cam = jnp.zeros((acfg.n_view, 16))
    img = jnp.zeros((acfg.n_view, 1024))
    unet_params = jax.jit(unet.init)(jax.random.PRNGKey(0), lat, jnp.asarray(0.0),
                                     text, cam, img)
    vae_params = jax.jit(vae.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    ckpt = g.get("pretrained_unet_path")
    if ckpt and os.path.exists(ckpt):
        from animate3d_tpu.convert.torch_to_flax import load_animate3d_motion_checkpoint

        unet_params, n_missing = load_animate3d_motion_checkpoint(unet_params, ckpt)
        print(f"[guidance] loaded {ckpt}; {n_missing} frozen keys kept at init")
    else:
        print("[guidance] WARNING: no pretrained_unet_path found — running with "
              "randomly initialized guidance (smoke mode)")

    from animate3d_tpu.ops.attention import attention_backend

    def unet_apply(p, lat, t, ctx, cam, ie, i2v_cond_time_zero=False):
        # flash attention keeps the guidance UNet's logits out of HBM inside
        # the pixel-gradient program (docs/architecture.md)
        with attention_backend("flash"):
            return unet.apply(p, lat, t, ctx, cam, ie,
                              i2v_cond_time_zero=i2v_cond_time_zero)

    def vae_encode(p, x):
        return vae.apply(p, x, method=AutoencoderKL.encode)

    gcfg = GuidanceConfig(
        guidance_scale=g.get("guidance_scale", 5.0),
        n_view=g.get("n_view", acfg.n_view),
        n_frame=n_frame,
        recon_std_rescale=g.get("recon_std_rescale", 0.25),
        min_step_percent=g.get("min_step_percent", 0.02),
        max_step_percent=g.get("max_step_percent", 0.2),
        i2v_cond_time_zero=g.get("model_config", {}).get("i2v_cond_time_zero", False),
    )
    guidance = AnimateMVGuidance(unet_apply, vae_encode, gcfg)

    # conditioning for the SDS batch (one video = n_view rows). Text comes
    # from the cached prompt processor when available, zeros otherwise.
    bn = acfg.n_view
    pp = dict(sys_cfg.get("prompt_processor", {}))
    from animate3d_tpu.models.prompt_processor import encode_prompt_or_zeros

    text_cond, text_uncond = encode_prompt_or_zeros(
        pp.get("prompt", ""), pp.get("negative_prompt", ""), bn)
    inputs = {
        "unet_params": unet_params,
        "vae_params": vae_params,
        "text_cond": text_cond,
        "text_uncond": text_uncond,
        "image_embeds": jnp.zeros((bn, ucfg.image_embed_dim)),
    }
    return guidance, inputs


def run_train(cfg, system, args) -> None:
    import jax
    import jax.numpy as jnp
    from animate3d_tpu.core.checkpoint import save_checkpoint
    from animate3d_tpu.data.cameras import gs_cameras_from_batch
    from animate3d_tpu.data.multi_image import MultiImageConfig, MultiImageDataset
    from animate3d_tpu.core.config import parse_structured
    from animate3d_tpu.data.cameras import RandomCameraConfig
    from animate3d_tpu.utils.logging import MetricsLogger, StepTimer

    data_cfg_dict = {k: v for k, v in cfg.data.items()
                     if k in MultiImageConfig.__dataclass_fields__}
    rc = data_cfg_dict.get("random_camera")
    if isinstance(rc, dict):
        data_cfg_dict["random_camera"] = parse_structured(
            RandomCameraConfig,
            {k: v for k, v in rc.items()
             if k in RandomCameraConfig.__dataclass_fields__})
    dcfg = parse_structured(MultiImageConfig, data_cfg_dict)
    dataset = MultiImageDataset(dcfg, seed=cfg.seed)

    max_steps = cfg.trainer.get("max_steps", 800)
    ckpt_every = cfg.checkpoint.get("every_n_train_steps", max_steps)
    val_every = cfg.trainer.get("val_check_interval", 0)
    ckpt_dir = os.path.join(cfg.trial_dir, "ckpts")
    logger = MetricsLogger(os.path.join(cfg.trial_dir, "metrics.jsonl"))
    timer = StepTimer()

    key = jax.random.PRNGKey(cfg.seed)
    raw = dataset.batch(0)
    batch = {
        "gs_cameras": gs_cameras_from_batch(raw),
        "timestamps": raw["timestamps"],
        "rgb": raw["rgb"],
        "mask": raw["mask"].astype(np.float32),
    }

    for step in range(max_steps):
        key, sub = jax.random.split(key)
        guidance_batch = None
        if system.cfg.load_guidance and dataset.random_sampler is not None:
            raw_rc = dataset.batch(step)["random_camera"]
            guidance_batch = {
                "cameras": gs_cameras_from_batch(raw_rc),
                "timestamps": jnp.asarray(raw_rc["timestamps"]),
                "c2w": jnp.asarray(raw_rc["c2w"]),
                "text_cond": system.guidance_inputs.get("text_cond"),
                "text_uncond": system.guidance_inputs.get("text_uncond"),
                "image_embeds": system.guidance_inputs.get("image_embeds"),
            }
        with timer:
            metrics = system.step(batch, sub, guidance_batch=guidance_batch)
        logger.log(step, {**metrics, "sec_per_step": timer.last})
        if step % cfg.trainer.get("log_every_n_steps", 50) == 0:
            msg = " ".join(f"{k}={v:.5f}" for k, v in metrics.items())
            print(f"[{step}/{max_steps}] {msg} ({timer.last:.2f}s/it)")
        if val_every and (step + 1) % val_every == 0 and step + 1 < max_steps:
            _validation_render(cfg, system, step + 1)
        if (step + 1) % ckpt_every == 0 or step + 1 == max_steps:
            save_checkpoint(ckpt_dir, step + 1, {
                "params": system.params,
                "opt_state": system.opt_state,
                "step": step + 1,
            })
    print(f"[train] done; checkpoints in {ckpt_dir}")


def _validation_render(cfg, system, step: int) -> None:
    """Periodic validation renders of the fixed views (Lightning
    validation_step parity, animate3d.py:372ff)."""
    from animate3d_tpu.data.cameras import fixed_view_cameras, gs_cameras_from_batch
    from animate3d_tpu.utils.saving import Saver

    n_frame = system.cfg.n_frame
    cams = fixed_view_cameras(height=cfg.data.get("height", 256),
                              width=cfg.data.get("width", 256),
                              total_frame=n_frame)
    out = system.render(gs_cameras_from_batch(cams), cams["timestamps"])
    saver = Saver(os.path.join(cfg.trial_dir, "save"))
    rgb = np.asarray(out.rgb)
    n_views = rgb.shape[0] // n_frame
    frames = rgb.reshape(n_views, n_frame, *rgb.shape[1:])
    saver.gif_mv(f"val/it{step}.gif", frames)


def run_test(cfg, system, args) -> None:
    import jax.numpy as jnp
    from animate3d_tpu.data.cameras import (
        fixed_view_cameras,
        gs_cameras_from_batch,
        testset_grid_cameras,
    )
    from animate3d_tpu.core.checkpoint import find_latest_checkpoint, restore_checkpoint
    from animate3d_tpu.utils.saving import Saver

    ckpt_dir = os.path.join(cfg.trial_dir, "ckpts")
    latest = cfg.resume or find_latest_checkpoint(ckpt_dir)
    if latest:
        restored = restore_checkpoint(latest, {
            "params": system.params, "opt_state": system.opt_state, "step": 0})
        system.params = restored["params"]
        print(f"[test] restored {latest}")

    test_option = cfg.system.get("test_option", "testset")
    n_frame = system.cfg.n_frame
    if test_option == "four_view":
        cams = fixed_view_cameras(height=cfg.data.get("height", 256),
                                  width=cfg.data.get("width", 256),
                                  total_frame=n_frame)
    else:
        cams = testset_grid_cameras(total_frame=n_frame)

    gs_cams = gs_cameras_from_batch(cams)
    out = system.render(gs_cams, cams["timestamps"])
    saver = Saver(os.path.join(cfg.trial_dir, "save"))
    n_views = out.rgb.shape[0] // n_frame
    rgb = np.asarray(out.rgb).reshape(n_views, n_frame, *out.rgb.shape[1:])
    alpha = np.asarray(out.alpha).reshape(n_views, n_frame, *out.alpha.shape[1:])
    for v in range(n_views):
        for f in range(n_frame):
            saver.rgba(f"images/{v * n_frame + f}.png", rgb[v, f], alpha[v, f])
        saver.mp4(f"videos/view_{v}.mp4", rgb[v])
    if cfg.system.get("save_gaussian_trajectory", False):
        means = np.asarray(out.means3d).reshape(n_views, n_frame, -1, 3)[0]
        for f in range(n_frame):
            saver.trajectory(f"gaussian_trajectory/means3D_frame_{f}.npy", means[f])
    print(f"[test] wrote artifacts to {saver.save_dir}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Animate3D-TPU experiment runner")
    parser.add_argument("--config", required=True)
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--train", action="store_true")
    group.add_argument("--validate", action="store_true")
    group.add_argument("--test", action="store_true")
    group.add_argument("--export", action="store_true")
    parser.add_argument("extras", nargs="*", help="dotted config overrides")
    args = parser.parse_args(argv)

    from animate3d_tpu.core.config import load_config, dump_config

    cfg = load_config(args.config, cli_args=args.extras)
    os.makedirs(cfg.trial_dir, exist_ok=True)
    dump_config(os.path.join(cfg.trial_dir, "parsed.yaml"),
                {"data": cfg.data, "system": cfg.system, "trainer": cfg.trainer})

    system = build_system(cfg, seed=cfg.seed)
    if args.train:
        run_train(cfg, system, args)
        run_test(cfg, system, args)
    elif args.test or args.validate or args.export:
        if args.export:
            cfg.system["save_gaussian_trajectory"] = True
        run_test(cfg, system, args)


if __name__ == "__main__":
    main()
