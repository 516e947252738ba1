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


def snapshot_provenance(trial_dir: str, args) -> None:
    """Experiment provenance: the launch command line (reference launch.py
    cmd.txt, :212-227) and a zip of the first-party sources (CodeSnapshot/
    ConfigSnapshot callbacks, threestudio/utils/callbacks.py:60-111)."""
    import sys
    import zipfile

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        with open(os.path.join(trial_dir, "cmd.txt"), "w") as f:
            f.write("python " + " ".join(sys.argv) + "\n")
        with zipfile.ZipFile(os.path.join(trial_dir, "code_snapshot.zip"),
                             "w", zipfile.ZIP_DEFLATED) as z:
            for root, dirs, files in os.walk(pkg_root):
                dirs[:] = [d for d in dirs if d != "__pycache__"]
                for name in files:
                    if name.endswith((".py", ".cpp", ".yaml")):
                        p = os.path.join(root, name)
                        z.write(p, os.path.relpath(p, os.path.dirname(pkg_root)))
    except OSError as e:  # read-only trial dirs etc. — provenance is best-effort
        print(f"[snapshot] WARNING: provenance snapshot failed: {e}")


def build_system(cfg, seed: int = 0):
    """Dispatch ``system_type`` through the module registry (the reference's
    ``threestudio.find(cfg.system_type)(cfg.system)``, launch.py:170)."""
    import animate3d_tpu.systems.animate3d  # noqa: F401 — registers the system
    from animate3d_tpu.core.registry import find

    cls = find(cfg.system_type or "gaussian-splatting-animate3d-system")
    return cls.from_config(cfg, seed=seed)


def load_system_weights(cfg, system) -> None:
    """Stage chaining: ``system.weights`` restores the deformation-field
    params from a previous stage's checkpoint (refine loads the recon ckpt;
    reference README.md:198, threestudio/systems/base.py:49-54)."""
    weights = cfg.system.get("weights")
    if not weights:
        return
    import jax
    import jax.numpy as jnp

    from animate3d_tpu.core.checkpoint import (
        find_latest_checkpoint,
        restore_checkpoint_raw,
    )

    path = weights
    if not os.path.basename(path).startswith("step_"):
        path = find_latest_checkpoint(path)
    if path is None or not os.path.isdir(path):
        raise FileNotFoundError(
            f"system.weights={weights!r}: no checkpoint found — run the "
            f"stage-1 reconstruction first (README pipeline order)")
    raw = restore_checkpoint_raw(path)
    # graft params only (the previous stage's optimizer state is not carried
    # across stages, matching the reference's load_weights state-dict load)
    system.params = jax.tree_util.tree_map(
        lambda tpl, src: jnp.asarray(src, tpl.dtype), system.params,
        raw["params"])
    print(f"[weights] restored system weights from {path}")


def _progress(cfg, args):
    """ProgressWriter in gradio mode (reference launch.py:200-202 installs
    ProgressCallback writing <trial_dir>/progress); None otherwise."""
    if not getattr(args, "gradio", False):
        return None
    from animate3d_tpu.utils.logging import ProgressWriter

    return ProgressWriter(os.path.join(cfg.trial_dir, "progress"))


def run_train(cfg, system, args) -> None:
    import jax
    import jax.numpy as jnp
    from animate3d_tpu.core.checkpoint import save_checkpoint
    from animate3d_tpu.core.registry import find
    from animate3d_tpu.data.cameras import gs_cameras_from_batch
    import animate3d_tpu.data.multi_image  # noqa: F401 — registers datamodule
    from animate3d_tpu.utils.logging import MetricsLogger

    data_cls = find(cfg.data_type or "simple-multi-image-datamodule")
    dataset = data_cls.from_config(cfg.data, seed=cfg.seed)

    # multi-chip: `trainer.mesh_dp=N` (CLI dotted override or yaml) shards
    # the view·frame batch over a dp mesh, params replicated; XLA inserts the
    # gradient psum over ICI (SURVEY §2.3 — replaces Lightning DDP)
    mesh = None
    mesh_dp = int(cfg.trainer.get("mesh_dp", 0) or 0)
    if mesh_dp > 1:
        from animate3d_tpu.parallel.mesh import make_mesh, replicate

        mesh = make_mesh(dp=mesh_dp, devices=jax.devices()[:mesh_dp])
        system.params = replicate(mesh, system.params)
        system.opt_state = replicate(mesh, system.opt_state)
        print(f"[mesh] dp={mesh_dp} over {mesh_dp} devices")

    max_steps = cfg.trainer.get("max_steps", 800)
    ckpt_every = cfg.checkpoint.get("every_n_train_steps", max_steps)
    val_every = cfg.trainer.get("val_check_interval", 0)
    ckpt_dir = os.path.join(cfg.trial_dir, "ckpts")
    logger = MetricsLogger(os.path.join(cfg.trial_dir, "metrics.jsonl"))

    key = jax.random.PRNGKey(cfg.seed)
    raw = dataset.batch(0)
    gs_cams = gs_cameras_from_batch(raw)
    rgb = jnp.asarray(raw["rgb"])
    mask = jnp.asarray(raw["mask"].astype(np.float32))
    if mesh is not None:
        from animate3d_tpu.parallel.mesh import shard_batch

        # cameras AND the GT planes shard over the view·frame axis — at the
        # refine stage's 1024² GT (50 MB+ per plane set) an unsharded upload
        # would be resharded by XLA every step (VERDICT r2 weak #6)
        gs_cams = shard_batch(mesh, gs_cams)
        rgb = shard_batch(mesh, rgb)
        mask = shard_batch(mesh, mask)
    batch = {
        "gs_cameras": gs_cams,
        # whole-video GT uploaded ONCE (the batch is constant across steps;
        # re-uploading 50 MB of renders per step dominated wall-clock)
        "timestamps": np.asarray(raw["timestamps"]),
        "rgb": rgb,
        "mask": mask,
    }

    log_every = cfg.trainer.get("log_every_n_steps", 50)
    # teacher-preview cadence during refine (guidance_eval, reference
    # animatemv_guidance.py:668-765); 0 ⇒ off
    geval_every = int(cfg.trainer.get("guidance_eval_interval", 0) or 0)
    pending = []  # (step, device-metrics) — fetched at log cadence so the
    # python loop dispatches ahead of the device instead of syncing per step

    def flush(now: float) -> None:
        if not pending:
            return
        window = max(now - flush.t0, 0.0) / len(pending)
        for s, m in pending:
            logger.log(s, {**{k: float(v) for k, v in m.items()},
                           "sec_per_step": window})
        s, m = pending[-1]
        msg = " ".join(f"{k}={float(v):.5f}" for k, v in m.items())
        print(f"[{s}/{max_steps}] {msg} ({window:.2f}s/it avg)")
        pending.clear()
        flush.t0 = time.perf_counter()

    progress = _progress(cfg, args)
    flush.t0 = time.perf_counter()
    for step in range(max_steps):
        if progress is not None and step % log_every == 0:
            progress.train_step(step, max_steps)
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
            if mesh is not None:
                from animate3d_tpu.parallel.mesh import shard_batch

                # SDS batch renders + VAE encode split over dp (64
                # view-frame items); the UNet part couples all of one
                # video's views/frames through cross-view and temporal
                # attention, so XLA gathers there — the per-item stages
                # are where the refine step's raster/VAE time goes
                for k in ("cameras", "timestamps", "c2w"):
                    guidance_batch[k] = shard_batch(mesh, guidance_batch[k])
        metrics = system.step(batch, sub, guidance_batch=guidance_batch)
        pending.append((step, metrics))
        if step % log_every == 0 or step + 1 == max_steps:
            flush(time.perf_counter())
        if (geval_every and guidance_batch is not None
                and (step + 1) % geval_every == 0):
            from animate3d_tpu.utils.saving import Saver

            key, k_p = jax.random.split(key)
            imgs = system.guidance_preview(
                guidance_batch, k_p,
                num_steps=int(cfg.trainer.get("guidance_eval_steps", 25)))
            Saver(os.path.join(cfg.trial_dir, "save")).gif_mv(
                f"guidance_eval/it{step + 1}.gif", np.asarray(imgs))
            print(f"[guidance_eval] wrote teacher preview at step {step + 1}")
        if val_every and (step + 1) % val_every == 0 and step + 1 < max_steps:
            _validation_render(cfg, system, step + 1)
        if (step + 1) % ckpt_every == 0 or step + 1 == max_steps:
            save_checkpoint(ckpt_dir, step + 1, {
                "params": system.params,
                "opt_state": system.opt_state,
                "step": step + 1,
            })
    flush(time.perf_counter())
    if progress is not None:
        progress.train_step(max_steps, max_steps)
        progress.close()
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


def _restore_for_eval(cfg, system, tag: str) -> None:
    from animate3d_tpu.core.checkpoint import find_latest_checkpoint, restore_checkpoint

    ckpt_dir = os.path.join(cfg.trial_dir, "ckpts")
    latest = cfg.resume or find_latest_checkpoint(ckpt_dir)
    if latest:
        restored = restore_checkpoint(latest, {
            "params": system.params, "opt_state": system.opt_state, "step": 0})
        system.params = restored["params"]
        print(f"[{tag}] restored {latest}")


def _eval_renderer_cfg(cfg, system, height=None, width=None):
    """Final evaluation renders use EXACT top_k binning unless the config
    opts out (system.renderer.exact_test_binning=false) — approx_max_k's
    ~1% candidate-recall loss is a training-speed trade, not something the
    evaluation images should carry. ``height``/``width`` override the raster
    resolution: the rasterizer sizes from Renderer4DConfig, NOT from the
    camera batch, so eval sizes (vis configs render at 1024²,
    visualize_four_view_frame_16.yaml:27-28) must be threaded here."""
    import dataclasses

    repl = {}
    if height is not None and height != system.cfg.renderer.height:
        repl.update(height=int(height))
    if width is not None and width != system.cfg.renderer.width:
        repl.update(width=int(width))
    if cfg.system.get("renderer", {}).get("exact_test_binning", True):
        repl.update(approx_binning=False)
    return (dataclasses.replace(system.cfg.renderer, **repl)
            if repl else system.cfg.renderer)


def run_test(cfg, system, args) -> None:
    import json

    import jax.numpy as jnp
    from animate3d_tpu.data.cameras import (
        fixed_view_cameras,
        gs_cameras_from_batch,
        testset_grid_cameras,
    )
    from animate3d_tpu.utils.saving import Saver

    _restore_for_eval(cfg, system, "test")
    progress = _progress(cfg, args)
    if progress is not None:  # callbacks.py:150-152 on_test_start
        progress.write("Rendering video ...")

    test_option = cfg.system.get("test_option", "testset")
    n_frame = system.cfg.n_frame
    rc = cfg.data.get("random_camera", {}) or {}

    def _eval_opt(key, default):
        # eval knobs live in data.random_camera in the reference's vis
        # configs (visualize_*_frame_16.yaml:27-39); a top-level data.<key>
        # override wins
        return cfg.data.get(key, rc.get(key, default))

    if test_option == "four_view":
        eval_h = cfg.data.get("eval_height", cfg.data.get("height", 256))
        eval_w = cfg.data.get("eval_width", cfg.data.get("width", 256))
        cams = fixed_view_cameras(height=eval_h, width=eval_w,
                                  total_frame=n_frame)
    else:
        kwargs = {}
        if _eval_opt("eval_elevation_deg", None) is not None:
            kwargs["elevations_deg"] = tuple(_eval_opt("eval_elevation_deg", ()))
        if _eval_opt("eval_azimuth_deg", None) is not None:
            kwargs["azimuth_sets_deg"] = tuple(
                tuple(s) for s in _eval_opt("eval_azimuth_deg", ()))
        eval_h = _eval_opt("eval_height", 512)
        eval_w = _eval_opt("eval_width", 512)
        cams = testset_grid_cameras(height=eval_h, width=eval_w,
                                    total_frame=n_frame, **kwargs)

    gs_cams = gs_cameras_from_batch(cams)
    out = system.render(gs_cams, cams["timestamps"],
                        renderer_cfg=_eval_renderer_cfg(
                            cfg, system, height=eval_h, width=eval_w))
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

    # quality metrics vs the GT video (the surface the reference's paper
    # metrics are computed on): available whenever the training frames exist
    if test_option == "four_view" and cfg.data.get("image_root") and \
            os.path.isdir(cfg.data["image_root"]):
        from animate3d_tpu.data.multi_image import load_rgba_frames
        from animate3d_tpu.utils import metrics as qm

        h, w = rgb.shape[2], rgb.shape[3]
        gt_rgb, gt_mask = load_rgba_frames(cfg.data["image_root"], h, w)
        bgc = np.asarray(system.cfg.renderer.back_ground_color, np.float32)
        gt = gt_rgb * gt_mask + bgc * (1.0 - gt_mask)
        gt = gt.reshape(n_views, n_frame, h, w, 3)
        report = {"per_view": []}
        for v in range(n_views):
            p = float(qm.psnr(jnp.asarray(rgb[v]), jnp.asarray(gt[v])))
            s = float(jnp.mean(qm.ssim(jnp.asarray(rgb[v]), jnp.asarray(gt[v]))))
            report["per_view"].append({"view": v, "psnr": round(p, 3),
                                       "ssim": round(s, 4)})
        report["psnr"] = round(
            float(np.mean([r["psnr"] for r in report["per_view"]])), 3)
        report["ssim"] = round(
            float(np.mean([r["ssim"] for r in report["per_view"]])), 4)
        lp = qm.load_lpips()
        if lp is not None:
            model, params = lp
            d = model(params, jnp.asarray(rgb.reshape(-1, h, w, 3)),
                      jnp.asarray(gt.reshape(-1, h, w, 3)))
            report["lpips"] = round(float(jnp.mean(d)), 4)
        with open(os.path.join(saver.save_dir, "metrics_test.json"), "w") as f:
            json.dump(report, f, indent=1)
        print(f"[test] PSNR {report['psnr']:.2f} dB  SSIM {report['ssim']:.4f}"
              + (f"  LPIPS {report['lpips']:.4f}" if "lpips" in report else ""))
    print(f"[test] wrote artifacts to {saver.save_dir}")


def run_validate(cfg, system, args) -> None:
    """Render the deterministic validation orbit (camera sweeps 360° while
    the animation plays — uncond_hybrid.py:426-559 val dataset), distinct
    from --test's fixed-view / testset-grid renders."""
    from animate3d_tpu.data.cameras import gs_cameras_from_batch, val_orbit_cameras
    from animate3d_tpu.utils.saving import Saver

    _restore_for_eval(cfg, system, "validate")
    n_frame = system.cfg.n_frame
    eval_h = cfg.data.get("eval_height", 512)
    eval_w = cfg.data.get("eval_width", 512)
    cams = val_orbit_cameras(
        n_views=int(cfg.data.get("n_val_views", 120)),
        height=eval_h, width=eval_w, total_frame=n_frame)
    out = system.render(gs_cameras_from_batch(cams), cams["timestamps"],
                        renderer_cfg=_eval_renderer_cfg(
                            cfg, system, height=eval_h, width=eval_w))
    saver = Saver(os.path.join(cfg.trial_dir, "save"))
    rgb = np.asarray(out.rgb)
    saver.mp4("videos/val_orbit.mp4", rgb)
    saver.gif_mv("val/orbit.gif", rgb[None])
    print(f"[validate] wrote {rgb.shape[0]}-frame orbit to {saver.save_dir}")


def main(argv=None) -> None:
    from animate3d_tpu.core.runtime import honor_jax_platforms_env
    honor_jax_platforms_env()  # $JAX_PLATFORMS wins over plugin backends

    parser = argparse.ArgumentParser(description="Animate3D-TPU experiment runner")
    parser.add_argument("--config", required=True)
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--train", action="store_true")
    group.add_argument("--validate", action="store_true")
    group.add_argument("--test", action="store_true")
    group.add_argument("--export", action="store_true")
    parser.add_argument(
        "--typecheck", action="store_true",
        help="runtime tensor shape/dtype contracts at the framework "
             "boundaries (reference launch.py:131-134 jaxtyping hook)")
    parser.add_argument(
        "--gradio", action="store_true",
        help="UI mode: write single-line progress to <trial_dir>/progress "
             "(reference ProgressCallback, callbacks.py:121-156)")
    parser.add_argument("extras", nargs="*", help="dotted config overrides")
    args = parser.parse_args(argv)

    if args.typecheck:
        from animate3d_tpu.core.typecheck import enable_typecheck

        enable_typecheck()

    from animate3d_tpu.core.config import load_config, dump_config

    cfg = load_config(args.config, cli_args=args.extras)
    os.makedirs(cfg.trial_dir, exist_ok=True)
    dump_config(os.path.join(cfg.trial_dir, "parsed.yaml"),
                {"data": cfg.data, "system": cfg.system, "trainer": cfg.trainer})
    snapshot_provenance(cfg.trial_dir, args)

    system = build_system(cfg, seed=cfg.seed)
    if args.train:
        load_system_weights(cfg, system)
        run_train(cfg, system, args)
        run_test(cfg, system, args)
    elif args.validate:
        run_validate(cfg, system, args)
    elif args.test or args.export:
        if args.export:
            cfg.system["save_gaussian_trajectory"] = True
        run_test(cfg, system, args)


if __name__ == "__main__":
    main()
