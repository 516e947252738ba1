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

    with open(os.path.join(trial_dir, "cmd.txt"), "w") as f:
        f.write("python " + " ".join(sys.argv) + "\n")
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        with zipfile.ZipFile(os.path.join(trial_dir, "code_snapshot.zip"),
                             "w", zipfile.ZIP_DEFLATED) as z:
            for root, dirs, files in os.walk(pkg_root):
                dirs[:] = [d for d in dirs if d != "__pycache__"]
                for name in files:
                    if name.endswith((".py", ".cpp", ".yaml")):
                        p = os.path.join(root, name)
                        z.write(p, os.path.relpath(p, os.path.dirname(pkg_root)))
    except OSError as e:  # read-only trial dirs etc. — provenance is best-effort
        print(f"[snapshot] WARNING: code snapshot failed: {e}")


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
    if mesh is not None:
        from animate3d_tpu.parallel.mesh import shard_batch

        gs_cams = shard_batch(mesh, gs_cams)
    batch = {
        "gs_cameras": gs_cams,
        # whole-video GT uploaded ONCE (the batch is constant across steps;
        # re-uploading 50 MB of renders per step dominated wall-clock)
        "timestamps": np.asarray(raw["timestamps"]),
        "rgb": jnp.asarray(raw["rgb"]),
        "mask": jnp.asarray(raw["mask"].astype(np.float32)),
    }

    log_every = cfg.trainer.get("log_every_n_steps", 50)
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

    flush.t0 = time.perf_counter()
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
        metrics = system.step(batch, sub, guidance_batch=guidance_batch)
        pending.append((step, metrics))
        if step % log_every == 0 or step + 1 == max_steps:
            flush(time.perf_counter())
        if val_every and (step + 1) % val_every == 0 and step + 1 < max_steps:
            _validation_render(cfg, system, step + 1)
        if (step + 1) % ckpt_every == 0 or step + 1 == max_steps:
            save_checkpoint(ckpt_dir, step + 1, {
                "params": system.params,
                "opt_state": system.opt_state,
                "step": step + 1,
            })
    flush(time.perf_counter())
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
    snapshot_provenance(cfg.trial_dir, args)

    system = build_system(cfg, seed=cfg.seed)
    if args.train:
        load_system_weights(cfg, system)
        run_train(cfg, system, args)
        run_test(cfg, system, args)
    elif args.test or args.validate or args.export:
        if args.export:
            cfg.system["save_gaussian_trajectory"] = True
        run_test(cfg, system, args)


if __name__ == "__main__":
    main()
