"""Per-program attribution of the stage-2 refine step on the real TPU.

bench.py::bench_refine_step measures the whole step (~4.4 s in round 4);
this script times its four XLA programs separately so optimization effort
goes where the time is:

  1. sds_render_fwd   — 64-item 256² guidance render (fwd only)
  2. sds_pixel_grad   — VAE encode + frozen MV-VDM CFG pair + x0-recon grad
  3. sds_render_vjp   — guidance render fwd AGAIN + rasterizer backward
                        (the fwd recompute inside the VJP surrogate is the
                        known double-render: systems/animate3d.py:432-440)
  4. recon_train_step — 1024² reconstruction renders + losses + Adam

Usage:  python scripts/profile_refine.py [--iters N]
Writes: docs/refine_profile.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, iters):
    import jax

    jax.block_until_ready(fn())  # warm (compile)
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    iters = 3
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])

    import jax
    import jax.numpy as jnp

    from animate3d_tpu.core.runtime import configure_persistent_cache
    configure_persistent_cache()

    from animate3d_tpu.data.cameras import (fixed_view_cameras,
                                            gs_cameras_from_batch)
    from animate3d_tpu.gaussians.deform import DeformConfig
    from animate3d_tpu.gaussians.state import random_state
    from animate3d_tpu.pipelines.guidance import build_guidance_from_config
    from animate3d_tpu.rendering.renderer4d import Renderer4DConfig
    from animate3d_tpu.systems.animate3d import (Animate3DConfig,
                                                 Animate3DSystem, LossConfig)

    n, recon_res, n_view, n_frame = 20000, 1024, 4, 16
    acfg = Animate3DConfig(
        n_view=n_view, n_frame=n_frame, progressive_iter_per_frame=50,
        sample_strategy="normal", load_guidance=True,
        deform=DeformConfig(),
        renderer=Renderer4DConfig(height=recon_res, width=recon_res),
        loss=LossConfig(lambda_sds=0.1),
    )
    sys_cfg = {"guidance": {"model_size": "full", "n_frame": n_frame,
                            "image_size": 256, "guidance_scale": 5.0}}
    guidance, ginputs = build_guidance_from_config(sys_cfg, acfg)
    state = random_state(jax.random.PRNGKey(0), n, radius=0.4)
    system = Animate3DSystem(acfg, state=state, guidance=guidance,
                             guidance_inputs=ginputs)
    system.global_step = 199

    cams = fixed_view_cameras(height=recon_res, width=recon_res,
                              total_frame=n_frame)
    rng = np.random.default_rng(0)
    batch = {
        "gs_cameras": gs_cameras_from_batch(cams),
        "timestamps": cams["timestamps"],
        "rgb": jnp.asarray(rng.uniform(
            size=(n_view * n_frame, recon_res, recon_res, 3)).astype(np.float32)),
        "mask": jnp.asarray(np.ones(
            (n_view * n_frame, recon_res, recon_res, 1), np.float32)),
    }
    g_cams = fixed_view_cameras(height=256, width=256, total_frame=n_frame)
    g = {
        "cameras": gs_cameras_from_batch(g_cams),
        "timestamps": jnp.asarray(g_cams["timestamps"]),
        "c2w": jnp.asarray(g_cams["c2w"]),
        "text_cond": ginputs["text_cond"],
        "text_uncond": ginputs["text_uncond"],
        "image_embeds": ginputs["image_embeds"],
    }

    results = {}
    lambdas = system.lambdas(system.global_step)
    key = jax.random.PRNGKey(0)
    params = system.params

    # 1. SDS render fwd
    rgb = system._g_render_fwd(params, g)
    results["sds_render_fwd_s"] = timeit(
        lambda: system._g_render_fwd(params, g), iters)

    # 2. pixel grad (VAE + UNet)
    def pixel():
        return system.guidance.pixel_grad(
            system.guidance_inputs["unet_params"],
            system.guidance_inputs["vae_params"],
            rgb, g["text_cond"], g["text_uncond"], g["c2w"],
            g["image_embeds"], key,
            t_range=(lambdas["g_min_step"], lambdas["g_max_step"]),
            ie_params=system.guidance_inputs.get("ie_params"))

    loss_sds, rgb_grad = pixel()
    results["sds_pixel_grad_s"] = timeit(pixel, iters)

    # 3. render VJP (fwd recompute + rasterizer bwd)
    sds_grads = system._g_render_vjp(params, g, rgb_grad)
    results["sds_render_vjp_s"] = timeit(
        lambda: system._g_render_vjp(params, g, rgb_grad), iters)

    # 4. recon train step — mirror step()'s frame bucketing at step 199
    frame_w = system.frame_weights(system.global_step)
    active = np.nonzero(frame_w)[0]
    bucket = 2
    while bucket < len(active):
        bucket *= 2
    cameras, timestamps = batch["gs_cameras"], np.asarray(batch["timestamps"])
    rgb_gt, mask = batch["rgb"], batch["mask"]
    if bucket <= n_frame // 2:
        pad = np.full(bucket - len(active), active[-1], np.int64)
        active_p = np.concatenate([active, pad])
        item_idx = np.concatenate(
            [v * n_frame + active_p for v in range(n_view)])
        cameras = jax.tree_util.tree_map(lambda x: x[item_idx], cameras)
        timestamps = timestamps[item_idx]
        rgb_gt = rgb_gt[item_idx]
        mask = mask[item_idx]
        frame_w = np.concatenate(
            [frame_w[active], np.zeros(len(pad), np.float32)])
    gb = dict(g, loss_sds=loss_sds, sds_grads=sds_grads)

    # _train_step donates params/opt_state → rebind each call
    ps, os_ = system.params, system.opt_state

    def recon():
        nonlocal ps, os_
        ps, os_, m = system._train_step(
            ps, os_, cameras, jnp.asarray(timestamps), rgb_gt,
            jnp.asarray(mask, jnp.float32), jnp.asarray(frame_w), lambdas,
            key, do_guidance=True, guidance_batch=gb)
        return m

    results["recon_train_step_s"] = timeit(recon, iters)
    results["sum_s"] = round(sum(results.values()), 4)
    # recon() donated the system's param/opt buffers — rebind the live ones
    system.params, system.opt_state = ps, os_

    # wrapper vs inner jit: guidance.pixel_grad adds host-side _sample_t +
    # camera16 (a dozen tiny dispatches through the axon tunnel per call)
    def pixel_wrapped():
        return system.guidance.pixel_grad(
            system.guidance_inputs["unet_params"],
            system.guidance_inputs["vae_params"],
            rgb, g["text_cond"], g["text_uncond"], g["c2w"],
            g["image_embeds"], key,
            t_range=(lambdas["g_min_step"], lambdas["g_max_step"]),
            ie_params=system.guidance_inputs.get("ie_params"))

    results["pixel_grad_wrapper_s"] = round(timeit(pixel_wrapped, iters), 4)

    # the full orchestrated step at a FIXED frame bucket (reset global_step
    # so the progressive schedule — and therefore the compiled program —
    # never changes mid-timing); difference vs the program sum is host glue
    def full_step():
        system.global_step = 200  # worst bucket: 8 frames = 32 renders@1024²
        return system.step(batch, jax.random.PRNGKey(5), guidance_batch=g)

    jax.block_until_ready(jax.tree_util.tree_leaves(full_step()))
    t0 = time.perf_counter()
    for _ in range(iters):
        m = full_step()
    jax.block_until_ready(jax.tree_util.tree_leaves(m))
    results["full_step_bucket8_s"] = round(
        (time.perf_counter() - t0) / iters, 4)
    results = {k: round(v, 4) for k, v in results.items()}
    with open("docs/refine_profile.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
