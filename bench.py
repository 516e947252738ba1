"""Benchmark: full-pipeline wall-clock estimate + quality anchors.

Headline metric (BASELINE.md north stars): estimated end-to-end wall-clock
for the TWO-STAGE GS pipeline's hot loops at reference budgets —

    75 denoise steps (25 DDIM × 3 FreeInit, CFG pair)    × sec/denoise-step
  + 800 stage-1 reconstruction steps ('normal' strategy)  × sec/recon-step
  + 200 stage-2 refine steps (1024² recon + 64@256² SDS)  × sec/refine-step
  + fixed ~30 s for VAE decode + IO glue (measured round 1)

``vs_baseline`` compares against the reference's "only 15 minutes in total"
on a ≥24 GB GPU (README.md:28 — the only number it publishes).  Extras carry
the per-component numbers plus the quality anchors the round-2 verdict
required: achieved TFLOP/s + MFU for the MV-VDM denoise step, the final
PSNR of a synthetic-GT reconstruction, and the approx-vs-exact binning
PSNR delta at production scale.
"""

import json
import time

import numpy as np

BASELINE_MINUTES = 15.0
FIXED_OVERHEAD_SEC = 30.0
# v5e peak: 197 TFLOP/s bf16 / 394 int8 (public TPU v5e specs)
PEAK_TFLOPS = {"tpu v5 lite": 197.0, "tpu v5e": 197.0}


def chain_bench(step_fn, x0, iters: int, consts=None):
    """Seconds per iteration of ``step_fn`` chained inside ONE jit program
    with a data dependency between iterations, measured as the two-point
    difference (t(n+iters) − t(n)) / iters with a forced scalar fetch.

    Per-call wall-clock through the device tunnel is unreliable: identical
    dispatches are memoized, block_until_ready doesn't reliably block, and
    per-dispatch overhead is several ms — this scheme cancels all of it.

    Pass large closed-over pytrees (model params) via ``consts`` —
    ``step_fn(consts, x)`` is then used — so they enter the program as
    ARGUMENTS; a closure capture lowers them as literal constants (6 GB of
    IR for the SD1.5 UNet) and multiplies compile time."""
    import jax
    import jax.numpy as jnp

    fn = step_fn if consts is not None else (lambda c, x: step_fn(x))

    # ONE compiled program with the trip count as a TRACED argument (the
    # fori_loop lowers to a dynamic while_loop): the two timing points are
    # two calls of the same executable.  Compiling separate n=1 / n=1+iters
    # programs doubled the cold-compile cost — >25 min each for the
    # full-UNet chain through the remote compiler, which is what actually
    # killed the denoise section in rounds 3-5 seeding runs.
    @jax.jit
    def run(c, x, n):
        def body(i, x):
            y = fn(c, x)
            return jax.tree_util.tree_map(
                lambda a, b: 0.999 * a + 0.001 * b.astype(a.dtype), x, y)
        out = jax.lax.fori_loop(0, n, body, x)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(out))

    n1, n2 = jnp.int32(1), jnp.int32(1 + iters)
    bump = lambda x: jax.tree_util.tree_map(lambda a: a + a.dtype.type(1e-5), x)
    float(run(consts, x0, n1))  # compile + warmup
    x1 = bump(x0)
    t0 = time.perf_counter()
    float(run(consts, x1, n1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(consts, x1, n2))
    t2 = time.perf_counter() - t0
    return max(t2 - t1, 1e-9) / iters


def program_tflops(fn, *args) -> float:
    """Total TFLOPs of one execution of ``fn(*args)`` from XLA's compiled
    cost analysis (0.0 when the backend doesn't expose it)."""
    import jax

    try:
        compiled = jax.jit(fn).lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) / 1e12
    except Exception as e:  # tunnel backends may not expose cost analysis
        print(f"[bench] cost_analysis unavailable: {e}")
        return 0.0


def device_peak_tflops() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAK_TFLOPS.items():
        if k in kind:
            return v
    return 197.0


def bench_denoise_step():
    """(sec/step, achieved TFLOP/s, MFU) for one CFG-pair MV-VDM forward."""
    import jax
    import jax.numpy as jnp
    from animate3d_tpu.models.unet_mv import MVMotionUNet, MVUNetConfig

    cfg = MVUNetConfig()
    model = MVMotionUNet(cfg, dtype=jnp.bfloat16)

    bn, f, h, w = 8, 16, 32, 32
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.normal(size=(bn, f, h, w, 4)), jnp.float32)
    t = jnp.asarray(501.0)
    text = jnp.asarray(rng.normal(size=(bn, 77, cfg.cross_attention_dim)), jnp.float32)
    camera = jnp.asarray(rng.normal(size=(bn, 16)), jnp.float32)
    image_embeds = jnp.asarray(rng.normal(size=(bn, cfg.image_embed_dim)), jnp.float32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), latents[:4, :2], t,
                                 text[:4], camera[:4], image_embeds[:4])
    step = lambda p, x: model.apply(p, x, t, text, camera, image_embeds)
    sec = chain_bench(step, latents, iters=5, consts=params)
    # logical FLOPs from an all-XLA-routed compile of the same math: XLA's
    # cost analysis reports 0 for Pallas custom calls, so counting the
    # production (flash/packed-routed) program undercounts the model by the
    # ~10 TFLOP that runs inside the kernels. The xla backend lowers every
    # attention site as plain batched matmuls at the true (unpadded) shapes.
    # Compile-only — but the remote compiler still rejects programs whose
    # buffers exceed HBM (the full-batch XLA L0 logits are ~16 GB), so count
    # at HALF batch (4 = one view group, everything in the UNet is linear in
    # batch) and double.
    # The count is a pure function of the model config + input shapes, so it
    # is memoized to disk: re-deriving it costs a full re-trace + remote
    # compile (~2 min of the section's wall) for a number that only moves
    # when the model does.
    import hashlib

    flops_key = hashlib.sha256(repr(
        (cfg, bn, f, h, w, "xla-routed-half-batch-x2")).encode()).hexdigest()[:16]
    cache_path = "docs/denoise_flops.json"
    cached = {}
    try:
        with open(cache_path) as fh:
            cached = json.load(fh)
    except (OSError, ValueError):
        pass
    if cached.get("key") == flops_key:
        tflops = cached["tflops"]
    else:
        from animate3d_tpu.ops.attention import attention_backend

        half = lambda p, x: model.apply(p, x, t, text[:4], camera[:4],
                                        image_embeds[:4])
        with attention_backend("xla"):
            tflops = 2.0 * program_tflops(half, params, latents[:4])
        if tflops:
            with open(cache_path, "w") as fh:
                json.dump({"key": flops_key, "tflops": tflops,
                           "note": "logical TFLOP/step, xla-routed count "
                                   "(see bench_denoise_step)"}, fh, indent=1)
    achieved = tflops / sec if tflops else 0.0
    return sec, achieved, achieved / device_peak_tflops()


def bench_raster_fps(n: int = 20000, res: int = 512) -> float:
    import math

    import jax
    import jax.numpy as jnp
    from animate3d_tpu.ops.rasterize import RasterConfig, camera_arrays, rasterize
    from animate3d_tpu.utils import camera as camu

    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.normal(size=(n, 3)) * 0.3, jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(size=(n, 3)) * 0.3 - 4.5), jnp.float32)
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    quats = jnp.asarray(quats, jnp.float32)
    opacity = jnp.asarray(rng.uniform(0.3, 0.9, size=(n,)), jnp.float32)
    colors = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    c2w = camu.generate_c2w(15.0, 30.0, distance=3.0)[0]
    fov = math.radians(40.0)
    cam = camera_arrays(camu.gs_camera(c2w, fov, fov, res, res))
    cfg = RasterConfig(height=res, width=res)

    def step(m):
        out = rasterize(m, scales, quats, opacity, cam, cfg,
                        colors_precomp=colors)
        return m + jnp.mean(out.rgb) * 1e-9

    sec = chain_bench(step, means, iters=20)
    return 1.0 / sec


def bench_binning_quality(n: int = 20000, resolutions=(256, 1024)) -> dict:
    """PSNR of approx_max_k binning renders vs exact top_k binning at
    production scale (VERDICT r2: quantify the ~1% recall loss)."""
    import math

    import jax.numpy as jnp
    from animate3d_tpu.ops.rasterize import RasterConfig, camera_arrays, rasterize
    from animate3d_tpu.utils import camera as camu
    from animate3d_tpu.utils.metrics import psnr

    rng = np.random.default_rng(1)
    means = jnp.asarray(rng.normal(size=(n, 3)) * 0.3, jnp.float32)
    scales = jnp.asarray(np.exp(rng.normal(size=(n, 3)) * 0.3 - 4.5), jnp.float32)
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    quats = jnp.asarray(quats, jnp.float32)
    opacity = jnp.asarray(rng.uniform(0.3, 0.9, size=(n,)), jnp.float32)
    colors = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    c2w = camu.generate_c2w(15.0, 30.0, distance=3.0)[0]
    fov = math.radians(40.0)

    out = {}
    for res in resolutions:
        cam = camera_arrays(camu.gs_camera(c2w, fov, fov, res, res))
        imgs = {}
        for approx in (True, False):
            cfg = RasterConfig(height=res, width=res, approx_binning=approx)
            imgs[approx] = np.asarray(rasterize(
                means, scales, quats, opacity, cam, cfg,
                colors_precomp=colors).rgb)
        p = float(psnr(jnp.asarray(imgs[True]), jnp.asarray(imgs[False])))
        out[f"approx_binning_psnr_{res}"] = round(min(p, 99.0), 2)
    return out


def _make_recon_system(n, res, n_view, n_frame, progressive_done=True):
    import jax
    from animate3d_tpu.data.cameras import fixed_view_cameras, gs_cameras_from_batch
    from animate3d_tpu.gaussians.deform import DeformConfig
    from animate3d_tpu.gaussians.state import random_state
    from animate3d_tpu.rendering.renderer4d import Renderer4DConfig
    from animate3d_tpu.systems.animate3d import (
        Animate3DConfig,
        Animate3DSystem,
        LossConfig,
    )

    state = random_state(jax.random.PRNGKey(0), n, radius=0.4)
    cams = fixed_view_cameras(height=res, width=res, total_frame=n_frame)
    cfg = Animate3DConfig(
        n_view=n_view, n_frame=n_frame, progressive_iter_per_frame=50,
        sample_strategy="normal",
        deform=DeformConfig(),
        renderer=Renderer4DConfig(height=res, width=res),
        loss=LossConfig(),
    )
    system = Animate3DSystem(cfg, state=state)
    if progressive_done:
        system.global_step = cfg.progressive_iter_per_frame * n_frame + 1
    return system, cams, gs_cameras_from_batch(cams)


def bench_recon_step(n: int = 20000, res: int = 256, n_view: int = 4,
                     n_frame: int = 16) -> dict:
    """Recon step cost over the progressive schedule. Early steps render
    only the unlocked frames padded to a power-of-two bucket (frame
    bucketing, animate3d.py:134-165 reference parity), so the true 800-step
    cost is the schedule-weighted average of the bucket phases:
    steps 0-99 → 2 frames, 100-199 → 4, 200-399 → 8, 400-799 → all 16."""
    import jax

    system, cams, gs_cams = _make_recon_system(n, res, n_view, n_frame)
    rng = np.random.default_rng(0)
    batch = {
        "gs_cameras": gs_cams,
        "timestamps": cams["timestamps"],
        # GT uploaded once like the real training loop
        "rgb": jax.numpy.asarray(
            rng.uniform(size=(n_view * n_frame, res, res, 3)).astype(np.float32)),
        "mask": jax.numpy.asarray(
            np.ones((n_view * n_frame, res, res, 1), np.float32)),
    }

    def measure(gstep: int, iters: int = 4) -> float:
        system.global_step = gstep
        m = system.step(batch, jax.random.PRNGKey(0))  # compile + warmup
        jax.block_until_ready(m)
        system.global_step = gstep
        t0 = time.perf_counter()
        for i in range(iters):
            m = system.step(batch, jax.random.PRNGKey(i + 1))
        jax.block_until_ready(m)  # steps are async — block once at the end
        return (time.perf_counter() - t0) / iters

    ipf = system.cfg.progressive_iter_per_frame  # 50
    full = measure(ipf * n_frame + 1)
    t2 = measure(ipf + 10)       # 2 active frames → bucket 2
    t4 = measure(3 * ipf + 10)   # 4 active → bucket 4
    t8 = measure(7 * ipf + 10)   # 8 active → bucket 8
    avg = (100 * t2 + 100 * t4 + 200 * t8 + 400 * full) / 800.0
    return {
        "recon_sec_per_step": round(full, 4),
        "recon_bucket_sec_per_step": [round(t, 4) for t in (t2, t4, t8)],
        "recon_schedule_avg_sec_per_step": round(avg, 4),
    }


def bench_recon_quality(n: int = 4000, res: int = 128, n_view: int = 4,
                        n_frame: int = 8, steps: int = 300) -> float:
    """Final PSNR of a short reconstruction against a SYNTHETIC ground-truth
    animation (the static splat under a known rigid motion) — the in-repo
    stand-in for "reference PSNR on dragon_head" while real assets can't be
    fetched.  Anchors every perf change to a quality number."""
    import jax
    import jax.numpy as jnp
    from animate3d_tpu.rendering.renderer4d import render_batch
    from animate3d_tpu.utils.metrics import psnr

    system, cams, gs_cams = _make_recon_system(
        n, res, n_view, n_frame, progressive_done=False)
    state = system.state

    def gt_deform(state, t, _ds):
        # rigid swing: rotate about z by 0.25·sin(π·(t+1)/2) rad + small bob
        ang = 0.25 * jnp.sin(jnp.pi * (t + 1.0) / 2.0)
        c, s = jnp.cos(ang), jnp.sin(ang)
        x, y, z = state.xyz[:, 0], state.xyz[:, 1], state.xyz[:, 2]
        xyz = jnp.stack([c * x - s * y, s * x + c * y,
                         z + 0.05 * jnp.sin(jnp.pi * (t + 1.0))], axis=1)
        return xyz, state.get_rotation(), state.get_scaling(), None

    ts = jnp.asarray(cams["timestamps"])
    gt = render_batch(state, gt_deform, gs_cams, ts, system.cfg.renderer,
                      key=None, do_reconstruction=False)
    batch = {
        "gs_cameras": gs_cams,
        "timestamps": cams["timestamps"],
        "rgb": jnp.clip(gt.rgb, 0.0, 1.0),
        "mask": (gt.alpha > 0.5).astype(jnp.float32)[..., None],
    }
    key = jax.random.PRNGKey(7)
    # full-unlock from the start (progressive schedule is a training nicety,
    # not needed to measure achievable quality on a tiny scene)
    system.global_step = system.cfg.progressive_iter_per_frame * n_frame + 1
    for i in range(steps):
        key, sub = jax.random.split(key)
        system.step(batch, sub)
    out = system.render(gs_cams, ts)
    bgc = jnp.asarray(system.cfg.renderer.back_ground_color, jnp.float32)
    gt_comp = batch["rgb"] * batch["mask"] + bgc * (1.0 - batch["mask"])
    # skip frame 0 (static anchor carries no recon loss)
    keep = np.asarray(cams["timestamps"]) > -1.0
    return float(psnr(out.rgb[keep], gt_comp[keep]))


def bench_refine_step(n: int = 20000, recon_res: int = 1024,
                      n_view: int = 4, n_frame: int = 16,
                      start_step: int = 196) -> float:
    """Stage-2 refine step at reference budgets (refine_frame_16.yaml:10,27):
    1024² recon renders + a 64-item 256² SDS batch through the frozen
    full-size MV-VDM (three-program chain).  ``start_step`` picks the
    progressive phase: 196 ⇒ the final 4-active-frame bucket (the worst
    production step), 96 ⇒ the 2-frame bucket that steps 0-99 run in."""
    import jax
    import jax.numpy as jnp
    from animate3d_tpu.data.cameras import fixed_view_cameras, gs_cameras_from_batch
    from animate3d_tpu.gaussians.deform import DeformConfig
    from animate3d_tpu.gaussians.state import random_state
    from animate3d_tpu.pipelines.guidance import build_guidance_from_config
    from animate3d_tpu.rendering.renderer4d import Renderer4DConfig
    from animate3d_tpu.systems.animate3d import (
        Animate3DConfig,
        Animate3DSystem,
        LossConfig,
    )

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
    # refine runs global_step 0..199 with progressive_iter_per_frame=50
    # (refine_frame_16.yaml:45,191): steps 0-99 render the 2-frame bucket,
    # steps 100-199 the 4-frame bucket (16 renders @1024² — the worst
    # production phase). Warm + timed steps must share one bucket: round 3
    # started at 199, which put the step-200 8-frame bucket's program
    # switch INSIDE the timed loop (a real 200-step refine never reaches
    # step 200, so that program isn't even a production shape)
    system.global_step = start_step

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
    guidance_batch = {
        "cameras": gs_cameras_from_batch(g_cams),
        "timestamps": jnp.asarray(g_cams["timestamps"]),
        "c2w": jnp.asarray(g_cams["c2w"]),
        "text_cond": ginputs["text_cond"],
        "text_uncond": ginputs["text_uncond"],
        "image_embeds": ginputs["image_embeds"],
    }
    m = system.step(batch, jax.random.PRNGKey(0), guidance_batch=guidance_batch)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    iters = 3
    for i in range(iters):
        m = system.step(batch, jax.random.PRNGKey(i + 1),
                        guidance_batch=guidance_batch)
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / iters


def bench_trainer_step(n_views: int = 4, n_frames: int = 16,
                       latent: int = 32) -> float:
    """MV-VDM trainer step at reference scale (train.yaml: batch 1 video =
    4 views × 16 frames @256² → 32² latents, bf16, motion/i2v-only updates)
    with gradient checkpointing on (train.py:380-382)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from animate3d_tpu.models.unet_mv import MVMotionUNet, MVUNetConfig
    from animate3d_tpu.pipelines.train_mvvdm import (
        MVVDMTrainConfig,
        TrainBatch,
        cast_frozen_bf16,
        make_optimizer,
        make_train_step,
    )

    ucfg = dataclasses.replace(MVUNetConfig(), gradient_checkpointing=True)
    model = MVMotionUNet(ucfg, dtype=jnp.bfloat16)
    tcfg = MVVDMTrainConfig(num_views=n_views)
    rng = np.random.default_rng(0)
    bn = n_views
    latents = jnp.asarray(rng.normal(size=(bn, n_frames, latent, latent, 4)),
                          jnp.float32)
    text = jnp.asarray(rng.normal(size=(bn, 77, ucfg.cross_attention_dim)),
                       jnp.float32)
    camera = jnp.asarray(rng.normal(size=(bn, 16)), jnp.float32)
    img = jnp.asarray(rng.normal(size=(bn, ucfg.image_embed_dim)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), latents[:, :2],
                                 jnp.asarray(0.0), text, camera, img)

    def unet_apply(p, lat, t, ctx, cam, ie, i2v_cond_time_zero=False):
        return model.apply(p, lat, t, ctx, cam, ie,
                           i2v_cond_time_zero=i2v_cond_time_zero)

    # the CLI's single-chip HBM discipline (cli/train_mvvdm.py): frozen base
    # stored bf16, grads/opt-state only for the trainable subtree, params +
    # opt-state donated so the Adam update happens in place
    params = cast_frozen_bf16(params)
    tx = make_optimizer(params, tcfg)
    opt_state = tx.init(params)
    train_step = jax.jit(make_train_step(unet_apply, tx, tcfg),
                         donate_argnums=(0, 1))
    batch = TrainBatch(latents=latents, text_ctx=text,
                       null_text_ctx=jnp.zeros_like(text), camera=camera,
                       image_embeds=img)
    params, opt_state, m = train_step(params, opt_state, batch,
                                      jax.random.PRNGKey(1))
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    iters = 3
    for i in range(iters):
        params, opt_state, m = train_step(params, opt_state, batch,
                                          jax.random.PRNGKey(i + 2))
    jax.block_until_ready(m)
    return (time.perf_counter() - t0) / iters


def _configure_jax_cache() -> None:
    from animate3d_tpu.core.runtime import (
        configure_persistent_cache,
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    configure_persistent_cache()


_SECTION_MARK = "BENCH_SECTION "
_FAIL_MARK = "BENCH_SECTION_FAIL "
_READY_MARK = "BENCH_WORKER_READY"

# name → (runner returning a flat dict of extras, per-section stall timeout
# seconds).  Timeouts assume a WARM persistent compile cache
# (~/.cache/animate3d_tpu/jax_cache, seeded every round by the builder's own
# bench run with the final code): they guard against hangs, not against cold
# compiles (a fully cold full-UNet compile takes 10-25+ min on this 1-core
# host and cannot fit any driver budget — the cache is the contract).
# ORDER = priority: the headline components (denoise → recon → refine) run
# first so a late stall costs only the tail sections (round-3 lesson: the
# old all-or-nothing ordering zeroed the round when refine OOM'd).
def _section_specs():
    return {
        "denoise": (lambda: dict(zip(
            ("mvvdm_sec_per_denoise_step", "mvvdm_achieved_tflops",
             "mvvdm_mfu"),
            (lambda s, t, m: (round(s, 4), round(t, 1), round(m, 4)))(
                *bench_denoise_step()))), 1500),
        "recon": (bench_recon_step, 1200),
        "refine": (lambda: {"refine_sec_per_step":
                            round(bench_refine_step(), 4)}, 1500),
        # the cheaper first-half phase (steps 0-99 run a 2-frame bucket);
        # when present the headline integrates 100·b2 + 100·b4 instead of
        # conservatively charging the worst phase for all 200 steps
        "refine_b2": (lambda: {"refine_sec_per_step_b2":
                               round(bench_refine_step(start_step=96), 4)},
                      900),
        "trainer": (lambda: {"mvvdm_trainer_sec_per_step":
                             round(bench_trainer_step(), 4)}, 1200),
        "quality": (lambda: {"recon_synthetic_gt_psnr":
                             round(bench_recon_quality(), 2)}, 900),
        "binning": (bench_binning_quality, 600),
        "raster": (lambda: {"raster_fps_512":
                            round(bench_raster_fps(), 1)}, 600),
    }


def run_worker(names) -> None:
    """Persistent-worker entry: initialize the device ONCE (the tunnel's
    first execution can take many minutes — that cost used to be re-paid by
    every per-section subprocess, VERDICT r4 weak #1), then run the given
    sections in-process, streaming one marked JSON line per section.  A
    section failure is caught and reported so the rest still run."""
    import gc
    import sys
    import traceback

    _configure_jax_cache()
    import jax.numpy as jnp

    t0 = time.monotonic()
    float(jnp.ones((8, 8)).sum())  # device init / tunnel handshake
    print(f"{_READY_MARK} {time.monotonic() - t0:.1f}", flush=True)
    specs = _section_specs()
    for name in names:
        t0 = time.monotonic()
        try:
            out = specs[name][0]()
        except Exception as e:  # OOM/tunnel error: lose the section, not the run
            traceback.print_exc(file=sys.stderr)
            print(_FAIL_MARK + json.dumps(
                {"name": name, "error": repr(e)[:300]}), flush=True)
            gc.collect()
            continue
        print(_SECTION_MARK + json.dumps(
            {"name": name, "extras": out,
             "wall_s": round(time.monotonic() - t0, 1)}), flush=True)
        gc.collect()  # drop this section's device buffers before the next


def run_section(name: str) -> None:
    """Single-section entry (manual debugging): `python bench.py --section X`."""
    run_worker([name] if name != "ping" else [])
    if name == "ping":
        print(_SECTION_MARK + json.dumps({"name": "ping", "extras": {}}),
              flush=True)


class _Worker:
    """Wraps the worker subprocess with a line queue + timeouts."""

    def __init__(self, names):
        import os
        import queue
        import subprocess
        import sys
        import threading

        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", ",".join(names)],
            stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        self.q: "queue.Queue[str | None]" = queue.Queue()

        def pump(pipe, q):
            for line in pipe:
                q.put(line.rstrip("\n"))
            q.put(None)

        threading.Thread(target=pump, args=(self.proc.stdout, self.q),
                         daemon=True).start()

    def next_line(self, timeout: float):
        """Next stdout line, None on EOF; raises queue.Empty on timeout."""
        return self.q.get(timeout=max(timeout, 1.0))

    def kill(self):
        try:
            self.proc.kill()
            self.proc.wait(timeout=30)
        except Exception:
            pass


def _emit_headline(extra: dict, missing, pending) -> None:
    """Print the headline JSON from whatever is measured SO FAR.  Called
    after every section so the last stdout JSON line is always the best
    current result — a late stall or OOM can no longer zero the whole run
    (round-3 lesson: rc=124 with the headline gated on ALL sections left
    ``parsed: null``).  Until all three headline components are measured the
    metric is suffixed ``_partial`` and ``value`` sums only measured parts."""
    parts = {
        "mvvdm_sec_per_denoise_step": 75,
        "recon_schedule_avg_sec_per_step": 800,
        "refine_sec_per_step": 200,
    }
    if ("recon_schedule_avg_sec_per_step" not in extra
            and "recon_sec_per_step" in extra):
        extra = dict(extra,
                     recon_schedule_avg_sec_per_step=extra["recon_sec_per_step"])
    measured = {k: n for k, n in parts.items() if k in extra}
    secs = sum(n * extra[k] for k, n in measured.items()) + FIXED_OVERHEAD_SEC
    if "refine_sec_per_step" in extra and "refine_sec_per_step_b2" in extra:
        # phase-resolved refine: steps 0-99 run the 2-frame bucket, 100-199
        # the 4-frame one (progressive_iter_per_frame=50 over 200 steps)
        secs += 100 * (extra["refine_sec_per_step_b2"]
                       - extra["refine_sec_per_step"])
    complete = len(measured) == len(parts)
    out = {
        "metric": ("two_stage_pipeline_minutes" if complete
                   else "two_stage_pipeline_minutes_partial"),
        "value": round(secs / 60.0, 2),
        "unit": "min (75 denoise + 800 recon + 200 refine steps + 30s glue; "
                "reference claims 15 min total on a >=24GB GPU)"
                + ("" if complete else
                   " — PARTIAL: missing " + ",".join(
                       k for k in parts if k not in measured)),
        "vs_baseline": round(BASELINE_MINUTES / (secs / 60.0), 3),
        "extra": dict(extra, sections_failed=sorted(missing),
                      sections_pending=sorted(pending)),
    }
    print(json.dumps(out), flush=True)


def main() -> None:
    import os
    import queue
    import sys

    if "--section" in sys.argv:
        run_section(sys.argv[sys.argv.index("--section") + 1])
        return
    if "--worker" in sys.argv:
        run_worker([s for s in
                    sys.argv[sys.argv.index("--worker") + 1].split(",") if s])
        return

    # Total wall budget.  Default sized to a budget the driver demonstrably
    # allows (round-2's full run landed; rounds 3-4 were killed — VERDICT r4
    # weak #1): with a warm persistent cache the full 8-section run completes
    # in well under this; the deadline bounds cold-cache disasters instead of
    # per-section retry arithmetic.
    wall_budget = float(os.environ.get("BENCH_WALL_SEC", 3000))
    start = time.monotonic()
    deadline = start + wall_budget
    # one long init allowance instead of kill-and-retry ping cycles: a >240 s
    # first execution is the tunnel making progress, not a hang (r4 burned
    # ~17 min killing and restarting it four times; measured attach times
    # this round: 0.9 s warm, 444-824 s after idle — size for the tail)
    init_allow = float(os.environ.get("BENCH_INIT_SEC", 1500))

    only = [s for s in os.environ.get("BENCH_ONLY", "").split(",") if s]
    specs = {n: s for n, s in _section_specs().items()
             if not only or n in only}
    pending = list(specs)
    extra: dict = {}
    failed: list = []
    section_walls: dict = {}

    def emit():
        _emit_headline(
            dict(extra, bench_wall_s=round(time.monotonic() - start, 1),
                 section_wall_s=section_walls),
            failed, pending)

    spawns = 0
    while pending and time.monotonic() < deadline - 60 and spawns < 4:
        spawns += 1
        worker = _Worker(pending)
        ready = False
        cur = pending[0]
        while True:
            remaining = deadline - time.monotonic()
            allow = (init_allow if not ready else specs[cur][1])
            try:
                line = worker.next_line(min(allow, remaining))
            except queue.Empty:
                why = "init" if not ready else f"section {cur}"
                print(f"[bench] {why} stalled "
                      f"(allow={min(allow, remaining):.0f}s) — killing worker",
                      file=sys.stderr, flush=True)
                worker.kill()
                if not ready:
                    pending = []  # device unreachable within budget — stop
                else:
                    failed.append(cur)
                    pending = pending[1:]
                    emit()
                break
            if line is None:  # EOF: worker crashed (or finished all sections)
                rc = worker.proc.wait()
                if pending:
                    print(f"[bench] worker exited rc={rc} during "
                          f"{'init' if not ready else cur}",
                          file=sys.stderr, flush=True)
                    if ready:  # crash mid-section: lose it, respawn for rest
                        failed.append(cur)
                        pending = pending[1:]
                        emit()
                    else:  # died before device init — don't burn the budget
                        pending = []
                break
            if line.startswith(_READY_MARK):
                ready = True
                print(f"[bench] device ready after "
                      f"{line[len(_READY_MARK):].strip()}s", file=sys.stderr,
                      flush=True)
            elif line.startswith(_SECTION_MARK):
                rec = json.loads(line[len(_SECTION_MARK):])
                extra.update(rec["extras"])
                section_walls[rec["name"]] = rec.get("wall_s")
                if rec["name"] in pending:
                    pending.remove(rec["name"])
                cur = pending[0] if pending else cur
                emit()
                if not pending:
                    worker.kill()
                    break
            elif line.startswith(_FAIL_MARK):
                rec = json.loads(line[len(_FAIL_MARK):])
                failed.append(rec["name"])
                if rec["name"] in pending:
                    pending.remove(rec["name"])
                cur = pending[0] if pending else cur
                emit()
            else:
                print(f"[bench worker] {line}", file=sys.stderr, flush=True)

    if pending or failed:
        print(f"[bench] sections failed={failed} skipped={pending}",
              file=sys.stderr, flush=True)
        emit()


if __name__ == "__main__":
    main()
