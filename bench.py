"""Benchmark: full-pipeline wall-clock estimate on the current device.

Headline metric (BASELINE.md north stars): estimated end-to-end wall-clock
for the GS pipeline's hot loops at reference budgets —

    75 denoise steps (25 DDIM × 3 FreeInit, CFG pair)   × sec/denoise-step
  + 800 stage-1 reconstruction steps ('normal' strategy) × sec/recon-step
  + fixed ~30 s for VAE decode + IO glue (measured round 1)

``vs_baseline`` compares against the reference's "only 15 minutes in total"
on a ≥24 GB GPU (README.md:28 — the only number it publishes). The JSON line
also carries the raw component metrics the round-1 verdict asked for:
sec/denoise-step, recon sec/step, and rasterizer FPS @512².
"""

import json
import time

import numpy as np

BASELINE_MINUTES = 15.0
FIXED_OVERHEAD_SEC = 30.0


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

    def make(n):
        @jax.jit
        def run(c, x):
            def body(i, x):
                y = fn(c, x)
                return jax.tree_util.tree_map(
                    lambda a, b: 0.999 * a + 0.001 * b.astype(a.dtype), x, y)
            out = jax.lax.fori_loop(0, n, body, x)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree_util.tree_leaves(out))
        return run

    n1, n2 = 1, 1 + iters
    r1, r2 = make(n1), make(n2)
    bump = lambda x: jax.tree_util.tree_map(lambda a: a + a.dtype.type(1e-5), x)
    float(r1(consts, x0)), float(r2(consts, x0))  # compile both
    x1 = bump(x0)
    t0 = time.perf_counter()
    float(r1(consts, x1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(r2(consts, x1))
    t2 = time.perf_counter() - t0
    return max(t2 - t1, 1e-9) / (n2 - n1)


def bench_denoise_step() -> float:
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
    return chain_bench(
        lambda p, x: model.apply(p, x, t, text, camera, image_embeds),
        latents, iters=5, consts=params)


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


def bench_recon_step(n: int = 20000, res: int = 256, n_view: int = 4,
                     n_frame: int = 16) -> float:
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
    rng = np.random.default_rng(0)
    batch = {
        "gs_cameras": gs_cameras_from_batch(cams),
        "timestamps": cams["timestamps"],
        "rgb": rng.uniform(size=(n_view * n_frame, res, res, 3)).astype(np.float32),
        "mask": np.ones((n_view * n_frame, res, res, 1), np.float32),
    }
    # fully-unlocked schedule (the steady-state cost); GT uploaded once like
    # the real training loop
    batch["rgb"] = jax.numpy.asarray(batch["rgb"])
    batch["mask"] = jax.numpy.asarray(batch["mask"])
    system.global_step = cfg.progressive_iter_per_frame * n_frame + 1
    m = system.step(batch, jax.random.PRNGKey(0))  # compile + warmup
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    iters = 4
    for i in range(iters):
        m = system.step(batch, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(m)  # steps are async now — block once at the end
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_animate3d_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    denoise = bench_denoise_step()
    raster_fps = bench_raster_fps()
    recon = bench_recon_step()

    pipeline_min = (75 * denoise + 800 * recon + FIXED_OVERHEAD_SEC) / 60.0
    print(json.dumps({
        "metric": "full_pipeline_minutes",
        "value": round(pipeline_min, 2),
        "unit": "min (75 denoise steps + 800 recon steps + 30s glue; "
                "reference claims 15 min total on a >=24GB GPU)",
        "vs_baseline": round(BASELINE_MINUTES / pipeline_min, 3),
        "extra": {
            "mvvdm_sec_per_denoise_step": round(denoise, 4),
            "recon_sec_per_step": round(recon, 4),
            "raster_fps_512": round(raster_fps, 1),
        },
    }))


if __name__ == "__main__":
    main()
