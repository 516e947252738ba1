"""Benchmark: MV-VDM sec/denoise-step on the current device.

Headline metric (BASELINE.md): one UNet forward for the CFG pair at the
reference inference config — 4 views × 16 frames @ 256² (32² latents),
SD1.5-scale MV motion UNet, bf16 activations.

``vs_baseline`` compares against an estimated 1.0 s/denoise-step for the
reference stack (xformers fp16, 24 GB-class GPU — the reference publishes no
numbers, README.md:28 only claims "15 minutes in total"; 25 DDIM steps × 3
FreeInit iters × CFG ⇒ ~75 denoise steps, so 1 s/step ≈ a few minutes of
sampling, consistent with that budget). vs_baseline > 1 means faster than
that estimate.
"""

import json
import time

import numpy as np

BASELINE_SEC_PER_STEP = 1.0


def main() -> None:
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

    step = jax.jit(lambda p, x: model.apply(p, x, t, text, camera, image_embeds))
    out = step(params, latents)
    out.block_until_ready()  # compile + warmup

    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = step(params, latents)
    out.block_until_ready()
    sec = (time.perf_counter() - t0) / n_iters

    print(json.dumps({
        "metric": "mvvdm_sec_per_denoise_step",
        "value": round(sec, 4),
        "unit": "s (CFG pair, 4 views x 16 frames @256^2, bf16)",
        "vs_baseline": round(BASELINE_SEC_PER_STEP / sec, 3),
    }))


if __name__ == "__main__":
    main()
