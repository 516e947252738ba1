"""Tune guidance.vae_encode_chunk on the real TPU.

The SDS pixel-grad program VAE-encodes the 64-item 256² guidance batch in
rematerialized chunks (pipelines/guidance.py::_chunked_vae_encode) — chunk 8
was picked for HBM fit, not speed.  This measures the full pixel-grad
program (VAE fwd/bwd + frozen UNet CFG forward) at several chunk sizes; a
size that OOMs is reported as such.

Usage:  python scripts/profile_vae_chunk.py [--iters N]
Writes: docs/vae_chunk_tune.json
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    iters = 3
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    chunks = (8, 16, 32, 64)
    if "--chunks" in sys.argv:  # each chunk size is a fresh full-program compile
        chunks = tuple(int(c) for c in
                       sys.argv[sys.argv.index("--chunks") + 1].split(","))

    import jax
    import jax.numpy as jnp

    from animate3d_tpu.core.runtime import configure_persistent_cache
    configure_persistent_cache()

    from animate3d_tpu.data.cameras import (fixed_view_cameras,
                                            gs_cameras_from_batch)
    from animate3d_tpu.gaussians.deform import DeformConfig
    from animate3d_tpu.pipelines.guidance import build_guidance_from_config
    from animate3d_tpu.rendering.renderer4d import Renderer4DConfig
    from animate3d_tpu.systems.animate3d import (Animate3DConfig, LossConfig)

    n_view, n_frame = 4, 16
    acfg = Animate3DConfig(
        n_view=n_view, n_frame=n_frame, load_guidance=True,
        deform=DeformConfig(),
        renderer=Renderer4DConfig(height=256, width=256),
        loss=LossConfig(lambda_sds=0.1),
    )
    sys_cfg = {"guidance": {"model_size": "full", "n_frame": n_frame,
                            "image_size": 256, "guidance_scale": 5.0}}
    guidance, ginputs = build_guidance_from_config(sys_cfg, acfg)

    g_cams = fixed_view_cameras(height=256, width=256, total_frame=n_frame)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(
        size=(n_view * n_frame, 256, 256, 3)).astype(np.float32))
    c2w = jnp.asarray(g_cams["c2w"])
    key = jax.random.PRNGKey(0)
    t_range = (jnp.int32(20), jnp.int32(200))

    results = {}
    for chunk in chunks:
        g2 = type(guidance)(
            guidance.unet_apply, guidance.vae_encode,
            cfg=dataclasses.replace(guidance.cfg, vae_encode_chunk=chunk),
            scheduler=guidance.scheduler,
            image_encode=guidance.image_encode)
        try:
            fn = lambda: g2.pixel_grad(
                ginputs["unet_params"], ginputs["vae_params"], rgb,
                ginputs["text_cond"], ginputs["text_uncond"], c2w,
                ginputs["image_embeds"], key, t_range=t_range,
                ie_params=ginputs.get("ie_params"))
            jax.block_until_ready(fn())
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn()
            jax.block_until_ready(out)
            sec = (time.perf_counter() - t0) / iters
            results[f"pixel_grad_chunk{chunk}_s"] = round(sec, 4)
            print(f"chunk {chunk}: {sec:.4f} s", flush=True)
        except Exception as e:
            results[f"pixel_grad_chunk{chunk}_s"] = None
            print(f"chunk {chunk}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    with open("docs/vae_chunk_tune.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
