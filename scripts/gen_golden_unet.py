#!/usr/bin/env python
"""Generate the composed-UNet golden tensors (tests/golden/unet_tiny.npz).

A frozen-seed single-denoise-step anchor for the full MV motion UNet at tiny
scale with every attention behavior enabled (cross-view attn1 + I2V branch,
IP-Adapter attn2, spatiotemporal motion attention with alpha blender, camera
embedding, i2v_cond_time_zero both off and on). The reference composition
(MVUNetMotionModel + processor installation, inference.py:107-192) cannot be
run in this environment (diffusers is not installed), so this anchors the
CURRENT implementation: any drift in layout reshapes, PE nulling, or blender
plumbing breaks the comparison (SURVEY §7 build step 4 / VERDICT item 9).

Run on CPU for bit-stable goldens:  python scripts/gen_golden_unet.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build():
    """Golden forward at fp32/highest precision (CPU-deterministic)."""
    with jax.default_matmul_precision("highest"):
        return _build()


def _build():
    from animate3d_tpu.convert.torch_to_flax import adapter_init_parity
    from animate3d_tpu.models.unet_mv import MVMotionUNet, MVUNetConfig

    cfg = MVUNetConfig.tiny(num_views=4)
    unet = MVMotionUNet(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1234)
    n, f, h, w = 4, 3, 8, 8
    latents = jnp.asarray(rng.normal(size=(n, f, h, w, 4)), jnp.float32)
    t = jnp.asarray(517.0)
    text = jnp.asarray(rng.normal(size=(n, 77, cfg.cross_attention_dim)),
                       jnp.float32)
    camera = jnp.asarray(rng.normal(size=(n, 16)), jnp.float32)
    image_embeds = jnp.asarray(rng.normal(size=(n, cfg.image_embed_dim)),
                               jnp.float32)
    params = unet.init(jax.random.PRNGKey(7), latents, t, text, camera,
                       image_embeds)
    params = adapter_init_parity(params)
    # perturb every param deterministically so zero-init adapters contribute
    leaves, treedef = jax.tree_util.tree_flatten(params)
    prng = np.random.default_rng(99)
    leaves = [jnp.asarray(np.asarray(p)
                          + 0.01 * prng.standard_normal(p.shape).astype(np.float32))
              for p in leaves]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    out = unet.apply(params, latents, t, text, camera, image_embeds)
    out_tz = unet.apply(params, latents, t, text, camera, image_embeds,
                        i2v_cond_time_zero=True)
    return {"out": np.asarray(out), "out_tz": np.asarray(out_tz)}


if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    dest = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                        "unet_tiny.npz")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    arrays = build()
    np.savez_compressed(dest, **arrays)
    for k, v in arrays.items():
        print(k, v.shape, "mean", float(v.mean()), "std", float(v.std()))
    print("wrote", dest)
