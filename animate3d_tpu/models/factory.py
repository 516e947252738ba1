"""Model factory: build the MV-VDM stack and graft converted weights.

The reference builds every model from pretrained torch checkpoints
(inference.py:61-87, train.py:191-322, animatemv_guidance.py:121-262). Here
the stack is built at full or tiny (test) scale and weights come from the
orbax bundle written by scripts/convert_weights.py:
``bundle/{unet,vae,text_encoder,image_encoder}/step_0`` + copied tokenizer.
"""

from __future__ import annotations

import os
from typing import Optional


def build_models(model_size: str, num_views: int, dtype=None):
    """(unet, vae, text_model, vision_model) at full or tiny scale."""
    import jax.numpy as jnp

    from animate3d_tpu.models.clip import (
        CLIPTextConfig,
        CLIPTextModel,
        CLIPVisionConfig,
        CLIPVisionModelWithProjection,
    )
    from animate3d_tpu.models.unet_mv import MVMotionUNet, MVUNetConfig
    from animate3d_tpu.models.vae import AutoencoderKL, VAEConfig

    dtype = dtype or jnp.bfloat16
    if model_size == "tiny":
        ucfg = MVUNetConfig.tiny(num_views=num_views)
        vcfg = VAEConfig.tiny()
        # vocab large enough for a byte-level test tokenizer (256 chars +
        # </w> forms + specials)
        tcfg = CLIPTextConfig.tiny(hidden_size=ucfg.cross_attention_dim,
                                   max_position_embeddings=77, vocab_size=576,
                                   num_heads=max(ucfg.cross_attention_dim // 16, 1))
        icfg = CLIPVisionConfig.tiny(projection_dim=ucfg.image_embed_dim)
    else:
        ucfg = MVUNetConfig(num_views=num_views)
        vcfg = VAEConfig()
        tcfg = CLIPTextConfig()
        icfg = CLIPVisionConfig()
    unet = MVMotionUNet(ucfg, dtype=dtype)
    vae = AutoencoderKL(vcfg)
    text_model = CLIPTextModel(tcfg)
    vision_model = CLIPVisionModelWithProjection(icfg)
    return unet, vae, text_model, vision_model


def init_and_load(unet, vae, text_model, vision_model, args_H, args_W, args_N,
                  flax_params_dir: Optional[str],
                  pretrained_unet_path: Optional[str], seed: int = 0):
    """Initialize all params and graft converted weights.

    Returns (unet_params, vae_params, text_params_or_None,
    vision_params_or_None, loaded: set of component names that came from
    real weights)."""
    import jax
    import jax.numpy as jnp

    from animate3d_tpu.convert.torch_to_flax import adapter_init_parity
    from animate3d_tpu.core.checkpoint import load_flax_bundle

    ucfg = unet.config
    lat = jnp.zeros((args_N, 2, args_H // 8, args_W // 8, 4))
    text0 = jnp.zeros((args_N, 77, ucfg.cross_attention_dim))
    cam0 = jnp.zeros((args_N, 16))
    img0 = jnp.zeros((args_N, ucfg.image_embed_dim))
    unet_params = jax.jit(unet.init)(jax.random.PRNGKey(seed), lat,
                                     jnp.asarray(0.0), text0, cam0, img0)
    unet_params = adapter_init_parity(unet_params)
    vae_params = jax.jit(vae.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, args_H, args_W, 3)))

    text_params = None
    vision_params = None
    loaded = set()

    if flax_params_dir and os.path.isdir(flax_params_dir):
        templates = {"unet": unet_params, "vae": vae_params}
        if os.path.isdir(os.path.join(flax_params_dir, "text_encoder")):
            templates["text_encoder"] = jax.jit(text_model.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
        if os.path.isdir(os.path.join(flax_params_dir, "image_encoder")):
            s = vision_model.config.image_size
            templates["image_encoder"] = jax.jit(vision_model.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3)))
        bundle = load_flax_bundle(flax_params_dir, templates)
        if "unet" in bundle:
            unet_params = bundle["unet"]
        if "vae" in bundle:
            vae_params = bundle["vae"]
        text_params = bundle.get("text_encoder")
        vision_params = bundle.get("image_encoder")
        loaded = set(bundle)
        print(f"[weights] loaded {sorted(loaded)} from {flax_params_dir}")

    if pretrained_unet_path and os.path.isdir(pretrained_unet_path):
        # motion-modules export from OUR trainer (orbax dir written by
        # cli/train_mvvdm.py; either .../motion_modules or a step_N inside
        # it) — the train → sample round trip without any torch detour
        from animate3d_tpu.core.checkpoint import (
            find_latest_checkpoint,
            graft_params,
            restore_checkpoint_raw,
        )

        path = pretrained_unet_path
        if not os.path.basename(path).startswith("step_"):
            latest = find_latest_checkpoint(path)
            if latest is None:
                raise FileNotFoundError(
                    f"--pretrained_unet_path {path!r}: no step_N checkpoint")
            path = latest
        raw = restore_checkpoint_raw(path)
        # the export stores the subset of the flax-inner params tree
        # (cli/train_mvvdm.py: extract_motion_modules(params["params"]));
        # tolerate an extra {"params": ...} wrapper level
        sub = raw.get("params", raw)
        if isinstance(sub, dict) and set(sub) == {"params"}:
            sub = sub["params"]
        inner, n_grafted = graft_params(
            unet_params.get("params", unet_params), sub)
        unet_params = (dict(unet_params, params=inner)
                       if "params" in unet_params else inner)
        loaded.add("motion_ckpt")
        print(f"[weights] motion modules grafted from {path} "
              f"({n_grafted} tensors; base UNet keys keep their init/bundle "
              f"values — strict=False parity, inference.py:214-223)")
    elif pretrained_unet_path and os.path.exists(pretrained_unet_path):
        from animate3d_tpu.convert.torch_to_flax import (
            load_animate3d_motion_checkpoint,
        )

        unet_params, n_missing = load_animate3d_motion_checkpoint(
            unet_params, pretrained_unet_path)
        loaded.add("motion_ckpt")
        print(f"[weights] motion checkpoint loaded; missing (frozen) keys: "
              f"{n_missing}")

    if "unet" not in loaded and "motion_ckpt" not in loaded:
        print("WARNING: no UNet weights given — random init (smoke mode)")
    return unet_params, vae_params, text_params, vision_params, loaded


def has_tokenizer(root: Optional[str]) -> bool:
    if not root:
        return False
    from animate3d_tpu.utils.tokenizer import find_tokenizer_files

    try:
        find_tokenizer_files(root)
        return True
    except FileNotFoundError:
        return False


def encode_text(prompt: str, negative_prompt: str, n_views: int, text_model,
                text_params, tokenizer_root: str):
    """[prompt, negative] → per-view (N, 77, D) cond/uncond embeddings
    (pipeline.py:345-524)."""
    import jax.numpy as jnp

    from animate3d_tpu.utils.tokenizer import ClipTokenizer, find_tokenizer_files

    tok = ClipTokenizer(*find_tokenizer_files(tokenizer_root), max_length=77)
    ids = tok([prompt, negative_prompt])
    out = text_model.apply(text_params, jnp.asarray(ids))
    cond = jnp.tile(out[0:1], (n_views, 1, 1))
    uncond = jnp.tile(out[1:2], (n_views, 1, 1))
    return cond, uncond
