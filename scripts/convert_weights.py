#!/usr/bin/env python
"""Convert the reference's torch checkpoints into an orbax bundle.

One-command mode (auto-detects all five artifact families under a directory,
converts them, audits key coverage against the reference's load assertions,
runs a golden denoise step through the converted UNet, and writes
``<output>/parity_report.json``):

  python scripts/convert_weights.py --all pretrained_models/ --output converted/

Expected artifact families (reference inference.py:63-73,198-223):
  * yanqinJiang/mvdream-sd1.5-diffusers   (unet/vae/text_encoder/tokenizer)
  * guoyww/animatediff-motion-adapter-v1-5-2
  * h94/IP-Adapter                        (models/ip-adapter_sd15.bin + image_encoder)
  * animate3d_motion_modules.ckpt         (the released trained motion modules)

One-command validation for an artifact-bearing host (converts, audits keys,
golden denoise step, then an end-to-end short DDIM sample through the public
CLI writing <output>/smoke_sample/sample/0-sample.gif — pass the real 4-view
conditioning renders via --smoke_images to eyeball against the reference):

  python scripts/convert_weights.py --all pretrained_models/ --output converted/ \
      --smoke --smoke_images renders/four_view/ --smoke_steps 25

Explicit mode:

  python scripts/convert_weights.py \
      --mvdream_dir pretrained_models/mvdream-sd1.5 \
      --motion_adapter_dir pretrained_models/animatediff-motion-adapter-v1-5-2 \
      --ip_adapter_dir pretrained_models/IP-Adapter \
      --animate3d_ckpt pretrained_models/animate3d_motion_modules.ckpt \
      --output converted/

Produces step_0 orbax checkpoints for {unet, vae, text_encoder, image_encoder}
plus copied tokenizer files, loadable by the CLIs.
"""

from __future__ import annotations

import argparse
import os
import shutil


def find_model_file(d: str, names=("diffusion_pytorch_model.safetensors",
                                   "diffusion_pytorch_model.bin",
                                   "model.safetensors", "pytorch_model.bin")):
    for n in names:
        p = os.path.join(d, n)
        if os.path.exists(p):
            return p
    return None


def discover_artifacts(root: str) -> dict:
    """Walk ``root`` and auto-detect the four artifact families by their
    directory signatures (reference inference.py:63-73 load paths)."""
    import json

    found = {"mvdream_dir": None, "motion_adapter_dir": None,
             "ip_adapter_dir": None, "animate3d_ckpt": None}
    for dirpath, dirnames, filenames in os.walk(root, followlinks=True):
        dirnames[:] = [d for d in dirnames if not d.startswith(".")]
        if (found["mvdream_dir"] is None
                and os.path.isdir(os.path.join(dirpath, "unet"))
                and os.path.isdir(os.path.join(dirpath, "vae"))):
            found["mvdream_dir"] = dirpath
        if (found["ip_adapter_dir"] is None and os.path.exists(
                os.path.join(dirpath, "models", "ip-adapter_sd15.bin"))):
            found["ip_adapter_dir"] = dirpath
        if found["motion_adapter_dir"] is None and "config.json" in filenames:
            try:
                with open(os.path.join(dirpath, "config.json")) as f:
                    if json.load(f).get("_class_name") == "MotionAdapter":
                        found["motion_adapter_dir"] = dirpath
            except (OSError, ValueError):
                pass
        if found["animate3d_ckpt"] is None:
            for n in filenames:
                if n.endswith((".ckpt", ".pth")) and "motion" in n.lower():
                    found["animate3d_ckpt"] = os.path.join(dirpath, n)
                    break
    # name-based fallback for the motion adapter (some mirrors drop config.json)
    if found["motion_adapter_dir"] is None:
        for dirpath, dirnames, filenames in os.walk(root, followlinks=True):
            if ("motion-adapter" in os.path.basename(dirpath)
                    and find_model_file(dirpath)):
                found["motion_adapter_dir"] = dirpath
                break
    return found


def validate_bundle(output: str, audit: dict) -> dict:
    """Golden denoise step through the CONVERTED bundle (the check the
    reference does by eye after inference.py:222's key audit): reload via the
    CLI loader, run one CFG-pair UNet forward on fixed inputs, record output
    statistics, and save the eps tensor for cross-framework comparison."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from animate3d_tpu.models.factory import build_models, init_and_load

    unet, vae, text_model, vision_model = build_models("full", 4,
                                                       dtype=jnp.bfloat16)
    (unet_params, vae_params, text_params, vision_params,
     loaded) = init_and_load(unet, vae, text_model, vision_model,
                             256, 256, 4, output, None)
    report = {"audit": audit, "loaded_families": sorted(loaded)}

    rng = np.random.default_rng(0)
    bn, f = 8, 16
    latents = jnp.asarray(rng.normal(size=(bn, f, 32, 32, 4)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(bn, 77, 768)), jnp.float32)
    cam = jnp.asarray(rng.normal(size=(bn, 16)), jnp.float32)
    ie = jnp.asarray(rng.normal(size=(bn, 1024)), jnp.float32)
    eps = unet.apply(unet_params, latents, jnp.asarray(501.0), text, cam, ie)
    eps = np.asarray(eps, np.float32)
    report["golden_denoise"] = {
        "input_seed": 0, "timestep": 501,
        "shape": list(eps.shape),
        "finite": bool(np.isfinite(eps).all()),
        "mean": float(eps.mean()), "std": float(eps.std()),
        "min": float(eps.min()), "max": float(eps.max()),
    }
    np.save(os.path.join(output, "golden_denoise_eps.npy"), eps)
    # pass/fail mirror of the reference's asserts (inference.py:221-223):
    # unexpected keys ⇒ broken file; missing must be 0 (full save) or the
    # motion-modules-only count
    ok = report["golden_denoise"]["finite"]
    for fam, a in audit.items():
        if a.get("unexpected", 0) != 0:
            ok = False
    report["ok"] = bool(ok)
    return report


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--all", default=None, metavar="DIR",
                        help="auto-detect every artifact family under DIR, "
                             "convert, then run the golden-denoise parity "
                             "validation (one-command mode)")
    parser.add_argument("--mvdream_dir", default=None)
    parser.add_argument("--motion_adapter_dir", default=None)
    parser.add_argument("--ip_adapter_dir", default=None)
    parser.add_argument("--animate3d_ckpt", default=None)
    parser.add_argument("--output", required=True)
    parser.add_argument("--skip_validate", action="store_true",
                        help="convert only (skip the golden denoise step)")
    parser.add_argument("--smoke", action="store_true",
                        help="after converting, run a short DDIM sample "
                             "through the bundle and write a 4-view GIF + "
                             "smoke stats into parity_report.json (the eyes-"
                             "on check the reference does at "
                             "inference.py:198-223 after its key audit)")
    parser.add_argument("--smoke_images", default=None, metavar="DIR",
                        help="directory with the 4 conditioning renders "
                             "(0.png..3.png) for --smoke; synthetic images "
                             "are generated when omitted")
    parser.add_argument("--smoke_steps", type=int, default=2,
                        help="DDIM steps for --smoke (default 2)")
    parser.add_argument("--smoke_prompt", default="a dragon head roaring",
                        help="text prompt for --smoke")
    parser.add_argument("--smoke_res", type=int, default=256,
                        help="W=H for --smoke (default 256)")
    parser.add_argument("--smoke_frames", type=int, default=16,
                        help="video length for --smoke (default 16)")
    parser.add_argument("--smoke_model_size", default=None,
                        choices=[None, "full", "tiny"],
                        help="model size override for --smoke (tests)")
    args = parser.parse_args()

    if args.all:
        found = discover_artifacts(args.all)
        for k, v in found.items():
            if getattr(args, k) is None:
                setattr(args, k, v)
            print(f"[discover] {k} = {getattr(args, k)}")
        missing_req = [k for k in ("mvdream_dir",) if getattr(args, k) is None]
        if missing_req:
            raise SystemExit(f"--all {args.all}: could not find {missing_req} "
                             f"(need a dir with unet/ + vae/ subdirs)")
    elif args.mvdream_dir is None:
        parser.error("--mvdream_dir is required (or use --all DIR)")

    audit = convert_bundle(args)

    if not args.skip_validate:
        import json

        report = validate_bundle(args.output, audit)
        if args.smoke:
            report["smoke"] = smoke_sample(args)
        path = os.path.join(args.output, "parity_report.json")
        with open(path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"[validate] golden denoise "
              f"{'OK' if report['ok'] else 'FAILED'}; report at {path}")
        if not report["ok"] or not report.get("smoke", {}).get("ok", True):
            raise SystemExit(1)


def smoke_sample(args) -> dict:
    """End-to-end DDIM sample through the converted bundle via the public
    inference CLI (tokenizer → text encoder → UNet → VAE decode → GIF), the
    one-command validation an artifact-bearing host runs unmodified
    (reference inference.py:198-223 sampling after the key audit)."""
    import numpy as np
    from PIL import Image

    from animate3d_tpu.cli.inference import main as inference_main

    res = args.smoke_res
    cond_dir = args.smoke_images
    if cond_dir is None:  # synthetic 4-view conditioning renders
        cond_dir = os.path.join(args.output, "smoke_cond")
        os.makedirs(cond_dir, exist_ok=True)
        yy, xx = np.mgrid[0:res, 0:res].astype(np.float32) / (res - 1.0)
        for i in range(4):
            img = np.stack([0.5 + 0.5 * np.cos(6.28 * (xx + i / 4.0)),
                            yy, 1.0 - yy], axis=-1)
            a = (((xx - 0.5) ** 2 + (yy - 0.5) ** 2) < 0.16) * 255.0
            rgba = np.concatenate([img * 255.0, a[..., None]], axis=-1)
            Image.fromarray(rgba.astype(np.uint8), "RGBA").save(
                os.path.join(cond_dir, f"{i}.png"))

    out_dir = os.path.join(args.output, "smoke_sample")
    argv = [
        "--ip_image_root", cond_dir, "--output_dir", out_dir,
        "--flax_params", args.output, "--prompt", args.smoke_prompt,
        "--steps", str(args.smoke_steps), "--freeinit_iters", "1",
        "-W", str(res), "-H", str(res), "-L", str(args.smoke_frames),
        "--seed", "0",
    ]
    if args.smoke_model_size:
        argv += ["--model_size", args.smoke_model_size]
    inference_main(argv)
    gif = os.path.join(out_dir, "sample", "0-sample.gif")
    rec = {"gif": gif, "ok": False}
    if os.path.exists(gif):
        im = Image.open(gif)
        frames = getattr(im, "n_frames", 1)
        arr = np.asarray(im.convert("RGB"), np.float32)
        rec.update(ok=bool(np.isfinite(arr).all() and arr.std() > 1.0),
                   n_frames=int(frames), frame_size=list(im.size),
                   pixel_std=float(arr.std()))
    print(f"[smoke] sample {'OK' if rec['ok'] else 'FAILED'}: {gif}")
    return rec


def convert_bundle(args) -> dict:
    import jax
    import jax.numpy as jnp

    from animate3d_tpu.convert.torch_to_flax import (
        adapter_init_parity,
        apply_to_flax_params,
        load_animate3d_motion_checkpoint,
        load_torch_state_dict,
        merge_params,
        torch_to_flax_params,
    )
    from animate3d_tpu.core.checkpoint import save_checkpoint
    from animate3d_tpu.models.clip import (
        CLIPTextModel,
        CLIPVisionModelWithProjection,
    )
    from animate3d_tpu.models.unet_mv import MVMotionUNet, MVUNetConfig
    from animate3d_tpu.models.vae import AutoencoderKL

    os.makedirs(args.output, exist_ok=True)
    audit = {}

    # --- UNet: base + motion adapter + ip adapter + trained modules ---
    ucfg = MVUNetConfig()
    unet = MVMotionUNet(ucfg)
    params = jax.jit(unet.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((4, 2, 32, 32, 4)), jnp.asarray(0.0),
        jnp.zeros((4, 77, 768)), jnp.zeros((4, 16)), jnp.zeros((4, 1024)))
    # install-time adapter init (inference.py:160-168) — matters only when
    # no animate3d motion checkpoint overwrites the adapters below
    params = adapter_init_parity(params)

    converted = {}
    base = find_model_file(os.path.join(args.mvdream_dir, "unet"))
    assert base, f"no unet weights under {args.mvdream_dir}/unet"
    converted = torch_to_flax_params(load_torch_state_dict(base))
    if args.motion_adapter_dir:
        ma = find_model_file(args.motion_adapter_dir)
        converted = merge_params(
            converted, torch_to_flax_params(load_torch_state_dict(ma)))
    if args.ip_adapter_dir:
        ip = os.path.join(args.ip_adapter_dir, "models", "ip-adapter_sd15.bin")
        sd = load_torch_state_dict(ip)
        # diffusers _load_ip_adapter_weights key mapping: "ip_adapter" block
        # indexes attn2 processors in unet order; "image_proj" → encoder_hid_proj
        converted = merge_params(converted, convert_ip_adapter(sd, ucfg))
    params, missing, unexpected = apply_to_flax_params(params, converted)
    print(f"[unet] missing={len(missing)} unexpected={len(unexpected)}")
    audit["unet"] = {"missing": len(missing), "unexpected": len(unexpected),
                     "missing_keys_sample": sorted(missing)[:8],
                     "unexpected_keys_sample": sorted(unexpected)[:8]}
    if args.animate3d_ckpt:
        params, n_missing = load_animate3d_motion_checkpoint(params,
                                                             args.animate3d_ckpt)
        print(f"[unet] animate3d motion ckpt loaded; frozen keys: {n_missing}")
        # reference inference.py:221-222: a motion-modules-only save leaves
        # exactly the frozen-base keys "missing" (726 in torch's flat key
        # count); anything else means the file does not match the model
        audit["animate3d_motion_ckpt"] = {"frozen_base_keys": int(n_missing),
                                          "unexpected": 0}
    save_checkpoint(os.path.join(args.output, "unet"), 0, params)

    # --- VAE ---
    vae = AutoencoderKL()
    vparams = jax.jit(vae.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    vfile = find_model_file(os.path.join(args.mvdream_dir, "vae"))
    vparams, m, u = apply_to_flax_params(
        vparams, torch_to_flax_params(load_torch_state_dict(vfile)))
    print(f"[vae] missing={len(m)} unexpected={len(u)}")
    audit["vae"] = {"missing": len(m), "unexpected": len(u)}
    save_checkpoint(os.path.join(args.output, "vae"), 0, vparams)

    # --- text encoder + tokenizer ---
    te_file = find_model_file(os.path.join(args.mvdream_dir, "text_encoder"))
    if te_file:
        text = CLIPTextModel()
        tparams = jax.jit(text.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 77), jnp.int32))
        tparams, m, u = apply_to_flax_params(
            tparams, torch_to_flax_params(load_torch_state_dict(te_file)))
        print(f"[text_encoder] missing={len(m)} unexpected={len(u)}")
        audit["text_encoder"] = {"missing": len(m), "unexpected": len(u)}
        save_checkpoint(os.path.join(args.output, "text_encoder"), 0, tparams)
        tok_dir = os.path.join(args.mvdream_dir, "tokenizer")
        if os.path.isdir(tok_dir):
            shutil.copytree(tok_dir, os.path.join(args.output, "tokenizer"),
                            dirs_exist_ok=True)

    # --- IP-Adapter image encoder ---
    if args.ip_adapter_dir:
        ie_file = find_model_file(
            os.path.join(args.ip_adapter_dir, "models", "image_encoder"))
        if ie_file:
            vision = CLIPVisionModelWithProjection()
            iparams = jax.jit(vision.init)(jax.random.PRNGKey(0),
                                           jnp.zeros((1, 224, 224, 3)))
            iparams, m, u = apply_to_flax_params(
                iparams, torch_to_flax_params(load_torch_state_dict(ie_file)))
            print(f"[image_encoder] missing={len(m)} unexpected={len(u)}")
            audit["image_encoder"] = {"missing": len(m), "unexpected": len(u)}
            save_checkpoint(os.path.join(args.output, "image_encoder"), 0, iparams)

    print(f"converted weights written to {args.output}")
    return audit


def convert_ip_adapter(sd, ucfg):
    """ip-adapter_sd15.bin → flax subtrees.

    The file has {"image_proj": {...}, "ip_adapter": {"1.to_k_ip.weight", ...}}
    where the integer prefix walks the UNet's attn2 processors in diffusers
    iteration order (down blocks → up blocks → mid)."""
    from animate3d_tpu.convert.torch_to_flax import convert_leaf

    # attn2 module paths in diffusers' attn_processors iteration order
    order = []
    n_blocks = len(ucfg.block_out_channels)
    for i in range(n_blocks - 1):  # cross-attn down blocks
        for j in range(ucfg.layers_per_block):
            order.append(f"down_blocks_{i}_attentions_{j}")
    for i in range(1, n_blocks):  # cross-attn up blocks
        for j in range(ucfg.layers_per_block + 1):
            order.append(f"up_blocks_{i}_attentions_{j}")
    order.append("mid_block_attentions_0")

    tree = {}
    for name, value in sd.items():
        parts = name.split(".")
        if parts[0] == "image_proj":
            path = ["encoder_hid_proj_0",
                    {"proj": "image_embeds", "norm": "norm"}[parts[1]]]
            full, v = convert_leaf(path, parts[-1], value)
        elif parts[0] == "ip_adapter":
            # attn2 processors appear at every *odd* index (attn1 processors
            # interleave in diffusers' ordering): 1, 3, 5, ...
            proc_idx = int(parts[1])
            attn_idx = proc_idx // 2
            block = order[attn_idx]
            path = [block, "transformer_blocks_0", "attn2", parts[2]]
            full, v = convert_leaf(path, parts[-1], value)
        else:
            continue
        node = tree
        for k in full[:-1]:
            node = node.setdefault(k, {})
        node[full[-1]] = v
    return tree


if __name__ == "__main__":
    main()
