#!/usr/bin/env python
"""Generate REFERENCE-DERIVED goldens (tests/golden/ref_mini.npz).

Unlike scripts/gen_golden_unet.py (a frozen-seed regression anchor of the
current implementation), these goldens come from an independent straight-line
torch transcription of the reference's attention-processor and embedding math
(scripts/ref_torch_mini.py, citing animatediff/models/attention_processor.py
and unet_motion_mv_model.py line-by-line).  tests/test_golden_ref.py converts
the torch state dicts through the repo's weight converter and asserts the
Flax modules reproduce these outputs — catching reference drift, not just
self-regression (round-2 VERDICT item 2).

Surfaces:
  * spatial   — Transformer2DModel block: MVDream-I2V attn1 + IP-Adapter
                attn2 + GEGLU ff + conv projections;
  * motion    — TransformerTemporalModel motion module, release flags
                (spatial_attn sinusoid, alpha blender, no image/camera);
  * motion_img  — image_attn on → 3-way SoftmaxAlphaBlender;
  * motion_learn — learnable spatial encoding tables;
  * emb / emb_tz — time+camera embedding plumbing, i2v_cond_time_zero off/on.

Run:  python scripts/gen_golden_ref.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import torch

import ref_torch_mini as ref

B, N, F, C, HEADS, FS = 1, 4, 3, 32, 2, 4
CTX_DIM, CTX_LEN, IP_TOKENS = 16, 7, 4
BASE_DIM, EMB_DIM = 8, 24

torch.manual_seed(0)


def _lin(rng, cout, cin, bias=True, scale=0.08):
    out = {"weight": torch.tensor(rng.normal(0, scale, (cout, cin)),
                                  dtype=torch.float32)}
    if bias:
        out["bias"] = torch.tensor(rng.normal(0, 0.02, (cout,)),
                                   dtype=torch.float32)
    return out


def _norm(rng, c):
    return {"weight": torch.tensor(1 + 0.05 * rng.normal(size=c),
                                   dtype=torch.float32),
            "bias": torch.tensor(0.02 * rng.normal(size=c),
                                 dtype=torch.float32)}


def _put(sd, prefix, d):
    for k, v in d.items():
        sd[f"{prefix}.{k}"] = v


def spatial_sd(rng):
    sd = {}
    _put(sd, "norm", _norm(rng, C))
    sd["proj_in.weight"] = torch.tensor(
        rng.normal(0, 0.08, (C, C, 1, 1)), dtype=torch.float32)
    sd["proj_in.bias"] = torch.tensor(rng.normal(0, 0.02, (C,)),
                                      dtype=torch.float32)
    p = "transformer_blocks.0"
    _put(sd, f"{p}.norm1", _norm(rng, C))
    _put(sd, f"{p}.norm2", _norm(rng, C))
    _put(sd, f"{p}.norm3", _norm(rng, C))
    for a in ("to_q", "to_k", "to_v"):
        _put(sd, f"{p}.attn1.{a}", _lin(rng, C, C, bias=False))
    _put(sd, f"{p}.attn1.to_out.0", _lin(rng, C, C))
    _put(sd, f"{p}.attn1.processor.to_q_i2v", _lin(rng, C, C, bias=False))
    _put(sd, f"{p}.attn1.processor.to_out_i2v", _lin(rng, C, C))
    _put(sd, f"{p}.attn2.to_q", _lin(rng, C, C, bias=False))
    _put(sd, f"{p}.attn2.to_k", _lin(rng, C, CTX_DIM, bias=False))
    _put(sd, f"{p}.attn2.to_v", _lin(rng, C, CTX_DIM, bias=False))
    _put(sd, f"{p}.attn2.to_out.0", _lin(rng, C, C))
    _put(sd, f"{p}.attn2.processor.to_k_ip.0", _lin(rng, C, CTX_DIM, bias=False))
    _put(sd, f"{p}.attn2.processor.to_v_ip.0", _lin(rng, C, CTX_DIM, bias=False))
    _put(sd, f"{p}.ff.net.0.proj", _lin(rng, 8 * C, C))
    _put(sd, f"{p}.ff.net.2", _lin(rng, C, 4 * C))
    sd["proj_out.weight"] = torch.tensor(
        rng.normal(0, 0.08, (C, C, 1, 1)), dtype=torch.float32)
    sd["proj_out.bias"] = torch.tensor(rng.normal(0, 0.02, (C,)),
                                       dtype=torch.float32)
    return sd


def motion_sd(rng, image_attn=False, learnable_spatial=False):
    sd = {}
    _put(sd, "norm", _norm(rng, C))
    _put(sd, "proj_in", _lin(rng, C, C))
    for blk in ("attn1", "attn2"):
        p = f"transformer_blocks.0.{blk}"
        for a in ("to_q", "to_k", "to_v"):
            _put(sd, f"{p}.{a}", _lin(rng, C, C, bias=False))
        _put(sd, f"{p}.to_out.0", _lin(rng, C, C))
        for a in ("to_q_sp", "to_k_sp", "to_v_sp"):
            _put(sd, f"{p}.processor.{a}", _lin(rng, C, C, bias=False))
        _put(sd, f"{p}.processor.to_out_sp", _lin(rng, C, C))
        if image_attn:
            for a in ("to_q_i2v", "to_k_i2v", "to_v_i2v"):
                _put(sd, f"{p}.processor.{a}", _lin(rng, C, C, bias=False))
            _put(sd, f"{p}.processor.to_out_i2v", _lin(rng, C, C))
            sd[f"{p}.processor.alpha_blender.mix_factor"] = torch.tensor(
                rng.normal(0, 0.4, (3,)), dtype=torch.float32)
        else:
            sd[f"{p}.processor.alpha_blender.mix_factor"] = torch.tensor(
                rng.normal(0, 0.4, (1,)), dtype=torch.float32)
        if learnable_spatial:
            sd[f"{p}.processor.spatial_pos_embed.row_embed.weight"] = (
                torch.tensor(rng.uniform(0, 1, (FS, C // 2)),
                             dtype=torch.float32))
            sd[f"{p}.processor.spatial_pos_embed.col_embed.weight"] = (
                torch.tensor(rng.uniform(0, 1, (FS, C // 2)),
                             dtype=torch.float32))
    for nm in ("norm1", "norm2", "norm3"):
        _put(sd, f"transformer_blocks.0.{nm}", _norm(rng, C))
    _put(sd, "transformer_blocks.0.ff.net.0.proj", _lin(rng, 8 * C, C))
    _put(sd, "transformer_blocks.0.ff.net.2", _lin(rng, C, 4 * C))
    _put(sd, "proj_out", _lin(rng, C, C))
    return sd


def emb_sd(rng):
    sd = {}
    _put(sd, "time_embedding.linear_1", _lin(rng, EMB_DIM, BASE_DIM, scale=0.2))
    _put(sd, "time_embedding.linear_2", _lin(rng, EMB_DIM, EMB_DIM, scale=0.2))
    _put(sd, "camera_embedding.linear_1", _lin(rng, EMB_DIM, 16, scale=0.2))
    _put(sd, "camera_embedding.linear_2", _lin(rng, EMB_DIM, EMB_DIM, scale=0.2))
    return sd


def main():
    rng = np.random.default_rng(42)
    out = {}

    def add_sd(tag, sd):
        for k, v in sd.items():
            out[f"sd:{tag}:{k}"] = v.numpy()

    # -- spatial transformer --------------------------------------------------
    sd = spatial_sd(rng)
    x = torch.tensor(rng.normal(0, 1, (B * N * F, C, FS, FS)),
                     dtype=torch.float32)
    ctx = torch.tensor(rng.normal(0, 1, (B * N * F, CTX_LEN, CTX_DIM)),
                       dtype=torch.float32)
    ip = torch.tensor(rng.normal(0, 1, (B * N * F, IP_TOKENS, CTX_DIM)),
                      dtype=torch.float32)
    y = ref.spatial_transformer(sd, x, ctx, ip, HEADS, N, F)
    add_sd("spatial", sd)
    out["in:spatial:x"] = x.numpy()
    out["in:spatial:ctx"] = ctx.numpy()
    out["in:spatial:ip"] = ip.numpy()
    out["out:spatial"] = y.numpy()

    # -- motion modules -------------------------------------------------------
    xm = torch.tensor(rng.normal(0, 1, (B * N * F, C, FS, FS)),
                      dtype=torch.float32)
    out["in:motion:x"] = xm.numpy()

    sd = motion_sd(rng)
    add_sd("motion", sd)
    out["out:motion"] = ref.motion_module(
        sd, xm, HEADS, N, F, spatial_attn=True, image_attn=False,
        use_alpha_blender=True, spatial_encoding_type="sinusoid").numpy()

    sd = motion_sd(rng, image_attn=True)
    add_sd("motion_img", sd)
    out["out:motion_img"] = ref.motion_module(
        sd, xm, HEADS, N, F, spatial_attn=True, image_attn=True,
        use_alpha_blender=True, spatial_encoding_type="sinusoid").numpy()

    sd = motion_sd(rng, learnable_spatial=True)
    add_sd("motion_learn", sd)
    out["out:motion_learn"] = ref.motion_module(
        sd, xm, HEADS, N, F, spatial_attn=True, image_attn=False,
        use_alpha_blender=True, spatial_encoding_type="learnable").numpy()

    # -- embedding plumbing ---------------------------------------------------
    sd = emb_sd(rng)
    add_sd("emb", sd)
    t = torch.tensor(517.0)
    camera = torch.tensor(rng.normal(0, 1, (B * N, 16)), dtype=torch.float32)
    out["in:emb:t"] = np.asarray(517.0, np.float32)
    out["in:emb:camera"] = camera.numpy()
    out["out:emb"] = ref.time_camera_frame_embeddings(
        sd, t, camera, F, False, BASE_DIM).numpy()
    out["out:emb_tz"] = ref.time_camera_frame_embeddings(
        sd, t, camera, F, True, BASE_DIM).numpy()

    out["meta"] = np.asarray([B, N, F, C, HEADS, FS, CTX_DIM, CTX_LEN,
                              IP_TOKENS, BASE_DIM, EMB_DIM], np.int64)

    dest = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                        "ref_mini.npz")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    np.savez_compressed(dest, **out)
    for k in sorted(out):
        if k.startswith("out:"):
            v = out[k]
            print(k, v.shape, "mean", float(v.mean()), "std", float(v.std()))
    print("wrote", dest)


if __name__ == "__main__":
    main()
