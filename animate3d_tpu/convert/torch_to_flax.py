"""Torch → Flax weight conversion for every pretrained artifact the reference
loads (SURVEY.md §2.5):

  * ``yanqinJiang/mvdream-sd1.5-diffusers`` UNet (incl. camera_embedding),
    VAE, CLIP text encoder;
  * ``guoyww/animatediff-motion-adapter-v1-5-2`` MotionAdapter;
  * ``h94/IP-Adapter`` ip-adapter_sd15.bin + CLIP ViT-H image encoder;
  * ``animate3d_motion_modules.ckpt`` (trained motion modules + i2v/spatial
    adapters + alpha blenders; loaded strict=False with the key-count check
    mirrored from inference.py:214-223).

Tensors convert by kind:
  linear weight (O,I) → kernel (I,O);   conv weight (O,I,kh,kw) → (kh,kw,I,O);
  norm weight/bias → scale/bias;        embeddings copied as-is.

Key-name translation is rule-based: the Flax module tree was deliberately
named so that diffusers paths map by joining block segments with underscores
(e.g. ``down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_q`` →
``down_blocks_0_attentions_1 / transformer_blocks_0 / attn1 / to_q``), and
attention-processor adapter keys (``...attn1.processor.to_q_i2v``) land in
the same attention module.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load / safetensors → flat {name: np.ndarray}."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: _to_numpy(v) for k, v in sd.items()}


# ---------------------------------------------------------------------------
# path translation
# ---------------------------------------------------------------------------

# segments that merge with their numeric index into one flax module name
_BLOCK_GROUPS = (
    "down_blocks", "up_blocks", "resnets", "attentions", "motion_modules",
    "downsamplers", "upsamplers", "layers", "image_projection_layers",
)


def translate_torch_path(name: str) -> Tuple[List[str], str]:
    """Flat torch key → (flax path segments, leaf name)."""
    name = name.replace(".processor.", ".")  # adapters live in the attention
    parts = name.split(".")
    leaf = parts.pop()  # weight | bias | mix_factor | ...
    out: List[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        nxt = parts[i + 1] if i + 1 < len(parts) else None
        if p in _BLOCK_GROUPS and nxt is not None and nxt.isdigit():
            # chains like down_blocks.0.resnets.1 merge into one name
            merged = f"{p}_{nxt}"
            i += 2
            while (i + 1 < len(parts) and parts[i] in _BLOCK_GROUPS
                   and parts[i + 1].isdigit()):
                merged += f"_{parts[i]}_{parts[i + 1]}"
                i += 2
            out.append(merged)
            continue
        if p == "mid_block" and nxt in ("resnets", "attentions", "motion_modules"):
            out.append(f"mid_block_{nxt}_{parts[i + 2]}")
            i += 3
            continue
        if p == "transformer_blocks" and nxt is not None and nxt.isdigit():
            out.append(f"transformer_blocks_{nxt}")
            i += 2
            continue
        if p == "to_out" and nxt == "0":
            out.append("to_out_0")
            i += 2
            continue
        if p == "ff" and nxt == "net":
            # ff.net.0.proj → ff/net_0_proj ; ff.net.2 → ff/net_2
            if parts[i + 2] == "0":
                out.extend(["ff", "net_0_proj"])
                i += 4  # skip ff net 0 proj
            else:
                out.extend(["ff", f"net_{parts[i + 2]}"])
                i += 3
            continue
        if p in ("to_k_ip", "to_v_ip") and nxt == "0":
            out.append(p)  # reference wraps these in a ModuleList of size 1
            i += 2
            continue
        if p == "encoder_hid_proj" and nxt == "image_projection_layers":
            out.append(f"encoder_hid_proj_{parts[i + 2]}")
            i += 3
            continue
        if p == "mlp" and nxt in ("fc1", "fc2"):
            out.append(f"mlp_{nxt}")
            i += 2
            continue
        if p in ("text_model", "vision_model", "embeddings", "encoder", "net"):
            i += 1  # structural wrappers flattened away
            continue
        out.append(p)
        i += 1
    return out, leaf


_NORM_MODULES = re.compile(
    r"(norm|layer_norm|group_norm|conv_norm_out|pre_layrnorm|post_layernorm"
    r"|final_layer_norm)")


def convert_leaf(path: List[str], leaf: str, value: np.ndarray
                 ) -> Tuple[List[str], np.ndarray]:
    """(path, leaf, tensor) → (full flax path, converted tensor)."""
    module = path[-1] if path else ""
    if leaf == "weight":
        if value.ndim == 4:  # conv OIHW → HWIO
            return path + ["kernel"], value.transpose(2, 3, 1, 0)
        if value.ndim == 2:
            if module in ("token_embedding",):  # nn.Embed
                return path + ["embedding"], value
            if module in ("position_embedding",):  # raw param table
                return path, value
            if module in ("row_embed", "col_embed"):
                # LearnedPositionalEncoding2D tables (embeddings.py:119-125)
                # are raw (num_embed, num_feats) params in the flax module
                return path, value
            return path + ["kernel"], value.T  # linear
        if value.ndim == 1:  # norm scale
            return path + ["scale"], value
    if leaf == "bias":
        return path + ["bias"], value
    # raw params (mix_factor, class_embedding, ...)
    return path + [leaf] if leaf not in ("weight",) else path, value


def torch_to_flax_params(state_dict: Dict[str, np.ndarray],
                         prefix_strip: Tuple[str, ...] = ("module.",),
                         ) -> Dict[str, Any]:
    """Flat torch dict → nested flax params dict (without the 'params' root)."""
    tree: Dict[str, Any] = {}
    for name, value in state_dict.items():
        for p in prefix_strip:
            if name.startswith(p):
                name = name[len(p):]
        path, leaf = translate_torch_path(name)
        # special-case renames
        if path and path[-1] == "position_embedding" and leaf == "weight":
            full, v = path, value
        elif path and path[-1] == "class_embedding":
            full, v = path, value
        else:
            full, v = convert_leaf(path, leaf, value)
        node = tree
        for k in full[:-1]:
            node = node.setdefault(k, {})
        node[full[-1]] = v
    return tree


def merge_params(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for k, v in override.items():
        out[k] = merge_params(out[k], v) if (
            k in out and isinstance(out[k], dict) and isinstance(v, dict)) else v
    return out


def flatten_paths(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        name = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(flatten_paths(v, name))
        else:
            flat[name] = v
    return flat


def apply_to_flax_params(flax_params: Dict[str, Any],
                         converted: Dict[str, Any],
                         strict: bool = False) -> Tuple[Dict[str, Any], List[str], List[str]]:
    """Graft converted tensors onto an initialized flax params tree.

    Returns (new_params, missing_keys, unexpected_keys) — the strict=False
    load semantics of inference.py:219-223 (missing = flax params with no
    converted tensor; unexpected = converted tensors with no flax home)."""
    import jax

    target = flax_params["params"] if "params" in flax_params else flax_params
    flat_target = flatten_paths(target)
    flat_src = flatten_paths(converted)

    missing = sorted(set(flat_target) - set(flat_src))
    unexpected = sorted(set(flat_src) - set(flat_target))
    if strict and (missing or unexpected):
        raise ValueError(f"missing={missing[:10]}... unexpected={unexpected[:10]}...")

    new_flat = {}
    for k, tgt in flat_target.items():
        if k in flat_src:
            src = np.asarray(flat_src[k])
            assert src.shape == tuple(tgt.shape), (k, src.shape, tgt.shape)
            new_flat[k] = src.astype(np.asarray(tgt).dtype)
        else:
            new_flat[k] = tgt

    # rebuild the nested tree
    out: Dict[str, Any] = {}
    for k, v in new_flat.items():
        node = out
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return ({"params": out} if "params" in flax_params else out), missing, unexpected


def adapter_init_parity(flax_params: Dict[str, Any]) -> Dict[str, Any]:
    """Install-time adapter initialization (reference inference.py:160-168).

    In every spatial attn1 with the MVDream-I2V branch, ``to_q_i2v`` starts as
    a copy of the frozen ``to_q`` (``to_out_i2v`` is zero-initialized inside
    the module, so the branch is an exact no-op at init either way — the copy
    matters for how the branch *trains*). Motion-module adapters
    (``to_*_sp``/``to_*_i2v`` of the spatiotemporal processor) keep their
    fresh init, matching the reference's processor __init__
    (attention_processor.py:490-540)."""

    def walk(node, path=()):
        if not isinstance(node, dict):
            return node
        out = {k: walk(v, path + (k,)) for k, v in node.items()}
        if ("to_q" in out and "to_q_i2v" in out
                and not any("motion_modules" in str(p) for p in path)):
            q_k = out["to_q"].get("kernel")
            qi = out["to_q_i2v"]
            if (q_k is not None and "kernel" in qi
                    and tuple(q_k.shape) == tuple(qi["kernel"].shape)):
                out["to_q_i2v"] = dict(qi, kernel=q_k)
        return out

    return walk(flax_params)


def load_animate3d_motion_checkpoint(
    flax_params: Dict[str, Any], ckpt_path: str
) -> Tuple[Dict[str, Any], int]:
    """Load the released motion-modules checkpoint onto UNet params.

    Mirrors inference.py:214-223: strict=False; asserts the missing keys are
    exactly the frozen base weights (0 when the checkpoint holds the full
    model). Returns (params, n_missing)."""
    sd = load_torch_state_dict(ckpt_path)
    converted = torch_to_flax_params(sd)
    params, missing, unexpected = apply_to_flax_params(flax_params, converted)
    if unexpected:
        raise ValueError(f"checkpoint has {len(unexpected)} unknown keys, "
                         f"e.g. {unexpected[:5]} — file is broken or layout drifted")
    trained_markers = ("motion_modules", "_i2v", "_sp", "alpha_blender")
    for k in missing:
        if any(m in k for m in trained_markers):
            raise ValueError(f"trained key {k} missing from checkpoint")
    return params, len(missing)
