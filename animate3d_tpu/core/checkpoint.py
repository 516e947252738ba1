"""Checkpointing (orbax) + resume helpers.

Parity targets (SURVEY.md §5 checkpoint/resume):
  * MV-VDM trainer: monolithic {step, params, opt_state} with periodic +
    ``latest`` checkpoints and find_latest_checkpoint (train.py:620-644,
    animatediff/utils/util.py:223-244), motion-modules-only export
    (unet_motion_mv_model.py:404-437);
  * 4D stage: every_n_train_steps checkpoints of (deform params, opt state,
    step), reload for --test/--export (launch.py:238-260), stage chaining
    (refine loads the recon checkpoint via system.weights).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(ckpt_dir: str, step: int, payload: Dict[str, Any],
                    keep: Optional[int] = None) -> str:
    """Save a pytree payload under ckpt_dir/step_{step}."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if keep is not None:
        steps = sorted(list_checkpoint_steps(ckpt_dir))
        for s in steps[:-keep]:
            import shutil

            shutil.rmtree(os.path.join(ckpt_dir, f"step_{s}"), ignore_errors=True)
    return path


def list_checkpoint_steps(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def find_latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Latest step_* path (util.py:223-244 parity)."""
    steps = list_checkpoint_steps(ckpt_dir)
    if not steps:
        return None
    return os.path.join(ckpt_dir, f"step_{steps[-1]}")


def restore_checkpoint(path: str, target: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the structure of ``target`` (shapes/dtypes template)."""
    ocp = _ocp()
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)


def restore_checkpoint_raw(path: str) -> Dict[str, Any]:
    """Restore without a target template (structure read from disk). Used for
    partial loads (e.g. stage chaining takes only ``params`` regardless of the
    saved optimizer state's structure)."""
    ocp = _ocp()
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def load_flax_bundle(bundle_dir: str, templates: Dict[str, Any]) -> Dict[str, Any]:
    """Load a converted-weights bundle (scripts/convert_weights.py layout:
    ``bundle_dir/{unet,vae,text_encoder,image_encoder}/step_*``).

    ``templates`` maps subdir name → initialized params (the restore shape/
    dtype template). Returns only the subtrees found on disk, so callers can
    fall back per-component. Mirrors the reference's from_pretrained loads
    (inference.py:61-87)."""
    out: Dict[str, Any] = {}
    for name, tpl in templates.items():
        latest = find_latest_checkpoint(os.path.join(bundle_dir, name))
        if latest:
            out[name] = restore_checkpoint(latest, tpl)
    return out


def graft_params(template: Dict[str, Any], subset: Dict[str, Any],
                 _path: str = "") -> tuple:
    """Deep-merge a partial param tree (e.g. a motion-modules-only export)
    onto a full template; returns (merged, n_leaves_grafted). Every subset
    leaf must exist in the template with the same shape — a mismatch means
    the checkpoint belongs to a different architecture."""
    import jax.numpy as jnp
    import numpy as np

    merged = dict(template)
    n = 0
    for k, v in subset.items():
        where = f"{_path}/{k}"
        if k not in merged:
            raise KeyError(f"graft_params: {where!r} not in the model tree")
        if isinstance(v, dict):
            merged[k], sub_n = graft_params(merged[k], v, where)
            n += sub_n
        else:
            tpl = merged[k]
            if tuple(np.shape(tpl)) != tuple(np.shape(v)):
                raise ValueError(
                    f"graft_params: shape mismatch at {where!r}: "
                    f"{np.shape(v)} vs model {np.shape(tpl)}")
            merged[k] = jnp.asarray(v, tpl.dtype)
            n += 1
    return merged, n


def extract_motion_modules(params: Dict[str, Any]) -> Dict[str, Any]:
    """Subtree of trained keys only (motion modules + adapters) — the
    release-checkpoint export (save_motion_modules parity)."""
    markers = ("motion_modules", "to_q_i2v", "to_k_i2v", "to_v_i2v",
               "to_out_i2v", "to_q_sp", "to_k_sp", "to_v_sp", "to_out_sp",
               "alpha_blender")

    def walk(node, path=()):
        out = {}
        for k, v in node.items():
            p = path + (k,)
            if isinstance(v, dict):
                sub = walk(v, p)
                if sub:
                    out[k] = sub
            elif any(m in seg for seg in p for m in markers):
                out[k] = v
        return out

    return walk(params)
