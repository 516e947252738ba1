"""Foreground segmentation of the generated multi-view video.

Parity target: tools/tracking_anything/custom_inference.py — the reference
seeds XMem with the alpha of each view's static rendering and propagates
masks through the 16 generated frames, writing RGBA (:57-130). SAM/XMem are
GPU checkpoints fetched from the network; on a zero-egress TPU pod we provide:

  * a pluggable ``segment_video(frames, template_mask, backend=...)`` API —
    drop in a SAM/XMem (or SAM-2) backend when weights are available;
  * a built-in ``"chroma"`` backend: the MV-VDM conditioning renders have a
    uniform white background, so background-distance thresholding seeded by
    the template mask + connected-component filtering recovers the object
    mask well for this pipeline's inputs.
"""

from __future__ import annotations

import argparse
import os
from typing import Callable, Dict, Optional

import numpy as np

_BACKENDS: Dict[str, Callable] = {}


def register_backend(name: str):
    def deco(fn):
        _BACKENDS[name] = fn
        return fn

    return deco


@register_backend("chroma")
def _chroma_backend(frames: np.ndarray, template_mask: np.ndarray,
                    bg_color=(1.0, 1.0, 1.0), threshold: float = 0.12
                    ) -> np.ndarray:
    """(F, H, W, 3) in [0,1] + (H, W) template → (F, H, W) float masks."""
    from scipy import ndimage

    bg = np.asarray(bg_color, np.float32)
    masks = []
    prev = template_mask > 0.5
    for f in frames:
        dist = np.linalg.norm(f - bg, axis=-1)
        raw = dist > threshold
        # keep components overlapping the previous frame's mask (propagation)
        labels, n = ndimage.label(raw)
        keep = np.zeros_like(raw)
        for comp in range(1, n + 1):
            comp_mask = labels == comp
            if (comp_mask & prev).sum() > 0 or comp_mask.sum() > 0.25 * prev.sum():
                keep |= comp_mask
        keep = ndimage.binary_closing(keep, iterations=2)
        keep = ndimage.binary_fill_holes(keep)
        masks.append(keep.astype(np.float32))
        prev = keep
    return np.stack(masks)


def segment_video(frames: np.ndarray, template_mask: np.ndarray,
                  backend: str = "chroma", **kw) -> np.ndarray:
    if backend not in _BACKENDS:
        raise KeyError(f"Unknown segmentation backend {backend!r}; "
                       f"available: {sorted(_BACKENDS)}")
    return _BACKENDS[backend](frames, template_mask, **kw)


def run(frames_dir: str, template_dir: str, output_dir: str,
        n_views: int = 4, backend: str = "chroma") -> None:
    """frames_dir: split_gif output ({view·F + frame}.png); template_dir: the
    static 4-view RGBA renders ({view}.png); writes RGBA to output_dir with
    the same numbering (custom_inference.py flow)."""
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    names = sorted((n for n in os.listdir(frames_dir) if n.endswith(".png")),
                   key=lambda x: int(x[:-4]))
    n_frames = len(names) // n_views
    for view in range(n_views):
        tmpl = np.asarray(
            Image.open(os.path.join(template_dir, f"{view}.png")).convert("RGBA"),
            np.float32) / 255.0
        frames = []
        for fi in range(n_frames):
            p = os.path.join(frames_dir, names[view * n_frames + fi])
            frames.append(np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0)
        frames = np.stack(frames)
        if tmpl.shape[:2] != frames.shape[1:3]:
            tm = Image.fromarray((tmpl[..., 3] * 255).astype(np.uint8)).resize(
                (frames.shape[2], frames.shape[1]))
            template_mask = np.asarray(tm, np.float32) / 255.0
        else:
            template_mask = tmpl[..., 3]
        masks = segment_video(frames, template_mask, backend=backend)
        for fi in range(n_frames):
            rgba = np.concatenate(
                [(frames[fi] * 255).astype(np.uint8),
                 (masks[fi] * 255).astype(np.uint8)[..., None]], axis=-1)
            Image.fromarray(rgba, "RGBA").save(
                os.path.join(output_dir, names[view * n_frames + fi]))
    print(f"segmented {n_views * n_frames} frames → {output_dir}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames_dir", required=True)
    parser.add_argument("--template_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--n_views", type=int, default=4)
    parser.add_argument("--backend", default="chroma")
    args = parser.parse_args()
    run(args.frames_dir, args.template_dir, args.output_dir, args.n_views,
        args.backend)


if __name__ == "__main__":
    main()
