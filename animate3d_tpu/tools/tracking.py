"""Foreground segmentation of the generated multi-view video.

Parity target: tools/tracking_anything/custom_inference.py — the reference
seeds XMem with the alpha of each view's static rendering and propagates
masks through the 16 generated frames, writing RGBA (:57-130). SAM/XMem are
GPU checkpoints fetched from the network; on a zero-egress TPU pod we provide:

  * a pluggable ``segment_video(frames, template_mask, backend=...)`` API —
    drop in a SAM/XMem (or SAM-2) backend when weights are available;
  * ``"propagation"`` (default): weights-free XMem-style tracker — a memory
    bank of (appearance-feature, mask) pairs with a space-local affinity
    readout, color-model refinement, and morphological cleanup; handles
    arbitrary backgrounds;
  * ``"chroma"`` (fallback): background-distance thresholding — fast, only
    valid for the uniform near-white backgrounds of default MV-VDM renders.
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


def _propagation_features(img: np.ndarray, sigma: float = 1.5) -> np.ndarray:
    """(H, W, 3) → (H, W, 9) appearance descriptor: color + blurred color +
    gradient magnitude per channel (hand-crafted stand-in for XMem's learned
    key encoder)."""
    from scipy import ndimage

    img = img.astype(np.float32)
    blur = ndimage.gaussian_filter(img, (sigma, sigma, 0))
    gx = ndimage.sobel(blur, axis=1)
    gy = ndimage.sobel(blur, axis=0)
    grad = np.sqrt(gx * gx + gy * gy)
    return np.concatenate([img, blur, grad], axis=-1)


def _window_readout(fq: np.ndarray, memory, window: int, tau: float):
    """Space-local memory attention: for each query pixel, soft-attend to
    memory pixels within a (2w+1)² window (XMem's affinity readout restricted
    to a local window, valid for the small frame-to-frame motion of 16-frame
    clips). Returns the propagated soft mask (H, W)."""
    h, w_, c = fq.shape
    num = np.zeros((h, w_), np.float32)
    den = np.zeros((h, w_), np.float32)
    offsets = [(dy, dx) for dy in range(-window, window + 1)
               for dx in range(-window, window + 1)]
    for fm, mm in memory:
        for dy, dx in offsets:
            fs = np.roll(fm, (dy, dx), axis=(0, 1))
            ms = np.roll(mm, (dy, dx), axis=(0, 1))
            d2 = np.mean((fq - fs) ** 2, axis=-1)
            aff = np.exp(-d2 / tau)
            # rolled-in borders are invalid
            if dy > 0:
                aff[:dy] = 0
            elif dy < 0:
                aff[dy:] = 0
            if dx > 0:
                aff[:, :dx] = 0
            elif dx < 0:
                aff[:, dx:] = 0
            num += aff * ms
            den += aff
    return num / (den + 1e-8)


@register_backend("propagation")
def _propagation_backend(frames: np.ndarray, template_mask: np.ndarray,
                         window: int = 4, tau: float = 0.02,
                         memory_every: int = 4, max_memory: int = 4,
                         ) -> np.ndarray:
    """XMem-style memory propagation (reference custom_inference.py:57-130 /
    tracker/base_tracker.py structure, weights-free):

      * a memory bank of (appearance features, mask) pairs — the template
        (the clean static render whose alpha seeds the track) is permanent,
        recent frames rotate through a small working memory;
      * per frame, a space-local affinity readout propagates mask values from
        memory to query pixels;
      * a per-frame foreground/background color model sharpens the uncertain
        band, then morphological closing + hole filling (the reference's mask
        post-processing).

    Works on arbitrary backgrounds — the ``chroma`` backend's white-background
    assumption is not used anywhere."""
    from scipy import ndimage

    template_mask = (template_mask > 0.5).astype(np.float32)
    feats0 = _propagation_features(frames[0])
    anchor = (feats0, template_mask)
    working: list = []
    masks = []
    prev = template_mask
    last = anchor  # the previous frame is always in memory (XMem working set)
    for i, frame in enumerate(frames):
        fq = _propagation_features(frame) if i else feats0
        memory = [anchor] + working[-max_memory:] + ([last] if i else [])
        soft = _window_readout(fq, memory, window, tau)

        # color-model refinement on the uncertain band
        fg = soft > 0.7
        bg = soft < 0.3
        if fg.sum() > 64 and bg.sum() > 64:
            mu_fg = frame[fg].mean(axis=0)
            mu_bg = frame[bg].mean(axis=0)
            d_fg = np.linalg.norm(frame - mu_fg, axis=-1)
            d_bg = np.linalg.norm(frame - mu_bg, axis=-1)
            color_vote = (d_bg > d_fg).astype(np.float32)
            band = ~fg & ~bg
            soft = np.where(band, 0.5 * soft + 0.5 * color_vote, soft)

        binary = soft > 0.5
        binary = ndimage.binary_closing(binary, iterations=2)
        binary = ndimage.binary_fill_holes(binary)
        # drop specks with no support from the previous mask
        labels, n = ndimage.label(binary)
        keep = np.zeros_like(binary)
        prev_b = prev > 0.5
        for comp in range(1, n + 1):
            comp_mask = labels == comp
            if (comp_mask & prev_b).sum() > 0 or comp_mask.sum() > 0.25 * prev_b.sum():
                keep |= comp_mask
        m = keep.astype(np.float32)
        masks.append(m)
        prev = m
        last = (fq, m)
        if i and i % memory_every == 0:
            working.append(last)
    return np.stack(masks)


@register_backend("xmem")
def _xmem_backend(frames: np.ndarray, template_mask: np.ndarray,
                  weights: Optional[str] = None, **kw) -> np.ndarray:
    """Learned XMem tracker (architecture-complete torch reimplementation,
    tools/xmem_arch.py — state-dict compatible with the released
    XMem-s012.pth the reference downloads, custom_inference.py:62-83).
    Weights come from ``weights=`` or $XMEM_WEIGHTS; without a checkpoint
    this backend refuses rather than running random-init garbage."""
    from animate3d_tpu.tools.xmem_arch import load_xmem, xmem_segment_video

    path = weights or os.environ.get("XMEM_WEIGHTS", "")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "xmem backend needs a checkpoint: pass weights= or set "
            "$XMEM_WEIGHTS to XMem-s012.pth (zero-egress environments can "
            "use backend='propagation' instead)")
    net = load_xmem(path)
    return xmem_segment_video(frames, (template_mask > 0.5).astype(np.float32),
                              net, **kw)


def segment_video(frames: np.ndarray, template_mask: np.ndarray,
                  backend: str = "propagation", **kw) -> np.ndarray:
    if backend not in _BACKENDS:
        raise KeyError(f"Unknown segmentation backend {backend!r}; "
                       f"available: {sorted(_BACKENDS)}")
    return _BACKENDS[backend](frames, template_mask, **kw)


def run(frames_dir: str, template_dir: str, output_dir: str,
        n_views: int = 4, backend: str = "propagation") -> None:
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
    parser.add_argument("--backend", default="propagation")
    args = parser.parse_args()
    run(args.frames_dir, args.template_dir, args.output_dir, args.n_views,
        args.backend)


if __name__ == "__main__":
    main()
