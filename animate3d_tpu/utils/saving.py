"""Artifact saving: images, multi-view GIFs, mp4s, trajectories, meshes.

Parity targets:
  * export_to_gif_mv — horizontal 4-view concat GIF
    (animatediff/utils/util.py:190-220);
  * save_videos_grid (util.py:176-188);
  * SaverMixin's image grids / img-sequence→mp4 / json / npy savers
    (threestudio/utils/saving.py:22-652, used subset);
  * per-view/per-frame RGBA pngs + means3D trajectory npys from test_step
    (systems/animate3d.py:427-471).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import numpy as np


def _to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    return img


def save_image(path: str, img: np.ndarray) -> str:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(_to_uint8(img)).save(path)
    return path


def save_rgba_image(path: str, rgb: np.ndarray, alpha: np.ndarray) -> str:
    """RGBA png from rgb (H,W,3) + alpha (H,W) in [0,1]."""
    rgba = np.concatenate([_to_uint8(rgb), _to_uint8(alpha)[..., None]], axis=-1)
    return save_image(path, rgba)


def export_to_gif_mv(frames: np.ndarray, path: str, fps: int = 8) -> str:
    """(N_view, F, H, W, 3) video → GIF with views concatenated horizontally
    (util.py:190-220)."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n, f = frames.shape[:2]
    pil_frames = []
    for fi in range(f):
        row = np.concatenate([_to_uint8(frames[v, fi]) for v in range(n)], axis=1)
        pil_frames.append(Image.fromarray(row))
    pil_frames[0].save(path, save_all=True, append_images=pil_frames[1:],
                       duration=int(1000 / fps), loop=0)
    return path


def save_video_mp4(frames: np.ndarray, path: str, fps: int = 8) -> str:
    """(F, H, W, 3) → mp4 (SaverMixin img-sequence→mp4 parity); falls back to
    GIF if no ffmpeg-capable imageio writer is present."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    import imageio

    try:
        writer = imageio.get_writer(path, fps=fps)
        for fr in frames:
            writer.append_data(_to_uint8(fr))
        writer.close()
        return path
    except Exception:
        alt = os.path.splitext(path)[0] + ".gif"
        export_to_gif_mv(frames[None], alt, fps=fps)
        return alt


def save_videos_grid(videos: np.ndarray, path: str, n_rows: int = 4,
                     fps: int = 8) -> str:
    """(B, F, H, W, 3) → grid GIF (util.py:176-188)."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    b, f = videos.shape[:2]
    cols = int(np.ceil(b / n_rows))
    pil_frames = []
    for fi in range(f):
        rows = []
        for r in range(n_rows):
            tiles = [
                _to_uint8(videos[r * cols + c, fi]) if r * cols + c < b
                else np.zeros_like(_to_uint8(videos[0, fi]))
                for c in range(cols)
            ]
            rows.append(np.concatenate(tiles, axis=1))
        pil_frames.append(Image.fromarray(np.concatenate(rows, axis=0)))
    pil_frames[0].save(path, save_all=True, append_images=pil_frames[1:],
                       duration=int(1000 / fps), loop=0)
    return path


def save_trajectory(path: str, means3d: np.ndarray) -> str:
    """Per-frame gaussian positions npy (mesh-animation export input,
    animate3d.py:464-471)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.save(path, np.asarray(means3d))
    return path


def save_json(path: str, data) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(data, f, indent=2)
    return path


class Saver:
    """Trial-dir scoped saver (SaverMixin's get_save_path semantics)."""

    def __init__(self, save_dir: str):
        self.save_dir = save_dir

    def path(self, name: str) -> str:
        p = os.path.join(self.save_dir, name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        return p

    def image(self, name, img):
        return save_image(self.path(name), img)

    def rgba(self, name, rgb, alpha):
        return save_rgba_image(self.path(name), rgb, alpha)

    def gif_mv(self, name, frames, fps=8):
        return export_to_gif_mv(frames, self.path(name), fps)

    def mp4(self, name, frames, fps=8):
        return save_video_mp4(frames, self.path(name), fps)

    def trajectory(self, name, means3d):
        return save_trajectory(self.path(name), means3d)

    def json(self, name, data):
        return save_json(self.path(name), data)
