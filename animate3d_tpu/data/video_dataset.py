"""MV-Video training dataset (host-side).

Parity target: animatediff/data/dataset.py:18-95 (MVideoDataset) — a JSON
manifest mapping each item to 4 per-view MP4s + a caption (+ camera angles);
``sample_n_frames`` frames sampled at a random stride phase from the clip;
pixels normalized to [-1, 1]; cameras from the MVDream orbit ``get_camera``.

decord is replaced by imageio's ffmpeg reader (CPU decode feeding the device
pipeline); batches are plain numpy dicts consumed by the pjit train step.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional

import numpy as np

from animate3d_tpu.utils.camera import get_camera


@dataclass
class MVideoConfig:
    manifest_path: str = ""
    video_root: str = ""
    sample_size: int = 256
    sample_n_frames: int = 16
    total_frames: int = 48  # source clip length the stride phase samples from
    num_views: int = 4
    elevation: float = 15.0


def _frame_paths_for(path: str, indices: np.ndarray):
    """For image-sequence items (a directory of frames, or one still image),
    the per-index file list; None for container formats (mp4)."""
    if os.path.isdir(path):
        names = sorted(
            (n for n in os.listdir(path)
             if n.lower().endswith((".png", ".jpg", ".jpeg"))),
            key=lambda x: (len(x), x))
        if not names:
            return None
        return [os.path.join(path, names[min(int(i), len(names) - 1)])
                for i in indices]
    if path.lower().endswith((".png", ".jpg", ".jpeg")):
        return [path] * len(indices)
    return None


def _read_video_frames(path: str, indices: np.ndarray, size: int) -> np.ndarray:
    """(len(indices), size, size, 3) float32 in [-1, 1].

    Image sequences go through the native parallel decoder and container
    formats (mp4) through the native libavcodec decoder
    (data/native_loader.py); anything else falls back to imageio/PIL
    (the decord replacement, dataset.py:57-65)."""
    from animate3d_tpu.data import native_loader

    frame_files = _frame_paths_for(path, indices)
    tried_native_video = False
    if frame_files is not None:
        native = native_loader.decode_images(frame_files, size)
        if native is not None:
            return native
    elif os.path.isfile(path):
        # any container format (.mp4/.mov/.webm/.avi/...) goes through the
        # native libavformat demuxer first
        tried_native_video = True
        native = native_loader.decode_video(path, indices, size)
        if native is not None:
            return native

    import imageio.v3 as iio
    from PIL import Image

    if tried_native_video:
        # keyed on the native decode having been ATTEMPTED, not on a .mp4
        # suffix — .mov/.webm etc. get the same explanatory error instead of
        # an unrelated imageio plugin failure (ADVICE r2)
        try:
            frames = iio.imread(path, plugin="pyav")
        except Exception as e:
            raise RuntimeError(
                f"cannot decode video {path!r}: the native libavcodec "
                "decoder failed on it (corrupt/unsupported file?) and the "
                "pyav fallback is unavailable or also failed") from e
    else:
        frames = iio.imread(path)
    frames = np.asarray(frames)
    if frames.ndim == 3:
        frames = frames[None]
    out = []
    for i in indices:
        f = frames[min(int(i), len(frames) - 1)]
        if f.shape[0] != size or f.shape[1] != size:
            f = np.asarray(Image.fromarray(f).resize((size, size), Image.LANCZOS))
        out.append(f[..., :3])
    return np.stack(out).astype(np.float32) / 127.5 - 1.0


class MVideoDataset:
    """items: [{"videos": [4 paths], "caption": str, ("azimuth_start": deg)}]"""

    def __init__(self, cfg: MVideoConfig, seed: int = 0):
        self.cfg = cfg
        with open(cfg.manifest_path) as f:
            self.items: List[Dict] = json.load(f)
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        item = self.items[idx]
        # random stride phase over the source clip (dataset.py:57-65)
        stride = cfg.total_frames // cfg.sample_n_frames
        phase = int(self.rng.integers(0, max(stride, 1)))
        indices = phase + stride * np.arange(cfg.sample_n_frames)

        videos = []
        for rel in item["videos"][: cfg.num_views]:
            path = os.path.join(cfg.video_root, rel)
            videos.append(_read_video_frames(path, indices, cfg.sample_size))
        pixel_values = np.stack(videos)  # (N, F, H, W, 3) in [-1, 1]

        cameras = get_camera(cfg.num_views, elevation=cfg.elevation,
                             azimuth_start=item.get("azimuth_start", 0.0))
        return {
            "pixel_values": pixel_values,
            "cameras": cameras,  # (N, 16)
            "text": item.get("caption", ""),
        }

    def iterate(self, batch_size: int = 1, shuffle: bool = True
                ) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.items))
        if len(order) < batch_size:
            # small datasets: sample with replacement so dp-scaled batches
            # (train_batch_size × device_count) always fill
            while True:
                idxs = self.rng.choice(len(self.items), batch_size, replace=True)
                samples = [self[int(i)] for i in idxs]
                yield {
                    "pixel_values": np.stack([s["pixel_values"] for s in samples]),
                    "cameras": np.stack([s["cameras"] for s in samples]),
                    "text": [s["text"] for s in samples],
                }
        while True:
            if shuffle:
                self.rng.shuffle(order)
            for start in range(0, len(order) - batch_size + 1, batch_size):
                samples = [self[int(i)] for i in order[start:start + batch_size]]
                yield {
                    "pixel_values": np.stack([s["pixel_values"] for s in samples]),
                    "cameras": np.stack([s["cameras"] for s in samples]),
                    "text": [s["text"] for s in samples],
                }


class Prefetcher:
    """Background-thread prefetch over any batch iterator (the TPU-side
    stand-in for the reference's 32-worker DataLoader, train.py:391-410):
    the host decodes/assembles the next batches while the device runs the
    current step. The native video decoder releases the GIL, so one thread
    overlaps genuinely. ``depth`` bounds the queued batches."""

    def __init__(self, it, depth: int = 2):
        import queue
        import threading

        self._q = queue.Queue(maxsize=max(depth, 1))
        self._sentinel = object()
        self._err = None

        def worker():
            try:
                for item in it:
                    self._q.put(item)
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(self._sentinel)

        self._t = threading.Thread(target=worker, daemon=True,
                                   name="batch-prefetch")
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._sentinel:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
