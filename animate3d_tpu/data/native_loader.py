"""ctypes binding for the native host-side loader (native/mvloader.cpp).

Parallel PNG/JPEG decode → bilinear resize → [-1, 1] float32, the TPU-build
replacement for the reference's decord C++ decoder + 32 DataLoader workers
(train.py:391-410). The C call releases the GIL, so one Python prefetch
thread overlaps a whole batch decode with device steps.

Falls back gracefully (returns None) when the shared library is absent and
cannot be built; callers then use the PIL/imageio path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libmvloader.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        # best-effort build from the checked-in source
        src_dir = os.path.join(os.path.dirname(__file__), "..", "..", "native")
        if os.path.isdir(src_dir):
            try:
                subprocess.run(["make", "-C", src_dir], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.mv_decode_images.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.mv_decode_images.restype = ctypes.c_int
    if hasattr(lib, "mv_decode_video"):
        lib.mv_decode_video.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.mv_decode_video.restype = ctypes.c_int
        lib.mv_encode_video.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.mv_encode_video.restype = ctypes.c_int
        lib.mv_video_frame_count.argtypes = [ctypes.c_char_p]
        lib.mv_video_frame_count.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def decode_images(paths: List[str], size: int,
                  n_threads: Optional[int] = None) -> Optional[np.ndarray]:
    """→ (len(paths), size, size, 3) float32 in [-1, 1], or None when the
    native library is unavailable. Failed files decode to zeros."""
    lib = _load()
    if lib is None or not paths:
        return None
    n_threads = n_threads or min(len(paths), os.cpu_count() or 1)
    out = np.empty((len(paths), size, size, 3), np.float32)
    joined = "\n".join(paths).encode()
    n_ok = lib.mv_decode_images(
        joined, len(paths), size, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if n_ok < len(paths):
        return None  # let the caller fall back (and surface the bad file)
    return out


def decode_video(path: str, indices, size: int) -> Optional[np.ndarray]:
    """Decode container-format (mp4 etc.) frames at ``indices`` via
    libavformat/libavcodec — the decord ``VideoReader.get_batch`` equivalent
    (reference animatediff/data/dataset.py:61-65).

    → (len(indices), size, size, 3) float32 in [-1, 1]; indices past the
    clip end clamp to the last frame. None when the native library is
    unavailable or the file cannot be decoded (caller falls back)."""
    lib = _load()
    if lib is None or not hasattr(lib, "mv_decode_video"):
        return None
    idx = np.ascontiguousarray(np.asarray(indices, np.int32))
    out = np.zeros((len(idx), size, size, 3), np.float32)
    filled = lib.mv_decode_video(
        path.encode(), idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(idx), size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if filled < len(idx):
        return None
    return out


def video_frame_count(path: str) -> Optional[int]:
    """Frames in a video container (``len(VideoReader)`` parity). None when
    the native library is unavailable or the file cannot be opened."""
    lib = _load()
    if lib is None or not hasattr(lib, "mv_video_frame_count"):
        return None
    n = lib.mv_video_frame_count(path.encode())
    return None if n < 0 else int(n)


def encode_video(path: str, frames: np.ndarray, fps: int = 8) -> bool:
    """Encode (F, H, W, 3) uint8 RGB frames to an MP4 (mpeg4). Test/tooling
    helper so clip round-trips need no binary fixtures."""
    lib = _load()
    if lib is None or not hasattr(lib, "mv_encode_video"):
        return False
    frames = np.ascontiguousarray(frames, np.uint8)
    f, h, w, c = frames.shape
    assert c == 3, frames.shape
    rc = lib.mv_encode_video(
        path.encode(), frames.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        f, h, w, fps)
    return rc == 0
