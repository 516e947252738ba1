"""Native C++ loader (native/mvloader.cpp) vs the PIL path."""

import os

import numpy as np
import pytest
from PIL import Image

from animate3d_tpu.data import native_loader


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, ext in enumerate(["png", "jpg", "png"]):
        arr = rng.integers(0, 255, size=(48, 48, 3), dtype=np.uint8)
        p = str(root / f"f{i}.{ext}")
        Image.fromarray(arr).save(p, quality=95)
        paths.append((p, arr))
    return paths


def test_native_decode_matches_pil(images):
    if not native_loader.available():
        pytest.skip("native loader not built (toolchain missing)")
    paths = [p for p, _ in images]
    out = native_loader.decode_images(paths, size=48)
    assert out is not None and out.shape == (3, 48, 48, 3)
    for i, (p, arr) in enumerate(images):
        ref = np.asarray(Image.open(p).convert("RGB"), np.float32) / 127.5 - 1.0
        tol = 1e-6 if p.endswith("png") else 0.2  # jpeg round-trip
        assert np.abs(out[i] - ref).max() <= tol, (p, np.abs(out[i] - ref).max())


def test_native_downscale_is_box_average(images):
    """Downscale is an antialiased area average (exact for integer factors)."""
    if not native_loader.available():
        pytest.skip("native loader not built")
    p, arr = images[0]
    out = native_loader.decode_images([p], size=24)[0]
    ref = arr.reshape(24, 2, 24, 2, 3).astype(np.float64).mean((1, 3))
    ref = (ref / 127.5 - 1.0).astype(np.float32)
    assert np.abs(out - ref).max() < 1e-4


def _flat_frames(n, h, w, seed=0):
    """Per-frame constant-color frames (codec-friendly: lossy mpeg4 keeps
    flat blocks nearly exact) with distinct levels per frame."""
    levels = np.linspace(30, 220, n).astype(np.uint8)
    frames = np.zeros((n, h, w, 3), np.uint8)
    for i, v in enumerate(levels):
        frames[i] = [v, 255 - v, (int(v) * 2) % 256]
    return frames, levels


def test_video_encode_decode_roundtrip(tmp_path):
    """mv_encode_video → mv_decode_video round-trips frame identity, order,
    index clamping, and the [-1,1] normalization (decord get_batch parity)."""
    if not native_loader.available():
        pytest.skip("native loader not built")
    p = str(tmp_path / "clip.mp4")
    frames, levels = _flat_frames(12, 32, 32)
    assert native_loader.encode_video(p, frames, fps=8)

    idx = [0, 3, 3, 11, 50]  # duplicates + past-the-end clamp
    out = native_loader.decode_video(p, idx, size=32)
    assert out is not None and out.shape == (5, 32, 32, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0
    want = [0, 3, 3, 11, 11]
    for slot, fi in enumerate(want):
        ref = frames[fi].astype(np.float32) / 127.5 - 1.0
        err = np.abs(out[slot] - ref).mean()
        assert err < 0.08, (slot, fi, err)  # lossy codec tolerance
    # frames are distinct: slot 0 and slot 3 must differ clearly
    assert np.abs(out[0] - out[3]).mean() > 0.3


def test_video_decode_resizes(tmp_path):
    if not native_loader.available():
        pytest.skip("native loader not built")
    p = str(tmp_path / "clip.mp4")
    frames, _ = _flat_frames(4, 48, 48)
    assert native_loader.encode_video(p, frames, fps=8)
    out = native_loader.decode_video(p, [2], size=24)  # downscale
    assert out is not None and out.shape == (1, 24, 24, 3)
    ref = frames[2, ::2, ::2].astype(np.float32) / 127.5 - 1.0
    assert np.abs(out[0] - ref).mean() < 0.08


def test_decode_video_missing_file_returns_none():
    assert native_loader.decode_video("/nonexistent/clip.mp4", [0], 8) is None
    assert native_loader.video_frame_count("/nonexistent/clip.mp4") is None


def test_video_frame_count(tmp_path):
    if not native_loader.available():
        pytest.skip("native loader not built")
    p = str(tmp_path / "clip.mp4")
    frames, _ = _flat_frames(7, 32, 32)
    assert native_loader.encode_video(p, frames, fps=8)
    assert native_loader.video_frame_count(p) == 7


def test_dataset_decodes_mp4_natively(tmp_path):
    """An mp4 manifest item decodes through the native libavcodec path
    (reference MVideoDataset reads mp4 via decord, dataset.py:57-65)."""
    import json

    from animate3d_tpu.data.video_dataset import MVideoConfig, MVideoDataset

    if not native_loader.available():
        pytest.skip("native loader not built")
    frames, _ = _flat_frames(8, 32, 32)
    p = str(tmp_path / "v.mp4")
    assert native_loader.encode_video(p, frames, fps=8)
    (tmp_path / "manifest.json").write_text(json.dumps(
        [{"videos": ["v.mp4"] * 4, "caption": "mp4 clip"}]))
    ds = MVideoDataset(MVideoConfig(
        manifest_path=str(tmp_path / "manifest.json"), video_root=str(tmp_path),
        sample_size=32, sample_n_frames=4, total_frames=8, num_views=4), seed=0)
    item = ds[0]
    pv = item["pixel_values"]
    assert pv.shape == (4, 4, 32, 32, 3)
    # frames sampled at stride 2 are distinct constant-color planes
    assert np.abs(pv[0, 0] - pv[0, -1]).mean() > 0.3


def test_dataset_uses_native_for_image_sequences(tmp_path):
    """A directory-of-frames item decodes through the native path and matches
    the normalized layout the trainer expects."""
    import json

    from animate3d_tpu.data.video_dataset import MVideoConfig, MVideoDataset

    rng = np.random.default_rng(1)
    seq = tmp_path / "view0"
    seq.mkdir()
    for f in range(4):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
                        ).save(seq / f"{f:03d}.png")
    (tmp_path / "manifest.json").write_text(json.dumps(
        [{"videos": ["view0"] * 4, "caption": "seq"}]))
    ds = MVideoDataset(MVideoConfig(
        manifest_path=str(tmp_path / "manifest.json"), video_root=str(tmp_path),
        sample_size=16, sample_n_frames=2, total_frames=4, num_views=4), seed=0)
    item = ds[0]
    pv = item["pixel_values"]
    assert pv.shape == (4, 2, 16, 16, 3)
    assert pv.min() >= -1.0 and pv.max() <= 1.0
    assert np.abs(pv).max() > 0.2  # actually decoded, not zeros
