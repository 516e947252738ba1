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
