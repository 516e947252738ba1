import json
import os
import struct

import numpy as np
import pytest


def test_split_gif_roundtrip(tmp_path):
    from PIL import Image
    from animate3d_tpu.tools.split_gif import split_gif

    n_views, n_frames, size = 4, 3, 16
    frames = []
    vals = np.arange(n_views * n_frames).reshape(n_views, n_frames) * 5 + 10
    for fi in range(n_frames):
        row = np.concatenate(
            [np.full((size, size, 3), vals[v, fi], np.uint8) for v in range(n_views)],
            axis=1)
        frames.append(Image.fromarray(row))
    gif = tmp_path / "mv.gif"
    frames[0].save(gif, save_all=True, append_images=frames[1:], duration=100)

    out = tmp_path / "split"
    n = split_gif(str(gif), str(out), n_views)
    assert n == n_frames
    for v in range(n_views):
        for fi in range(n_frames):
            img = np.asarray(Image.open(out / f"{v * n_frames + fi}.png"))
            # GIF palette quantization is lossless for uniform tiles
            assert abs(int(img[0, 0, 0]) - int(vals[v, fi])) <= 2


def test_process_rodin(tmp_path):
    from animate3d_tpu.tools.process_rodin import process

    obj = tmp_path / "a.obj"
    obj.write_text("mtllib base.mtl\nv 0 0 0\nf 1 1 1\n")
    process(str(obj), texture_name="tex.png")
    content = obj.read_text()
    assert "usemtl Material" in content
    assert content.index("mtllib") < content.index("usemtl")
    assert "map_Kd tex.png" in (tmp_path / "base.mtl").read_text()


def test_chroma_segmentation():
    from animate3d_tpu.tools.tracking import segment_video

    h = w = 32
    frames = np.ones((3, h, w, 3), np.float32)
    # a dark moving square
    for fi in range(3):
        frames[fi, 8 + fi: 16 + fi, 8:16] = 0.2
    template = np.zeros((h, w), np.float32)
    template[8:16, 8:16] = 1.0
    masks = segment_video(frames, template, backend="chroma")
    assert masks.shape == (3, h, w)
    assert masks[0, 10, 10] == 1.0
    assert masks[0, 2, 2] == 0.0
    assert masks[2, 17, 10] == 1.0  # tracked the moved square


def test_glb_morph_export(tmp_path):
    from animate3d_tpu.tools.export_animated_mesh import (
        write_glb_morph_animation,
        inverse_asset_transform,
    )
    from animate3d_tpu.gaussians.ply import asset_transform_matrix

    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.asarray([[0, 1, 2]], np.int32)
    frames = np.stack([verts, verts + [0, 0, 0.5]])
    out = write_glb_morph_animation(str(tmp_path / "anim.glb"), verts, faces, frames)

    raw = open(out, "rb").read()
    magic, version, total = struct.unpack("<III", raw[:12])
    assert magic == 0x46546C67 and version == 2 and total == len(raw)
    json_len = struct.unpack("<I", raw[12:16])[0]
    gltf = json.loads(raw[20:20 + json_len])
    assert len(gltf["meshes"][0]["primitives"][0]["targets"]) == 2
    assert gltf["animations"][0]["channels"][0]["target"]["path"] == "weights"

    # inverse transform undoes the load-time re-posing
    rot = asset_transform_matrix(90.0, 30.0)
    posed = np.einsum("ij,fnj->fni", rot, frames) * 2.0
    restored = inverse_asset_transform(posed, 90.0, 30.0, 2.0)
    np.testing.assert_allclose(restored, frames, atol=1e-5)


def test_trajectory_loader(tmp_path):
    from animate3d_tpu.tools.export_animated_mesh import load_trajectory_frames

    for i in [0, 1, 10, 2]:
        np.save(tmp_path / f"means3D_frame_{i}.npy",
                np.full((4, 3), float(i), np.float32))
    traj = load_trajectory_frames(str(tmp_path))
    assert traj.shape == (4, 4, 3)
    np.testing.assert_array_equal(traj[:, 0, 0], [0, 1, 2, 10])


class TestPropagationTracker:
    def _sequence(self, bg="gradient", n=8, res=64):
        """Moving colored disk over a non-white background."""
        yy, xx = np.mgrid[0:res, 0:res].astype(np.float32)
        if bg == "gradient":
            bg_img = np.stack([xx / res, yy / res, 0.5 + 0 * xx], -1)
        else:
            bg_img = np.ones((res, res, 3), np.float32)
        frames, gts = [], []
        for i in range(n):
            cx, cy, r = 20 + 2.5 * i, 26 + 1.5 * i, 10
            disk = ((xx - cx) ** 2 + (yy - cy) ** 2) < r * r
            img = bg_img.copy()
            img[disk] = (0.8, 0.2, 0.1)
            frames.append(img)
            gts.append(disk.astype(np.float32))
        return np.stack(frames), np.stack(gts)

    def _iou(self, a, b):
        inter = np.logical_and(a > 0.5, b > 0.5).sum()
        union = np.logical_or(a > 0.5, b > 0.5).sum()
        return inter / max(union, 1)

    def test_propagation_tracks_on_nonwhite_background(self):
        from animate3d_tpu.tools.tracking import segment_video

        frames, gts = self._sequence(bg="gradient")
        masks = segment_video(frames, gts[0], backend="propagation")
        ious = [self._iou(m, g) for m, g in zip(masks, gts)]
        assert min(ious) > 0.8, ious

    def test_chroma_fails_where_propagation_succeeds(self):
        """Documents why the default changed: the chroma backend assumes a
        near-white background and breaks on the gradient scene."""
        from animate3d_tpu.tools.tracking import segment_video

        frames, gts = self._sequence(bg="gradient")
        chroma = segment_video(frames, gts[0], backend="chroma")
        iou_last = self._iou(chroma[-1], gts[-1])
        assert iou_last < 0.5, iou_last


class TestXMemArch:
    """Architecture-complete XMem reimplementation (tools/xmem_arch.py):
    state-dict layout matches the released XMem-s012.pth (the keys XMem's own
    loader introspects), synthetic weights round-trip through the backend's
    loading path, and the inference loop produces sane masks."""

    def _save_synthetic(self, tmp_path):
        import torch

        from animate3d_tpu.tools.xmem_arch import XMemNet

        torch.manual_seed(0)
        net = XMemNet()
        path = tmp_path / "xmem_synth.pth"
        torch.save(net.state_dict(), path)
        return net, str(path)

    def test_state_dict_layout_matches_release(self, tmp_path):
        torch = pytest.importorskip("torch")  # noqa: F841
        net, _ = self._save_synthetic(tmp_path)
        sd = net.state_dict()
        # the exact keys XMem's loader reads dims from (network.py:142-152)
        assert sd["key_proj.key_proj.weight"].shape[0] == 64
        assert sd["value_encoder.fuser.block2.conv2.weight"].shape[0] == 512
        assert sd["decoder.hidden_update.transform.weight"].shape[0] == 3 * 64
        # multi-object value encoder: image + mask + others = 5 channels
        assert sd["value_encoder.conv1.weight"].shape[1] == 5
        # spot checks across every submodule family
        for k in (
            "key_encoder.conv1.weight", "key_encoder.res2.0.conv3.weight",
            "key_encoder.layer3.5.bn3.running_mean",
            "value_encoder.layer3.1.conv2.weight",
            "value_encoder.fuser.attention.ChannelGate.mlp.1.weight",
            "value_encoder.fuser.attention.SpatialGate.spatial.conv.weight",
            "value_encoder.hidden_reinforce.transform.weight",
            "decoder.fuser.block1.downsample.weight",
            "decoder.up_16_8.skip_conv.weight",
            "decoder.up_8_4.out_conv.conv2.weight",
            "decoder.pred.weight",
        ):
            assert k in sd, k

    def test_synthetic_weights_load_and_track(self, tmp_path):
        torch = pytest.importorskip("torch")  # noqa: F841
        from animate3d_tpu.tools.xmem_arch import load_xmem, xmem_segment_video

        _, path = self._save_synthetic(tmp_path)
        net = load_xmem(path)  # strict load; dims read from the weights
        rng = np.random.default_rng(0)
        frames = rng.uniform(size=(3, 48, 48, 3)).astype(np.float32)
        tmpl = np.zeros((48, 48), np.float32)
        tmpl[10:30, 10:30] = 1.0
        masks = xmem_segment_video(frames, tmpl, net, mem_every=1)
        assert masks.shape == (3, 48, 48)
        assert np.isfinite(masks).all()
        np.testing.assert_array_equal(masks[0], tmpl)  # frame 0 = template

    def test_backend_refuses_without_weights(self, monkeypatch):
        from animate3d_tpu.tools.tracking import segment_video

        monkeypatch.delenv("XMEM_WEIGHTS", raising=False)
        frames = np.zeros((2, 32, 32, 3), np.float32)
        with pytest.raises(FileNotFoundError):
            segment_video(frames, np.zeros((32, 32)), backend="xmem")

    def test_backend_dispatches_with_weights(self, tmp_path, monkeypatch):
        torch = pytest.importorskip("torch")  # noqa: F841
        from animate3d_tpu.tools.tracking import segment_video

        _, path = self._save_synthetic(tmp_path)
        monkeypatch.setenv("XMEM_WEIGHTS", path)
        rng = np.random.default_rng(1)
        frames = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        tmpl = np.zeros((32, 32), np.float32)
        tmpl[8:24, 8:24] = 1.0
        masks = segment_video(frames, tmpl, backend="xmem", mem_every=1)
        assert masks.shape == (2, 32, 32)
