import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_clip_vision_conversion_parity():
    """Our Flax CLIP vision tower == HF torch CLIPVisionModelWithProjection."""
    import torch
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModelWithProjection as HFModel

    from animate3d_tpu.convert.torch_to_flax import (
        apply_to_flax_params,
        torch_to_flax_params,
    )
    from animate3d_tpu.models.clip import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig.tiny(hidden_act="gelu")
    model = CLIPVisionModelWithProjection(cfg)
    img = np.random.default_rng(0).normal(size=(2, cfg.image_size, cfg.image_size, 3)
                                          ).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(img))

    hf_cfg = HFCfg(hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
                   num_attention_heads=cfg.num_heads,
                   intermediate_size=cfg.intermediate_size,
                   image_size=cfg.image_size, patch_size=cfg.patch_size,
                   projection_dim=cfg.projection_dim, hidden_act="gelu")
    hf = HFModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    sd.pop("vision_model.embeddings.position_ids", None)
    params2, missing, unexpected = apply_to_flax_params(
        params, torch_to_flax_params(sd))
    assert not missing, missing
    assert not unexpected, unexpected
    out_f = np.asarray(model.apply(params2, jnp.asarray(img)))
    with torch.no_grad():
        out_t = hf(torch.from_numpy(img.transpose(0, 3, 1, 2))).image_embeds.numpy()
    np.testing.assert_allclose(out_f, out_t, atol=5e-4)


def test_softmax_alpha_blender_three_way():
    from animate3d_tpu.models.attention_layers import SpatioTemporalAttention

    n, hw, f, c = 2, 4, 2, 16
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n * hw, f, c)),
                    jnp.float32)
    m = SpatioTemporalAttention(c, 2, n, spatial_attn=True, image_attn=True,
                                use_alpha_blender=True,
                                spatial_encoding="sinusoid")
    params = m.init(jax.random.PRNGKey(0), x, 2, 2)
    # 3-way softmax blender params exist
    assert "mix_factor" in params["params"]["alpha_blender"]
    assert params["params"]["alpha_blender"]["mix_factor"].shape == (3,)
    out = m.apply(params, x, 2, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_camera_encoding_variants():
    from animate3d_tpu.models.attention_layers import SpatioTemporalAttention

    n, hw, f, c = 4, 4, 2, 16
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n * hw, f, c)),
                    jnp.float32)
    for enc in ("sinusoid", "learnable"):
        m = SpatioTemporalAttention(c, 2, n, spatial_attn=True,
                                    spatial_encoding="learnable",
                                    camera_encoding=enc)
        params = m.init(jax.random.PRNGKey(0), x, 2, 2)
        out = m.apply(params, x, 2, 2)
        assert np.all(np.isfinite(np.asarray(out)))


def test_hybrid_random_camera_sampler():
    from animate3d_tpu.data.cameras import HybridRandomCameraSampler, RandomCameraConfig

    cfg = RandomCameraConfig(batch_size=2 * 4 * 2, n_view=4, total_frame=2,
                             width=32, height=32, progressive_until=100)
    s = HybridRandomCameraSampler(cfg, seed=0)
    s.update_step(0)  # fully narrowed at step 0
    b = s.sample()
    assert b["c2w"].shape == (16, 4, 4)
    # azimuths within a video cover 4 views; frames repeat per view
    az = b["azimuth"].reshape(2, 4, 2)
    assert np.allclose(az[:, :, 0], az[:, :, 1])
    # timestamps linspace per view
    ts = b["timestamps"].reshape(2, 4, 2)
    np.testing.assert_allclose(ts[0, 0], [-1.0, 1.0])
    # progressive: at step 0 elevation pinned to eval elevation
    assert np.allclose(b["elevation"], cfg.eval_elevation_deg, atol=1.0)
    s.update_step(10_000)
    b2 = s.sample()
    assert b2["elevation"].min() >= cfg.elevation_range[0] - 1e-5
    assert b2["elevation"].max() <= cfg.elevation_range[1] + 1e-5


def test_mvideo_dataset(tmp_path):
    from PIL import Image
    from animate3d_tpu.data.video_dataset import MVideoConfig, MVideoDataset

    for v in range(4):
        Image.fromarray(np.full((8, 8, 3), v * 10, np.uint8)).save(
            tmp_path / f"v{v}.png")
    (tmp_path / "m.json").write_text(json.dumps(
        [{"videos": [f"v{v}.png" for v in range(4)], "caption": "x",
          "azimuth_start": 30.0}]))
    ds = MVideoDataset(MVideoConfig(manifest_path=str(tmp_path / "m.json"),
                                    video_root=str(tmp_path), sample_size=8,
                                    sample_n_frames=2), seed=0)
    item = ds[0]
    assert item["pixel_values"].shape == (4, 2, 8, 8, 3)
    assert item["pixel_values"].min() >= -1.0 and item["pixel_values"].max() <= 1.0
    assert item["cameras"].shape == (4, 16)
    assert item["text"] == "x"


def test_saving_gif_and_mp4(tmp_path):
    from animate3d_tpu.utils.saving import Saver

    saver = Saver(str(tmp_path))
    frames = np.random.default_rng(0).uniform(size=(4, 3, 8, 8, 3))
    p = saver.gif_mv("x/test.gif", frames)
    assert os.path.exists(p)
    from PIL import Image

    g = Image.open(p)
    assert g.size == (32, 8)  # 4 views wide
    p2 = saver.mp4("x/v.mp4", frames[0])
    assert os.path.exists(p2)
    p3 = saver.rgba("x/a.png", frames[0, 0], np.ones((8, 8)))
    assert np.asarray(Image.open(p3)).shape == (8, 8, 4)


def test_similarity_init_sampler():
    from animate3d_tpu.pipelines.mv_sampler import MVSampler, MVSamplerConfig

    cfg = MVSamplerConfig(num_inference_steps=4, num_views=2, num_frames=2,
                          height=16, width=16, freeinit_enabled=False,
                          i2v_similarity_strength=0.5,
                          i2v_similarity_origin_prob=0.5)
    sampler = MVSampler(lambda *a, **k: None, cfg)
    ts = sampler.active_timesteps()
    assert len(ts) == 2  # strength 0.5 → half the steps
    ffl = jnp.ones((2, 1, 2, 2, 4))
    latents, noise = sampler.prepare_initial_latents(jax.random.PRNGKey(0), ffl)
    assert latents.shape == (2, 2, 2, 2, 4)
    np.testing.assert_array_equal(np.asarray(latents[:, 0]), np.asarray(ffl[:, 0]))
