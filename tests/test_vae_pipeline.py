import numpy as np
import jax
import jax.numpy as jnp
import pytest

from animate3d_tpu.models.vae import AutoencoderKL, VAEConfig
from animate3d_tpu.models.clip import (
    CLIPTextModel,
    CLIPTextConfig,
    CLIPVisionModelWithProjection,
    CLIPVisionConfig,
)
from animate3d_tpu.models.unet_mv import MVMotionUNet, MVUNetConfig
from animate3d_tpu.pipelines.mv_sampler import (
    MVSampler,
    MVSamplerConfig,
    decode_video,
    encode_conditioning_images,
)


def test_vae_shapes_roundtrip():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    x = jnp.zeros((2, 16, 16, 3))
    params = jax.jit(vae.init)(jax.random.PRNGKey(0), x)
    z = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode_mode))(params, x)
    assert z.shape == (2, 8, 8, 4)  # one downsample (2 blocks)
    y = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))(params, z)
    assert y.shape == (2, 16, 16, 3)


def test_clip_text_shapes():
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    ids = jnp.zeros((2, 7), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids)
    out = jax.jit(model.apply)(params, ids)
    assert out.shape == (2, 7, cfg.hidden_size)


def test_clip_vision_shapes():
    cfg = CLIPVisionConfig.tiny()
    model = CLIPVisionModelWithProjection(cfg)
    img = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    out = jax.jit(model.apply)(params, img)
    assert out.shape == (2, cfg.projection_dim)


@pytest.fixture(scope="module")
def tiny_sampler():
    ucfg = MVUNetConfig.tiny()
    unet = MVMotionUNet(ucfg)
    scfg = MVSamplerConfig(
        num_inference_steps=3, num_views=4, num_frames=2, height=32, width=32,
        freeinit_enabled=True, freeinit_num_iters=2,
    )
    bn, f = 4, scfg.num_frames
    h = w = scfg.latent_height
    latents = jnp.zeros((bn, f, h, w, 4))
    text = jnp.zeros((bn, 7, ucfg.cross_attention_dim))
    camera = jnp.zeros((bn, 16))
    img = jnp.zeros((bn, ucfg.image_embed_dim))
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), latents, jnp.asarray(0.0),
                                text, camera, img)

    def unet_apply(p, lat, t, ctx, cam, img_emb, i2v_cond_time_zero=False):
        return unet.apply(p, lat, t, ctx, cam, img_emb,
                          i2v_cond_time_zero=i2v_cond_time_zero)

    sampler = MVSampler(unet_apply, scfg)
    return sampler, params, ucfg, scfg


def test_sampler_end_to_end_shapes(tiny_sampler):
    sampler, params, ucfg, scfg = tiny_sampler
    bn = 4
    h = w = scfg.latent_height
    rng = np.random.default_rng(0)
    ffl = jnp.asarray(rng.normal(size=(bn, 1, h, w, 4)), jnp.float32)
    text_c = jnp.asarray(rng.normal(size=(bn, 7, ucfg.cross_attention_dim)), jnp.float32)
    text_u = jnp.zeros_like(text_c)
    img = jnp.asarray(rng.normal(size=(bn, ucfg.image_embed_dim)), jnp.float32)

    out = sampler.sample(jax.random.PRNGKey(0), params, ffl, text_c, text_u, img)
    assert out.shape == (bn, scfg.num_frames, h, w, 4)
    assert np.all(np.isfinite(np.asarray(out)))
    # frame 0 must be exactly the clean conditioning latents
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(ffl[:, 0]), atol=1e-6)


def test_sampler_cameras_shape(tiny_sampler):
    sampler, *_ = tiny_sampler
    cams = sampler.cameras(1)
    assert cams.shape == (4, 16)
    # normalized translations
    t = np.asarray(cams).reshape(4, 4, 4)[:, :3, 3]
    np.testing.assert_allclose(np.linalg.norm(t, axis=1), 1.0, atol=1e-5)


def test_vae_encode_decode_helpers():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    imgs = jnp.zeros((4, 16, 16, 3))
    params = jax.jit(vae.init)(jax.random.PRNGKey(0), imgs)

    def vae_encode(p, x):
        return vae.apply(p, x, method=vae.encode_mode)

    def vae_decode(p, z):
        return vae.apply(p, z, method=vae.decode)

    ffl = encode_conditioning_images(vae_encode, params, imgs)
    assert ffl.shape == (4, 1, 8, 8, 4)
    latents = jnp.concatenate([ffl, ffl], axis=1)  # (4, 2, 8, 8, 4)
    video = decode_video(vae_decode, params, latents, frame_chunk=4)
    assert video.shape == (4, 2, 16, 16, 3)
    assert float(jnp.min(video)) >= 0.0 and float(jnp.max(video)) <= 1.0
