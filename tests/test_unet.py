import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from animate3d_tpu.models.unet_mv import MVMotionUNet, MVUNetConfig


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = MVUNetConfig.tiny()
    model = MVMotionUNet(cfg)
    bn, f, h, w = 4, 2, 8, 8
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.normal(size=(bn, f, h, w, 4)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(bn, 7, cfg.cross_attention_dim)), jnp.float32)
    camera = jnp.asarray(rng.normal(size=(bn, 16)), jnp.float32)
    image_embeds = jnp.asarray(rng.normal(size=(bn, cfg.image_embed_dim)), jnp.float32)
    t = jnp.asarray(500.0)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), latents, t, text, camera,
                                 image_embeds)

    @functools.partial(jax.jit, static_argnames=("i2v_cond_time_zero",))
    def apply(params, latents, t, text, camera, image_embeds,
              i2v_cond_time_zero=False):
        return model.apply(params, latents, t, text, camera, image_embeds,
                           i2v_cond_time_zero=i2v_cond_time_zero)

    return model, params, apply, (latents, t, text, camera, image_embeds)


def test_unet_forward_shape(tiny_unet):
    model, params, apply, (latents, t, text, camera, image_embeds) = tiny_unet
    out = apply(params, latents, t, text, camera, image_embeds)
    assert out.shape == latents.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_unet_camera_conditioning_matters(tiny_unet):
    model, params, apply, (latents, t, text, camera, image_embeds) = tiny_unet
    out1 = apply(params, latents, t, text, camera, image_embeds)
    out2 = apply(params, latents, t, text, camera + 1.0, image_embeds)
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-5


def test_unet_i2v_cond_time_zero_changes_frame0_path(tiny_unet):
    model, params, apply, (latents, t, text, camera, image_embeds) = tiny_unet
    out1 = apply(params, latents, t, text, camera, image_embeds,
                 i2v_cond_time_zero=False)
    out2 = apply(params, latents, t, text, camera, image_embeds,
                 i2v_cond_time_zero=True)
    # t=500 vs t=0 embedding on frame 0 must change the output
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-5


def test_gradient_checkpointing_matches(tiny_unet):
    """remat'd UNet (gradient_checkpointing=True) must produce identical
    outputs AND gradients — remat changes memory, not math (reference
    train.py:380-382 enable_gradient_checkpointing parity)."""
    import dataclasses

    model, params, apply, (latents, t, text, camera, image_embeds) = tiny_unet
    model_gc = MVMotionUNet(dataclasses.replace(
        model.config, gradient_checkpointing=True))

    def loss(m, p):
        return jnp.sum(m.apply(p, latents, t, text, camera, image_embeds) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(model, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(model_gc, p))(params)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    # tolerances allow fp32 recompute-order noise (remat re-evaluates the
    # forward inside the backward, changing summation order) while still
    # catching any structural divergence
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=2e-3)


def test_motion_module_fused_layout_matches():
    """MotionModule's einsum-fused proj_in/out layout path (hw ≥
    _FUSE_LAYOUT_MIN_HW) must match the explicit-transpose path with the
    SAME params — the permuted-output einsum is the same matmul with the
    layout move folded into the dot's output."""
    from animate3d_tpu.models import unet_blocks as UB

    rng = np.random.default_rng(7)
    bn, f, hh, ww, c = 2, 4, 4, 4, 32
    x = jnp.asarray(rng.normal(size=(bn * f, hh, ww, c)), jnp.float32)
    mod = UB.MotionModule(channels=c, num_heads=2, num_views=2,
                          attn_cfg=UB.MotionAttnConfig(enabled=False))
    params = mod.init(jax.random.PRNGKey(0), x, f)
    assert hh * ww < UB._FUSE_LAYOUT_MIN_HW
    ref = mod.apply(params, x, f)

    prev = UB._FUSE_LAYOUT_MIN_HW
    UB._FUSE_LAYOUT_MIN_HW = 1
    try:
        p_fused = mod.init(jax.random.PRNGKey(0), x, f)
        out = mod.apply(params, x, f)
    finally:
        UB._FUSE_LAYOUT_MIN_HW = prev
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # identical param tree + identical init values (checkpoint and RNG-path
    # compatibility between nn.Dense and _DenseParams declarations)
    assert (jax.tree_util.tree_structure(p_fused)
            == jax.tree_util.tree_structure(params))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_param_count_sd15_scale():
    # full-size config builds and has SD1.5-scale parameter count (~1.3B total
    # incl. motion modules & adapters; base SD1.5 UNet alone is 860M)
    cfg = MVUNetConfig()
    model = MVMotionUNet(cfg)
    bn, f, h, w = 4, 2, 8, 8
    latents = jnp.zeros((bn, f, h, w, 4), jnp.float32)
    text = jnp.zeros((bn, 7, 768), jnp.float32)
    camera = jnp.zeros((bn, 16), jnp.float32)
    img = jnp.zeros((bn, 1024), jnp.float32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), latents, jnp.asarray(0.0),
                           text, camera, img)
    )
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    assert 1.0e9 < n_params < 2.0e9, n_params
