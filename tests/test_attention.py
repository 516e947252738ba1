import numpy as np
import jax
import jax.numpy as jnp
import pytest

from animate3d_tpu.ops.attention import attention_xla, multi_head_attention
from animate3d_tpu.models.attention_layers import (
    CrossViewSelfAttention,
    SpatioTemporalAttention,
    TextCrossAttention,
)


def test_attention_xla_is_softmax_attention():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 3, 5, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 3, 7, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 3, 7, 8)), jnp.float32)
    out = attention_xla(q, k, v, scale=8 ** -0.5)
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) * 8 ** -0.5
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    expected = np.einsum("bhqk,bhkd->bhqd", probs, v)
    # matmuls run at the backend's fast precision (bf16-class) by design
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-2)


def test_multi_head_matches_single_big_head_layout():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 6, 16)), jnp.float32)
    out = multi_head_attention(x, x, x, num_heads=4)
    assert out.shape == (2, 6, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def _init_and_apply(module, *args, **kwargs):
    params = module.init(jax.random.PRNGKey(0), *args, **kwargs)
    return lambda *a, **k: module.apply(params, *a, **k)


class TestCrossViewSelfAttention:
    def setup_method(self):
        self.n, self.f, self.l, self.c = 4, 2, 9, 16
        rng = np.random.default_rng(2)
        self.x = jnp.asarray(
            rng.normal(size=(self.n * self.f, self.l, self.c)), jnp.float32)

    def test_cross_view_mixing_within_frame(self):
        m = CrossViewSelfAttention(self.c, 2, self.n, image_attn=False)
        fn = _init_and_apply(m, self.x, self.f)
        base = np.asarray(fn(self.x, self.f))
        # perturb view 2, frame 0 (batch index = view*f + frame = 2*2+0 = 4)
        x2 = self.x.at[4].add(1.0)
        out = np.asarray(fn(x2, self.f))
        # same-frame other views change
        assert np.abs(out[0] - base[0]).max() > 1e-6  # view0 frame0
        assert np.abs(out[2] - base[2]).max() > 1e-6  # view1 frame0
        # other frames unchanged (no temporal mixing in attn1)
        assert np.abs(out[1] - base[1]).max() < 1e-6  # view0 frame1
        assert np.abs(out[5] - base[5]).max() < 1e-6  # view2 frame1

    def test_i2v_branch_leaks_frame0_to_all_frames(self):
        m = CrossViewSelfAttention(self.c, 2, self.n, image_attn=True)
        params = m.init(jax.random.PRNGKey(0), self.x, self.f)
        # to_out_i2v is zero-init (no-op at install); make it nonzero so the
        # branch contributes
        rng = np.random.default_rng(7)
        oi = params["params"]["to_out_i2v"]
        params = {"params": dict(params["params"], to_out_i2v=dict(
            oi, kernel=jnp.asarray(rng.normal(size=oi["kernel"].shape) * 0.1,
                                   jnp.float32)))}
        base = np.asarray(m.apply(params, self.x, self.f))
        x2 = self.x.at[4].add(1.0)  # view2 frame0
        out = np.asarray(m.apply(params, x2, self.f))
        # frame-1 outputs now change too, via the frame-0 K/V broadcast
        assert np.abs(out[1] - base[1]).max() > 1e-8

    def test_i2v_branch_is_noop_at_init(self):
        """Install-time parity (reference inference.py:160-168): zero-init
        to_out_i2v ⇒ the I2V branch contributes exactly nothing at init."""
        m_i2v = CrossViewSelfAttention(self.c, 2, self.n, image_attn=True)
        params = m_i2v.init(jax.random.PRNGKey(0), self.x, self.f)
        oi = params["params"]["to_out_i2v"]
        assert np.all(np.asarray(oi["kernel"]) == 0.0)
        assert np.all(np.asarray(oi["bias"]) == 0.0)
        m_plain = CrossViewSelfAttention(self.c, 2, self.n, image_attn=False)
        shared = {"params": {k: v for k, v in params["params"].items()
                             if not k.endswith("_i2v")}}
        out_i2v = np.asarray(m_i2v.apply(params, self.x, self.f))
        out_plain = np.asarray(m_plain.apply(shared, self.x, self.f))
        # q/k/v run as one fused matmul whose width includes to_q_i2v when
        # image_attn=True (attention_layers._shared_input_proj), so plain-vs-i2v is
        # equal only up to matmul-tiling reassociation (~1e-7)
        np.testing.assert_allclose(out_i2v, out_plain, atol=1e-5, rtol=1e-6)
        # the zero-contribution property itself is exact: scrambling the i2v
        # QUERY projection must not change the output at all (to_out_i2v = 0)
        import jax as _jax
        scrambled = _jax.tree_util.tree_map(lambda p: p, params)
        qi = scrambled["params"]["to_q_i2v"]["kernel"]
        scrambled["params"]["to_q_i2v"]["kernel"] = qi + 7.0
        out_scrambled = np.asarray(m_i2v.apply(scrambled, self.x, self.f))
        np.testing.assert_array_equal(out_i2v, out_scrambled)


class TestTextCrossAttention:
    def test_ip_branch_additive(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(2, 7, 12)), jnp.float32)
        ip = jnp.asarray(rng.normal(size=(2, 4, 12)), jnp.float32)
        m = TextCrossAttention(16, 2, 12, ip_enabled=True, ip_scale=1.0)
        params = m.init(jax.random.PRNGKey(0), x, ctx, ip)
        out_ip = np.asarray(m.apply(params, x, ctx, ip))
        m0 = TextCrossAttention(16, 2, 12, ip_enabled=True, ip_scale=0.0)
        out_no = np.asarray(m0.apply(params, x, ctx, ip))
        assert np.abs(out_ip - out_no).max() > 1e-6


class TestSpatioTemporal:
    def setup_method(self):
        self.b, self.n, self.h, self.w, self.f, self.c = 1, 4, 3, 3, 2, 16
        rng = np.random.default_rng(4)
        self.x = jnp.asarray(
            rng.normal(size=(self.b * self.n * self.h * self.w, self.f, self.c)),
            jnp.float32)

    def make(self, **kw):
        defaults = dict(spatial_attn=True, image_attn=False,
                        use_alpha_blender=True, spatial_encoding="sinusoid")
        defaults.update(kw)
        m = SpatioTemporalAttention(self.c, 2, self.n, **defaults)
        params = m.init(jax.random.PRNGKey(0), self.x, self.h, self.w)
        return m, params

    def test_temporal_only_no_cross_position_mixing(self):
        m, params = self.make(spatial_attn=False, use_alpha_blender=False,
                              spatial_encoding=None)
        base = np.asarray(m.apply(params, self.x, self.h, self.w))
        x2 = self.x.at[0].add(1.0)  # position 0's sequence
        out = np.asarray(m.apply(params, x2, self.h, self.w))
        assert np.abs(out[1:] - base[1:]).max() < 1e-6
        assert np.abs(out[0] - base[0]).max() > 1e-6

    def test_spatial_branch_mixes_positions(self):
        m, params = self.make()
        base = np.asarray(m.apply(params, self.x, self.h, self.w))
        x2 = self.x.at[0].add(1.0)
        out = np.asarray(m.apply(params, x2, self.h, self.w))
        # with alpha blender at init (0.5/0.5), spatial branch contributes
        assert np.abs(out[1:] - base[1:]).max() > 1e-8

    def test_zero_init_merge_matches_temporal_only(self):
        # without alpha blender, to_out_sp is zero-init → output equals the
        # temporal-only path at init... but the temporal path re-applies the
        # time PE when spatial encoding is on, so compare against the same
        # module with the spatial branch output removed by zeroing params.
        m, params = self.make(use_alpha_blender=False)
        out = np.asarray(m.apply(params, self.x, self.h, self.w))
        assert np.all(np.isfinite(out))
        # spatial to_out is zero-init: contribution must be exactly zero
        flat = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda p: p,
                params["params"]["to_out_sp"],
            )
        )
        for leaf in flat:
            assert np.all(np.asarray(leaf) == 0)

    def test_image_branch_frame0_broadcast(self):
        m, params = self.make(spatial_attn=False, image_attn=True,
                              spatial_encoding=None, use_alpha_blender=True)
        base = np.asarray(m.apply(params, self.x, self.h, self.w))
        # perturb frame 1 of some position: other positions' frame outputs
        # should NOT change through the image branch (K/V from frame 0 only),
        # but frame0 perturbation should propagate
        x2 = self.x.at[0, 0].add(1.0)  # position 0, frame 0
        out = np.asarray(m.apply(params, x2, self.h, self.w))
        assert np.abs(out[1] - base[1]).max() > 1e-8  # other positions see frame-0 kv


class TestFlashBackward:
    """Pallas flash-attention backward (dq/dk/dv kernels, VERDICT item 7):
    gradients must match the XLA reference without ever materializing the
    (Sq, Sk) logits in HBM."""

    def _qkv(self, sq=300, sk=512, h=2, d=40, dtype=jnp.float32):
        rng = np.random.default_rng(11)
        q = jnp.asarray(rng.normal(size=(1, sq, h * d)), dtype)
        k = jnp.asarray(rng.normal(size=(1, sk, h * d)), dtype)
        v = jnp.asarray(rng.normal(size=(1, sk, h * d)), dtype)
        return q, k, v

    def test_flash_grads_match_xla(self):
        from animate3d_tpu.ops.attention import multi_head_attention

        q, k, v = self._qkv()

        def loss(backend):
            def fn(q, k, v):
                out = multi_head_attention(q, k, v, 2, backend=backend)
                return jnp.sum(out ** 2) + jnp.sum(out[:, :7] * 0.3)
            return fn

        gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss("flash"), argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gx, gf, ("dq", "dk", "dv")):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=5e-4, rtol=5e-4, err_msg=name)

    def test_flash_forward_unchanged(self):
        from animate3d_tpu.ops.attention import multi_head_attention

        q, k, v = self._qkv()
        ox = multi_head_attention(q, k, v, 2, backend="xla")
        of = multi_head_attention(q, k, v, 2, backend="flash")
        np.testing.assert_allclose(np.asarray(of), np.asarray(ox),
                                   atol=2e-5, rtol=1e-5)

    def test_flash_skipmax_long_kv_parity(self):
        """Sk ≥ 2048 routes the dense whole-K kernel through the bounded-
        logit softmax (row-max pass skipped, clamp fused into exp2 —
        ops/attention.py::_flash_kernel_wholek skip_max). Forward AND
        gradients must match XLA: the lse handed to the backward kernels is
        exact whenever the clamp doesn't bind."""
        from animate3d_tpu.ops.attention import multi_head_attention

        # sq ≥ 512 AND sk ≥ 2048 → skip_max with the taller 512-row q block
        q, k, v = self._qkv(sq=512, sk=2048, h=1, d=40)

        of = multi_head_attention(q, k, v, 1, backend="flash")
        ox = multi_head_attention(q, k, v, 1, backend="xla")
        np.testing.assert_allclose(np.asarray(of), np.asarray(ox),
                                   atol=2e-5, rtol=1e-5)

        def loss(backend):
            def fn(q, k, v):
                out = multi_head_attention(q, k, v, 1, backend=backend)
                return jnp.sum(out ** 2) + jnp.sum(out[:, :7] * 0.3)
            return fn

        gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss("flash"), argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gx, gf, ("dq", "dk", "dv")):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=5e-4, rtol=5e-4, err_msg=name)


class TestPackedSmallAttention:
    """The MXU-packed path for tiny temporal sequences (backend='packed')."""

    def _qkv(self, b, s, c=40, seed=3):
        rng = np.random.default_rng(seed)
        return tuple(jnp.asarray(rng.normal(size=(b, s, c)), jnp.float32)
                     for _ in range(3))

    @pytest.mark.parametrize("b,s", [(24, 16), (13, 16), (7, 32), (256, 8)])
    def test_packed_matches_xla(self, b, s):
        # b=13 / b=7 exercise the pad-to-pack-multiple + slice-back path
        q, k, v = self._qkv(b, s)
        op = multi_head_attention(q, k, v, 2, backend="packed")
        ox = multi_head_attention(q, k, v, 2, backend="xla")
        np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                                   atol=2e-5, rtol=1e-5)

    def test_packed_grads_match_xla(self):
        q, k, v = self._qkv(24, 16)

        def loss(backend):
            def fn(q, k, v):
                out = multi_head_attention(q, k, v, 2, backend=backend)
                return jnp.sum(out ** 2) + jnp.sum(out[:, :5] * 0.3)
            return fn

        gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
        gp = jax.grad(loss("packed"), argnums=(0, 1, 2))(q, k, v)
        for a, b_, name in zip(gx, gp, ("dq", "dk", "dv")):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       atol=5e-5, rtol=5e-5, err_msg=name)

    def test_packed_falls_back_on_cross_attention(self):
        # ragged kv (77-token text) can't pack; 'packed' must not break
        rng = np.random.default_rng(4)
        q = jnp.asarray(rng.normal(size=(8, 16, 40)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(8, 77, 40)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(8, 77, 40)), jnp.float32)
        op = multi_head_attention(q, k, v, 2, backend="packed")
        ox = multi_head_attention(q, k, v, 2, backend="xla")
        np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                                   atol=2e-5, rtol=1e-5)


class TestPackedTemporalFlash:
    """ops/attention.py::packed_temporal_flash — the fused Pallas variant of
    the MXU-packed tiny-sequence path (probabilities stay in VMEM instead of
    round-tripping the packed (G, H, 128, 128) f32 blocks through HBM).

    XLA:CPU on this box computes f32 matmuls in reduced precision and tiles
    batched vs unbatched dots differently, so parity is checked under
    ``jax.default_matmul_precision("highest")`` where both paths are exact.
    """

    def _qkv(self, b, s=16, c=80, seed=5):
        rng = np.random.default_rng(seed)
        return tuple(jnp.asarray(rng.normal(size=(b, s, c)), jnp.float32)
                     for _ in range(3))

    @pytest.mark.parametrize("b", [16, 20])  # 20: pad-to-group-multiple path
    def test_forward_matches_packed_small(self, b):
        from animate3d_tpu.ops.attention import (_packed_small_attention,
                                                 packed_temporal_flash)

        q, k, v = self._qkv(b)
        with jax.default_matmul_precision("highest"):
            ref = _packed_small_attention(q, k, v, 2, 40 ** -0.5)
            out = packed_temporal_flash(q, k, v, 2, 40 ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_grads_match_packed_small(self):
        from animate3d_tpu.ops.attention import (_packed_small_attention,
                                                 packed_temporal_flash)

        q, k, v = self._qkv(16)

        def loss(fn):
            return lambda q, k, v: jnp.sum(
                jnp.sin(fn(q, k, v, 2, 40 ** -0.5)))

        with jax.default_matmul_precision("highest"):
            gr = jax.grad(loss(_packed_small_attention),
                          argnums=(0, 1, 2))(q, k, v)
            gn = jax.grad(loss(packed_temporal_flash),
                          argnums=(0, 1, 2))(q, k, v)
        for a, b_, name in zip(gr, gn, ("dq", "dk", "dv")):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       atol=2e-5, rtol=2e-5, err_msg=name)


class TestPackedTemporalFlashPadded:
    """ops/attention.py::packed_temporal_flash_padded — the lane-padded
    fused packed kernel (one grid cell per 128-token packed group, all heads
    side-by-side on lanes, fused Pallas forward AND backward). Production
    temporal-attention path; must match the packed XLA path on the real
    lanes and keep pad lanes exactly zero."""

    def _mk(self, rng, b, s, h, d):
        from animate3d_tpu.ops import attention as A

        x = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.float32)
        xp = jnp.pad(x.reshape(b, s, h, d),
                     ((0, 0), (0, 0), (0, 0), (0, A.DP - d))
                     ).reshape(b, s, h * A.DP)
        return x, xp

    @pytest.mark.parametrize("b,s", [(24, 16), (13, 16), (17, 8)])
    def test_forward_matches_packed_xla(self, rng, b, s):
        # b=13/17 exercise the pad-to-group-multiple + slice-back path
        from animate3d_tpu.ops import attention as A

        h, d = 2, 24
        q, qp = self._mk(rng, b, s, h, d)
        k, kp = self._mk(rng, b, s, h, d)
        v, vp = self._mk(rng, b, s, h, d)
        with jax.default_matmul_precision("highest"):
            ref = A._packed_small_attention(q, k, v, h, d ** -0.5)
            out_p = A.packed_temporal_flash_padded(qp, kp, vp, h, d ** -0.5)
        out = out_p.reshape(b, s, h, A.DP)[..., :d].reshape(b, s, h * d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4)
        # pad lanes must stay exact zeros (the row-padded out-projection
        # relies on it)
        pads = np.asarray(out_p.reshape(b, s, h, A.DP)[..., d:])
        assert (pads == 0).all()

    def test_gradients_match_packed_xla(self, rng):
        from animate3d_tpu.ops import attention as A

        b, s, h, d = 24, 16, 2, 24
        q, _ = self._mk(rng, b, s, h, d)
        k, _ = self._mk(rng, b, s, h, d)
        v, _ = self._mk(rng, b, s, h, d)

        def pad(x):
            return jnp.pad(x.reshape(b, s, h, d),
                           ((0, 0), (0, 0), (0, 0), (0, A.DP - d))
                           ).reshape(b, s, h * A.DP)

        def loss_padded(q, k, v):
            o = A.packed_temporal_flash_padded(pad(q), pad(k), pad(v), h,
                                               d ** -0.5)
            o = o.reshape(b, s, h, A.DP)[..., :d].reshape(b, s, h * d)
            return jnp.sum(jnp.sin(o))

        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(
                A._packed_small_attention(q, k, v, h, d ** -0.5)))

        with jax.default_matmul_precision("highest"):
            g_p = jax.grad(loss_padded, argnums=(0, 1, 2))(q, k, v)
            g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_, name in zip(g_p, g_r, ("dq", "dk", "dv")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-4, rtol=2e-4, err_msg=name)

    def test_temporal_layer_padded_path_matches(self, rng, monkeypatch):
        """TemporalSelfAttention with the packed plan forced on must match
        the unpadded path with the SAME params."""
        from animate3d_tpu.models import attention_layers as L

        b, f, c, heads = 24, 16, 48, 2
        x = jnp.asarray(rng.normal(size=(b, f, c)), jnp.float32)
        layer = L.TemporalSelfAttention(channels=c, num_heads=heads)
        params = layer.init(jax.random.PRNGKey(0), x)
        ref = layer.apply(params, x)
        monkeypatch.setattr(L, "padded_packed_plan", lambda *a: True)
        out = layer.apply(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-4, rtol=2e-3)
        # param tree identical under both plans (checkpoint compatibility)
        p_on = layer.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(p_on)
                == jax.tree_util.tree_structure(params))

    def test_spatiotemporal_temporal_branch_padded_matches(self, rng,
                                                           monkeypatch):
        from animate3d_tpu.models import attention_layers as L

        b, n, f, hgt, wid, c, heads = 1, 2, 16, 8, 8, 48, 2
        hw = hgt * wid
        x = jnp.asarray(rng.normal(size=(b * n * hw, f, c)), jnp.float32)
        layer = L.SpatioTemporalAttention(channels=c, num_heads=heads,
                                          num_views=n, spatial_attn=True,
                                          image_attn=True)
        params = layer.init(jax.random.PRNGKey(0), x, hgt, wid)
        ref = layer.apply(params, x, hgt, wid)
        monkeypatch.setattr(L, "padded_packed_plan", lambda *a: True)
        out = layer.apply(params, x, hgt, wid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-4, rtol=2e-3)


class TestFusedGEGLU:
    """ops/geglu.py — fused feed-forward kernel parity vs the reference
    Dense/split/gelu/Dense chain (docs/denoise_roofline.md lever (b))."""

    def _inputs(self, m=300, c=64, inner=1280, dtype=jnp.float32, seed=0):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(m, c)), dtype)
        w1 = jnp.asarray(rng.normal(size=(c, 2 * inner)) * 0.05, dtype)
        b1 = jnp.asarray(rng.normal(size=(2 * inner,)) * 0.05, dtype)
        w2 = jnp.asarray(rng.normal(size=(inner, c)) * 0.05, dtype)
        b2 = jnp.asarray(rng.normal(size=(c,)) * 0.05, dtype)
        return x, w1, b1, w2, b2

    def test_pallas_matches_reference(self):
        from animate3d_tpu.ops.geglu import _geglu_pallas, _geglu_reference

        x, w1, b1, w2, b2 = self._inputs()
        ref = _geglu_reference(x, w1, b1, w2, b2, jnp.float32)
        out = _geglu_pallas(x, w1, b1, w2, b2, jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_pallas_matches_reference_unaligned_rows(self):
        # M not a multiple of the row block; C not a multiple of 128
        from animate3d_tpu.ops.geglu import _geglu_pallas, _geglu_reference

        x, w1, b1, w2, b2 = self._inputs(m=77, c=40, inner=640, seed=1)
        ref = _geglu_reference(x, w1, b1, w2, b2, jnp.float32)
        out = _geglu_pallas(x, w1, b1, w2, b2, jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=2e-4)

    def test_module_output_and_grads_unchanged(self):
        # FeedForwardGEGLU (which routes through geglu_ff) must match the
        # plain chain it replaced, incl. gradients through the custom_vjp
        from animate3d_tpu.ops.geglu import _geglu_fused, _geglu_reference

        x, w1, b1, w2, b2 = self._inputs(m=64, c=32, inner=640, seed=2)

        def loss_fused(*a):
            return jnp.sum(_geglu_fused(jnp.float32, *a) ** 2)

        def loss_ref(*a):
            return jnp.sum(_geglu_reference(*a, jnp.float32) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        for a, b_, name in zip(gr, gf, ("dx", "dw1", "db1", "dw2", "db2")):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       atol=2e-3, rtol=2e-3, err_msg=name)


class TestPaddedFlash:
    """Lane-padded merged-head flash path (flash_attention_padded +
    attention_layers._padded_head_proj): same math as the (B, H, S, D)
    path, no HBM pad/head-split glue (docs/denoise_profile.json)."""

    def _mk(self, rng, b, s, h, d, dp=128):
        from animate3d_tpu.ops import attention as A

        x = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.float32)
        xp = jnp.pad(x.reshape(b, s, h, d), ((0, 0), (0, 0), (0, 0),
                                             (0, dp - d))).reshape(b, s, h * dp)
        return x, xp

    def test_forward_matches_xla(self, rng):
        from animate3d_tpu.ops import attention as A

        b, s, h, d = 2, 512, 2, 24
        q, qp = self._mk(rng, b, s, h, d)
        k, kp = self._mk(rng, b, s, h, d)
        v, vp = self._mk(rng, b, s, h, d)
        scale = d ** -0.5
        ref = A.multi_head_attention(q, k, v, h, backend="xla")
        out_p = A.flash_attention_padded(qp, kp, vp, h, scale)
        out = out_p.reshape(b, s, h, A.DP)[..., :d].reshape(b, s, h * d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4)
        # pad lanes must be exact zeros (the row-padded out-projection and
        # the backward delta both rely on it)
        pads = np.asarray(out_p.reshape(b, s, h, A.DP)[..., d:])
        assert (pads == 0).all()

    def test_gradients_match_xla(self, rng):
        from animate3d_tpu.ops import attention as A

        b, s, h, d = 1, 512, 2, 24
        q, _ = self._mk(rng, b, s, h, d)
        k, _ = self._mk(rng, b, s, h, d)
        v, _ = self._mk(rng, b, s, h, d)
        scale = d ** -0.5
        tgt = jnp.asarray(rng.normal(size=(b, s, h * d)), jnp.float32)

        def pad(x):
            return jnp.pad(x.reshape(b, s, h, d),
                           ((0, 0), (0, 0), (0, 0), (0, A.DP - d))
                           ).reshape(b, s, h * A.DP)

        def loss_padded(q, k, v):
            o = A.flash_attention_padded(pad(q), pad(k), pad(v), h, scale)
            o = o.reshape(b, s, h, A.DP)[..., :d].reshape(b, s, h * d)
            return jnp.sum((o - tgt) ** 2)

        def loss_ref(q, k, v):
            o = A.multi_head_attention(q, k, v, h, backend="xla")
            return jnp.sum((o - tgt) ** 2)

        g_p = jax.grad(loss_padded, argnums=(0, 1, 2))(q, k, v)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g_p, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-3, rtol=1e-3)

    def test_cross_view_layer_padded_path_matches(self, rng, monkeypatch):
        """CrossViewSelfAttention with the padded plan forced on (interpret-
        mode kernels on CPU): output must match the unpadded path with the
        SAME params, including the folded to_out_0(h + to_out_i2v(hi))."""
        from animate3d_tpu.models import attention_layers as L

        b, n, f, l, c, heads = 1, 2, 2, 256, 48, 2
        x = jnp.asarray(rng.normal(size=(b * n * f, l, c)), jnp.float32)
        layer = L.CrossViewSelfAttention(channels=c, num_heads=heads,
                                         num_views=n, image_attn=True)
        params = layer.init(jax.random.PRNGKey(0), x, f)
        ref = layer.apply(params, x, f)
        monkeypatch.setattr(L, "padded_flash_plan", lambda *a: True)
        out = layer.apply(params, x, f)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-4, rtol=2e-3)

    def test_spatiotemporal_layer_padded_path_matches(self, rng, monkeypatch):
        from animate3d_tpu.models import attention_layers as L

        b, n, f, hgt, wid, c, heads = 1, 2, 2, 16, 16, 48, 2
        hw = hgt * wid
        x = jnp.asarray(rng.normal(size=(b * n * hw, f, c)), jnp.float32)
        layer = L.SpatioTemporalAttention(channels=c, num_heads=heads,
                                          num_views=n, spatial_attn=True,
                                          image_attn=True)
        params = layer.init(jax.random.PRNGKey(0), x, hgt, wid)
        ref = layer.apply(params, x, hgt, wid)
        monkeypatch.setattr(L, "padded_flash_plan", lambda *a: True)
        out = layer.apply(params, x, hgt, wid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-4, rtol=2e-3)

    def test_param_tree_identical_under_plan(self, rng, monkeypatch):
        """Init under plan=True and plan=False must declare the SAME param
        tree (checkpoint compatibility: nn.Dense vs _DenseParams parity)."""
        from animate3d_tpu.models import attention_layers as L

        b, n, f, l, c, heads = 1, 2, 2, 256, 48, 2
        x = jnp.asarray(rng.normal(size=(b * n * f, l, c)), jnp.float32)
        layer = L.CrossViewSelfAttention(channels=c, num_heads=heads,
                                         num_views=n, image_attn=True)
        p_off = layer.init(jax.random.PRNGKey(0), x, f)
        monkeypatch.setattr(L, "padded_flash_plan", lambda *a: True)
        p_on = layer.init(jax.random.PRNGKey(0), x, f)
        flat_off = jax.tree_util.tree_leaves_with_path(p_off)
        flat_on = {jax.tree_util.keystr(kp): v
                   for kp, v in jax.tree_util.tree_leaves_with_path(p_on)}
        assert set(flat_on) == {jax.tree_util.keystr(kp)
                                for kp, _ in flat_off}
        for kp, v in flat_off:
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(flat_on[jax.tree_util.keystr(kp)]),
                err_msg=jax.tree_util.keystr(kp))
