"""Quality metrics: PSNR/SSIM/LPIPS (utils/metrics.py).

The LPIPS parity test transcribes the torch ``lpips`` package forward
(richzhang/PerceptualSimilarity lpips/lpips.py + torchvision alexnet
features) straight-line in torch and checks the Flax module + converter
reproduce it on synthetic weights — the reference-derived anchor the
zero-egress environment allows (real calibration weights drop in via the
same converter)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from animate3d_tpu.utils import metrics as qm


def test_psnr_known_value(rng):
    x = rng.uniform(size=(8, 8, 3)).astype(np.float32)
    noise = np.full_like(x, 0.1)
    p = float(qm.psnr(jnp.asarray(x), jnp.asarray(x + noise)))
    assert abs(p - 20.0) < 1e-3  # MSE = 0.01 → 20 dB
    assert float(qm.psnr(jnp.asarray(x), jnp.asarray(x))) > 100.0


def test_psnr_batched_axis(rng):
    x = rng.uniform(size=(4, 8, 8, 3)).astype(np.float32)
    y = x + rng.normal(size=x.shape).astype(np.float32) * 0.05
    per = qm.psnr(jnp.asarray(x), jnp.asarray(y), axis=(-3, -2, -1))
    assert per.shape == (4,)


def test_ssim_identity_and_ordering(rng):
    x = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    assert float(qm.ssim(jnp.asarray(x), jnp.asarray(x))) == pytest.approx(1.0, abs=1e-5)
    small = x + rng.normal(size=x.shape).astype(np.float32) * 0.02
    large = x + rng.normal(size=x.shape).astype(np.float32) * 0.3
    s_small = float(qm.ssim(jnp.asarray(x), jnp.asarray(np.clip(small, 0, 1))))
    s_large = float(qm.ssim(jnp.asarray(x), jnp.asarray(np.clip(large, 0, 1))))
    assert s_small > s_large
    assert 0.0 < s_large < s_small < 1.0


def test_ssim_matches_direct_windowed_reference(rng):
    """Separable-filter SSIM == direct dense-window computation."""
    x = rng.uniform(size=(1, 24, 24, 1)).astype(np.float32)
    y = np.clip(x + rng.normal(size=x.shape).astype(np.float32) * 0.1, 0, 1)

    k1 = np.asarray(qm._gaussian_kernel1d(11, 1.5))
    win = np.outer(k1, k1)  # (11, 11)

    def filt(img):
        out = np.zeros((img.shape[1] - 10, img.shape[2] - 10))
        for i in range(out.shape[0]):
            for j in range(out.shape[1]):
                out[i, j] = np.sum(img[0, i:i + 11, j:j + 11, 0] * win)
        return out

    mu_x, mu_y = filt(x), filt(y)
    mu_xx, mu_yy, mu_xy = filt(x * x), filt(y * y), filt(x * y)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    s = ((2 * mu_x * mu_y + c1) * (2 * (mu_xy - mu_x * mu_y) + c2)) / (
        (mu_x ** 2 + mu_y ** 2 + c1)
        * ((mu_xx - mu_x ** 2) + (mu_yy - mu_y ** 2) + c2))
    ref = float(np.mean(s))
    got = float(qm.ssim(jnp.asarray(x), jnp.asarray(y))[0])
    assert got == pytest.approx(ref, abs=2e-5)


def test_ssim_jit_and_batch(rng):
    x = jnp.asarray(rng.uniform(size=(3, 16, 16, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=(3, 16, 16, 3)).astype(np.float32))
    out = jax.jit(qm.ssim)(x, y)
    assert out.shape == (3,)


# -- LPIPS --------------------------------------------------------------------


def _synthetic_torch_states(rng):
    """lpips-package-shaped state dicts with random but deterministic values."""
    conv_ids = (0, 3, 6, 8, 10)
    chans = qm._ALEX_CHANNELS
    kss = qm._ALEX_KERNELS
    alex, lin = {}, {}
    cin = 3
    for i, tid in enumerate(conv_ids):
        alex[f"{tid}.weight"] = rng.normal(
            size=(chans[i], cin, kss[i], kss[i])).astype(np.float32) * 0.05
        alex[f"{tid}.bias"] = rng.normal(size=(chans[i],)).astype(np.float32) * 0.01
        lin[f"lin{i}.model.1.weight"] = np.abs(rng.normal(
            size=(1, chans[i], 1, 1)).astype(np.float32)) * 0.1
        cin = chans[i]
    return alex, lin


def _torch_lpips_forward(alex, lin, x_np, y_np):
    """Straight-line torch transcription of lpips.LPIPS(net='alex')."""
    import torch
    import torch.nn.functional as F

    def feats(img):
        t = torch.from_numpy(img.transpose(0, 3, 1, 2).copy())
        t = 2.0 * t - 1.0
        shift = torch.tensor(qm._LPIPS_SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(qm._LPIPS_SCALE).view(1, 3, 1, 1)
        t = (t - shift) / scale
        out = []
        conv_ids = (0, 3, 6, 8, 10)
        for i, tid in enumerate(conv_ids):
            w = torch.from_numpy(alex[f"{tid}.weight"])
            b = torch.from_numpy(alex[f"{tid}.bias"])
            t = F.conv2d(t, w, b, stride=qm._ALEX_STRIDES[i],
                         padding=qm._ALEX_PADS[i])
            t = F.relu(t)
            out.append(t)
            if i in qm._ALEX_POOL_AFTER:
                t = F.max_pool2d(t, 3, stride=2)
        return out

    fx, fy = feats(x_np), feats(y_np)
    total = torch.zeros(x_np.shape[0])
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / torch.sqrt((a ** 2).sum(1, keepdim=True) + 1e-10)
        b = b / torch.sqrt((b ** 2).sum(1, keepdim=True) + 1e-10)
        d = (a - b) ** 2
        w = torch.from_numpy(lin[f"lin{i}.model.1.weight"]).clamp(min=0)
        d = F.conv2d(d, w)
        total = total + d.mean(dim=(1, 2, 3))
    return total.numpy()


def test_lpips_matches_torch_reference(rng):
    torch = pytest.importorskip("torch")  # noqa: F841
    alex, lin = _synthetic_torch_states(rng)
    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    y = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    ref = _torch_lpips_forward(alex, lin, x, y)

    model = qm.Lpips()
    params = qm.lpips_params_from_torch(alex, lin)
    got = np.asarray(model(params, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-5)


def test_lpips_properties(rng):
    model = qm.Lpips()
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    d_self = float(model(params, x, x)[0])
    assert d_self == pytest.approx(0.0, abs=1e-6)
    y = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    assert float(model(params, x, y)[0]) > 0.0


def test_load_lpips_npz_roundtrip(tmp_path, rng):
    alex, lin = _synthetic_torch_states(rng)
    params = qm.lpips_params_from_torch(alex, lin)
    flat = {}
    for mod, leaves in params.items():
        for leaf, v in leaves.items():
            flat[f"{mod}/{leaf}"] = np.asarray(v)
    p = tmp_path / "lpips_alex.npz"
    np.savez(p, **flat)
    loaded = qm.load_lpips(str(p))
    assert loaded is not None
    model, lp = loaded
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(model(lp, x, y)),
                               np.asarray(model(params, x, y)), rtol=1e-6)


def test_load_lpips_absent_returns_none(tmp_path, monkeypatch):
    monkeypatch.delenv("LPIPS_WEIGHTS", raising=False)
    monkeypatch.chdir(tmp_path)
    assert qm.load_lpips() is None
