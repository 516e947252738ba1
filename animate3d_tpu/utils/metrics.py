"""Image quality metrics: PSNR, SSIM, LPIPS.

The reference repo computes its paper metrics (CLIP/LPIPS, arXiv:2407.11398)
off-repo on the 3-elevation x 4-azimuth testset renders
(custom/threestudio-animate3d/data/uncond_hybrid.py:560-700); nothing in the
reference tree measures quality either.  This module makes quality a
first-class, in-repo measurement for the TPU rebuild:

  * ``psnr`` / ``ssim`` — pure-jnp, jittable, used by the training metrics,
    ``run_test`` (per-view numbers vs the GT video) and ``bench.py`` (so every
    perf change carries a quality anchor).
  * ``Lpips`` — AlexNet-backbone LPIPS (Zhang et al. 2018) as a Flax module,
    with a converter for the standard torch ``lpips`` package checkpoints
    (``lpips_params_from_torch``).  This environment has no egress, so real
    calibration weights cannot be fetched; the architecture + converter are
    complete and tested against synthetic torch state dicts, and
    ``load_lpips`` returns None (with a warning) when no checkpoint exists.

All image tensors are channels-last float in [0, 1] unless noted.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# -- PSNR ---------------------------------------------------------------------

def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0,
         axis: Optional[Sequence[int]] = None) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB.

    ``axis``: axes to average the squared error over (default: all — one
    scalar).  Pass e.g. ``(-3, -2, -1)`` for a per-image batch of HWC images.
    """
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2,
                   axis=axis)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


# -- SSIM ---------------------------------------------------------------------

def _gaussian_kernel1d(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    return g / jnp.sum(g)


def _filter2d_sep(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Separable 2D filter of an (N, H, W, C) batch, 'valid' padding.

    Depthwise via feature_group_count so channels stay independent; two 1-D
    convs instead of one KxK (K=11 -> 22 taps vs 121)."""
    n, h, w, c = img.shape
    size = k.shape[0]
    kh = jnp.tile(k.reshape(1, size, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(size, 1, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(img.shape, (1, size, 1, c),
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(img, kh, (1, 1), "VALID",
                                       dimension_numbers=dn,
                                       feature_group_count=c)
    dn = jax.lax.conv_dimension_numbers(out.shape, (size, 1, 1, c),
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(out, kw, (1, 1), "VALID",
                                        dimension_numbers=dn,
                                        feature_group_count=c)


def ssim(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Structural similarity (Wang et al. 2004), per batch item.

    Accepts (H, W, C) or (N, H, W, C); returns () or (N,).  Standard
    constants C1=(0.01 L)^2, C2=(0.03 L)^2 and an 11-tap Gaussian window —
    matches torchmetrics/skimage defaults (gaussian_weights=True)."""
    squeeze = pred.ndim == 3
    if squeeze:
        pred, target = pred[None], target[None]
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    k = _gaussian_kernel1d(kernel_size, sigma)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    mu_x = _filter2d_sep(pred, k)
    mu_y = _filter2d_sep(target, k)
    mu_xx = _filter2d_sep(pred * pred, k)
    mu_yy = _filter2d_sep(target * target, k)
    mu_xy = _filter2d_sep(pred * target, k)

    var_x = mu_xx - mu_x * mu_x
    var_y = mu_yy - mu_y * mu_y
    cov = mu_xy - mu_x * mu_y

    s = ((2 * mu_x * mu_y + c1) * (2 * cov + c2)) / (
        (mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2))
    out = jnp.mean(s, axis=(1, 2, 3))
    return out[0] if squeeze else out


# -- LPIPS --------------------------------------------------------------------

# torch ``lpips`` package AlexNet feature taps: conv outputs after each ReLU.
_ALEX_CHANNELS = (64, 192, 384, 256, 256)
_ALEX_KERNELS = (11, 5, 3, 3, 3)
_ALEX_STRIDES = (4, 1, 1, 1, 1)
_ALEX_PADS = (2, 2, 1, 1, 1)
# max-pool after taps 0, 1 (AlexNet features indices 2, 5)
_ALEX_POOL_AFTER = (0, 1)

# ImageNet scaling used by lpips.LPIPS (ScalingLayer shift/scale buffers)
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class Lpips:
    """AlexNet-backbone LPIPS distance.

    Params pytree layout::

        {"conv{i}": {"kernel": (kh, kw, cin, cout), "bias": (cout,)},
         "lin{i}":  {"kernel": (1, 1, ci, 1)}}                     i in 0..4

    ``__call__(params, x, y)``: x, y (N, H, W, 3) in [0, 1] -> (N,) distance.
    Matches the torch lpips.LPIPS(net='alex') forward: scale to [-1, 1],
    ImageNet-normalize, per-tap unit-normalize channels, squared diff,
    1x1 linear head, spatial average, sum over taps
    (richzhang/PerceptualSimilarity lpips/lpips.py).
    """

    def init(self, key: jax.Array) -> dict:
        params = {}
        cin = 3
        for i, (cout, ks) in enumerate(zip(_ALEX_CHANNELS, _ALEX_KERNELS)):
            key, k1 = jax.random.split(key)
            scale = 1.0 / np.sqrt(ks * ks * cin)
            params[f"conv{i}"] = {
                "kernel": jax.random.normal(k1, (ks, ks, cin, cout)) * scale,
                "bias": jnp.zeros((cout,)),
            }
            params[f"lin{i}"] = {
                "kernel": jnp.full((1, 1, cout, 1), 1.0 / cout)}
            cin = cout
        return params

    def _features(self, params: dict, x: jnp.ndarray) -> list:
        # [0,1] -> [-1,1] -> ImageNet normalize (lpips ScalingLayer)
        x = 2.0 * x - 1.0
        x = (x - jnp.asarray(_LPIPS_SHIFT)) / jnp.asarray(_LPIPS_SCALE)
        feats = []
        for i in range(len(_ALEX_CHANNELS)):
            w = params[f"conv{i}"]["kernel"]
            s = _ALEX_STRIDES[i]
            p = _ALEX_PADS[i]
            x = jax.lax.conv_general_dilated(
                x, w, (s, s), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = x + params[f"conv{i}"]["bias"]
            x = jax.nn.relu(x)
            feats.append(x)
            if i in _ALEX_POOL_AFTER:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                    "VALID")
        return feats

    def __call__(self, params: dict, x: jnp.ndarray, y: jnp.ndarray
                 ) -> jnp.ndarray:
        fx = self._features(params, x)
        fy = self._features(params, y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a ** 2, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b ** 2, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            lin = params[f"lin{i}"]["kernel"]
            d = jax.lax.conv_general_dilated(
                d, jnp.maximum(lin, 0.0), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            total = total + jnp.mean(d, axis=(1, 2, 3))
        return total


def lpips_params_from_torch(alex_state: dict, lin_state: dict) -> dict:
    """Convert torch state dicts to the Lpips params pytree.

    ``alex_state``: torchvision ``alexnet().features`` state dict
    (keys ``{0,3,6,8,10}.weight/bias``, OIHW).
    ``lin_state``: ``lpips`` package linear-head state dict
    (keys ``lin{i}.model.1.weight``, (1, ci, 1, 1)).
    """
    conv_ids = (0, 3, 6, 8, 10)
    params = {}
    for i, tid in enumerate(conv_ids):
        w = np.asarray(alex_state[f"{tid}.weight"], np.float32)  # OIHW
        b = np.asarray(alex_state[f"{tid}.bias"], np.float32)
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),  # HWIO
            "bias": jnp.asarray(b),
        }
        lw = np.asarray(lin_state[f"lin{i}.model.1.weight"], np.float32)
        params[f"lin{i}"] = {
            "kernel": jnp.asarray(lw.reshape(lw.shape[1], 1, 1, 1)
                                  .transpose(1, 2, 0, 3))}  # (1,1,ci,1)
    return params


def load_lpips(path: Optional[str] = None):
    """(Lpips, params) from a converted checkpoint, or None when absent.

    ``path``: .npz of flattened params (``scripts/convert_weights.py`` style)
    or a torch .pth saved as {"alex": features_state, "lin": lpips_lin_state}.
    Checked locations when None: $LPIPS_WEIGHTS, ./weights/lpips_alex.npz.
    """
    candidates = [path] if path else [
        os.environ.get("LPIPS_WEIGHTS", ""),
        os.path.join(os.getcwd(), "weights", "lpips_alex.npz"),
    ]
    model = Lpips()
    for p in candidates:
        if not p or not os.path.exists(p):
            continue
        if p.endswith(".npz"):
            flat = dict(np.load(p))
            params: dict = {}
            for k, v in flat.items():
                mod, leaf = k.split("/")
                params.setdefault(mod, {})[leaf] = jnp.asarray(v)
            return model, params
        import torch  # pragma: no cover - torch path exercised in tests

        blob = torch.load(p, map_location="cpu")
        return model, lpips_params_from_torch(blob["alex"], blob["lin"])
    print("[metrics] LPIPS calibration weights not found — LPIPS disabled "
          "(PSNR/SSIM remain available); set $LPIPS_WEIGHTS to enable")
    return None
