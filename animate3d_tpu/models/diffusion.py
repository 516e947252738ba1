"""Diffusion schedules: DDIM (+ DDPM noising) and FreeInit, as pure functions.

Parity: diffusers DDIMScheduler with the reference's config
(configs/inference/inference.yaml noise_scheduler_kwargs: 1000 train steps,
beta 0.00085→0.012 linear, steps_offset 1, clip_sample false;
training/i2v noising at train.py:533-550) and diffusers FreeInitMixin
(butterworth low-pass noise re-initialization, pipeline.py:987-999) —
re-expressed as jit-friendly table lookups so the whole sampling loop scans.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "linear"  # linear | scaled_linear
    steps_offset: int = 1
    clip_sample: bool = False
    set_alpha_to_one: bool = True
    prediction_type: str = "epsilon"


class DDIMScheduler(NamedTuple):
    """Precomputed tables (device arrays) + static config."""

    alphas_cumprod: jnp.ndarray  # (T,)
    final_alpha_cumprod: jnp.ndarray  # ()
    config: SchedulerConfig

    @classmethod
    def create(cls, config: SchedulerConfig = SchedulerConfig()) -> "DDIMScheduler":
        t = config.num_train_timesteps
        if config.beta_schedule == "linear":
            betas = np.linspace(config.beta_start, config.beta_end, t, dtype=np.float64)
        elif config.beta_schedule == "scaled_linear":
            betas = np.linspace(config.beta_start ** 0.5, config.beta_end ** 0.5, t,
                                dtype=np.float64) ** 2
        else:
            raise ValueError(config.beta_schedule)
        alphas_cumprod = np.cumprod(1.0 - betas)
        final = 1.0 if config.set_alpha_to_one else alphas_cumprod[0]
        return cls(
            alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
            final_alpha_cumprod=jnp.asarray(final, jnp.float32),
            config=config,
        )

    def timesteps(self, num_inference_steps: int) -> jnp.ndarray:
        """Descending (num_inference_steps,) int32 timesteps (diffusers
        'leading' spacing + steps_offset)."""
        step_ratio = self.config.num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * step_ratio).round()[::-1].copy()
        ts = ts + self.config.steps_offset
        return jnp.asarray(ts, jnp.int32)

    def _alpha(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.alphas_cumprod[jnp.clip(t, 0, None)]

    def pred_original(self, sample: jnp.ndarray, eps: jnp.ndarray,
                      t: jnp.ndarray) -> jnp.ndarray:
        """x0 prediction from epsilon (scheduler.step(...).pred_original_sample,
        used by 4D-SDS at animatemv_guidance.py:466)."""
        a_t = self._alpha(t)
        shape = (-1,) + (1,) * (sample.ndim - 1)
        a_t = a_t.reshape(shape) if a_t.ndim else a_t
        return (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)

    def step(
        self,
        eps: jnp.ndarray,
        t: jnp.ndarray,
        sample: jnp.ndarray,
        num_inference_steps: int,
        eta: float = 0.0,
        noise: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One deterministic DDIM step. Returns (prev_sample, pred_x0)."""
        cfg = self.config
        prev_t = t - cfg.num_train_timesteps // num_inference_steps
        a_t = self._alpha(t)
        a_prev = jnp.where(prev_t >= 0, self._alpha(prev_t), self.final_alpha_cumprod)

        x0 = (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        if cfg.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)

        if eta > 0.0:
            assert noise is not None
            var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
            sigma = eta * jnp.sqrt(var)
            dir_coeff = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma ** 2, 0.0))
            prev = jnp.sqrt(a_prev) * x0 + dir_coeff * eps + sigma * noise
        else:
            prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
        return prev, x0

    def add_noise(self, x0: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        """Forward diffusion q(x_t | x_0) (training + SDS noising)."""
        a_t = self._alpha(t)
        while a_t.ndim < x0.ndim:
            a_t = a_t[..., None]
        return jnp.sqrt(a_t) * x0 + jnp.sqrt(1.0 - a_t) * noise

    def velocity(self, x0: jnp.ndarray, noise: jnp.ndarray,
                 t: jnp.ndarray) -> jnp.ndarray:
        a_t = self._alpha(t)
        while a_t.ndim < x0.ndim:
            a_t = a_t[..., None]
        return jnp.sqrt(a_t) * noise - jnp.sqrt(1.0 - a_t) * x0


jax.tree_util.register_pytree_node(
    DDIMScheduler,
    lambda s: ((s.alphas_cumprod, s.final_alpha_cumprod), s.config),
    lambda cfg, children: DDIMScheduler(children[0], children[1], cfg),
)


# ---------------------------------------------------------------------------
# FreeInit (diffusers FreeInitMixin, butterworth variant)
# ---------------------------------------------------------------------------


def _butterworth_lowpass_3d(shape: Tuple[int, int, int], d_s: float = 0.25,
                            d_t: float = 0.25, order: int = 4) -> np.ndarray:
    """(F, H, W) low-pass mask over centered normalized frequencies."""
    f, h, w = shape
    if d_s == 0 or d_t == 0:
        return np.zeros(shape, np.float32)
    ts = ((np.arange(f) / f) * 2 - 1)[:, None, None] / d_t
    hs = ((np.arange(h) / h) * 2 - 1)[None, :, None] / d_s
    ws = ((np.arange(w) / w) * 2 - 1)[None, None, :] / d_s
    d2 = ts ** 2 + hs ** 2 + ws ** 2
    return (1.0 / (1.0 + d2 ** order)).astype(np.float32)


def freeinit_blend(
    diffused_latents: jnp.ndarray,  # (B, F, h, w, C) — re-noised previous sample
    fresh_noise: jnp.ndarray,  # same shape
    filter_order: int = 4,
    cutoff_spatial: float = 0.25,
    cutoff_temporal: float = 0.25,
) -> jnp.ndarray:
    """Low-frequency of the diffused latents + high-frequency of fresh noise
    (diffusers freq_mix_3d with a butterworth LPF)."""
    b, f, h, w, c = diffused_latents.shape
    lpf = jnp.asarray(_butterworth_lowpass_3d((f, h, w), cutoff_spatial,
                                              cutoff_temporal, filter_order))
    lpf = jnp.fft.ifftshift(lpf)  # mask built in centered coords
    lpf = lpf[None, :, :, :, None]

    x_freq = jnp.fft.fftn(diffused_latents.astype(jnp.complex64), axes=(1, 2, 3))
    n_freq = jnp.fft.fftn(fresh_noise.astype(jnp.complex64), axes=(1, 2, 3))
    mixed = x_freq * lpf + n_freq * (1.0 - lpf)
    return jnp.real(jnp.fft.ifftn(mixed, axes=(1, 2, 3))).astype(diffused_latents.dtype)
