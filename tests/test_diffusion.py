import numpy as np
import jax
import jax.numpy as jnp
import pytest

from animate3d_tpu.models.diffusion import (
    DDIMScheduler,
    SchedulerConfig,
    freeinit_blend,
    _butterworth_lowpass_3d,
)


@pytest.fixture(scope="module")
def sched():
    return DDIMScheduler.create(SchedulerConfig())


def test_timesteps_leading_spacing(sched):
    ts = np.asarray(sched.timesteps(25))
    assert len(ts) == 25
    assert ts[0] == 961  # 24*40 + steps_offset
    assert ts[-1] == 1
    assert np.all(np.diff(ts) == -40)


def test_add_noise_endpoints(sched):
    x0 = jnp.ones((2, 3))
    noise = jnp.full((2, 3), 2.0)
    # t=0: almost all signal
    out0 = np.asarray(sched.add_noise(x0, noise, jnp.asarray([0, 0])))
    np.testing.assert_allclose(out0, 1.0 * np.sqrt(1 - 0.00085) + 2.0 * np.sqrt(0.00085),
                               rtol=1e-4)
    # t=999: mostly noise
    out1 = np.asarray(sched.add_noise(x0, noise, jnp.asarray([999, 999])))
    a = np.asarray(sched.alphas_cumprod)[-1]
    np.testing.assert_allclose(out1, np.sqrt(a) + 2 * np.sqrt(1 - a), rtol=1e-4)


def test_ddim_deterministic_roundtrip(sched):
    # one forward noising + one full-step denoise with the true eps recovers x0
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 4, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4))
    t = jnp.asarray(961)
    xt = sched.add_noise(x0, noise, t)
    pred = sched.pred_original(xt, noise, t)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(x0), atol=1e-4)


def test_ddim_step_reduces_noise_level(sched):
    # stepping with the exact eps moves the sample to the correct xt_prev
    x0 = jnp.ones((1, 4))
    noise = jax.random.normal(jax.random.PRNGKey(2), (1, 4))
    t = jnp.asarray(961)
    xt = sched.add_noise(x0, noise, t)
    prev, pred_x0 = sched.step(noise, t, xt, num_inference_steps=25)
    expected = sched.add_noise(x0, noise, jnp.asarray(921))
    np.testing.assert_allclose(np.asarray(prev), np.asarray(expected), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0), atol=1e-4)


def test_ddim_full_chain_with_zero_noise(sched):
    # if the model always predicts eps=0, sampling converges to x0 = xT/sqrt(a)
    ts = sched.timesteps(25)
    x = jnp.ones((1, 2))

    def body(x, t):
        prev, _ = sched.step(jnp.zeros_like(x), t, x, 25)
        return prev, None

    out, _ = jax.lax.scan(body, x, ts)
    a0 = np.asarray(sched.alphas_cumprod)[961]
    np.testing.assert_allclose(np.asarray(out), 1.0 / np.sqrt(a0), rtol=1e-3)


def test_butterworth_filter_shape_and_range():
    lpf = _butterworth_lowpass_3d((8, 16, 16))
    assert lpf.shape == (8, 16, 16)
    assert lpf.max() <= 1.0 and lpf.min() >= 0.0
    # center (DC after shift) is ~1
    assert lpf[4, 8, 8] == pytest.approx(1.0, abs=1e-6)


def test_freeinit_preserves_low_freq():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1, 8, 16, 16, 4))  # pure DC
    noise = jax.random.normal(key, x.shape)
    out = freeinit_blend(x, noise)
    # DC comes from x (the filter ≈1 at DC): mean ≈ 1
    assert np.asarray(out).mean() == pytest.approx(1.0, abs=0.05)
    # high-frequency energy comes from the noise
    assert np.asarray(out).std() > 0.1
