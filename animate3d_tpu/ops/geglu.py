"""Fused GEGLU feed-forward (Pallas TPU kernel + XLA reference path).

The MV-VDM transformer blocks' feed-forward is diffusers' GEGLU
(reference animatediff uses diffusers FeedForward: ``proj = x @ W1 + b1;
h, g = split(proj); y = (h * gelu(g)) @ W2 + b2`` — exact erf GELU).  As
three XLA ops the (M, 2I) projection and the (M, I) gated hidden round-trip
through HBM between the two matmuls; measured ~75 TF/s at L0 vs the convs'
~190 TF/s (docs/denoise_roofline.md, lever (b)).  This kernel keeps the
hidden in VMEM: for each row block, stream inner-dim blocks — two column
slices of W1 in, gate in f32, one accumulating dot against the matching W2
row block.

Backward is the plain-XLA vjp of the reference expression (one extra
``x @ W1`` recompute — the MV-VDM trainer remats these blocks anyway), so
the kernel needs no hand-written gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BM = 256  # row block
_BI = 640  # inner-dim block (5×128 lanes; divides the SD1.5 inner dims 1280/2560/5120)


def _gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * x * (1.0 + jax.lax.erf(x * (2.0 ** -0.5)))


def _erf_as7126(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz & Stegun 7.1.26 rational erf (|eps| <= 1.5e-7, far below
    bf16 resolution).  Used only inside the Pallas kernel: Mosaic has no
    lowering for lax.erf (checked in jax's tpu lowering tables), while exp
    and rcp lower fine."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_kernel_approx(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * x * (1.0 + _erf_as7126(x * (2.0 ** -0.5)))


def _geglu_reference(x, w1, b1, w2, b2, dtype):
    """Bit-compatible with the previous nn.Dense/split/gelu/nn.Dense chain
    (all math in ``dtype``, exact erf GELU)."""
    x = x.astype(dtype)
    p = x @ w1.astype(dtype) + b1.astype(dtype)
    h, g = jnp.split(p, 2, axis=-1)
    h = h * _gelu_exact(g)
    return h @ w2.astype(dtype) + b2.astype(dtype)


def _geglu_kernel(x_ref, w1h_ref, b1h_ref, w1g_ref, b1g_ref, w2_ref, b2_ref,
                  o_ref, acc_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xb = x_ref[...]  # (BM, Cp) input dtype — MXU runs native bf16
    ph = jnp.dot(xb, w1h_ref[...], preferred_element_type=jnp.float32) + b1h_ref[...]
    pg = jnp.dot(xb, w1g_ref[...], preferred_element_type=jnp.float32) + b1g_ref[...]
    h = ph * _gelu_kernel_approx(pg)
    acc_ref[:] = acc_ref[:] + jnp.dot(
        h.astype(xb.dtype), w2_ref[...], preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _():
        o_ref[...] = (acc_ref[:] + b2_ref[...]).astype(o_ref.dtype)


def _pad_axis(x, axis, multiple):
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _geglu_pallas(x, w1, b1, w2, b2, dtype, interpret=None):
    """x (M, C); w1 (C, 2I); w2 (I, C) → (M, C)."""
    m, c = x.shape
    inner = w2.shape[0]
    cp = c + ((-c) % 128)

    x = _pad_axis(_pad_axis(x.astype(dtype), 1, 128), 0, _BM)
    mp = x.shape[0]
    w1 = w1.astype(dtype)
    w1h = _pad_axis(w1[:, :inner], 0, 128)
    w1g = _pad_axis(w1[:, inner:], 0, 128)
    b1h = b1[:inner].astype(jnp.float32).reshape(1, inner)
    b1g = b1[inner:].astype(jnp.float32).reshape(1, inner)
    w2p = _pad_axis(w2.astype(dtype), 1, 128)
    b2p = _pad_axis(b2.astype(jnp.float32).reshape(1, c), 1, 128)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _geglu_kernel,
        grid=(mp // _BM, inner // _BI),
        in_specs=[
            pl.BlockSpec((_BM, cp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, _BI), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BI), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, _BI), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BI), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BI, cp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BM, cp), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, cp), dtype),
        scratch_shapes=[pltpu.VMEM((_BM, cp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, w1h, b1h, w1g, b1g, w2p, b2p)
    return out[:m, :c]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _geglu_fused(dtype, x, w1, b1, w2, b2):
    return _geglu_pallas(x, w1, b1, w2, b2, dtype)


def _geglu_fused_fwd(dtype, x, w1, b1, w2, b2):
    return _geglu_fused(dtype, x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _geglu_fused_bwd(dtype, res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(lambda *a: _geglu_reference(*a, dtype), x, w1, b1, w2, b2)
    return vjp(g.astype(dtype))


_geglu_fused.defvjp(_geglu_fused_fwd, _geglu_fused_bwd)


def geglu_ff(x, w1, b1, w2, b2, dtype=jnp.float32):
    """GEGLU feed-forward over the last axis of ``x``; picks the Pallas
    kernel on TPU (inner dim permitting), XLA elsewhere."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    inner = w2.shape[0]
    if (jax.default_backend() == "tpu" and inner % _BI == 0
            and x2.shape[0] >= _BM):
        y = _geglu_fused(dtype, x2, w1, b1, w2, b2)
    else:
        y = _geglu_reference(x2, w1, b1, w2, b2, dtype)
    return y.reshape(lead + (w2.shape[1],))
