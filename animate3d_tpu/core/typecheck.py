"""Opt-in runtime shape/dtype checking (``launch.py --typecheck``).

Parity target: reference launch.py:131-134 installs a jaxtyping import hook
over threestudio (``install_import_hook("threestudio",
"typeguard.typechecked")``) so annotated tensor shapes are validated at
runtime.

TPU design: instead of an import hook over unannotated code (which checks
nothing), :func:`enable_typecheck` wraps the framework's data boundaries —
the places user-supplied arrays enter jitted programs — with jaxtyping
contracts. Because the wrappers run at TRACE time, they validate every
compiled shape signature exactly once and add zero per-step cost on TPU;
a planted shape bug fails with a named-axis error message instead of an
opaque XLA broadcast failure 30 layers deep.

Boundaries covered:
  * ``Animate3DSystem.step``            — recon/refine training batches;
  * ``rendering.render_batch``          — camera pytree + timestamps;
  * ``ops.rasterize.rasterize``         — gaussian tensors vs camera;
  * ``ops.attention.multi_head_attention`` — merged-head q/k/v agreement.
"""

from __future__ import annotations

import functools
from typing import Optional

from jaxtyping import Array, Float, Num, jaxtyped
from typeguard import typechecked

_enabled = False
_originals: list = []


# -- boundary contracts -------------------------------------------------------
# Each contract is a jaxtyped function whose only job is to bind the named
# axes; calling it with mis-shaped arrays raises jaxtyping's TypeCheckError
# with the per-argument axis bindings spelled out.


@jaxtyped(typechecker=typechecked)
def _check_recon_batch(
    rgb: Num[Array, "bnf h w 3"],
    mask: Num[Array, "bnf h w 1"],
    timestamps: Num[Array, "bnf"],
) -> None:
    pass


@jaxtyped(typechecker=typechecked)
def _check_render_batch(
    timestamps: Num[Array, "b"],
    w2c: Float[Array, "b 4 4"],
    full_proj: Float[Array, "b 4 4"],
    cam_pos: Float[Array, "b 3"],
) -> None:
    pass


@jaxtyped(typechecker=typechecked)
def _check_rasterize(
    means: Float[Array, "n 3"],
    scales: Float[Array, "n 3"],
    quats: Float[Array, "n 4"],
    opacity: Float[Array, "n"],
) -> None:
    pass


@jaxtyped(typechecker=typechecked)
def _check_attention(
    q: Num[Array, "b sq c"],
    k: Num[Array, "b sk c"],
    v: Num[Array, "b sk c"],
) -> None:
    pass


def _wrap(obj, name: str, make_wrapper) -> None:
    fn = getattr(obj, name)
    wrapped = make_wrapper(fn)
    functools.update_wrapper(wrapped, fn)
    _originals.append((obj, name, fn))
    setattr(obj, name, wrapped)


def enable_typecheck() -> None:
    """Install the shape contracts (idempotent)."""
    global _enabled
    if _enabled:
        return
    _enabled = True

    import jax.numpy as jnp

    from animate3d_tpu.ops import attention as attn_mod
    from animate3d_tpu.ops import rasterize as rast_mod
    from animate3d_tpu.rendering import renderer4d as r4d_mod
    from animate3d_tpu.systems import animate3d as sys_mod

    def sys_step(fn):
        def wrapper(self, batch, key, guidance_batch=None):
            _check_recon_batch(jnp.asarray(batch["rgb"]),
                               jnp.asarray(batch["mask"]),
                               jnp.asarray(batch["timestamps"]))
            return fn(self, batch, key, guidance_batch=guidance_batch)
        return wrapper

    _wrap(sys_mod.Animate3DSystem, "step", sys_step)

    def render_batch(fn):
        def wrapper(state, deform_fn, cameras, timestamps, cfg, **kw):
            _check_render_batch(jnp.asarray(timestamps),
                                jnp.asarray(cameras.world_view),
                                jnp.asarray(cameras.full_proj),
                                jnp.asarray(cameras.camera_center))
            return fn(state, deform_fn, cameras, timestamps, cfg, **kw)
        return wrapper

    _wrap(r4d_mod, "render_batch", render_batch)
    # systems/animate3d.py imported render_batch by name — patch its binding
    _wrap(sys_mod, "render_batch", render_batch)

    def rasterize(fn):
        def wrapper(means, scales, quats, opacity, cam, cfg, **kw):
            _check_rasterize(jnp.asarray(means), jnp.asarray(scales),
                             jnp.asarray(quats), jnp.asarray(opacity))
            return fn(means, scales, quats, opacity, cam, cfg, **kw)
        return wrapper

    _wrap(rast_mod, "rasterize", rasterize)

    def mha(fn):
        def wrapper(q, k, v, num_heads, scale=None, backend="auto"):
            _check_attention(q, k, v)
            if q.shape[-1] % num_heads:
                raise ValueError(
                    f"multi_head_attention: channels {q.shape[-1]} not "
                    f"divisible by num_heads {num_heads}")
            return fn(q, k, v, num_heads, scale=scale, backend=backend)
        return wrapper

    _wrap(attn_mod, "multi_head_attention", mha)
    # modules that imported the symbol by name hold their own binding
    from animate3d_tpu.models import attention_layers as attn_layers_mod

    _wrap(attn_layers_mod, "multi_head_attention", mha)


def disable_typecheck() -> None:
    """Restore the unwrapped functions (tests use this to avoid leaking)."""
    global _enabled
    while _originals:
        obj, name, fn = _originals.pop()
        setattr(obj, name, fn)
    _enabled = False
