"""MV-VDM trainer: data-parallel fine-tuning of motion modules + adapters.

Parity target: train.py:88-698 in the reference —
  * only ``motion_modules`` and i2v/spatial adapter params train
    (train.py:350-358, configs/training/train.yaml:34-36) via optax.masked;
  * the first frame stays noise-free as the I2V condition, one random
    timestep per video repeated across views, epsilon-MSE on frames 1..F−1
    (train.py:533-583);
  * 10% text-conditioning dropout for CFG (train.py:492-493);
  * AdamW + grad-norm clipping (train.py:360-366, 588-601).

TPU design: instead of DDP/NCCL (train.py:457), the train step is jitted over
a ``Mesh`` with the (B·N) batch axis sharded on ``dp``; XLA inserts the
gradient psum over ICI. bf16 activations replace AMP GradScaler (no loss
scaling needed in bf16). HBM discipline for one 16 GB chip: gradients and
optimizer state exist only for the trainable subtree (partition_params), the
frozen base can be stored bf16 (cast_frozen_bf16), and callers jit the step
with ``donate_argnums=(0, 1)`` so params/opt-state update in place.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from animate3d_tpu.models.diffusion import DDIMScheduler, SchedulerConfig

TRAINABLE_KEY_MARKERS = (
    "motion_modules",  # all temporal transformers
    "to_q_i2v", "to_k_i2v", "to_v_i2v", "to_out_i2v",  # I2V adapters
    "to_q_sp", "to_k_sp", "to_v_sp", "to_out_sp",  # spatial adapters
    "alpha_blender",
)


@dataclass(frozen=True)
class MVVDMTrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0
    cfg_dropout_prob: float = 0.1
    num_views: int = 4
    i2v_cond_time_zero: bool = False
    # LR schedule (diffusers get_scheduler surface, train.py:427-436)
    lr_scheduler: str = "constant"  # constant | linear | cosine
    lr_warmup_steps: int = 0
    max_train_steps: int = 100000  # decay horizon for linear/cosine
    # reference semantics: gradient_accumulation_steps only scales the LR
    # (train.py:128,427-428 — the loop itself steps every batch); with a dp
    # mesh the batch is scaled by device count instead, so this stays an
    # LR knob for config parity
    gradient_accumulation_steps: int = 1
    scale_lr: bool = False
    lr_scale_factor: float = 1.0  # batch_size × n_processes when scale_lr


def make_lr_schedule(cfg: MVVDMTrainConfig):
    lr = cfg.learning_rate
    if cfg.scale_lr:
        lr = lr * cfg.gradient_accumulation_steps * cfg.lr_scale_factor
    warmup = cfg.lr_warmup_steps * cfg.gradient_accumulation_steps
    total = max(cfg.max_train_steps * cfg.gradient_accumulation_steps, warmup + 1)
    if cfg.lr_scheduler == "constant":
        main = optax.constant_schedule(lr)
    elif cfg.lr_scheduler == "linear":
        main = optax.linear_schedule(lr, 0.0, total - warmup)
    elif cfg.lr_scheduler == "cosine":
        main = optax.cosine_decay_schedule(lr, total - warmup)
    else:
        raise ValueError(f"unknown lr_scheduler {cfg.lr_scheduler!r}")
    if warmup:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup), main], [warmup])
    return main


def trainable_mask(params) -> Any:
    """True for params the reference unfreezes (train.py:350-358)."""

    def mark(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        joined = "/".join(str(k) for k in keys)
        return any(m in joined for m in TRAINABLE_KEY_MARKERS)

    return jax.tree_util.tree_map_with_path(mark, params)


def partition_params(params) -> Tuple[Any, Any]:
    """(trainable, frozen) trees with ``None`` (empty-subtree) leaves on the
    other side, so gradients/optimizer state exist ONLY for the ~30% of
    params the reference unfreezes — full-tree gradients for the SD1.5-scale
    UNet are ~5 GB of HBM that the frozen base never uses."""
    mask = trainable_mask(params)
    train = jax.tree_util.tree_map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree_util.tree_map(lambda p, m: None if m else p, params, mask)
    return train, frozen


def combine_params(train, frozen):
    """Inverse of :func:`partition_params` (None leaves fill from the other
    tree)."""
    return jax.tree_util.tree_map(
        lambda t, f: f if t is None else t, train, frozen,
        is_leaf=lambda x: x is None)


def cast_frozen_bf16(params):
    """Cast the frozen base weights to bf16 in place of fp32 storage: the
    compute path casts them to bf16 anyway (model dtype), and they receive
    no updates — halves the resident bytes of the ~860M frozen params.
    Trainable params stay fp32 (optimizer master weights)."""
    train, frozen = partition_params(params)
    frozen = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, frozen)
    return combine_params(train, frozen)


def make_optimizer(params, cfg: MVVDMTrainConfig) -> optax.GradientTransformation:
    """AdamW over the trainable subtree only. ``init`` accepts either the
    full param tree or an already-partitioned trainable subtree; ``update``
    takes gradients of the trainable subtree (as produced by
    :func:`make_train_step`) — frozen params carry no state, no gradients,
    and no update buffers."""
    inner = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            learning_rate=make_lr_schedule(cfg),
            b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        ),
    )

    def init_fn(params):
        train, _ = partition_params(params)
        return inner.init(train)

    def update_fn(grads, state, params=None):
        train = partition_params(params)[0] if params is not None else None
        return inner.update(grads, state, train)

    return optax.GradientTransformation(init_fn, update_fn)


class TrainBatch(NamedTuple):
    """Pre-encoded training batch, leading axis = B·N (view-major)."""

    latents: jnp.ndarray  # (B·N, F, h, w, 4) clean VAE latents × 0.18215
    text_ctx: jnp.ndarray  # (B·N, 77, D)
    null_text_ctx: jnp.ndarray  # (B·N, 77, D) empty-prompt embeds (CFG dropout)
    camera: jnp.ndarray  # (B·N, 16)
    image_embeds: Optional[jnp.ndarray]  # (B·N, D_img) or None


def make_train_step(
    unet_apply: Callable,
    tx: optax.GradientTransformation,
    cfg: MVVDMTrainConfig,
    scheduler: Optional[DDIMScheduler] = None,
) -> Callable:
    """Returns jit-able ``train_step(params, opt_state, batch, key)`` →
    (params, opt_state, metrics)."""
    sched = scheduler or DDIMScheduler.create(SchedulerConfig())
    n_views = cfg.num_views
    T = sched.config.num_train_timesteps

    def loss_fn(train_params, frozen_params, batch: TrainBatch, key):
        params = combine_params(train_params, frozen_params)
        bn, f = batch.latents.shape[:2]
        b = bn // n_views
        k_t, k_noise, k_drop = jax.random.split(key, 3)

        # one timestep per video, repeated over views (train.py:541,563)
        t_video = jax.random.randint(k_t, (b,), 0, T)
        t = jnp.repeat(t_video, n_views)

        first = batch.latents[:, :1]
        rest = batch.latents[:, 1:]
        noise = jax.random.normal(k_noise, rest.shape, rest.dtype)
        noisy_rest = sched.add_noise(rest, noise, t)
        noisy = jnp.concatenate([first, noisy_rest], axis=1)

        # CFG dropout: whole-video text → empty prompt with prob p
        drop = jax.random.bernoulli(k_drop, cfg.cfg_dropout_prob, (b,))
        drop = jnp.repeat(drop, n_views)[:, None, None]
        text_ctx = jnp.where(drop, batch.null_text_ctx, batch.text_ctx)

        eps_pred = unet_apply(
            params, noisy, t, text_ctx, batch.camera, batch.image_embeds,
            i2v_cond_time_zero=cfg.i2v_cond_time_zero,
        )
        loss = jnp.mean((eps_pred[:, 1:].astype(jnp.float32)
                         - noise.astype(jnp.float32)) ** 2)
        return loss

    def train_step(params, opt_state, batch: TrainBatch, key):
        train, frozen = partition_params(params)
        loss, grads = jax.value_and_grad(loss_fn)(train, frozen, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        train = optax.apply_updates(train, updates)
        gnorm = optax.global_norm(grads)
        return (combine_params(train, frozen), opt_state,
                {"loss": loss, "grad_norm": gnorm})

    return train_step
