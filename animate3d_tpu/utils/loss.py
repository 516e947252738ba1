"""Loss helpers (threestudio/utils/loss.py parity)."""

from __future__ import annotations

import jax.numpy as jnp


def tv_loss(img: jnp.ndarray) -> jnp.ndarray:
    """Total-variation loss on (B, H, W, C) images (threestudio tv_loss
    semantics: mean squared neighbor differences along H and W, averaged)."""
    h_diff = img[:, 1:, :, :] - img[:, :-1, :, :]
    w_diff = img[:, :, 1:, :] - img[:, :, :-1, :]
    return jnp.mean(h_diff ** 2) + jnp.mean(w_diff ** 2)
