"""Device mesh + sharding helpers.

Replaces the reference's NCCL process-group bootstrap (train.py:55-84,
torchrun/SLURM env parsing) with the JAX model: one global
``jax.sharding.Mesh`` and NamedShardings; gradient reduction is inserted by
XLA as ``psum`` over ICI.

Axes:
  * ``dp`` — data parallel over the (B·N) batch/view axis (the reference's
    only strategy, DDP at train.py:457);
  * ``sp`` — optional view/frame sharding of attention sequences (the
    TPU-native upgrade path the reference lacks; SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, sp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // sp
    assert dp * sp == len(devices), (dp, sp, len(devices))
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (B·N) axis across dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array in the pytree with its leading axis sharded on dp."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def shard_leading_where_divisible(mesh: Mesh, tree):
    """ZeRO-1-style placement: shard each leaf's leading axis over dp when
    it divides evenly, replicate otherwise. Used for optimizer state — the
    Adam moments are elementwise over params, so GSPMD slices the
    (replicated) gradients for the sharded update and all-gathers the
    updated params back to their replicated output sharding; memory for
    the moments drops ~1/dp with no numerics change."""
    dp = mesh.shape["dp"]
    rep = replicated(mesh)

    def place(x):
        shape = getattr(x, "shape", ())
        if len(shape) >= 1 and shape[0] % dp == 0 and shape[0] > 0:
            return jax.device_put(x, NamedSharding(mesh, P("dp")))
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(place, tree)
