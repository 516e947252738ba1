"""Time-varying scalar schedules.

``C(value, epoch, global_step)`` evaluates a config scalar that may be either
a plain number or a piecewise schedule list:

  * ``[start, end, end_step]``              (start_step = 0)
  * ``[start_step, start, end, end_step]``
  * multi-segment: ``[s0, v0, v1, e0, v2, e1, ...]`` — pairs of
    ``(value, boundary_step)`` appended after the first 4-tuple.

``end_step`` being a float switches the clock from ``global_step`` to
``epoch``. Interpolation is ``"linear"`` or ``"exp"`` (log-space linear).

Behavior parity: threestudio/utils/misc.py:66-101 in the reference; used for
LR / loss-weight / timestep-range annealing throughout the 4D stage.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence, Union

Scalar = Union[int, float]


def C(value: Any, epoch: int, global_step: int, interpolation: str = "linear") -> float:
    if isinstance(value, (int, float)):
        return value
    value = list(value)
    if not isinstance(value, list):
        raise TypeError(f"Scalar schedule must be a number or list, got {type(value)}")
    if len(value) == 3:
        value = [0] + value
    if len(value) >= 6:
        select_i = 3
        for i in range(3, len(value) - 2, 2):
            if global_step >= value[i]:
                select_i = i + 2
        if select_i != 3:
            start_value, start_step = value[select_i - 3], value[select_i - 2]
        else:
            start_step, start_value = value[:2]
        end_value, end_step = value[select_i - 1], value[select_i]
        value = [start_step, start_value, end_value, end_step]
    if len(value) != 4:
        raise ValueError(f"Cannot interpret schedule spec {value}")
    start_step, start_value, end_value, end_step = value
    current_step = epoch if isinstance(end_step, float) else global_step
    t = max(min(1.0, (current_step - start_step) / (end_step - start_step)), 0.0)
    if interpolation == "linear":
        return start_value + (end_value - start_value) * t
    if interpolation == "exp":
        return math.exp(math.log(start_value) * (1 - t) + math.log(end_value) * t)
    raise ValueError(f"Unknown interpolation {interpolation!r} (linear|exp)")


def c_schedule(value: Any, interpolation: str = "linear") -> Callable:
    """jit-traceable optax-style schedule: step → scalar, same semantics as
    :func:`C` for plain numbers and [start, end, end_step] /
    [start_step, start, end, end_step] specs (step clock only)."""
    import jax.numpy as jnp

    if isinstance(value, (int, float)):
        return lambda step: jnp.float32(value)
    spec = list(value)
    if len(spec) == 3:
        spec = [0] + spec
    if len(spec) != 4:
        raise ValueError(f"c_schedule supports single-segment specs, got {spec}")
    start_step, start_value, end_value, end_step = [float(v) for v in spec]

    def fn(step):
        t = jnp.clip((step - start_step) / (end_step - start_step), 0.0, 1.0)
        if interpolation == "linear":
            return start_value + (end_value - start_value) * t
        return jnp.exp(math.log(start_value) * (1 - t) + math.log(end_value) * t)

    return fn
