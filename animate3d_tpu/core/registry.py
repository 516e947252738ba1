"""Module registry.

Named registration/lookup of systems, geometries, renderers, guidances and
datamodules so YAML configs can select implementations by string, including
the ``"main:sub"`` multiple-inheritance composition syntax.

Behavior parity: threestudio/__init__.py:5-32 in the reference.
"""

from __future__ import annotations

from typing import Any, Dict, Type

__modules__: Dict[str, Type[Any]] = {}


def register(name: str):
    """Class decorator registering ``cls`` under ``name``."""

    def decorator(cls):
        if name in __modules__ and __modules__[name] is not cls:
            raise ValueError(f"Module {name!r} already registered")
        __modules__[name] = cls
        return cls

    return decorator


def find(name: str) -> Type[Any]:
    """Look up a registered class.

    ``"main:sub"`` (or ``"main:sub1,sub2"``) composes a new type whose MRO is
    ``(sub1, sub2, ..., main)`` — used by configs to mix behaviors into a base
    system.
    """
    if ":" in name:
        main_name, sub_name = name.split(":")
        name_list = sub_name.split(",") + [main_name]
        return type(
            f"{main_name}.{sub_name}",
            tuple(__modules__[n] for n in name_list),
            {},
        )
    if name not in __modules__:
        raise KeyError(
            f"No module registered under {name!r}; known: {sorted(__modules__)}"
        )
    return __modules__[name]


def registered() -> Dict[str, Type[Any]]:
    return dict(__modules__)
