"""Config system: YAML + dotted CLI overrides + structured dataclasses.

Keeps the reference's config semantics (threestudio/utils/config.py:10-128)
without the OmegaConf dependency:

  * multiple YAML files deep-merged in order, then ``key.path=value`` CLI
    overrides (values parsed as YAML), then explicit kwargs;
  * ``${...}`` interpolation with path references plus the resolver set the
    reference registers (add/sub/mul/div/idiv/basename/rmspace/tuple2/gt0/
    cmaxgt0/not/cmaxgt0orcmaxgt0/calc_exp_lr_decay_rate);
  * per-module structured dataclass validation via :func:`parse_structured`;
  * :class:`ExperimentConfig` with trial-dir handling.
"""

from __future__ import annotations

import dataclasses
import os
import re
from dataclasses import dataclass, field, fields as dc_fields, is_dataclass
from datetime import datetime
from typing import Any, Dict, List, Optional

import yaml

from animate3d_tpu.core.schedule import C  # noqa: F401  (re-export convenience)


def C_max(value: Any) -> float:
    """Max value a C() schedule can reach (for gt0-style config predicates)."""
    if isinstance(value, (int, float)):
        return value
    value = list(value)
    if len(value) >= 6:
        max_value = value[2]
        for i in range(4, len(value), 2):
            max_value = max(max_value, value[i])
        value = [value[0], value[1], max_value, value[3]]
    if len(value) == 3:
        value = [0] + value
    assert len(value) == 4
    _, start_value, end_value, _ = value
    return max(start_value, end_value)


_RESOLVERS = {
    "calc_exp_lr_decay_rate": lambda factor, n: factor ** (1.0 / n),
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "idiv": lambda a, b: a // b,
    "basename": lambda p: os.path.basename(p),
    "rmspace": lambda s, sub: s.replace(" ", sub),
    "tuple2": lambda s: [float(s), float(s)],
    "gt0": lambda s: s > 0,
    "cmaxgt0": lambda s: C_max(s) > 0,
    "not": lambda s: not s,
    "cmaxgt0orcmaxgt0": lambda a, b: C_max(a) > 0 or C_max(b) > 0,
}

# innermost ${...} (no nested braces inside)
_INTERP_RE = re.compile(r"\$\{([^${}]+)\}")


def deep_merge(base: Any, override: Any) -> Any:
    """Merge ``override`` into ``base`` (dicts merged recursively, else replaced)."""
    if isinstance(base, dict) and isinstance(override, dict):
        out = dict(base)
        for k, v in override.items():
            out[k] = deep_merge(out[k], v) if k in out else v
        return out
    return override


def set_dotted(cfg: Dict[str, Any], dotted_key: str, value: Any) -> None:
    keys = dotted_key.split(".")
    node = cfg
    for k in keys[:-1]:
        nxt = node.get(k)
        if not isinstance(nxt, dict):
            nxt = {}
            node[k] = nxt
        node = nxt
    node[keys[-1]] = value


def parse_cli_overrides(args: List[str]) -> Dict[str, Any]:
    cfg: Dict[str, Any] = {}
    for arg in args:
        if "=" not in arg:
            raise ValueError(f"CLI override must look like key.path=value, got {arg!r}")
        key, raw = arg.split("=", 1)
        set_dotted(cfg, key.strip(), yaml.safe_load(raw) if raw != "" else None)
    return cfg


def _lookup(root: Any, path: str) -> Any:
    node = root
    for part in path.split("."):
        if isinstance(node, dict):
            node = node[part]
        elif isinstance(node, (list, tuple)):
            node = node[int(part)]
        else:
            node = getattr(node, part)
    return node


def _parse_scalar(tok: str) -> Any:
    return yaml.safe_load(tok) if tok != "" else ""


def _resolve_expr(expr: str, root: Any) -> Any:
    expr = expr.strip()
    if ":" in expr:
        name, _, argstr = expr.partition(":")
        name = name.strip()
        if name in _RESOLVERS:
            args = [_parse_scalar(a.strip()) for a in argstr.split(",")] if argstr else []
            return _RESOLVERS[name](*args)
    return _lookup(root, expr)


def resolve_interpolations(node: Any, root: Any, _depth: int = 0) -> Any:
    """Resolve ``${...}`` references; innermost-first, to fixpoint."""
    if _depth > 32:
        raise RecursionError("Interpolation depth exceeded (cycle?)")
    if isinstance(node, dict):
        return {k: resolve_interpolations(v, root, _depth) for k, v in node.items()}
    if isinstance(node, list):
        return [resolve_interpolations(v, root, _depth) for v in node]
    if isinstance(node, str):
        m = _INTERP_RE.fullmatch(node.strip())
        if m:  # whole-string interpolation: keep resolved type
            val = _resolve_expr(m.group(1), root)
            if isinstance(val, str) and _INTERP_RE.search(val):
                val = resolve_interpolations(val, root, _depth + 1)
            return val
        # embedded interpolation(s): substitute as strings
        def sub(match):
            v = _resolve_expr(match.group(1), root)
            return str(v)

        out = node
        for _ in range(32):
            m = _INTERP_RE.fullmatch(out.strip())
            if m:  # substitution collapsed to a single expression: keep type
                return resolve_interpolations(out, root, _depth + 1)
            new = _INTERP_RE.sub(sub, out)
            if new == out:
                return new
            out = new
        raise RecursionError(f"Interpolation did not converge for {node!r}")
    return node


def _fixpoint_resolve(cfg: Dict[str, Any]) -> Dict[str, Any]:
    # iterate so references-to-references settle
    for _ in range(8):
        new = resolve_interpolations(cfg, cfg)
        if new == cfg:
            return new
        cfg = new
    return cfg


def parse_structured(cls: Any, cfg: Optional[Dict[str, Any]] = None) -> Any:
    """Instantiate dataclass ``cls`` from a dict, recursing into dataclass
    fields. Unknown keys raise (config validation)."""
    cfg = dict(cfg or {})
    if not is_dataclass(cls):
        raise TypeError(f"{cls} is not a dataclass")
    names = {f.name: f for f in dc_fields(cls)}
    unknown = set(cfg) - set(names)
    if unknown:
        raise ValueError(f"Unknown config keys for {cls.__name__}: {sorted(unknown)}")
    kwargs = {}
    for k, v in cfg.items():
        ftype = names[k].type
        if is_dataclass(ftype) and isinstance(v, dict):
            v = parse_structured(ftype, v)
        kwargs[k] = v
    return cls(**kwargs)


def config_to_primitive(config: Any, resolve: bool = True) -> Any:
    if is_dataclass(config) and not isinstance(config, type):
        return {f.name: config_to_primitive(getattr(config, f.name)) for f in dc_fields(config)}
    if isinstance(config, dict):
        return {k: config_to_primitive(v) for k, v in config.items()}
    if isinstance(config, (list, tuple)):
        return [config_to_primitive(v) for v in config]
    return config


def dump_config(path: str, config: Any) -> None:
    with open(path, "w") as fp:
        yaml.safe_dump(config_to_primitive(config), fp, sort_keys=False)


@dataclass
class ExperimentConfig:
    """Top-level experiment config (reference: threestudio/utils/config.py:51-101)."""

    name: str = "default"
    description: str = ""
    tag: str = ""
    seed: int = 0
    use_timestamp: bool = True
    timestamp: Optional[str] = None
    exp_root_dir: str = "outputs"

    # derived
    exp_dir: str = "outputs/default"
    trial_name: str = "exp"
    trial_dir: str = "outputs/default/exp"
    n_devices: int = 1

    resume: Optional[str] = None

    data_type: str = ""
    data: dict = field(default_factory=dict)

    system_type: str = ""
    system: dict = field(default_factory=dict)

    trainer: dict = field(default_factory=dict)
    checkpoint: dict = field(default_factory=dict)

    def __post_init__(self):
        if not self.tag and not self.use_timestamp:
            raise ValueError("Either tag is specified or use_timestamp is True.")
        self.trial_name = self.tag
        if self.timestamp is None:
            self.timestamp = ""
            if self.use_timestamp and self.n_devices <= 1:
                self.timestamp = datetime.now().strftime("@%Y%m%d-%H%M%S")
        self.trial_name += self.timestamp
        self.exp_dir = os.path.join(self.exp_root_dir, self.name)
        self.trial_dir = os.path.join(self.exp_dir, self.trial_name)


def load_config(
    *yamls: str,
    cli_args: Optional[List[str]] = None,
    from_string: bool = False,
    makedirs: bool = True,
    **kwargs: Any,
) -> ExperimentConfig:
    confs = []
    for y in yamls:
        raw = y if from_string else open(y).read()
        confs.append(yaml.safe_load(raw) or {})
    cfg: Dict[str, Any] = {}
    for c in confs:
        cfg = deep_merge(cfg, c)
    cfg = deep_merge(cfg, parse_cli_overrides(list(cli_args or [])))
    cfg = deep_merge(cfg, kwargs)
    cfg = _fixpoint_resolve(cfg)
    scfg = parse_structured(ExperimentConfig, cfg)
    if makedirs:
        os.makedirs(scfg.trial_dir, exist_ok=True)
    return scfg
