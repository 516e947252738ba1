import math

import pytest

from animate3d_tpu.core.registry import register, find
from animate3d_tpu.core.schedule import C
from animate3d_tpu.core.config import (
    C_max,
    load_config,
    parse_cli_overrides,
    parse_structured,
)
from dataclasses import dataclass, field


def test_registry_basic_and_composition():
    @register("test-base")
    class Base:
        def who(self):
            return "base"

    @register("test-mixin")
    class Mixin:
        def who(self):
            return "mixin"

    assert find("test-base") is Base
    composed = find("test-base:test-mixin")
    assert composed.__mro__[1] is Mixin  # sub takes precedence
    assert composed().who() == "mixin"


def test_schedule_plain_scalar():
    assert C(0.5, 0, 100) == 0.5
    assert C(3, 0, 0) == 3


def test_schedule_three_and_four_elem():
    # [start, end, end_step] -> start_step=0
    assert C([0.0, 1.0, 10], 0, 0) == 0.0
    assert C([0.0, 1.0, 10], 0, 5) == pytest.approx(0.5)
    assert C([0.0, 1.0, 10], 0, 20) == 1.0
    # [start_step, start, end, end_step]
    assert C([10, 2.0, 4.0, 20], 0, 15) == pytest.approx(3.0)
    assert C([10, 2.0, 4.0, 20], 0, 0) == 2.0


def test_schedule_exp_interp():
    v = C([0, 1.0, 100.0, 10], 0, 5, interpolation="exp")
    assert v == pytest.approx(10.0)


def test_schedule_epoch_clock():
    # float end_step switches the clock to epochs
    assert C([0, 0.0, 1.0, 10.0], 5, 99999) == pytest.approx(0.5)


def test_schedule_multi_segment():
    # [s0, v0, v1, e0, v2, e1]: second segment from step e0 to e1
    spec = [0, 0.0, 1.0, 10, 2.0, 20]
    assert C(spec, 0, 5) == pytest.approx(0.5)
    assert C(spec, 0, 15) == pytest.approx(1.5)
    assert C(spec, 0, 25) == 2.0


def test_cmax():
    assert C_max(0.7) == 0.7
    assert C_max([0, 0.0, 1.0, 10]) == 1.0
    assert C_max([0, 0.0, 1.0, 10, 5.0, 20]) == 5.0


def test_cli_overrides():
    cfg = parse_cli_overrides(["a.b.c=3", "a.d=[1,2]", "name=hello", "flag=true"])
    assert cfg == {"a": {"b": {"c": 3}, "d": [1, 2]}, "name": "hello", "flag": True}


def test_parse_structured_rejects_unknown():
    @dataclass
    class Cfg:
        x: int = 1

    assert parse_structured(Cfg, {"x": 5}).x == 5
    with pytest.raises(ValueError):
        parse_structured(Cfg, {"y": 2})


def test_parse_structured_nested():
    @dataclass
    class Inner:
        a: int = 0

    @dataclass
    class Outer:
        inner: Inner = field(default_factory=Inner)

    out = parse_structured(Outer, {"inner": {"a": 7}})
    assert out.inner.a == 7


def test_load_config_interpolation(tmp_path):
    y = tmp_path / "cfg.yaml"
    y.write_text(
        """
name: "demo"
tag: "${rmspace:a b c,_}"
use_timestamp: false
exp_root_dir: "%s"
seed: 0
data:
  width: 256
  height: ${data.width}
  batch: ${idiv:${data.width},64}
system:
  lr: ${mul:2,0.5}
"""
        % tmp_path
    )
    cfg = load_config(str(y), cli_args=["data.width=128", "seed=3"])
    assert cfg.tag == "a_b_c"
    assert cfg.seed == 3
    assert cfg.data["width"] == 128
    assert cfg.data["height"] == 128
    assert cfg.data["batch"] == 2
    assert cfg.system["lr"] == pytest.approx(1.0)
    assert cfg.trial_dir.endswith("demo/a_b_c")
