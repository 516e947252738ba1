"""--typecheck runtime shape contracts (reference launch.py:131-134 parity)
+ the wandb/progress logging shims."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def typechecked_env():
    from animate3d_tpu.core.typecheck import disable_typecheck, enable_typecheck

    enable_typecheck()
    yield
    disable_typecheck()


def _tiny_system(res=16, n_view=4, n_frame=2):
    from animate3d_tpu.data.cameras import fixed_view_cameras, gs_cameras_from_batch
    from animate3d_tpu.gaussians.deform import DeformConfig
    from animate3d_tpu.gaussians.state import random_state
    from animate3d_tpu.rendering.renderer4d import Renderer4DConfig
    from animate3d_tpu.systems.animate3d import (
        Animate3DConfig,
        Animate3DSystem,
        LossConfig,
    )

    cfg = Animate3DConfig(
        n_view=n_view, n_frame=n_frame, progressive_iter_per_frame=1,
        deform=DeformConfig(grid_sizes=((4, 4, 4, 3),), grid_feature_dim=4),
        renderer=Renderer4DConfig(height=res, width=res, max_per_tile=16,
                                  tile_chunk=1),
        loss=LossConfig(arap_K=3, arap_sample_num=16),
    )
    system = Animate3DSystem(
        cfg, state=random_state(jax.random.PRNGKey(0), 20, radius=0.4))
    cams = fixed_view_cameras(height=res, width=res, total_frame=n_frame)
    batch = {
        "gs_cameras": gs_cameras_from_batch(cams),
        "timestamps": cams["timestamps"],
        "rgb": np.random.default_rng(0).uniform(
            size=(n_view * n_frame, res, res, 3)).astype(np.float32),
        "mask": np.ones((n_view * n_frame, res, res, 1), np.float32),
    }
    return system, batch


def test_planted_shape_bug_is_caught(typechecked_env):
    """A mask with 3 channels (instead of 1) must fail at the step boundary
    with a named-axis jaxtyping error, not deep inside XLA."""
    system, batch = _tiny_system()
    bad = dict(batch, mask=np.ones(batch["mask"].shape[:3] + (3,), np.float32))
    with pytest.raises(Exception) as ei:
        system.step(bad, jax.random.PRNGKey(0))
    assert "mask" in str(ei.value)


def test_planted_batch_length_mismatch_is_caught(typechecked_env):
    """rgb with a different leading batch than timestamps violates the shared
    ``bnf`` axis binding."""
    system, batch = _tiny_system()
    bad = dict(batch, rgb=batch["rgb"][:-1])
    with pytest.raises(Exception):
        system.step(bad, jax.random.PRNGKey(0))


def test_good_batch_passes_and_trains(typechecked_env):
    system, batch = _tiny_system()
    m = system.step(batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_attention_contract(typechecked_env):
    from animate3d_tpu.ops.attention import multi_head_attention

    q = jnp.zeros((2, 8, 16))
    kv = jnp.zeros((2, 8, 16))
    out = multi_head_attention(q, kv, kv, num_heads=2)
    assert out.shape == (2, 8, 16)
    with pytest.raises(Exception):
        # k/v sequence lengths disagree
        multi_head_attention(q, kv, jnp.zeros((2, 4, 16)), num_heads=2)
    with pytest.raises(ValueError):
        multi_head_attention(q, kv, kv, num_heads=3)  # 16 % 3 != 0


def test_launch_flag_plumbs_enable(monkeypatch):
    """--typecheck on the launch CLI installs the hooks before the system is
    built (the reference installs its import hook pre-import)."""
    import animate3d_tpu.cli.launch as launch_mod
    from animate3d_tpu.core import typecheck as tc

    called = {}
    monkeypatch.setattr(tc, "enable_typecheck",
                        lambda: called.setdefault("on", True))
    # argparse exits before any config IO when required args are present;
    # stop right after the flag handling by making load_config raise
    monkeypatch.setattr(
        "animate3d_tpu.core.config.load_config",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stop")))
    with pytest.raises(RuntimeError, match="stop"):
        launch_mod.main(["--config", "x.yaml", "--train", "--typecheck"])
    assert called.get("on")


def test_wandb_shim_offline(tmp_path):
    """Without the wandb package the logger degrades to an offline JSONL with
    identical call sites (train.py:177,610 parity)."""
    from animate3d_tpu.utils.logging import WandbLogger

    p = tmp_path / "wandb_offline.jsonl"
    wl = WandbLogger("animatediff", "unit", config={"a": 1},
                     offline_path=str(p))
    wl.log({"train_loss": 0.5}, step=3)
    wl.finish()
    lines = [json.loads(l) for l in p.read_text().splitlines()]
    assert lines[0]["event"] == "init"
    assert {"step": 3, "train_loss": 0.5} == lines[1]


def test_progress_writer(tmp_path):
    """Single current line, rewritten in place (callbacks.py:133-139)."""
    from animate3d_tpu.utils.logging import ProgressWriter

    p = tmp_path / "progress"
    pw = ProgressWriter(str(p))
    pw.train_step(10, 200)
    assert p.read_text() == "Generation progress: 5.00%"
    pw.train_step(100, 200)
    assert p.read_text() == "Generation progress: 50.00%"
    pw.write("Rendering video ...")
    assert p.read_text() == "Rendering video ..."
    pw.close()
