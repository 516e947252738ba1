import json
import os

import numpy as np
import pytest


def test_mvvdm_train_cli_smoke(tmp_path):
    """End-to-end MV-VDM trainer smoke: tiny model, synthetic manifest."""
    from PIL import Image

    # synthetic "videos": one png per view (frames repeat the single image)
    vid_dir = tmp_path / "vids"
    vid_dir.mkdir()
    rng = np.random.default_rng(0)
    for v in range(4):
        img = (rng.uniform(0, 255, size=(16, 16, 3))).astype(np.uint8)
        Image.fromarray(img).save(vid_dir / f"view{v}.png")

    manifest = [{"videos": [f"view{v}.png" for v in range(4)],
                 "caption": "test"}]
    (tmp_path / "manifest.json").write_text(json.dumps(manifest))

    cfg = f"""
output_dir: "{tmp_path}/out"
model_size: tiny
num_views: 4
video_length: 2
sample_size: 16
train_data:
  manifest_path: "{tmp_path}/manifest.json"
  video_root: "{vid_dir}"
max_train_steps: 2
checkpointing_steps: 2
learning_rate: 1.0e-4
global_seed: 0
"""
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(cfg)

    from animate3d_tpu.cli.train_mvvdm import main

    main(["--config", str(cfg_path)])

    out = tmp_path / "out"
    assert (out / "sanity_check.gif").exists()
    assert (out / "checkpoints" / "step_2").exists()
    assert (out / "motion_modules" / "step_2").exists()
    metrics = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert len(metrics) == 2
    assert all(np.isfinite(m["loss"]) for m in metrics)


def test_mvvdm_train_cli_resume(tmp_path):
    # reuse the smoke setup but run twice; second run resumes from step 2
    test_mvvdm_train_cli_smoke.__wrapped__ if hasattr(
        test_mvvdm_train_cli_smoke, "__wrapped__") else None
    from PIL import Image
    import json as _json

    vid_dir = tmp_path / "vids"
    vid_dir.mkdir()
    rng = np.random.default_rng(0)
    for v in range(4):
        Image.fromarray(
            rng.uniform(0, 255, size=(16, 16, 3)).astype(np.uint8)
        ).save(vid_dir / f"view{v}.png")
    (tmp_path / "manifest.json").write_text(_json.dumps(
        [{"videos": [f"view{v}.png" for v in range(4)], "caption": "t"}]))
    cfg = f"""
output_dir: "{tmp_path}/out"
model_size: tiny
num_views: 4
video_length: 2
sample_size: 16
train_data:
  manifest_path: "{tmp_path}/manifest.json"
  video_root: "{vid_dir}"
max_train_steps: 2
checkpointing_steps: 2
global_seed: 0
"""
    cfg_path = tmp_path / "train.yaml"
    cfg_path.write_text(cfg)
    from animate3d_tpu.cli.train_mvvdm import main

    main(["--config", str(cfg_path)])
    # second invocation: raise max steps; must resume from step 2
    main(["--config", str(cfg_path), "max_train_steps=3"])
    metrics = [json.loads(l) for l in open(tmp_path / "out" / "metrics.jsonl")]
    steps = [m["step"] for m in metrics]
    assert steps == [0, 1, 2]


def test_frozen_params_do_not_move():
    """Regression: optax.masked passes masked-out grads through as raw
    updates — the optimizer must zero them instead (train.py:350-358 freezes
    everything but motion_modules/i2v adapters)."""
    import jax
    import jax.numpy as jnp

    from animate3d_tpu.pipelines.train_mvvdm import (
        MVVDMTrainConfig,
        TrainBatch,
        make_optimizer,
        make_train_step,
    )

    params = {"params": {
        "to_q": {"kernel": jnp.ones((4,))},
        "motion_modules_0": {"kernel": jnp.ones((4,))},
    }}

    def unet_apply(p, lat, t, ctx, cam, ie, i2v_cond_time_zero=False):
        s = (jnp.sum(p["params"]["to_q"]["kernel"] ** 2)
             + jnp.sum(p["params"]["motion_modules_0"]["kernel"] ** 2))
        return lat * s

    cfg = MVVDMTrainConfig(num_views=4)
    tx = make_optimizer(params, cfg)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(unet_apply, tx, cfg))
    rng = np.random.default_rng(0)
    batch = TrainBatch(
        latents=jnp.asarray(rng.normal(size=(4, 2, 4, 4, 4)), jnp.float32),
        text_ctx=jnp.zeros((4, 7, 8)), null_text_ctx=jnp.zeros((4, 7, 8)),
        camera=jnp.zeros((4, 16)), image_embeds=jnp.zeros((4, 8)))
    p2, _, metrics = step(params, opt_state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # frozen: bit-identical; trainable: moved
    np.testing.assert_array_equal(
        np.asarray(p2["params"]["to_q"]["kernel"]),
        np.asarray(params["params"]["to_q"]["kernel"]))
    assert np.abs(np.asarray(p2["params"]["motion_modules_0"]["kernel"])
                  - 1.0).max() > 0


def _write_train_workspace(tmp_path, caption="a red toy"):
    from PIL import Image

    vid_dir = tmp_path / "vids"
    vid_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for v in range(4):
        Image.fromarray(
            rng.uniform(0, 255, size=(16, 16, 3)).astype(np.uint8)
        ).save(vid_dir / f"view{v}.png")
    (tmp_path / "manifest.json").write_text(json.dumps(
        [{"videos": [f"view{v}.png" for v in range(4)], "caption": caption}]))


def _make_tiny_bundle(tmp_path):
    import jax
    import jax.numpy as jnp

    from animate3d_tpu.cli.inference import build_models
    from animate3d_tpu.core.checkpoint import save_checkpoint
    from animate3d_tpu.utils.tokenizer import write_char_level_tokenizer

    _, _, text_model, vision_model = build_models("tiny", 4, dtype=jnp.float32)
    bundle = tmp_path / "bundle"
    tparams = jax.jit(text_model.init)(jax.random.PRNGKey(3),
                                       jnp.zeros((1, 77), jnp.int32))
    save_checkpoint(str(bundle / "text_encoder"), 0, tparams)
    s = vision_model.config.image_size
    vparams = jax.jit(vision_model.init)(jax.random.PRNGKey(4),
                                         jnp.zeros((1, s, s, 3)))
    save_checkpoint(str(bundle / "image_encoder"), 0, vparams)
    write_char_level_tokenizer(str(bundle / "tokenizer"))
    return bundle


def _run_trainer(tmp_path, bundle, caption, out_name):
    _write_train_workspace(tmp_path, caption=caption)
    cfg = f"""
output_dir: "{tmp_path}/{out_name}"
model_size: tiny
num_views: 4
video_length: 2
sample_size: 16
flax_params_dir: "{bundle}"
train_data:
  manifest_path: "{tmp_path}/manifest.json"
  video_root: "{tmp_path}/vids"
max_train_steps: 1
checkpointing_steps: 1
learning_rate: 1.0e-4
cfg_random_null_text_ratio: 0.0
global_seed: 0
"""
    cfg_path = tmp_path / f"{out_name}.yaml"
    cfg_path.write_text(cfg)
    from animate3d_tpu.cli.train_mvvdm import main

    main(["--config", str(cfg_path)])
    metrics = [json.loads(l) for l in open(tmp_path / out_name / "metrics.jsonl")]
    return metrics[0]["loss"]


def test_caption_content_changes_loss(tmp_path):
    """Text conditioning is live in the trainer (VERDICT item 4): same data +
    seed, different caption ⇒ different loss through the CLIP text tower."""
    bundle = _make_tiny_bundle(tmp_path)
    loss_a = _run_trainer(tmp_path, bundle, "a red toy", "out_a")
    loss_b = _run_trainer(tmp_path, bundle, "a blue dragon flying", "out_b")
    assert np.isfinite(loss_a) and np.isfinite(loss_b)
    assert abs(loss_a - loss_b) > 1e-7


def test_lr_schedule_shapes():
    """diffusers get_scheduler parity: warmup + constant/linear/cosine
    (train.py:427-436)."""
    from animate3d_tpu.pipelines.train_mvvdm import MVVDMTrainConfig, make_lr_schedule

    cfg = MVVDMTrainConfig(learning_rate=1e-3, lr_warmup_steps=10,
                           lr_scheduler="linear", max_train_steps=110)
    sched = make_lr_schedule(cfg)
    assert abs(float(sched(0))) < 1e-9
    assert abs(float(sched(10)) - 1e-3) < 1e-9  # warmup done
    assert float(sched(60)) < 1e-3  # decaying
    assert float(sched(110)) < 1e-5

    cfg = MVVDMTrainConfig(learning_rate=1e-3, lr_scheduler="constant",
                           scale_lr=True, gradient_accumulation_steps=2,
                           lr_scale_factor=4.0)
    sched = make_lr_schedule(cfg)
    assert abs(float(sched(500)) - 8e-3) < 1e-9


def test_validation_sampling_writes_gif(tmp_path):
    bundle = _make_tiny_bundle(tmp_path)
    _write_train_workspace(tmp_path, caption="a toy")
    cfg = f"""
output_dir: "{tmp_path}/out"
model_size: tiny
num_views: 4
video_length: 2
sample_size: 16
flax_params_dir: "{bundle}"
train_data:
  manifest_path: "{tmp_path}/manifest.json"
  video_root: "{tmp_path}/vids"
max_train_steps: 1
checkpointing_steps: 1
validation_steps: 1
validation_num_steps: 2
learning_rate: 1.0e-4
lr_scheduler: linear
lr_warmup_steps: 0
global_seed: 0
"""
    (tmp_path / "t.yaml").write_text(cfg)
    from animate3d_tpu.cli.train_mvvdm import main

    main(["--config", str(tmp_path / "t.yaml")])
    assert (tmp_path / "out" / "samples" / "sample-1.gif").exists()
