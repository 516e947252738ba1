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
