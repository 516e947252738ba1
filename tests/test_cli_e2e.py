import json
import os

import numpy as np
import pytest


TEST_OBJ = """
v 0 0 0
v 0.5 0 0
v 0.5 0.5 0
v 0 0.5 0
v 0.25 0.25 0.4
f 1 2 3
f 1 3 4
f 1 2 5
f 2 3 5
f 3 4 5
f 4 1 5
"""

N_VIEW, N_FRAME, RES = 4, 2, 32


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """mesh2gaussian output + fake tracked RGBA frames + tiny config."""
    root = tmp_path_factory.mktemp("e2e")
    obj = root / "asset.obj"
    obj.write_text(TEST_OBJ)

    from animate3d_tpu.tools import mesh2gaussian

    mesh2gaussian.run(str(obj), str(root), "asset")
    assert (root / "asset.ply").exists()
    assert (root / "asset.json").exists()

    # fake tracked RGBA frames, view-major numbering (split_gif layout)
    from PIL import Image

    img_root = root / "frames"
    img_root.mkdir()
    rng = np.random.default_rng(0)
    for i in range(N_VIEW * N_FRAME):
        rgba = (rng.uniform(0, 255, size=(RES, RES, 4))).astype(np.uint8)
        rgba[..., 3] = 255
        Image.fromarray(rgba, "RGBA").save(img_root / f"{i}.png")

    cfg = f"""
name: "e2e"
tag: "t"
use_timestamp: false
exp_root_dir: "{root}/outputs"
seed: 0
data:
  image_root: "{img_root}"
  height: {RES}
  width: {RES}
  n_view: {N_VIEW}
  total_frame: {N_FRAME}
system:
  load_guidance: false
  n_view: {N_VIEW}
  n_frame: {N_FRAME}
  progressive_iter_per_frame: 1
  test_option: "four_view"
  save_gaussian_trajectory: true
  connected_vertices_info_path: "{root}/asset.json"
  geometry:
    grid_size: [[8, 8, 8, 3]]
    n_grid_dims: 4
    use_global_trans: false
    geometry_convert_from: "{root}/asset.ply"
    load_ply_cfg:
      rot_x_degree: 90.0
      rot_z_degree: 0.0
      scale_factor: 1.0
  renderer:
    back_ground_color: [0.5, 0.5, 0.5]
  loss:
    lambda_rgb: 100.0
    lambda_mask: 10.0
    lambda_arap: 1.0
    arap_K: 2
    arap_sample_num: 16
trainer:
  max_steps: 3
  log_every_n_steps: 1
checkpoint:
  every_n_train_steps: 3
"""
    cfg_path = root / "config.yaml"
    cfg_path.write_text(cfg)
    return root, cfg_path


def test_launch_train_and_test(workspace):
    root, cfg_path = workspace
    from animate3d_tpu.cli.launch import main

    main(["--config", str(cfg_path), "--train"])

    trial = root / "outputs" / "e2e" / "t"
    assert (trial / "ckpts").exists()
    steps = os.listdir(trial / "ckpts")
    assert any(s.startswith("step_") for s in steps)
    # test artifacts written by the post-train test pass
    imgs = os.listdir(trial / "save" / "images")
    assert len(imgs) == N_VIEW * N_FRAME
    assert (trial / "save" / "gaussian_trajectory").exists()
    metrics = [json.loads(l) for l in open(trial / "metrics.jsonl")]
    assert len(metrics) == 3
    assert all(np.isfinite(m["loss"]) for m in metrics)


def test_launch_test_restores_checkpoint(workspace):
    root, cfg_path = workspace
    from animate3d_tpu.cli.launch import main

    main(["--config", str(cfg_path), "--test"])
    trial = root / "outputs" / "e2e" / "t"
    assert (trial / "save" / "videos").exists()
