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
  n_val_views: 6
  eval_height: {RES}
  eval_width: {RES}
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
    # quality report vs the GT frames (four_view mode with image_root)
    report = json.load(open(trial / "save" / "metrics_test.json"))
    assert np.isfinite(report["psnr"]) and len(report["per_view"]) == N_VIEW
    assert -1.0 <= report["ssim"] <= 1.0


def test_launch_validate_orbit(workspace):
    """--validate renders the deterministic val orbit (distinct from --test;
    reference uncond_hybrid.py:426-559)."""
    root, cfg_path = workspace
    from animate3d_tpu.cli.launch import main

    main(["--config", str(cfg_path), "--validate"])
    trial = root / "outputs" / "e2e" / "t"
    # save_video_mp4 falls back to .gif without an ffmpeg-capable writer
    vids = os.listdir(trial / "save" / "videos")
    assert any(v.startswith("val_orbit") for v in vids), vids
    assert (trial / "save" / "val" / "orbit.gif").exists()


def test_refine_stage_chaining_and_guidance(workspace, tmp_path):
    """Stage-2 e2e: system.weights restores the recon checkpoint (VERDICT
    item 3) and the tiny guidance stack (bundle-loaded UNet/VAE + per-step
    IP image embeds) drives one SDS step (items 1/2)."""
    import jax
    import jax.numpy as jnp
    import yaml

    root, cfg_path = workspace
    trial = root / "outputs" / "e2e" / "t"
    assert (trial / "ckpts").exists(), "recon run must have executed first"

    # tiny converted-weights bundle for the guidance stack
    from animate3d_tpu.cli.inference import build_models
    from animate3d_tpu.core.checkpoint import restore_checkpoint_raw, save_checkpoint

    unet, vae, _, vision = build_models("tiny", N_VIEW, dtype=jnp.float32)
    ucfg = unet.config
    uparams = jax.jit(unet.init)(
        jax.random.PRNGKey(11), jnp.zeros((N_VIEW, 2, 8, 8, 4)),
        jnp.asarray(0.0), jnp.zeros((N_VIEW, 77, ucfg.cross_attention_dim)),
        jnp.zeros((N_VIEW, 16)), jnp.zeros((N_VIEW, ucfg.image_embed_dim)))
    save_checkpoint(str(tmp_path / "bundle" / "unet"), 0, uparams)
    s = vision.config.image_size
    vparams = jax.jit(vision.init)(jax.random.PRNGKey(12),
                                   jnp.zeros((1, s, s, 3)))
    save_checkpoint(str(tmp_path / "bundle" / "image_encoder"), 0, vparams)

    cfg = yaml.safe_load(cfg_path.read_text())
    cfg["name"] = "e2e_refine"
    cfg["system"]["weights"] = str(trial / "ckpts")
    cfg["system"]["load_guidance"] = True
    cfg["system"]["loss"]["lambda_sds"] = 0.01
    cfg["system"]["guidance"] = {
        "model_size": "tiny",
        "flax_params_dir": str(tmp_path / "bundle"),
        "n_frame": N_FRAME,
        "image_size": 16,
        "guidance_scale": 5.0,
    }
    cfg["data"]["use_random_camera"] = True
    cfg["data"]["random_camera"] = {
        "batch_size": N_VIEW * N_FRAME,
        "n_view": N_VIEW,
        "total_frame": N_FRAME,
        "width": 16, "height": 16,
    }
    cfg["trainer"]["max_steps"] = 1
    cfg["trainer"]["guidance_eval_interval"] = 1
    cfg["trainer"]["guidance_eval_steps"] = 2
    cfg["checkpoint"]["every_n_train_steps"] = 1
    refine_cfg = tmp_path / "refine.yaml"
    refine_cfg.write_text(yaml.safe_dump(cfg))

    from animate3d_tpu.cli.launch import main

    main(["--config", str(refine_cfg), "--train"])

    refine_trial = root / "outputs" / "e2e_refine" / "t"
    metrics = [json.loads(l) for l in open(refine_trial / "metrics.jsonl")]
    assert "loss_sds" in metrics[0] and np.isfinite(metrics[0]["loss_sds"])
    # guidance-eval teacher preview artifact (animatemv_guidance.py:668-765)
    assert (refine_trial / "save" / "guidance_eval" / "it1.gif").exists()

    # refine params started from the recon checkpoint, not zero-init:
    recon = restore_checkpoint_raw(
        str(sorted((trial / "ckpts").glob("step_*"))[-1]))
    refined = restore_checkpoint_raw(
        str(sorted((refine_trial / "ckpts").glob("step_*"))[-1]))
    ra = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(
        recon["params"])])
    fa = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(
        refined["params"])])
    # after 1 step of lr<=1e-2 the params stay near the recon solution
    assert np.abs(ra - fa).max() < 0.05
    assert np.abs(ra).max() > 0  # recon actually trained something


def test_launch_test_testset_grid(workspace):
    """test_option=testset renders the paper-metrics 3-elevation grid, each
    elevation paired with its own azimuth set (visualize_testset_frame_16
    semantics); eval size comes from eval_height/eval_width."""
    root, cfg_path = workspace
    from animate3d_tpu.cli.launch import main

    main(["--config", str(cfg_path), "--test",
          "name=e2e_testset", "system.test_option=testset",
          "system.save_gaussian_trajectory=false",
          "data.eval_height=16", "data.eval_width=16"])
    trial = root / "outputs" / "e2e_testset" / "t"
    imgs = os.listdir(trial / "save" / "images")
    assert len(imgs) == 12 * N_FRAME  # 3 elevations x 4 azimuths
    from PIL import Image

    im = Image.open(trial / "save" / "images" / imgs[0])
    assert im.size == (16, 16)


def test_visualize_configs_parse():
    """The two reference-mirroring vis configs ship with the repo and carry
    the reference's eval semantics (visualize_*_frame_16.yaml)."""
    from animate3d_tpu.core.config import load_config

    four = load_config("configs/animate3d/visualize_four_view_frame_16.yaml")
    assert four.system["test_option"] == "four_view"
    assert four.data["eval_height"] == 1024
    grid = load_config("configs/animate3d/visualize_testset_frame_16.yaml")
    assert grid.system["test_option"] == "testset"
    sets = grid.data["random_camera"]["eval_azimuth_deg"]
    assert len(sets) == 3 and list(grid.data["random_camera"]
                                   ["eval_elevation_deg"]) == [15.0, 0.0, 30.0]
