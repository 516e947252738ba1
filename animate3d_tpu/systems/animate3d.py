"""Animate3D 4D optimization system (stage-1 motion recon + stage-2 refine).

Parity target: custom/threestudio-animate3d/systems/animate3d.py:43-486 +
configs/motion_recon_frame_16.yaml / refine_frame_16.yaml —

  * progressive frame unlocking: ``start = step // progressive_iter_per_frame``
    ('normal' uses frames 1..start+1; 'light' uses one random past frame +
    the newest, animate3d.py:134-165);
  * losses: rgb MSE against background-composited GT + mask MSE (:170-184),
    4D-SDS on random cameras in refine (:186-213), ARAP on the first view's
    trajectory (:216-244), optional position/opacity/sparsity/scales/TV
    (:256-302) — all weights C()-schedulable;
  * only the deformation field trains (Gaussian4DModel.training_setup builds
    Adam groups for the MLPs/grids only, gaussian_4d.py:344-391), Adam
    eps 1e-15, exp-interpolated per-group LR (:393-448).

TPU design: one jitted train step; the progressive schedule is expressed as
a per-frame weight mask so shapes stay static ('normal'), or a fixed-size
frame gather ('light') — no recompiles across the 800-step run.
"""

from __future__ import annotations

import json
import random as pyrandom
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from animate3d_tpu.core.schedule import C, c_schedule
from animate3d_tpu.core.registry import register
from animate3d_tpu.gaussians import arap as arap_mod
from animate3d_tpu.gaussians.deform import DeformationField, DeformConfig
from animate3d_tpu.gaussians.ply import load_gaussians
from animate3d_tpu.gaussians.state import GaussianState
from animate3d_tpu.rendering.renderer4d import Renderer4DConfig, render_batch
from animate3d_tpu.utils.loss import tv_loss


@dataclass
class LossConfig:
    lambda_rgb: Any = 100.0
    lambda_mask: Any = 100.0
    lambda_sds: Any = 0.0
    lambda_arap: Any = 12.0
    arap_radius: float = 0.01
    arap_K: int = 3
    arap_sample_num: int = 512
    lambda_position: Any = 0.0
    lambda_opacity: Any = 0.0
    lambda_sparsity: Any = 0.0
    lambda_scales: Any = 0.0
    lambda_tv_loss: Any = 0.0
    lambda_depth_tv_loss: Any = 0.0


@dataclass
class Animate3DConfig:
    n_view: int = 4
    n_frame: int = 16
    progressive_iter_per_frame: int = 50
    sample_strategy: str = "normal"  # normal | light
    # render only the progressively-unlocked frames, padded up to a
    # power-of-two bucket so at most log2(n_frame) programs compile — the
    # reference builds its batch from the selected frames only
    # (animate3d.py:134-165); rendering locked frames is pure waste (their
    # loss weight is 0). ~33% less raster work over an 800-step recon; the
    # 200-step refine never unlocks past 6 frames (fresh global_step +
    # progressive_iter_per_frame=50, refine_frame_16.yaml:45) so its 1024²
    # recon renders drop 64 → ≤32 per step.
    frame_bucketing: bool = True
    load_guidance: bool = False
    # geometry load (load_ply_cfg)
    geometry_convert_from: str = ""
    rot_x_degree: float = 0.0
    rot_z_degree: float = 0.0
    scale_factor: float = 1.0
    max_sh_degree: int = 0
    # mesh-mode ARAP
    connected_vertices_info_path: str = ""
    # lrs (gaussian_4d.py Config)
    delta_xyz_network_lr: Any = 1e-4
    delta_rot_network_lr: Any = 1e-4
    delta_scaling_network_lr: Any = 1e-4
    grid_lr: Any = 0.01
    global_trans_lr: Any = 1e-3
    deform: DeformConfig = field(default_factory=DeformConfig)
    renderer: Renderer4DConfig = field(default_factory=Renderer4DConfig)
    loss: LossConfig = field(default_factory=LossConfig)


def _deform_param_label(path) -> str:
    top = str(path[0].key if hasattr(path[0], "key") else path[0])
    # params nested under "params"
    for p in path:
        k = str(getattr(p, "key", getattr(p, "name", "")))
        if k.startswith("grid_"):
            return "grid"
        if k.startswith("delta_xyz"):
            return "delta_xyz_network"
        if k.startswith("delta_rot"):
            return "delta_rot_network"
        if k.startswith("delta_scaling"):
            return "delta_scaling_network"
        if k.startswith("global_"):
            return "global_trans"
    return "grid"


def make_deform_optimizer(params, cfg: Animate3DConfig) -> optax.GradientTransformation:
    """Per-group Adam (eps 1e-15) with exp-interpolated LR schedules
    (gaussian_4d.py:344-448)."""
    labels = jax.tree_util.tree_map_with_path(lambda p, _: _deform_param_label(p),
                                              params)
    lrs = {
        "delta_xyz_network": cfg.delta_xyz_network_lr,
        "delta_rot_network": cfg.delta_rot_network_lr,
        "delta_scaling_network": cfg.delta_scaling_network_lr,
        "grid": cfg.grid_lr,
        "global_trans": cfg.global_trans_lr,
    }
    transforms = {
        name: optax.adam(learning_rate=c_schedule(lr, "exp"), eps=1e-15)
        for name, lr in lrs.items()
    }
    return optax.multi_transform(transforms, labels)


@register("gaussian-splatting-animate3d-system")
class Animate3DSystem:
    """Functional training system. Holds the frozen gaussian state and the
    trainable deformation-field params + optimizer state."""

    def __init__(self, cfg: Animate3DConfig, state: Optional[GaussianState] = None,
                 key: Optional[jax.Array] = None, guidance=None,
                 guidance_inputs: Optional[Dict[str, Any]] = None):
        self.cfg = cfg
        key = key if key is not None else jax.random.PRNGKey(0)
        if state is None:
            assert cfg.geometry_convert_from, "need a .ply or an explicit state"
            state = load_gaussians(
                cfg.geometry_convert_from, cfg.rot_x_degree, cfg.rot_z_degree,
                cfg.scale_factor, cfg.max_sh_degree)
            state = jax.tree_util.tree_map(jnp.asarray, state)
        self.state = state

        self.field = DeformationField(cfg.deform)
        self.params = self.field.init(key, state, jnp.asarray(0.0))
        self.tx = make_deform_optimizer(self.params, cfg)
        self.opt_state = self.tx.init(self.params)
        self.guidance = guidance
        self.guidance_inputs = guidance_inputs or {}
        self.global_step = 0

        # ARAP connectivity: fixed for the whole run (depends only on the
        # static asset; the reference recomputes identical values per step)
        if cfg.connected_vertices_info_path:
            with open(cfg.connected_vertices_info_path) as f:
                conn_json = json.load(f)
            nn_idx, valid = arap_mod.connectivity_from_mesh_edges(conn_json)
            self.mesh_nn_idx = jnp.asarray(nn_idx)
            self.mesh_valid = jnp.asarray(valid)
            self.connectivity = None
        else:
            self.mesh_nn_idx = None
            self.connectivity = arap_mod.connectivity_from_points(
                state.xyz[None], radius=cfg.loss.arap_radius, K=cfg.loss.arap_K)

        # statically-active optional loss terms (reference gates on the config
        # value too, animate3d.py:256-296; also avoids 0·NaN gradient traps)
        from animate3d_tpu.core.config import C_max

        self.active_terms = frozenset(
            name for name in ("lambda_position", "lambda_sparsity",
                              "lambda_scales", "lambda_tv_loss", "lambda_arap")
            if C_max(getattr(cfg.loss, name)) > 0.0)

        # params/opt-state donated: the Adam update happens in place (frees
        # one params+opt copy of HBM headroom; step() rebinds from the return)
        self._train_step = jax.jit(self._train_step_impl,
                                   static_argnames=("do_guidance",),
                                   donate_argnums=(0, 1))
        # the 4D-SDS gradient runs as three separate compile units: fusing
        # the frozen SD1.5 UNet with the rasterizer backward into one XLA
        # program made tracing/compile blow up (docs/architecture.md)
        self._g_render_fwd = jax.jit(self._render_guidance_rgb)
        self._g_render_vjp = jax.jit(self._sds_render_vjp_impl)

    @classmethod
    def from_config(cls, cfg, seed: int = 0):
        """Construct from an ExperimentConfig (registry dispatch target:
        ``system_type: gaussian-splatting-animate3d-system``)."""
        from animate3d_tpu.core.config import parse_structured

        sys_cfg = cfg.system
        geo = dict(sys_cfg.get("geometry", {}))
        load_ply = dict(geo.get("load_ply_cfg", {}))
        grid_size = tuple(tuple(g) for g in geo.get(
            "grid_size", ((50, 50, 50, 8), (100, 100, 100, 16))))
        renderer = dict(sys_cfg.get("renderer", {}))
        loss = {k: v for k, v in dict(sys_cfg.get("loss", {})).items()
                if k in LossConfig.__dataclass_fields__}

        acfg = Animate3DConfig(
            n_view=sys_cfg.get("n_view", 4),
            n_frame=sys_cfg.get("n_frame", 16),
            progressive_iter_per_frame=sys_cfg.get("progressive_iter_per_frame", 50),
            sample_strategy=sys_cfg.get("sample_strategy", "normal"),
            frame_bucketing=sys_cfg.get("frame_bucketing", True),
            load_guidance=sys_cfg.get("load_guidance", False),
            geometry_convert_from=geo.get("geometry_convert_from", ""),
            rot_x_degree=load_ply.get("rot_x_degree", 0.0),
            rot_z_degree=load_ply.get("rot_z_degree", 0.0),
            scale_factor=load_ply.get("scale_factor", 1.0),
            connected_vertices_info_path=sys_cfg.get(
                "connected_vertices_info_path", ""),
            delta_xyz_network_lr=geo.get("delta_xyz_network_lr", 1e-4),
            delta_rot_network_lr=geo.get("delta_rot_network_lr", 1e-4),
            delta_scaling_network_lr=geo.get("delta_scaling_network_lr", 1e-4),
            grid_lr=geo.get("grid_lr", 0.01),
            global_trans_lr=geo.get("global_trans_lr", 1e-3),
            deform=DeformConfig(
                grid_sizes=grid_size,
                grid_feature_dim=geo.get("n_grid_dims", 16),
                use_global_trans=geo.get("use_global_trans", False),
            ),
            renderer=Renderer4DConfig(
                height=cfg.data.get("height", 256),
                width=cfg.data.get("width", 256),
                back_ground_color=tuple(
                    renderer.get("back_ground_color", (1, 1, 1))),
                invert_bg_prob=renderer.get("invert_bg_prob", 1.0),
                first_frame_trainable=renderer.get("first_frame_trainable",
                                                   False),
            ),
            loss=parse_structured(LossConfig, loss),
        )

        guidance = None
        guidance_inputs = None
        if acfg.load_guidance:
            from animate3d_tpu.pipelines.guidance import build_guidance_from_config

            guidance, guidance_inputs = build_guidance_from_config(sys_cfg, acfg)
        return cls(acfg, key=jax.random.PRNGKey(seed), guidance=guidance,
                   guidance_inputs=guidance_inputs)

    # -- progressive frame schedule (host-side) ------------------------------

    def frame_weights(self, step: int) -> np.ndarray:
        """(F,) weight per frame; frame 0 always 0 (no recon loss on the
        static frame), frames beyond the progressive horizon 0."""
        cfg = self.cfg
        start = min(step // cfg.progressive_iter_per_frame, cfg.n_frame - 2)
        w = np.zeros((cfg.n_frame,), np.float32)
        if cfg.sample_strategy == "normal":
            w[1: start + 2] = 1.0
        elif cfg.sample_strategy == "light":
            if start == 0:
                w[1] = 1.0
            elif step >= cfg.progressive_iter_per_frame * (cfg.n_frame - 1):
                w[1:] = 1.0
            else:
                w[pyrandom.randint(1, start)] = 1.0
                w[start + 1] = 1.0
        else:
            raise NotImplementedError(cfg.sample_strategy)
        return w

    def lambdas(self, step: int) -> Dict[str, jnp.ndarray]:
        lc = self.cfg.loss
        out = {
            k: jnp.float32(C(getattr(lc, k), 0, step))
            for k in ("lambda_rgb", "lambda_mask", "lambda_arap", "lambda_sds",
                      "lambda_position", "lambda_sparsity", "lambda_scales",
                      "lambda_tv_loss")
        }
        if self.guidance is not None:
            mn, mx = self.guidance.min_max_step(step)
            out["g_min_step"] = jnp.int32(mn)
            out["g_max_step"] = jnp.int32(mx)
        return out

    # -- jitted step ----------------------------------------------------------

    def _arap(self, means_per_frame, frame_w, key):
        """means_per_frame: (F, Nv, 3) first-view trajectory incl. static."""
        cfg = self.cfg
        nodes = jnp.concatenate([self.state.xyz[None], means_per_frame], axis=0)
        if self.mesh_nn_idx is not None:
            k1, key = jax.random.split(key)
            picked = arap_mod.sample_neighbor_subset(
                k1, self.mesh_nn_idx, self.mesh_valid, cfg.loss.arap_K)
            valid = picked >= 0
            w = valid.astype(jnp.float32)
            w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-12)
            conn = arap_mod.Connectivity(nn_idx=picked.astype(jnp.int32), weight=w)
        else:
            conn = self.connectivity
        fw = jnp.concatenate([jnp.zeros((1,)), frame_w])  # static + F frames
        return arap_mod.arap_error(nodes, conn, key,
                                   sample_num=cfg.loss.arap_sample_num,
                                   frame_weights=fw[1:])

    def _train_step_impl(self, params, opt_state, cameras, timestamps, gt_rgb,
                         gt_mask, frame_w, lambdas, key, do_guidance=False,
                         guidance_batch=None):
        cfg = self.cfg

        def make_cached_deform(params, frame_ts, deform_scales):
            """Deform once per unique frame, not per view·frame item (the
            reference recomputes per item in its batch loop); all frames in
            one time-factorized matmul-sampler pass (deform_frames)."""
            deformed = self.field.apply(
                params, self.state, frame_ts, deform_scales,
                method=DeformationField.deform_frames)

            def fn(state, t, _deform_scales):
                fi = jnp.argmin(jnp.abs(frame_ts - t))
                return (deformed[0][fi], deformed[1][fi], deformed[2][fi], None)

            return fn

        # number of frames actually rendered this step (== n_frame for the
        # 'normal' strategy; the 'light' strategy gathers a 2-frame subset
        # host-side so shapes stay static per strategy)
        n_active = timestamps.shape[0] // cfg.n_view

        def loss_fn(params):
            k_render, k_arap, k_g = jax.random.split(key, 3)
            frame_ts = timestamps[:n_active]
            deform_fn = make_cached_deform(params, frame_ts, False)

            out = render_batch(
                self.state, deform_fn, cameras, timestamps, cfg.renderer,
                key=k_render, do_reconstruction=True, do_guidance=False)

            # per-item weight from the frame schedule (view-major layout)
            item_w = jnp.tile(frame_w, cfg.n_view)  # (N·F',)
            wsum = jnp.maximum(jnp.sum(item_w), 1e-8)

            bgc = jnp.asarray(cfg.renderer.back_ground_color, jnp.float32)
            gt = gt_rgb * gt_mask + bgc * (1.0 - gt_mask)
            per_item_rgb = jnp.mean((gt - out.rgb) ** 2, axis=(1, 2, 3))
            loss_rgb = jnp.sum(per_item_rgb * item_w) / wsum
            per_item_mask = jnp.mean((gt_mask[..., 0] - out.alpha) ** 2, axis=(1, 2))
            loss_mask = jnp.sum(per_item_mask * item_w) / wsum

            loss = lambdas["lambda_rgb"] * loss_rgb + lambdas["lambda_mask"] * loss_mask
            # PSNR of the masked-composited render vs GT (active frames only)
            # — the quality anchor every perf change is judged against
            # (uncond_hybrid.py testset metrics surface)
            psnr = -10.0 * jnp.log10(jnp.maximum(
                jnp.sum(per_item_rgb * item_w) / wsum, 1e-10))
            metrics = {"loss_rgb": loss_rgb, "loss_mask": loss_mask,
                       "psnr": psnr,
                       # dropped gaussian·tile pairs this step: >0 means the
                       # fixed-K binning truncated a dense view (ADVICE r2)
                       "raster_overflow": out.overflow.astype(jnp.float32)}

            # ARAP over the first view's trajectory (animate3d.py:216-244)
            if "lambda_arap" in self.active_terms:
                means_v0 = out.means3d[:n_active]
                loss_arap = self._arap(means_v0, frame_w, k_arap)
                loss = loss + lambdas["lambda_arap"] * loss_arap
                metrics["loss_arap"] = loss_arap

            # optional regularizers (statically gated)
            if "lambda_position" in self.active_terms:
                safe_norm = jnp.sqrt(jnp.sum(out.means3d ** 2, axis=-1) + 1e-12)
                loss = loss + lambdas["lambda_position"] * jnp.mean(safe_norm)
            if "lambda_sparsity" in self.active_terms:
                loss = loss + lambdas["lambda_sparsity"] * jnp.mean(
                    jnp.sqrt(out.alpha ** 2 + 0.01))
            if "lambda_scales" in self.active_terms:
                loss = loss + lambdas["lambda_scales"] * (
                    jnp.sum(out.scales) / out.scales.shape[0])
            if "lambda_tv_loss" in self.active_terms:
                loss = loss + lambdas["lambda_tv_loss"] * tv_loss(out.rgb)

            metrics["loss"] = loss
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

        if do_guidance:
            # gradients add linearly: the SDS grads come from a separately
            # compiled program (see _sds_grad_impl), passed in here
            extra_grads = guidance_batch["sds_grads"]
            grads = jax.tree_util.tree_map(
                lambda a, b: a + lambdas["lambda_sds"] * b, grads, extra_grads)
            metrics["loss_sds"] = guidance_batch["loss_sds"]
            metrics["loss"] = (metrics["loss"]
                               + lambdas["lambda_sds"] * guidance_batch["loss_sds"])

        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    def _render_guidance_rgb(self, params, guidance_batch):
        """Guidance-batch renders (fwd). Shared by the fwd pass and the VJP
        surrogate so the rasterizer never shares a program with the UNet.

        Rendered at the GUIDANCE input size (256²) — the reference's SDS
        batch comes from the random_camera sampler with its own 256²
        resolution (refine_frame_16.yaml data.random_camera), independent of
        the 1024² reconstruction renders."""
        import dataclasses

        cfg = self.cfg
        g_res = (self.guidance.cfg.image_size if self.guidance is not None
                 else cfg.renderer.height)
        rcfg = dataclasses.replace(cfg.renderer, height=g_res, width=g_res)
        g = guidance_batch
        frame_ts = g["timestamps"][: cfg.n_frame]
        deformed = self.field.apply(params, self.state, frame_ts, True,
                                    method=DeformationField.deform_frames)

        def deform_fn(state, t, _ds):
            fi = jnp.argmin(jnp.abs(frame_ts - t))
            return (deformed[0][fi], deformed[1][fi], deformed[2][fi], None)

        return render_batch(
            self.state, deform_fn, g["cameras"], g["timestamps"],
            rcfg, key=None, do_reconstruction=True,
            do_guidance=True).rgb

    def _sds_render_vjp_impl(self, params, guidance_batch, rgb_cotangent):
        """grads of ⟨render(params), ḡ⟩ — the render-side half of the SDS
        chain rule (render fwd+bwd only)."""

        def surrogate(params):
            rgb = self._render_guidance_rgb(params, guidance_batch)
            return jnp.vdot(rgb, jax.lax.stop_gradient(rgb_cotangent))

        return jax.grad(surrogate)(params)

    def sds_gradients(self, params, guidance_batch, lambdas, key):
        """(loss_sds, param grads) via three modest compile units:
        render fwd → (VAE+UNet) pixel grad → render VJP."""
        g = guidance_batch
        rgb = self._g_render_fwd(params, g)
        loss_sds, rgb_grad = self.guidance.pixel_grad(
            self.guidance_inputs["unet_params"],
            self.guidance_inputs["vae_params"],
            rgb, g["text_cond"], g["text_uncond"], g["c2w"],
            g["image_embeds"], key,
            t_range=(lambdas["g_min_step"], lambdas["g_max_step"]),
            ie_params=self.guidance_inputs.get("ie_params"))
        grads = self._g_render_vjp(params, g, rgb_grad)
        return loss_sds, grads

    def guidance_preview(self, guidance_batch, key, num_steps: int = 25):
        """Guidance-eval: render the SDS batch and run the frozen teacher's
        25-step preview sampler from the current max annealed timestep
        (animatemv_guidance.py:668-765) — the visual debugging surface for
        stage-2 refinement. Returns (B·N, F, H, W, 3) in [0, 1]."""
        assert self.guidance is not None, "guidance_preview needs load_guidance"
        g = guidance_batch
        rgb = self._g_render_fwd(self.params, g)
        _, mx = self.guidance.min_max_step(self.global_step)
        return self.guidance.preview_from_rgb(
            self.guidance_inputs["unet_params"],
            self.guidance_inputs["vae_params"],
            self.guidance_inputs["vae_decode"], rgb,
            g["text_cond"], g["text_uncond"], g["c2w"], g["image_embeds"],
            int(mx), key, ie_params=self.guidance_inputs.get("ie_params"),
            num_steps=num_steps)

    # -- public ---------------------------------------------------------------

    @staticmethod
    def _is_multi_device(x) -> bool:
        s = getattr(x, "sharding", None)
        try:
            return s is not None and len(s.device_set) > 1
        except Exception:
            return False

    def step(self, batch: Dict[str, Any], key: jax.Array,
             guidance_batch: Optional[Dict[str, Any]] = None) -> Dict[str, float]:
        cfg = self.cfg
        frame_w = self.frame_weights(self.global_step)
        lambdas = self.lambdas(self.global_step)
        do_guidance = cfg.load_guidance and self.guidance is not None

        cameras = batch["gs_cameras"]
        timestamps = np.asarray(batch["timestamps"])
        rgb = batch["rgb"]
        mask = batch["mask"]

        if cfg.sample_strategy == "light" and not do_guidance:
            # fixed-size 2-frame gather (animate3d.py:144-157): always render
            # [0 (static anchor slot reused as a real frame), newest] — here
            # the two active frames chosen by the schedule
            # frame_weights already sampled [random past, newest] — gather
            # exactly those (pad to 2 early on; the final phase uses all)
            active = np.nonzero(frame_w)[0]
            if len(active) == 1:
                active = np.array([active[0], active[0]])
            item_idx = np.concatenate(
                [v * cfg.n_frame + active for v in range(cfg.n_view)])
            # device-side gathers: rgb/mask may live on device (uploaded once
            # by the caller); pulling them host-side per step would re-pay
            # the 50 MB transfer every iteration
            cameras = jax.tree_util.tree_map(lambda x: x[item_idx], cameras)
            timestamps = timestamps[item_idx]
            rgb = jnp.asarray(rgb)[item_idx]
            mask = jnp.asarray(mask)[item_idx]
            frame_w = np.ones((len(active),), np.float32)
        elif (cfg.sample_strategy == "normal" and cfg.frame_bucketing
                and not self._is_multi_device(rgb)):
            # render only the unlocked frames, padded to a power-of-two
            # bucket (≤ log2(n_frame) compiled programs); pad slots repeat
            # the last active frame with weight 0 so the loss, its
            # normalization (wsum = #active), and the ARAP energy are
            # identical to the full-batch program. The reference renders
            # exactly the selected subset (animate3d.py:134-165). Skipped on
            # multi-device batches — a subset gather would break the even
            # dp sharding of the uploaded GT planes.
            active = np.nonzero(frame_w)[0]
            bucket = 2
            while bucket < len(active):
                bucket *= 2
            if bucket <= cfg.n_frame // 2:
                pad = np.full(bucket - len(active), active[-1], np.int64)
                active_p = np.concatenate([active, pad])
                # indices only change at 50-step phase boundaries; cache the
                # gathered subset so steady steps skip the per-step gather
                # dispatches (the GT batch is uploaded once and reused)
                ck = (active_p.tobytes(), id(batch["rgb"]), id(batch["mask"]))
                if getattr(self, "_bucket_cache_key", None) != ck:
                    item_idx = np.concatenate(
                        [v * cfg.n_frame + active_p for v in range(cfg.n_view)])
                    self._bucket_cache_key = ck
                    self._bucket_cache = (
                        jax.tree_util.tree_map(lambda x: x[item_idx], cameras),
                        timestamps[item_idx],
                        jnp.asarray(rgb)[item_idx],
                        jnp.asarray(mask)[item_idx],
                    )
                cameras, timestamps, rgb, mask = self._bucket_cache
                frame_w = np.concatenate(
                    [frame_w[active], np.zeros(len(pad), np.float32)])
            else:
                frame_w = np.asarray(frame_w)
        else:
            frame_w = np.asarray(frame_w)

        if do_guidance:
            key, k_g = jax.random.split(key)
            loss_sds, sds_grads = self.sds_gradients(self.params, guidance_batch,
                                                     lambdas, k_g)
            guidance_batch = dict(guidance_batch,
                                  loss_sds=loss_sds, sds_grads=sds_grads)

        self.params, self.opt_state, metrics = self._train_step(
            self.params, self.opt_state, cameras,
            jnp.asarray(timestamps), jnp.asarray(rgb),
            jnp.asarray(mask, jnp.float32), jnp.asarray(frame_w), lambdas, key,
            do_guidance=do_guidance, guidance_batch=guidance_batch)
        self.global_step += 1
        # device-resident scalars: no forced sync — callers convert at their
        # logging cadence so dispatch runs ahead of the device (the per-step
        # float() fetch previously cost a ~0.25 s tunnel round-trip)
        return metrics

    def render(self, cameras, timestamps, key=None, do_guidance=False,
               renderer_cfg: Optional[Renderer4DConfig] = None):
        def deform_fn(state, t, deform_scales):
            return self.field.apply(self.params, state, t, deform_scales,
                                    method=DeformationField.deform)

        return render_batch(self.state, deform_fn, cameras,
                            jnp.asarray(timestamps),
                            renderer_cfg or self.cfg.renderer, key=key,
                            do_reconstruction=False, do_guidance=do_guidance)
