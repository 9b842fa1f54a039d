"""SuGaR static two-stage system (reference system/sugar_static.py:34-541).

stage "gaussian": free 3DGS trained like the zero123 system plus SuGaR's
surface regularizers -- opacity binary cross-entropy (reference :258-283),
density regulation against the rendered depth (utils/sugar_utils.py), and the
SDF better-normal alignment; the geometry's `sugar_prune_at` then hard-prunes
low-opacity Gaussians for the handoff.

stage "sugar": Gaussians bound to the extracted mesh (geometry "sugar"),
refined with reference losses + mesh smoothness (normal consistency,
laplacian, reference :286-313) + opacity-max + normal-depth consistency and
TV regularizers (:315-331).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussian_field as gf
from ..models.optim import adam_update, init_adam
from ..ops import knn as knn_ops
from ..ops import mesh as mesh_ops
from ..ops import sugar_reg
from ..ops.camera import camera_from_c2w
from ..utils.loss import tv_loss
from ..utils.registry import register
from .base import SystemState, to_device_batch
from .gaussian_zero123 import Zero123System, Zero123SystemConfig


@dataclasses.dataclass
class SugarStaticConfig(Zero123SystemConfig):
    stage: str = "gaussian"  # 'gaussian' | 'sugar'
    sugar: dict = dataclasses.field(default_factory=dict)
    # border-face cleanup before texture extraction (reference
    # system/base.py:40-42,73,325-382)
    postprocess: bool = False
    postprocess_density_threshold: float = 0.1
    postprocess_iterations: int = 5
    # optional 2D-diffusion SDS on the random-camera substep, alternating
    # normal/rgb inputs by freq.input_normal after freq.milestone_2d_sds
    # (reference sugar_static.py:231-244)
    guidance_2d_type: Optional[str] = None
    guidance_2d: dict = dataclasses.field(default_factory=dict)
    prompt_processor_2d_type: Optional[str] = None
    prompt_processor_2d: dict = dataclasses.field(default_factory=dict)
    n_samples_for_sugar_sdf_reg: Optional[int] = None  # reference alias


class GaussianStageRegMixin:
    """SuGaR's free-Gaussian surface regularizers (opacity binary CE +
    density regulation + SDF better-normal), shared by the sugar-static
    gaussian stage and the 4dgen static stage (reference sugar_static.py
    :258-283 and configs/gs4d_static.yaml:130-131)."""

    def _init_sugar_stage(self, sugar_dict):
        from ..utils.config import parse_structured

        self.sugar_cfg = parse_structured(sugar_reg.SuGaRRegConfig, sugar_dict)
        self._knn_idx = None
        self._knn_step = -(10 ** 9)

    def _refresh_knn(self, state, step: int):
        if (
            self._knn_idx is not None
            and step - self._knn_step < self.sugar_cfg.reset_neighbors_every
        ):
            return
        xyz = state.gauss.params.xyz
        alive = state.gauss.alive
        guarded = jnp.where(alive[:, None], xyz, 1e6)
        # the reference neighbor table INCLUDES the self-match (pytorch3d
        # knn_points' first neighbor at distance 0), so the density at a
        # sample counts its own source Gaussian -- the dominant term
        _, idx = knn_ops.knn(
            guarded, guarded, k=self.sugar_cfg.knn_to_track, exclude_self=False
        )
        self._knn_idx = idx
        self._knn_step = step

    def _gaussian_stage_losses(self, gs, batch, sched, key, logs, out_ref):
        loss = jnp.float32(0.0)
        params = gs.params
        alive_f = gs.alive.astype(jnp.float32)
        opac = gf.get_opacity(params)[:, 0]

        if self.has_loss("lambda_opacity_binary"):
            # push opacities toward {0, 1} (reference :258-283)
            binary = jnp.sum(opac * (1.0 - opac) * alive_f) / jnp.maximum(
                jnp.sum(alive_f), 1.0
            )
            logs["train/loss_opacity_binary"] = binary
            loss = loss + binary * self.loss_lambda(sched, "lambda_opacity_binary")

        if out_ref is not None:
            # reference applies the TV trio in both stages
            # (sugar_static.py:315-331)
            loss = self.tv_trio_losses(out_ref, sched, logs, loss)

        needs_density = self.has_loss("lambda_density_regulation")
        needs_normal = self.has_loss("lambda_normal_regulation")
        if (needs_density or needs_normal) and self._knn_idx is not None:
            gaussians = dict(
                means=params.xyz,
                scales=gf.get_scaling(params),
                quats=params.rotation,
                opacities=opac,
                alive=gs.alive,
            )
            n_samples = min(
                self.sugar_cfg.n_samples_for_sdf_regularization, 8192
            )
            if needs_density and out_ref is not None and "comp_depth" in out_ref:
                k1, key = jax.random.split(key)
                fovy = batch["fovy"][0]
                cam = camera_from_c2w(
                    batch["c2w"][0], fovy, fovy,
                    out_ref["comp_depth"].shape[1],
                    out_ref["comp_depth"].shape[2],
                )
                dens_loss, beta = sugar_reg.density_regulation_loss(
                    k1, gaussians, self._knn_idx, cam,
                    jax.lax.stop_gradient(out_ref["comp_depth"][0, :, :, 0]),
                    n_samples,
                )
                logs["train/loss_density_regulation"] = dens_loss
                logs["train/sugar_beta"] = beta
                loss = loss + dens_loss * self.loss_lambda(
                    sched, "lambda_density_regulation"
                )
            if needs_normal:
                k2, key = jax.random.split(key)
                nl = sugar_reg.sdf_better_normal_loss(
                    k2, gaussians, self._knn_idx, min(n_samples, 2048)
                )
                logs["train/loss_normal_regulation"] = nl
                loss = loss + nl * self.loss_lambda(
                    sched, "lambda_normal_regulation"
                )
        return loss


@register("sugar-static-system")
class SugarStaticSystem(GaussianStageRegMixin, Zero123System):
    Config = SugarStaticConfig

    # reference lambda names -> ours (accepted as aliases so reference
    # experiment files map 1:1; reference configs/gs_to_sugar.yaml:161-163)
    _LOSS_ALIASES = {
        "lambda_sugar_density_reg": "lambda_density_regulation",
        "lambda_sugar_sdf_normal_reg": "lambda_normal_regulation",
    }

    def __init__(self, cfg=None, **kwargs):
        super().__init__(cfg, **kwargs)
        from ..utils.config import parse_structured
        from ..utils.registry import find

        for ref_name, ours in self._LOSS_ALIASES.items():
            if ref_name in self.cfg.loss and ours not in self.cfg.loss:
                self.cfg.loss[ours] = self.cfg.loss[ref_name]
        sugar_dict = dict(self.cfg.sugar)
        if self.cfg.n_samples_for_sugar_sdf_reg is not None:
            sugar_dict.setdefault(
                "n_samples_for_sdf_regularization",
                self.cfg.n_samples_for_sugar_sdf_reg,
            )
        self._init_sugar_stage(sugar_dict)
        self.guidance_2d = (
            find(self.cfg.guidance_2d_type)(self.cfg.guidance_2d)
            if self.cfg.guidance_2d_type
            else None
        )
        pp2 = (
            find(self.cfg.prompt_processor_2d_type)(self.cfg.prompt_processor_2d)
            if self.cfg.prompt_processor_2d_type
            else None
        )
        self.prompt_utils_2d = pp2() if pp2 else None
        if self.cfg.stage == "sugar":
            self._maybe_bind_mesh()

    # -- optional 2D SDS -----------------------------------------------------
    def _extra_sig(self, step: int) -> tuple:
        if self.guidance_2d is None:
            return (False, False)
        freq = self.cfg.freq or {}
        use_2d = step >= int(freq.get("milestone_2d_sds", 0))
        every = max(int(freq.get("input_normal", 0)), 0)
        use_normal = every > 0 and step % every == 0
        return (use_2d, use_normal)

    def _guidance_2d_losses(self, out_z, rcb, sched, key, logs, sig):
        use_2d, use_normal = sig[8], sig[9]
        if self.guidance_2d is None or not use_2d:
            return jnp.float32(0.0)
        inp = (
            out_z["comp_normal"]
            if use_normal and "comp_normal" in out_z
            else out_z["comp_rgb"]
        )
        g2 = self.guidance_2d(
            inp, self.prompt_utils_2d, rcb, key=key, sched=sched.get("guidance")
        )
        logs["train/loss_sds_2d"] = g2["loss_sds"]
        return g2["loss_sds"] * self.loss_lambda(sched, "lambda_sds_2d")

    def extra_substep_losses(self, gs, batch, sched, key, logs, out_ref):
        if self.cfg.stage == "gaussian":
            return self._gaussian_stage_losses(gs, batch, sched, key, logs, out_ref)
        return jnp.float32(0.0)

    def _train_step_impl(self, sig, state, batch, key, sched):
        if self.cfg.stage == "sugar":
            return self._sugar_step_impl(sig, state, batch, key, sched)
        return super()._train_step_impl(sig, state, batch, key, sched)

    # -- sugar refinement stage ---------------------------------------------
    def _maybe_bind_mesh(self):
        src = self.cfg.geometry_convert_from or self.cfg.geometry.get(
            "geometry_convert_from", ""
        )
        if self._needs_binding() and src:
            if src.endswith(".ckpt.npz") or src.endswith(".npz"):
                # gaussian-stage checkpoint (the natural gs_to_sugar handoff;
                # reference geometry_convert_from accepts a .ckpt the same
                # way, geometry/gaussian_base.py:297-347)
                from ..models.mesh_extract import extract_mesh_from_gaussians
                from ..utils.ckpt import load_checkpoint

                prev_state, _ = load_checkpoint(src)
                g_state = getattr(prev_state, "gauss", prev_state)
                verts, faces = extract_mesh_from_gaussians(g_state)
                if verts is None:
                    raise ValueError(
                        f"mesh extraction from {src!r} found no surface "
                        "(gaussians too diffuse?); cannot bind the sugar stage"
                    )
                self.geometry.bind_mesh(verts, faces)
            elif src.endswith(".ply"):
                # extract a mesh from the gaussian-stage PLY and bind it
                from ..models import ply_io
                from ..models.gaussian_field import (
                    GaussianFieldConfig,
                    init_state as gf_init,
                )
                from ..models.mesh_extract import extract_mesh_from_gaussians

                raw_cfg = GaussianFieldConfig(geometry_convert_from=src)
                g_state = gf_init(raw_cfg)
                verts, faces = extract_mesh_from_gaussians(g_state)
                if verts is None:
                    raise ValueError(
                        f"mesh extraction from {src!r} found no surface "
                        "(gaussians too diffuse?); cannot bind the sugar stage"
                    )
                self.geometry.bind_mesh(verts, faces)
            elif src.endswith(".obj"):
                verts, faces = mesh_ops.load_obj(src)
                self.geometry.bind_mesh(verts, faces)

    def _needs_binding(self):
        return (
            hasattr(self.geometry, "bind_mesh")
            and getattr(self.geometry, "_bound_mesh", None) is None
        )

    def bind_mesh(self, verts, faces, colors=None):
        self.geometry.bind_mesh(verts, faces, colors)

    def init_state(self, seed: int = 0):
        if self.cfg.stage != "sugar":
            return super().init_state(seed)
        sugar_state = self.geometry.init_state(seed)
        key = jax.random.PRNGKey(seed)
        extra: Dict[str, Any] = {}
        if self.background is not None and hasattr(self.background, "init_params"):
            params = self.background.init_params(key)
            if params:
                extra["background"] = params
        return SystemState(
            gauss=sugar_state, extra_params=extra, extra_opt=init_adam(extra)
        )

    def _sugar_step_impl(self, sig, state, batch, key, sched):
        (h, w, bs, hrc, wrc, bsrc, do_ref, do_z) = sig[:8]
        sugar_state = state.gauss
        topo = self.geometry.topology

        def loss_fn(params, ep):
            ss = sugar_state.replace(params=params)
            logs: Dict[str, Any] = {}
            total = jnp.float32(0.0)
            k = key
            out_stats = None
            if do_z and "random_camera" in batch:
                rcb = batch["random_camera"]
                k, k_r, k_g = jax.random.split(k, 3)
                out_z = self._render_sugar(ss, ep, rcb, hrc, wrc, k_r, sched)
                guidance_out = self.guidance(
                    out_z["comp_rgb"], self.prompt_utils, rcb,
                    key=k_g, sched=sched.get("guidance"),
                )
                logs["train/loss_zero123_sds"] = guidance_out["loss_sds"]
                total = total + guidance_out["loss_sds"] * self.loss_lambda(
                    sched, "lambda_sds"
                )
                # optional 2D SDS, stage-independent in the reference
                # (sugar_static.py:231-244)
                k, k_2d = jax.random.split(k)
                total = total + self._guidance_2d_losses(
                    out_z, rcb, sched, k_2d, logs, sig
                )
                out_stats = out_z
            if do_ref:
                k, k_r = jax.random.split(k)
                out_ref = self._render_sugar(ss, ep, batch, h, w, k_r, sched)
                total = total + super(SugarStaticSystem, self)._ref_losses(
                    out_ref, batch, sched, logs
                )
                out_stats = out_ref

            verts = params.points
            if self.has_loss("lambda_normal_consistency"):
                nc = mesh_ops.normal_consistency_loss(
                    verts, sugar_state.faces, jnp.asarray(topo.edge_faces)
                )
                logs["train/loss_normal_consistency"] = nc
                total = total + nc * self.loss_lambda(
                    sched, "lambda_normal_consistency"
                )
            if self.has_loss("lambda_laplacian_smoothing"):
                lap = mesh_ops.laplacian_smoothing_loss(
                    verts,
                    jnp.asarray(topo.vert_nbr_idx),
                    jnp.asarray(topo.vert_nbr_mask),
                )
                logs["train/loss_laplacian_smoothing"] = lap
                total = total + lap * self.loss_lambda(
                    sched, "lambda_laplacian_smoothing"
                )
            if self.has_loss("lambda_opacity_max"):
                from ..models.sugar import gaussian_strengths

                om = jnp.mean((1.0 - gaussian_strengths(params)) ** 2)
                logs["train/loss_opacity_max"] = om
                total = total + om * self.loss_lambda(sched, "lambda_opacity_max")
            if (
                self.has_loss("lambda_normal_depth_consistency")
                and out_stats is not None
                and "comp_normal" in out_stats
                and "comp_normal_from_dist" in out_stats
            ):
                n1 = out_stats["comp_normal"] * 2.0 - 1.0
                n2 = out_stats["comp_normal_from_dist"] * 2.0 - 1.0
                # MSE between raw normals (reference sugar_static.py:306-313)
                ndc = jnp.mean((n1 - n2) ** 2)
                logs["train/loss_normal_depth_consistency"] = ndc
                total = total + ndc * self.loss_lambda(
                    sched, "lambda_normal_depth_consistency"
                )
            if self.has_loss("lambda_tv_loss") and out_stats is not None:
                tv = tv_loss(out_stats["comp_rgb"])
                logs["train/loss_tv"] = tv
                total = total + tv * self.loss_lambda(sched, "lambda_tv_loss")
            if out_stats is not None:
                # reference TV names: rgb_tv / depth_tv / normal_tv
                # (sugar_static.py:315-331)
                total = self.tv_trio_losses(out_stats, sched, logs, total)

            logs["train/loss_total"] = total
            logs["n_faces"] = sugar_state.faces.shape[0]
            return total, (out_stats, logs)

        (g_params, g_extra), (out, logs) = jax.grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(sugar_state.params, state.extra_params)

        new_params, new_adam = adam_update(
            sugar_state.params, g_params, sugar_state.adam, sched["lrs"]
        )
        new_sugar = sugar_state.replace(params=new_params, adam=new_adam)
        if state.extra_params:
            lr_tree = jax.tree_util.tree_map(
                lambda _: sched["extra_lr"], state.extra_params
            )
            new_extra, new_opt = adam_update(
                state.extra_params, g_extra, state.extra_opt, lr_tree, eps=1e-8
            )
        else:
            new_extra, new_opt = state.extra_params, state.extra_opt
        return (
            SystemState(gauss=new_sugar, extra_params=new_extra, extra_opt=new_opt),
            logs,
        )

    def _render_sugar(self, ss, ep, batch, height, width, key, sched):
        b = dict(batch)
        b["height"], b["width"] = height, width
        return self.renderer.batch_forward(
            ss,
            b,
            bg_params=ep.get("background") if ep else None,
            key=key,
            ambient_only=sched.get("ambient_only") if sched else None,
            training=True,
            color_clip=sched["color_clip"] if sched else jnp.float32(1e9),
        )

    def predict_textured_mesh(self, state, views, out_path: str):
        """--predict: bake a textured OBJ (reference system/base.py:72-323).
        With cfg.postprocess, low-density border faces are peeled first
        (reference on_predict_start, system/base.py:73)."""
        from ..models.texture_bake import extract_textured_mesh

        if self.cfg.postprocess:
            new_gauss = self.geometry.postprocess_state(
                state.gauss,
                density_threshold=self.cfg.postprocess_density_threshold,
                iterations=self.cfg.postprocess_iterations,
            )
            state = state.replace(gauss=new_gauss)
        return extract_textured_mesh(
            self.geometry,
            state.gauss,
            lambda vs: self.render_views(state, vs),
            views,
            out_path,
            square_size=self.geometry.cfg.square_size_in_texture,
        )

    # sugar stage has no densify; the zero123 base handles the gaussian stage
    def _update_structures(self, state, step, key):
        if self.cfg.stage == "sugar":
            return state, False
        return self.geometry.update_states(state.gauss, step, key)

    def sched_scalars(self, step: int):
        sched = super().sched_scalars(step)
        sched["lrs"] = self.geometry.lr_tree(step)
        return sched

    def train_step(self, state, batch, step: int, key):
        if self.cfg.stage != "sugar":
            # gaussian stage: the density/SDF regularizers track a host-side
            # KNN table, refreshed every reset_neighbors_every steps
            # (reference sugar_utils.py:232-254).  This was previously in a
            # SHADOWED duplicate train_step definition and never ran.
            if self.has_loss("lambda_density_regulation") or self.has_loss(
                "lambda_normal_regulation"
            ):
                self._refresh_knn(state, step)
            return Zero123System.train_step(self, state, batch, step, key)
        dev_batch = to_device_batch(batch)
        sched = self.sched_scalars(step)
        bs = int(np.asarray(batch["c2w"]).shape[0])
        h, wd = int(batch["height"]), int(batch["width"])
        rc = batch.get("random_camera")
        do_ref, do_z = self._substep_mode(step)
        if rc is not None:
            bsrc = int(np.asarray(rc["c2w"]).shape[0])
            hrc, wrc = int(rc["height"]), int(rc["width"])
        else:
            bsrc, hrc, wrc = 0, 0, 0
            do_z = False
        sig = (h, wd, bs, hrc, wrc, bsrc, do_ref, do_z) + self._extra_sig(step)
        if sig not in self._train_jit:
            self._train_jit[sig] = jax.jit(partial(self._sugar_step_impl, sig))
        state, logs = self._train_jit[sig](state, dev_batch, key, sched)
        return state, logs
