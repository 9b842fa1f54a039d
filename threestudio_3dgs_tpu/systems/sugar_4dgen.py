"""SuGaR 4D system: motion-stage training of dynamic (mesh-bound) Gaussians
(reference system/sugar_4dgen.py:33-788).

Per iteration: temporal-SDS substep on random cameras x sampled frames, a
reference substep on the fixed camera across frames (rgb/mask + PSNR metric
+ per-frame mesh normal-consistency and laplacian, reference :234-250),
ARAP energy between the canonical and timed meshes on key and
densely-sampled inter-frame timestamps (reference :321-328,391-393,412-421),
and a reference-frame anchor (lambda_ref_xyz, reference :304-307).

Spline control knots are the per-frame node transforms and stay inside the
jitted graph (the reference recomputes them host-side every step,
:423-427)."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.optim import adam_update, init_adam
from ..ops import mesh as mesh_ops
from ..ops.arap import arap_energy, cotangent_weights
from ..utils.loss import psnr
from ..utils.registry import register
from .base import SystemState, to_device_batch
from .gaussian_zero123 import Zero123System
from .sugar_static import SugarStaticConfig


@dataclasses.dataclass
class Sugar4DGenConfig(SugarStaticConfig):
    stage: str = "motion"
    num_inter_frames: int = 10
    length_inter_frames: float = 0.2
    guidance_zero123_type: Optional[str] = None
    guidance_zero123: dict = dataclasses.field(default_factory=dict)
    guidance_2d_type: Optional[str] = None
    guidance_2d: dict = dataclasses.field(default_factory=dict)
    prompt_processor_2d_type: Optional[str] = None
    prompt_processor_2d: dict = dataclasses.field(default_factory=dict)
    prompt_processor_3d_type: Optional[str] = None
    guidance_3d_type: Optional[str] = None


@register("sugar-4dgen-system")
class Sugar4DGenSystem(Zero123System):
    Config = Sugar4DGenConfig

    def __init__(self, cfg=None, **kwargs):
        super().__init__(cfg, **kwargs)
        from ..utils.registry import find

        if self.cfg.guidance_zero123_type:
            self.guidance = find(self.cfg.guidance_zero123_type)(
                self.cfg.guidance_zero123
            )
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
        self._arap_weights = None
        self._refresh_arap_weights()  # geometry may bind via config path

    def attach_video_frames(self, frames: np.ndarray):
        if hasattr(self.guidance, "prepare_embeddings"):
            self.guidance.prepare_embeddings(frames)

    def bind_mesh(self, verts, faces, colors=None):
        self.geometry.bind_mesh(verts, faces, colors)
        self._refresh_arap_weights()

    def _refresh_arap_weights(self):
        """Cotangent edge weights on the canonical mesh (reference ARAPCoach,
        arap_utils.py:66-140); uniform weights silently diverged before."""
        topo = getattr(self.geometry, "topology", None)
        state_faces = getattr(self.geometry, "_bound_mesh", None)
        if topo is None or state_faces is None:
            return
        verts, faces = state_faces[0], state_faces[1]
        self._arap_weights = cotangent_weights(
            jnp.asarray(verts),
            jnp.asarray(faces),
            jnp.asarray(topo.vert_nbr_idx),
            jnp.asarray(topo.vert_nbr_mask),
        )

    def init_state(self, seed: int = 0) -> SystemState:
        sugar_state = self.geometry.init_state(seed)
        key = jax.random.PRNGKey(seed)
        extra: Dict[str, Any] = {}
        if self.background is not None and hasattr(self.background, "init_params"):
            params = self.background.init_params(key)
            if params:
                extra["background"] = params
        if self.geometry.cfg.dynamic_mode == "deformation":
            from ..models.deformation import (
                DeformationConfig,
                init_deformation_params,
            )

            extra["deformation"] = init_deformation_params(
                jax.random.PRNGKey(seed + 1), DeformationConfig()
            )
        return SystemState(
            gauss=sugar_state, extra_params=extra, extra_opt=init_adam(extra)
        )

    # -- regularizers --------------------------------------------------------
    def _image_reg_losses(self, out, sched, logs):
        """Image-space regularizers on the substep's render
        (reference sugar_4dgen.py:276-302): rgb/depth/normal total variation
        and the normal vs depth-derived-normal MSE."""
        from ..utils.loss import tv_loss

        loss = self.tv_trio_losses(out, sched, logs)
        if (
            self.has_loss("lambda_normal_depth_consistency")
            and "comp_normal" in out
            and "comp_normal_from_dist" in out
        ):
            n1 = out["comp_normal"] * 2.0 - 1.0
            n2 = out["comp_normal_from_dist"] * 2.0 - 1.0
            v = jnp.mean((n1 - n2) ** 2)
            logs["train/loss_normal_depth_consistency"] = v
            loss = loss + v * self.loss_lambda(
                sched, "lambda_normal_depth_consistency"
            )
        return loss

    def _inter_frame_losses(self, ss, ep, batch, sched, key, logs, h, w):
        """Dense inter-frame regularization (reference sugar_4dgen.py:348-410):
        sample num_inter_frames timestamps in a random window of
        length_inter_frames, apply (a) the 2D-diffusion SDS on renders of
        those frames from the reference camera and (b) ARAP between the
        canonical mesh and every sampled frame."""
        loss = jnp.float32(0.0)
        n_if = int(self.cfg.num_inter_frames)
        length = float(self.cfg.length_inter_frames)
        k1, k2, k3 = jax.random.split(key, 3)
        start = jax.random.uniform(k1) * (1.0 - length)
        ts = start + jnp.linspace(0.0, length, n_if)

        deformation = ep.get("deformation")
        f0 = batch["frame_indices"][0] if "frame_indices" in batch else 0

        if self.has_loss("lambda_arap_reg_inter_frame") or self.has_loss(
            "lambda_arap_reg"
        ):
            topo = self.geometry.topology
            nbr_idx = jnp.asarray(topo.vert_nbr_idx)
            nbr_mask = jnp.asarray(topo.vert_nbr_mask)

            def one(t):
                verts_t = self.geometry.timed_vertices(ss, t, f0, deformation)
                return arap_energy(
                    ss.params.points, verts_t, nbr_idx, nbr_mask,
                    weights=self._arap_weights,
                ) / ss.params.points.shape[0]

            e = jnp.mean(jax.vmap(one)(ts))
            logs["train/loss_arap_reg_inter_frame"] = e
            lam = sched["lambdas"].get(
                "lambda_arap_reg_inter_frame",
                sched["lambdas"].get("lambda_arap_reg", jnp.float32(0.0)),
            )
            loss = loss + e * lam

        if self.guidance_2d is not None and self.has_loss("lambda_sds_2d"):
            c2w0 = batch["c2w"][:1]
            batch_if = {
                "c2w": jnp.tile(c2w0, (n_if, 1, 1)),
                "fovy": jnp.tile(batch["fovy"][:1], (n_if,)),
                "elevation": jnp.tile(batch["elevation"][:1], (n_if,))
                if "elevation" in batch else jnp.zeros((n_if,)),
                "azimuth": jnp.tile(batch["azimuth"][:1], (n_if,))
                if "azimuth" in batch else jnp.zeros((n_if,)),
                "camera_distances": jnp.tile(
                    batch["camera_distances"][:1], (n_if,)
                ) if "camera_distances" in batch else jnp.ones((n_if,)),
                "timestamp": ts,
                "height": h,
                "width": w,
            }
            out_if = self._render(ss, ep, batch_if, h, w, k2, sched)
            g2 = self.guidance_2d(
                out_if["comp_rgb"], self.prompt_utils_2d, batch_if,
                key=k3, sched=sched.get("guidance"),
            )
            logs["train/loss_interf_sds_2d"] = g2["loss_sds"]
            loss = loss + g2["loss_sds"] * self.loss_lambda(sched, "lambda_sds_2d")
        return loss

    def _mesh_motion_losses(self, ss, ep, batch, sched, key, logs):
        loss = jnp.float32(0.0)
        topo = self.geometry.topology
        deformation = ep.get("deformation")
        timestamps = batch.get("timestamp")
        t0 = timestamps[0] if timestamps is not None else jnp.float32(0.0)
        f0 = batch["frame_indices"][0] if "frame_indices" in batch else 0

        verts_t = self.geometry.timed_vertices(ss, t0, f0, deformation)
        nbr_idx = jnp.asarray(topo.vert_nbr_idx)
        nbr_mask = jnp.asarray(topo.vert_nbr_mask)

        if self.has_loss("lambda_normal_consistency"):
            nc = mesh_ops.normal_consistency_loss(
                verts_t, ss.faces, jnp.asarray(topo.edge_faces)
            )
            logs["train/loss_normal_consistency"] = nc
            loss = loss + nc * self.loss_lambda(sched, "lambda_normal_consistency")
        if self.has_loss("lambda_laplacian_smoothing"):
            lap = mesh_ops.laplacian_smoothing_loss(verts_t, nbr_idx, nbr_mask)
            logs["train/loss_laplacian_smoothing"] = lap
            loss = loss + lap * self.loss_lambda(
                sched, "lambda_laplacian_smoothing"
            )

        if (
            self.has_loss("lambda_arap_reg")
            or self.has_loss("lambda_full_arap_reg")
            or self.has_loss("lambda_arap_reg_key_frame")
            or self.has_loss("lambda_arap_reg_inter_frame")
        ):
            # ARAP between the canonical mesh and a random inter-frame time
            # (reference :321-328,391-421)
            k1, key = jax.random.split(key)
            t_rand = jax.random.uniform(k1)
            verts_r = self.geometry.timed_vertices(ss, t_rand, f0, deformation)
            e = arap_energy(
                ss.params.points, verts_r, nbr_idx, nbr_mask,
                weights=self._arap_weights,
            ) / ss.params.points.shape[0]
            logs["train/loss_arap_reg"] = e
            # reference splits ARAP into key-frame / inter-frame substep
            # weights (configs/sugar_dynamic_dg.yaml:172-173); our single
            # random-time ARAP accepts any of the names (max over aliases)
            zero = jnp.float32(0.0)
            lam = sched["lambdas"].get(
                "lambda_arap_reg",
                sched["lambdas"].get("lambda_full_arap_reg", zero),
            )
            lam = jnp.maximum(
                lam,
                jnp.maximum(
                    sched["lambdas"].get("lambda_arap_reg_key_frame", zero),
                    sched["lambdas"].get("lambda_arap_reg_inter_frame", zero),
                ),
            )
            loss = loss + e * lam

        if self.has_loss("lambda_ref_xyz"):
            # reference anchors the t=0 deformed verts to the canonical mesh
            # with an L1 mean (sugar_4dgen.py:304-307)
            verts_0 = self.geometry.timed_vertices(
                ss, jnp.float32(0.0), 0, deformation
            )
            anchor = jnp.mean(jnp.abs(verts_0 - ss.params.points))
            logs["train/loss_ref_xyz"] = anchor
            loss = loss + anchor * self.loss_lambda(sched, "lambda_ref_xyz")
        if self.has_loss("lambda_obj_centric"):
            # keep the deforming object centered in xy
            # (reference sugar_4dgen.py:310-319)
            oc = jnp.abs(jnp.mean(verts_t[..., 0])) + jnp.abs(
                jnp.mean(verts_t[..., 1])
            )
            logs["train/loss_obj_centric"] = oc
            loss = loss + oc * self.loss_lambda(sched, "lambda_obj_centric")
        return loss

    # -- train step ----------------------------------------------------------
    def _train_step_impl(self, sig, state, batch, key, sched):
        (h, w, bs, hrc, wrc, bsrc, do_ref, do_z) = sig[:8]
        sugar_state = state.gauss

        def loss_fn(params, ep):
            ss = sugar_state.replace(params=params)
            logs: Dict[str, Any] = {}
            total = jnp.float32(0.0)
            out_stats = None
            k = key
            if do_z and "random_camera" in batch:
                rcb = batch["random_camera"]
                k, k_r, k_g = jax.random.split(k, 3)
                out_z = self._render(ss, ep, rcb, hrc, wrc, k_r, sched)
                guidance_out = self.guidance(
                    out_z["comp_rgb"], self.prompt_utils, rcb,
                    key=k_g, sched=sched.get("guidance"),
                )
                logs["train/loss_zero123_sds"] = guidance_out["loss_sds"]
                lam = sched["lambdas"].get(
                    "lambda_sds_zero123",
                    sched["lambdas"].get("lambda_sds", jnp.float32(0.0)),
                )
                total = total + guidance_out["loss_sds"] * lam
                out_stats = out_z
            if do_ref:
                k, k_r = jax.random.split(k)
                out_ref = self._render(ss, ep, batch, h, w, k_r, sched)
                total = total + self._ref_losses(out_ref, batch, sched, logs)
                logs["train/psnr"] = psnr(
                    out_ref["comp_rgb"] * batch["mask"],
                    batch["rgb"] * batch["mask"],
                )
                out_stats = out_ref
            if out_stats is not None:
                total = total + self._image_reg_losses(out_stats, sched, logs)
            k, k_m = jax.random.split(k)
            total = total + self._mesh_motion_losses(
                ss, ep, batch, sched, k_m, logs
            )
            if sig[8]:  # inter-frame substep (reference :348-410)
                k, k_if = jax.random.split(k)
                total = total + self._inter_frame_losses(
                    ss, ep, batch, sched, k_if, logs, h, w
                )
            logs["train/loss_total"] = total
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

    def _render(self, ss, ep, batch, height, width, key, sched):
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
            deformation_params=ep.get("deformation") if ep else None,
        )

    def sched_scalars(self, step: int):
        sched = super().sched_scalars(step)
        sched["lrs"] = self.geometry.lr_tree(step)
        return sched

    def train_step(self, state, batch, step: int, key):
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
        freq = self.cfg.freq or {}
        if_every = int(freq.get("inter_frame_reg", 0))
        do_if = (
            if_every > 0
            and step % if_every == 0
            and step >= int(freq.get("milestone_inter_frame_reg", 0))
        )
        sig = (h, wd, bs, hrc, wrc, bsrc, do_ref, do_z, do_if)
        if sig not in self._train_jit:
            self._train_jit[sig] = jax.jit(partial(self._train_step_impl, sig))
        state, logs = self._train_jit[sig](state, dev_batch, key, sched)
        return state, logs
