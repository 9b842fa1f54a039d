"""Image-to-3D system (reference system/gaussian_zero123.py:20-343).

Two substeps per iteration:
  * "ref": the fixed front camera, supervised by the reference RGBA image
    (rgb/mask MSE, lstsq-aligned absolute depth, Pearson relative depth,
    normal cosine -- reference :115-157);
  * "zero123": SDS on batch["random_camera"] with a random ambient ratio
    (reference :92-97, :158-167).
`freq.ref_or_zero123` selects accumulate (both each step) or alternate
scheduling (reference :202-210).  Densification statistics come from the
last executed substep, matching the reference's use of the final
viewspace_point_tensor (reference :221-237).

The dynamic-shape masked-index lstsq of the reference becomes a closed-form
masked 2x2 normal-equation solve (static shapes under jit).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussian_field as gf
from ..utils.registry import register
from .base import BaseGaussianSystem, BaseSystemConfig, SystemState, to_device_batch


@dataclasses.dataclass
class Zero123SystemConfig(BaseSystemConfig):
    refinement: bool = False
    ambient_ratio_min: float = 0.5
    back_ground_color: Tuple[float, float, float] = (1, 1, 1)


def masked_depth_align_loss(pred, gt, mask):
    """MSE between pred depth and the best affine map of gt depth, computed
    over masked pixels with static shapes (reference :126-136)."""
    m = mask.reshape(-1)
    p = pred.reshape(-1)
    g = gt.reshape(-1)
    n = jnp.maximum(jnp.sum(m), 1.0)
    # solve min ||a*g + b - p||^2 over masked pixels
    sg = jnp.sum(m * g)
    sp = jnp.sum(m * p)
    sgg = jnp.sum(m * g * g)
    sgp = jnp.sum(m * g * p)
    det = n * sgg - sg * sg
    a = jnp.where(jnp.abs(det) > 1e-8, (n * sgp - sg * sp) / det, 0.0)
    b = (sp - a * sg) / n
    aligned = jax.lax.stop_gradient(a) * g + jax.lax.stop_gradient(b)
    return jnp.sum(m * (aligned - p) ** 2) / n


def masked_pearson(pred, gt, mask, eps=1e-6):
    m = mask.reshape(-1)
    p = pred.reshape(-1)
    g = gt.reshape(-1)
    n = jnp.maximum(jnp.sum(m), 1.0)
    pm = jnp.sum(m * p) / n
    gm = jnp.sum(m * g) / n
    pc = (p - pm) * m
    gc = (g - gm) * m
    return jnp.sum(pc * gc) / jnp.maximum(
        jnp.linalg.norm(pc) * jnp.linalg.norm(gc), eps
    )


@register("gaussian-splatting-zero123-system")
class Zero123System(BaseGaussianSystem):
    Config = Zero123SystemConfig

    def _substep_mode(self, step: int) -> Tuple[bool, bool]:
        mode = self.cfg.freq.get("ref_or_zero123", "accumulate")
        if mode == "accumulate":
            return True, True
        do_ref = step < self.cfg.freq.get("ref_only_steps", 0) or step % int(
            self.cfg.freq.get("n_ref", 1)
        ) == 0
        return do_ref, not do_ref

    # ------------------------------------------------------------------
    def _ref_losses(self, out, batch, sched, logs):
        loss = jnp.float32(0.0)
        gt_mask = batch["mask"]
        gt_rgb = batch["rgb"] * gt_mask
        loss_rgb = jnp.mean((gt_rgb - out["comp_rgb"] * gt_mask) ** 2)
        logs["train/loss_ref_rgb"] = loss_rgb
        loss = loss + loss_rgb * self.loss_lambda(sched, "lambda_rgb")

        loss_mask = jnp.mean((gt_mask - out["comp_mask"]) ** 2)
        logs["train/loss_ref_mask"] = loss_mask
        loss = loss + loss_mask * self.loss_lambda(sched, "lambda_mask")

        if self.has_loss("lambda_depth") and "ref_depth" in batch:
            ld = masked_depth_align_loss(
                out["comp_depth"], batch["ref_depth"], gt_mask
            )
            logs["train/loss_ref_depth"] = ld
            loss = loss + ld * self.loss_lambda(sched, "lambda_depth")

        if self.has_loss("lambda_depth_rel") and "ref_depth" in batch:
            lrel = 1.0 - masked_pearson(
                out["comp_depth"], batch["ref_depth"], gt_mask
            )
            logs["train/loss_ref_depth_rel"] = lrel
            loss = loss + lrel * self.loss_lambda(sched, "lambda_depth_rel")

        if (
            self.has_loss("lambda_normal")
            and "ref_normal" in batch
            and "comp_normal" in out
        ):
            gt_n = 1.0 - 2.0 * batch["ref_normal"]
            pred_n = 2.0 * out["comp_normal"] - 1.0
            cos = jnp.sum(gt_n * pred_n, axis=-1) / jnp.maximum(
                jnp.linalg.norm(gt_n, axis=-1) * jnp.linalg.norm(pred_n, axis=-1),
                1e-6,
            )
            m = gt_mask[..., 0]
            ln = 1.0 - jnp.sum(cos * m) / jnp.maximum(jnp.sum(m), 1.0)
            logs["train/loss_ref_normal"] = ln
            loss = loss + ln * self.loss_lambda(sched, "lambda_normal")
        return loss

    def _normal_smooth_loss(self, out, sched, logs, prefix):
        if self.has_loss("lambda_normal_smooth") and "comp_normal" in out:
            n = out["comp_normal"]
            ls = jnp.mean((n[:, 1:] - n[:, :-1]) ** 2) + jnp.mean(
                (n[:, :, 1:] - n[:, :, :-1]) ** 2
            )
            logs[f"train/loss_{prefix}_normal_smooth"] = ls
            return ls * self.loss_lambda(sched, "lambda_normal_smooth")
        return jnp.float32(0.0)

    def _extra_sig(self, step: int) -> tuple:
        """Extra STATIC jit-signature entries subclasses key their graphs on
        (e.g. step-milestone flags); appended to sig after the 8 base slots."""
        return ()

    def _guidance_2d_losses(self, out_z, rcb, sched, key, logs, sig):
        """Optional 2D-diffusion SDS on the random-camera substep (reference
        sugar_static.py:231-244); base systems have none."""
        return jnp.float32(0.0)

    def extra_substep_losses(self, gs, batch, sched, key, logs, out_ref):
        """Hook for subclasses (e.g. SuGaR gaussian-stage regularizers)."""
        return jnp.float32(0.0)

    # ------------------------------------------------------------------
    def _train_step_impl(
        self, sig, state, batch, key, sched
    ):
        (h, w, bs, hrc, wrc, bsrc, do_ref, do_z) = sig[:8]
        cap = state.gauss.capacity
        b_stats = bs if do_ref else bsrc
        vs_dummy = jnp.zeros((b_stats, cap, 2))

        def loss_fn(gp, ep, vs):
            gs = state.gauss.replace(params=gp)
            logs: Dict[str, Any] = {}
            total = jnp.float32(0.0)
            out_stats = None
            k = key
            if do_z:
                rcb = batch["random_camera"]
                k, k_r, k_g, k_a = jax.random.split(k, 4)
                ambient_ratio = self.cfg.ambient_ratio_min + (
                    1.0 - self.cfg.ambient_ratio_min
                ) * jax.random.uniform(k_a)
                out_z = self.render_batch(
                    gs, ep, rcb, hrc, wrc, k_r, sched, True,
                    vs_dummy=None if do_ref else vs,
                    ambient_ratio=ambient_ratio,
                )
                guidance_out = self.guidance(
                    out_z["comp_rgb"], self.prompt_utils, rcb,
                    key=k_g, sched=sched.get("guidance"),
                )
                loss_z = guidance_out["loss_sds"] * self.loss_lambda(
                    sched, "lambda_sds"
                )
                logs["train/loss_zero123_sds"] = guidance_out["loss_sds"]
                loss_z = loss_z + self._normal_smooth_loss(out_z, sched, logs, "zero123")
                k, k_g2 = jax.random.split(k)
                loss_z = loss_z + self._guidance_2d_losses(
                    out_z, rcb, sched, k_g2, logs, sig
                )
                total = total + loss_z
                out_stats = out_z
            if do_ref:
                k, k_r = jax.random.split(k)
                out_ref = self.render_batch(
                    gs, ep, batch, h, w, k_r, sched, True,
                    vs_dummy=vs,
                    ambient_ratio=1.0,
                    shading="diffuse",
                )
                loss_ref = self._ref_losses(out_ref, batch, sched, logs)
                loss_ref = loss_ref + self._normal_smooth_loss(
                    out_ref, sched, logs, "ref"
                )
                k, k_x = jax.random.split(k)
                loss_ref = loss_ref + self.extra_substep_losses(
                    gs, batch, sched, k_x, logs, out_ref
                )
                total = total + loss_ref
                out_stats = out_ref
            logs["train/loss_total"] = total
            logs["gauss_num"] = gs.n_alive
            return total, (out_stats, logs)

        (g_gauss, g_extra, g_vs), (out, logs) = jax.grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(state.gauss.params, state.extra_params, vs_dummy)

        from ..models.optim import adam_update

        gauss = gf.apply_gradients(state.gauss, g_gauss, sched["lrs"])
        if state.extra_params:
            lr_tree = jax.tree_util.tree_map(
                lambda _: sched["extra_lr"], state.extra_params
            )
            new_extra, new_opt = adam_update(
                state.extra_params, g_extra, state.extra_opt, lr_tree, eps=1e-8
            )
        else:
            new_extra, new_opt = state.extra_params, state.extra_opt

        vs_grad_norm = jnp.linalg.norm(g_vs, axis=-1)
        gauss = gf.accumulate_stats(
            gauss,
            out["radii"].astype(jnp.float32),
            out["visibility_filter"],
            vs_grad_norm,
        )
        return SystemState(gauss=gauss, extra_params=new_extra, extra_opt=new_opt), logs

    def render_batch(
        self, gauss, extra_params, batch, height, width, key, sched, training,
        vs_dummy=None, ambient_ratio=None, shading=None,
    ):
        b = dict(batch)
        b["height"], b["width"] = height, width
        return self.renderer.batch_forward(
            gauss,
            b,
            bg_params=extra_params.get("background") if extra_params else None,
            key=key,
            ambient_only=sched.get("ambient_only") if sched else None,
            training=training,
            color_clip=sched["color_clip"] if sched else jnp.float32(1e9),
            means2d_offset=vs_dummy,
            ambient_ratio=ambient_ratio,
            shading=shading,
        )

    def train_step(self, state, batch, step: int, key):
        do_ref, do_z = self._substep_mode(step)
        dev_batch = to_device_batch(batch)
        sched = self.sched_scalars(step)
        bs = int(np.asarray(batch["c2w"]).shape[0])
        h, w = int(batch["height"]), int(batch["width"])
        rc = batch.get("random_camera")
        if rc is not None:
            bsrc = int(np.asarray(rc["c2w"]).shape[0])
            hrc, wrc = int(rc["height"]), int(rc["width"])
        else:
            bsrc, hrc, wrc = 0, 0, 0
            do_z = False
        sig = (h, w, bs, hrc, wrc, bsrc, do_ref, do_z) + self._extra_sig(step)
        if sig not in self._train_jit:
            self._train_jit[sig] = jax.jit(partial(self._train_step_impl, sig))
        k_step, k_struct = jax.random.split(key)
        state, logs = self._train_jit[sig](state, dev_batch, k_step, sched)
        new_gauss, changed = self.geometry.update_states(state.gauss, step, k_struct)
        if changed:
            state = state.replace(gauss=new_gauss)
        return state, logs
