"""Text-to-3D SDS system (reference system/gaussian_splatting.py:17-223).

Loss assembly mirrors the reference training_step exactly: every guidance
output named loss_* weighted by lambda_*, plus position / opacity / scales /
TV / depth-TV regularizers (reference :88-124).  The reference's two-phase
backward (loss_sds first, read viewspace grads, then the rest) collapses to
one jax.grad: the regularizers never touch the means2d side-channel, so the
densification statistics are identical (SURVEY.md call stack 3.1)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import gaussian_field as gf
from ..utils.loss import tv_loss
from ..utils.registry import register
from .base import BaseGaussianSystem, BaseSystemConfig


@register("gaussian-splatting-system")
class GaussianSplattingSystem(BaseGaussianSystem):
    Config = BaseSystemConfig

    def compute_loss(self, out, gauss, extra_params, batch, sched, key):
        logs = {}
        guidance_out = self.guidance(
            out["comp_rgb"],
            self.prompt_utils,
            batch,
            key=key,
            sched=sched.get("guidance"),
        )
        loss = jnp.float32(0.0)
        for name, value in guidance_out.items():
            logs[f"train/{name}"] = value
            if name.startswith("loss_"):
                loss = loss + value * self.loss_lambda(
                    sched, name.replace("loss_", "lambda_")
                )

        params = gauss.params
        alive = gauss.alive.astype(jnp.float32)
        n_alive = jnp.maximum(jnp.sum(alive), 1.0)

        if self.has_loss("lambda_position"):
            # mean |xyz| over live points (reference :90-95)
            xyz_norm = jnp.linalg.norm(params.xyz, axis=-1) * alive
            loss_position = jnp.sum(xyz_norm) / n_alive
            logs["train/loss_position"] = loss_position
            loss = loss + self.loss_lambda(sched, "lambda_position") * loss_position

        if self.has_loss("lambda_opacity"):
            # sum of |scale| * opacity (reference :97-103)
            scaling = jnp.linalg.norm(gf.get_scaling(params), axis=-1)
            opac = gf.get_opacity(params)[:, 0]
            loss_opacity = jnp.sum(
                jax.lax.stop_gradient(scaling) * opac * alive
            )
            logs["train/loss_opacity"] = loss_opacity
            loss = loss + self.loss_lambda(sched, "lambda_opacity") * loss_opacity

        if self.has_loss("lambda_scales"):
            scale_sum = jnp.sum(gf.get_scaling(params) * alive[:, None])
            logs["train/scales"] = scale_sum
            loss = loss + self.loss_lambda(sched, "lambda_scales") * scale_sum

        if self.has_loss("lambda_tv_loss"):
            loss_tv = tv_loss(out["comp_rgb"])
            logs["train/loss_tv"] = loss_tv
            loss = loss + self.loss_lambda(sched, "lambda_tv_loss") * loss_tv

        if self.has_loss("lambda_depth_tv_loss") and "comp_depth" in out:
            terms = tv_loss(out["comp_depth"])
            if "comp_normal" in out:
                terms = terms + tv_loss(out["comp_normal"])
            logs["train/loss_depth_tv"] = terms
            loss = loss + self.loss_lambda(sched, "lambda_depth_tv_loss") * terms

        if self.has_loss("lambda_sparsity") and "comp_mask" in out:
            loss_sparsity = jnp.mean(out["comp_mask"])
            logs["train/loss_sparsity"] = loss_sparsity
            loss = loss + self.loss_lambda(sched, "lambda_sparsity") * loss_sparsity

        logs["train/loss_total"] = loss
        logs["gauss_num"] = gauss.n_alive
        return loss, logs
