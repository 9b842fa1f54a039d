"""Multi-view (MVDream / ImageDream) system (reference
system/gaussian_mvdream.py:15-249): the text-to-3D loss set plus a sparsity
loss on comp_mask (reference :108-111) and a pred-normal MSE against the
rendered depth-normal (reference :135-139)."""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.registry import register
from .base import BaseSystemConfig
from .gaussian_splatting import GaussianSplattingSystem


@register("gaussian-splatting-mvdream-system")
class MVDreamSystem(GaussianSplattingSystem):
    Config = BaseSystemConfig

    def compute_loss(self, out, gauss, extra_params, batch, sched, key):
        loss, logs = super().compute_loss(out, gauss, extra_params, batch, sched, key)

        if (
            self.has_loss("lambda_pred_normal")
            and "comp_pred_normal" in out
            and "comp_normal" in out
        ):
            loss_pred_normal = jnp.mean(
                (out["comp_pred_normal"] - out["comp_normal"]) ** 2
            )
            logs["train/loss_pred_normal"] = loss_pred_normal
            loss = loss + loss_pred_normal * self.loss_lambda(
                sched, "lambda_pred_normal"
            )
        logs["train/loss_total"] = loss
        return loss, logs
