"""Deterministic fake guidance for tests and offline end-to-end runs
(SURVEY.md section 4, test level 3: "a deterministic fake guidance ... so no
diffusion checkpoint is needed").

Two variants:
  * `fake-sds-guidance`: pulls renders toward a fixed target color via the
    true SDS reparameterization path (exercises the exact loss plumbing the
    diffusion guidance uses -- an analytic denoiser whose score points from
    the noisy latent toward the target image).
  * `fake-mse-guidance`: plain MSE toward a target color; simplest possible
    signal for smoke tests.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..utils.registry import register
from .base import BaseGuidance
from .sds import SDSConfig, ddpm_alphas_cumprod, sds_loss, sds_sched_scalars


@dataclasses.dataclass
class FakeGuidanceConfig:
    target_color: Tuple[float, float, float] = (0.8, 0.2, 0.2)
    guidance_scale: float = 3.0
    min_step_percent: Any = 0.02
    max_step_percent: Any = 0.98
    grad_clip: Any = None


@register("fake-sds-guidance")
class FakeSDSGuidance(BaseGuidance):
    Config = FakeGuidanceConfig

    def __init__(self, cfg=None, **kwargs):
        if cfg is None:
            cfg = FakeGuidanceConfig(**kwargs)
        elif isinstance(cfg, dict):
            from ..utils.config import parse_structured

            cfg = parse_structured(FakeGuidanceConfig, cfg)
        self.cfg = cfg
        self.sds_cfg = SDSConfig(
            guidance_scale=cfg.guidance_scale,
            min_step_percent=cfg.min_step_percent,
            max_step_percent=cfg.max_step_percent,
            grad_clip=cfg.grad_clip,
        )
        self.alphas_cumprod = ddpm_alphas_cumprod()

    def sched_scalars(self, step: int) -> dict:
        return sds_sched_scalars(self.sds_cfg, step)

    def __call__(self, rgb, prompt_utils, batch, key=None, sched=None):
        target = jnp.asarray(self.cfg.target_color, jnp.float32)
        ac = self.alphas_cumprod

        def denoise_fn(noisy, t, k):
            # analytic denoiser: the "clean image" the model believes in is
            # the target color; eps = (noisy - sqrt(ab)*x0) / sqrt(1-ab)
            alpha_bar = ac[t].reshape((t.shape[0],) + (1,) * (noisy.ndim - 1))
            x0 = jnp.broadcast_to(target, noisy.shape)
            eps = (noisy - jnp.sqrt(alpha_bar) * x0) / jnp.sqrt(1.0 - alpha_bar)
            return eps, eps  # uncond == cond (cfg mixing is a no-op)

        if key is None:
            key = jax.random.PRNGKey(0)
        if sched is None:
            sched = sds_sched_scalars(self.sds_cfg, 0)
        loss, aux = sds_loss(rgb, denoise_fn, key, sched, self.sds_cfg, ac)
        return {"loss_sds": loss, "grad_norm": aux["grad_norm"]}


@register("fake-mse-guidance")
class FakeMSEGuidance(BaseGuidance):
    Config = FakeGuidanceConfig

    def __init__(self, cfg=None, **kwargs):
        if cfg is None:
            cfg = FakeGuidanceConfig(**kwargs)
        elif isinstance(cfg, dict):
            from ..utils.config import parse_structured

            cfg = parse_structured(FakeGuidanceConfig, cfg)
        self.cfg = cfg

    def __call__(self, rgb, prompt_utils, batch, key=None, sched=None):
        target = jnp.asarray(self.cfg.target_color, jnp.float32)
        loss = jnp.mean((rgb - target) ** 2) * rgb.shape[1] * rgb.shape[2]
        return {"loss_sds": loss}
