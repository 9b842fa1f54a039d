"""Temporal Zero123 guidance: frame-conditioned SDS for 4D generation
(reference guidance/temporal_zero123_guidance.py:77-386 and the
Stable-Zero123 variant at guidance/temporal_stable_zero123_guidance.py).

The reference precomputes per-frame CLIP crossattn + VAE concat conditioning
from the video frames (:200-215) and looks them up by `frame_indices` during
SDS (:251-296).  The SDS math itself (CFG pair batch, w = 1 - alpha_bar,
reparameterized MSE, scheduled min/max step + grad clip) lives in
guidance/sds.py and is exact.

The denoiser is pluggable like the SD guidance: real Zero123 UNet/VAE weights
are not downloadable here (zero egress), so the default denoiser is an
analytic per-frame prior whose clean image is the matching conditioning
frame -- frame-lookup, camera-delta embedding, and CFG plumbing are all
exercised for real.  `set_denoiser(fn)` attaches a real model when local
weights exist.

Camera conditioning (reference :260-272): [d_elev, sin(d_azim), cos(d_azim),
d_dist] for zero123; the stable-zero123 variant replaces the 4th channel with
deg2rad(90 - cond_elevation)."""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.registry import register
from .base import BaseGuidance
from .sds import SDSConfig, ddpm_alphas_cumprod, sds_loss, sds_sched_scalars


@dataclasses.dataclass
class TemporalZero123Config:
    pretrained_model_name_or_path: str = "load/zero123/zero123-xl.ckpt"
    pretrained_config: str = ""
    vram_O: bool = True
    cond_image_path: str = ""
    cond_video_path: str = ""
    cond_elevation_deg: float = 0.0
    cond_azimuth_deg: float = 0.0
    cond_camera_distance: float = 1.2
    guidance_scale: float = 3.0
    min_step_percent: Any = 0.02
    max_step_percent: Any = 0.98
    grad_clip: Any = None
    num_frames: int = 14


class _TemporalZero123Base(BaseGuidance):
    Config = TemporalZero123Config
    stable_variant = False

    def __init__(self, cfg=None, **kwargs):
        if cfg is None:
            cfg = TemporalZero123Config(**kwargs)
        elif isinstance(cfg, dict):
            from ..utils.config import parse_structured

            cfg = parse_structured(TemporalZero123Config, cfg)
        self.cfg = cfg
        self.sds_cfg = SDSConfig(
            guidance_scale=cfg.guidance_scale,
            min_step_percent=cfg.min_step_percent,
            max_step_percent=cfg.max_step_percent,
            grad_clip=cfg.grad_clip,
        )
        self.alphas_cumprod = ddpm_alphas_cumprod()
        self.denoiser = None
        # per-frame conditioning; filled by prepare_embeddings
        self.cond_targets = jnp.full((cfg.num_frames, 3), 0.5)

    def prepare_embeddings(self, frames: np.ndarray) -> None:
        """frames (T, H, W, 3) in [0, 1]: the reference runs CLIP + VAE here
        (:200-215); the analytic prior keeps the per-frame images (downsampled
        mean color target) for frame-conditioned SDS."""
        t = frames.shape[0]
        means = frames.reshape(t, -1, 3).mean(axis=1)
        self.cond_targets = jnp.asarray(means, jnp.float32)
        self._cond_frames = jnp.asarray(frames, jnp.float32)

    def set_denoiser(self, fn):
        self.denoiser = fn

    def camera_embedding(self, batch) -> jnp.ndarray:
        """(B, 4) relative-camera conditioning (reference :260-272)."""
        d_elev = batch["elevation"] - self.cfg.cond_elevation_deg
        d_azim = (batch["azimuth"] - self.cfg.cond_azimuth_deg) % 360.0
        d_dist = batch["camera_distances"] - self.cfg.cond_camera_distance
        if self.stable_variant:
            fourth = jnp.deg2rad(
                jnp.full_like(d_elev, 90.0 - self.cfg.cond_elevation_deg)
            )
        else:
            fourth = d_dist
        return jnp.stack(
            [
                jnp.deg2rad(d_elev),
                jnp.sin(jnp.deg2rad(d_azim)),
                jnp.cos(jnp.deg2rad(d_azim)),
                fourth,
            ],
            axis=-1,
        )

    def sched_scalars(self, step: int) -> dict:
        return sds_sched_scalars(self.sds_cfg, step)

    def __call__(self, rgb, prompt_utils, batch, key=None, sched=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        if sched is None:
            sched = sds_sched_scalars(self.sds_cfg, 0)
        ac = self.alphas_cumprod
        frame_idx = batch.get("frame_indices")
        if frame_idx is None:
            frame_idx = jnp.zeros((rgb.shape[0],), jnp.int32)
        cam_emb = self.camera_embedding(batch)

        if self.denoiser is not None:
            def denoise_fn(noisy, t, k):
                return self.denoiser(noisy, t, k, frame_idx, cam_emb)

        else:
            targets = self.cond_targets[frame_idx]  # (B, 3)

            def denoise_fn(noisy, t, k):
                alpha_bar = ac[t].reshape((t.shape[0],) + (1,) * (noisy.ndim - 1))
                x0 = jnp.broadcast_to(
                    targets[:, None, None, :], noisy.shape
                )
                eps = (noisy - jnp.sqrt(alpha_bar) * x0) / jnp.sqrt(1.0 - alpha_bar)
                return eps, eps

        loss, aux = sds_loss(rgb, denoise_fn, key, sched, self.sds_cfg, ac)
        return {"loss_sds": loss, "grad_norm": aux["grad_norm"]}


@register("temporal-zero123-guidance")
class TemporalZero123Guidance(_TemporalZero123Base):
    stable_variant = False


@register("temporal-stable-zero123-guidance")
class TemporalStableZero123Guidance(_TemporalZero123Base):
    stable_variant = True


@register("stable-zero123-guidance")
@register("zero123-guidance")
class StableZero123Guidance(_TemporalZero123Base):
    """Single-image (non-temporal) zero123: frame 0 conditioning only
    (the reference uses threestudio's builtin here; same interface)."""

    stable_variant = True
