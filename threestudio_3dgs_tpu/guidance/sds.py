"""Score-distillation core math, shared by all diffusion guidance variants.

Implements exactly the reference's reparameterized-MSE SDS (reference
guidance/temporal_zero123_guidance.py:336-364):

    grad = w(t) * (eps_pred - eps)              (stop-gradient)
    target = stop_grad(latents - grad)
    loss_sds = 0.5 * sum((latents - target)^2) / batch

with w(t) = 1 - alpha_bar_t, uniform timestep sampling in a scheduled
[min_step, max_step] window, optional gradient clipping, and classifier-free
guidance mixing.  The denoiser is pluggable: real UNet weights (when present
locally) or an analytic prior for tests."""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.config import C


def ddpm_alphas_cumprod(
    num_steps: int = 1000, beta_start: float = 0.00085, beta_end: float = 0.012
) -> jnp.ndarray:
    """Scaled-linear (sqrt-space) beta schedule, as used by the SD/Zero123
    DDIMScheduler config the reference loads."""
    betas = (
        jnp.linspace(beta_start ** 0.5, beta_end ** 0.5, num_steps) ** 2
    )
    return jnp.cumprod(1.0 - betas)


@dataclasses.dataclass
class SDSConfig:
    guidance_scale: float = 3.0
    min_step_percent: object = 0.02  # schedulable via C()
    max_step_percent: object = 0.98
    grad_clip: Optional[object] = None  # schedulable [start, v0, v1, end]
    num_train_timesteps: int = 1000
    weighting_strategy: str = "sds"  # w = 1 - alpha_bar (reference :349)


def sds_sched_scalars(cfg: SDSConfig, step: int) -> dict:
    """Host-side evaluation of the scheduled SDS knobs for one step; the
    results enter the jitted graph as traced scalars (no retraces)."""
    sched = {
        "min_step": jnp.int32(
            C(cfg.min_step_percent, 0, step) * cfg.num_train_timesteps
        ),
        "max_step": jnp.int32(
            C(cfg.max_step_percent, 0, step) * cfg.num_train_timesteps
        ),
    }
    if cfg.grad_clip is not None:
        sched["grad_clip"] = jnp.float32(C(cfg.grad_clip, 0, step))
    return sched


def sds_loss(
    latents: jnp.ndarray,  # (B, ...) differentiable render (or latent)
    denoise_fn: Callable,  # (noisy, t, key) -> (eps_uncond, eps_cond)
    key: jnp.ndarray,
    sched: dict,  # from sds_sched_scalars (traced scalars)
    cfg: SDSConfig,
    alphas_cumprod: Optional[jnp.ndarray] = None,
    n_view: int = 1,  # >1: one shared timestep per scene of n_view views
) -> Tuple[jnp.ndarray, dict]:
    if alphas_cumprod is None:
        alphas_cumprod = ddpm_alphas_cumprod(cfg.num_train_timesteps)
    b = latents.shape[0]
    min_step = sched["min_step"]
    max_step = sched["max_step"]

    k_t, k_eps, k_dn = jax.random.split(key, 3)
    t = jax.random.randint(k_t, (b // n_view,), min_step, max_step + 1)
    if n_view > 1:
        t = jnp.repeat(t, n_view)
    alpha_bar = alphas_cumprod[t].reshape((b,) + (1,) * (latents.ndim - 1))
    noise = jax.random.normal(k_eps, latents.shape)
    noisy = jnp.sqrt(alpha_bar) * latents + jnp.sqrt(1.0 - alpha_bar) * noise

    eps_uncond, eps_cond = denoise_fn(jax.lax.stop_gradient(noisy), t, k_dn)
    eps_pred = eps_uncond + cfg.guidance_scale * (eps_cond - eps_uncond)

    if cfg.weighting_strategy == "sds":
        w = 1.0 - alpha_bar
    elif cfg.weighting_strategy == "uniform":
        w = jnp.ones_like(alpha_bar)
    elif cfg.weighting_strategy == "fantasia3d":
        w = (alpha_bar ** 0.5) * (1.0 - alpha_bar)
    else:
        raise ValueError(cfg.weighting_strategy)

    grad = w * (eps_pred - noise)
    if "grad_clip" in sched:
        grad = jnp.clip(grad, -sched["grad_clip"], sched["grad_clip"])
    grad = jnp.nan_to_num(grad)

    target = jax.lax.stop_gradient(latents - grad)
    loss = 0.5 * jnp.sum((latents - target) ** 2) / b
    aux = {"grad_norm": jnp.linalg.norm(grad), "min_step": min_step, "max_step": max_step}
    return loss, aux


def sds_recon_loss(
    latents: jnp.ndarray,  # (B, ...) differentiable latents, B = S*V views
    denoise_fn: Callable,  # (noisy, t, key) -> (eps_uncond, eps_cond)
    key: jnp.ndarray,
    sched: dict,
    cfg: SDSConfig,
    alphas_cumprod: Optional[jnp.ndarray] = None,
    n_view: int = 4,
    recon_std_rescale: float = 0.5,
) -> Tuple[jnp.ndarray, dict]:
    """MVDream's reconstruction-mode SDS (threestudio-mvdream guidance,
    `recon_loss: true` in reference configs/gaussian_splatting_mvdream.yaml:90):
    denoise to an x0 estimate under CFG, rescale its per-scene std toward the
    unguided estimate (CFG over-saturation fix), and take MSE against it.
    One shared timestep per scene (all V views of a scene get the same t)."""
    if alphas_cumprod is None:
        alphas_cumprod = ddpm_alphas_cumprod(cfg.num_train_timesteps)
    b = latents.shape[0]
    scenes = b // n_view

    k_t, k_eps, k_dn = jax.random.split(key, 3)
    t_scene = jax.random.randint(
        k_t, (scenes,), sched["min_step"], sched["max_step"] + 1
    )
    t = jnp.repeat(t_scene, n_view)
    alpha_bar = alphas_cumprod[t].reshape((b,) + (1,) * (latents.ndim - 1))
    noise = jax.random.normal(k_eps, latents.shape)
    noisy = jnp.sqrt(alpha_bar) * latents + jnp.sqrt(1.0 - alpha_bar) * noise

    eps_uncond, eps_cond = denoise_fn(jax.lax.stop_gradient(noisy), t, k_dn)
    eps_pred = eps_uncond + cfg.guidance_scale * (eps_cond - eps_uncond)

    sqrt_ab = jnp.sqrt(alpha_bar)
    sqrt_1ab = jnp.sqrt(1.0 - alpha_bar)
    recon = (noisy - sqrt_1ab * eps_pred) / sqrt_ab
    if recon_std_rescale > 0:
        recon_nocfg = (noisy - sqrt_1ab * eps_cond) / sqrt_ab
        per_scene = lambda x: x.reshape((scenes, -1))
        std = jnp.std(per_scene(recon), axis=1) + 1e-8
        std_nocfg = jnp.std(per_scene(recon_nocfg), axis=1)
        factor = (std_nocfg / std).reshape(
            (scenes,) + (1,) * (latents.ndim - 1)
        )
        adjusted = recon.reshape((scenes, n_view) + latents.shape[1:]) * factor[
            :, None
        ]
        adjusted = adjusted.reshape(latents.shape)
        recon = recon_std_rescale * adjusted + (1 - recon_std_rescale) * recon

    target = jax.lax.stop_gradient(recon)
    loss = 0.5 * jnp.mean(jnp.sum((latents - target) ** 2, axis=tuple(range(1, latents.ndim))))
    aux = {
        "grad_norm": jnp.linalg.norm(latents - target),
        "min_step": sched["min_step"],
        "max_step": sched["max_step"],
    }
    return loss, aux
