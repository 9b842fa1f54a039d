"""Stable-Diffusion SDS guidance (interface-compatible with the reference's
`stable-diffusion-guidance` and the LoRA subclass at reference
guidance/stable_diffusion_lora_guidance.py:21-50).

The full UNet/VAE stack requires checkpoint weights.  This environment has no
network egress, so the denoiser is pluggable:
  * if `pretrained_model_name_or_path` points to a local directory with
    weights, a real denoiser could be attached via `set_denoiser`;
  * otherwise an analytic prior drives SDS toward a deterministic
    prompt-derived palette -- every piece of the SDS plumbing (timestep
    window scheduling, CFG mixing, w(t), reparameterized MSE, grad clip)
    is the real thing (guidance/sds.py), only the score network is fake.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..utils.registry import register
from .base import BaseGuidance
from .sds import SDSConfig, ddpm_alphas_cumprod, sds_loss, sds_sched_scalars


@dataclasses.dataclass
class StableDiffusionGuidanceConfig:
    pretrained_model_name_or_path: str = "stabilityai/stable-diffusion-2-1-base"
    guidance_scale: float = 100.0
    weighting_strategy: str = "sds"
    min_step_percent: Any = 0.02
    max_step_percent: Any = 0.98
    grad_clip: Any = None
    half_precision_weights: bool = True
    lora_model_name_or_path: Optional[str] = None  # lora subclass
    lora_scale: float = 1.0


@register("stable-diffusion-guidance")
class StableDiffusionGuidance(BaseGuidance):
    Config = StableDiffusionGuidanceConfig

    def __init__(self, cfg=None, **kwargs):
        if cfg is None:
            cfg = StableDiffusionGuidanceConfig(**kwargs)
        elif isinstance(cfg, dict):
            from ..utils.config import parse_structured

            cfg = parse_structured(StableDiffusionGuidanceConfig, cfg)
        self.cfg = cfg
        self.sds_cfg = SDSConfig(
            guidance_scale=cfg.guidance_scale,
            min_step_percent=cfg.min_step_percent,
            max_step_percent=cfg.max_step_percent,
            grad_clip=cfg.grad_clip,
            weighting_strategy=cfg.weighting_strategy,
        )
        self.alphas_cumprod = ddpm_alphas_cumprod()
        self.denoiser = None
        self.encode_rgb = None
        if os.path.isdir(str(cfg.pretrained_model_name_or_path)):
            # hook point for locally-available weights; loading machinery is
            # deliberately isolated so the training path stays functional
            self.denoiser = self._try_load_local(cfg.pretrained_model_name_or_path)

    def _try_load_local(self, path: str):
        """Build the real latent-diffusion denoiser from a local diffusers
        checkpoint directory (unet/ + vae/).  Returns None when absent --
        the analytic prior then drives the same SDS plumbing."""
        import os

        unet_file = None
        for cand in (
            "unet/diffusion_pytorch_model.safetensors",
            "unet/diffusion_pytorch_model.bin",
        ):
            if os.path.exists(os.path.join(path, cand)):
                unet_file = os.path.join(path, cand)
                break
        if unet_file is None:
            return None
        from ..diffusion import SD21_UNET, UNet2DCondition, torch_unet_to_flax
        from ..diffusion.convert import (
            fuse_lora,
            load_torch_state_dict,
            unet_config_from_diffusers_json,
        )

        unet_cfg = SD21_UNET
        cfg_json = os.path.join(path, "unet", "config.json")
        if os.path.isfile(cfg_json):
            # real diffusers checkpoints ship their architecture; honor it
            unet_cfg = unet_config_from_diffusers_json(cfg_json)
        from ..diffusion.convert import cast_params_half, tpu_fast_model_config

        # bf16 compute + flash attention on TPU (the reference's
        # half_precision_weights default; the UNet is stop-gradient'd in SDS
        # so the forward-only flash kernel is valid)
        unet_cfg = tpu_fast_model_config(
            unet_cfg, self.cfg.half_precision_weights
        )

        sd = load_torch_state_dict(unet_file)
        lora_path = str(self.cfg.lora_model_name_or_path or "")
        if lora_path:
            # LoRA personalization fused offline into the base weights
            # (reference guidance/stable_diffusion_lora_guidance.py:27-50)
            for cand in (
                lora_path,
                os.path.join(lora_path, "pytorch_lora_weights.safetensors"),
                os.path.join(lora_path, "pytorch_lora_weights.bin"),
            ):
                if os.path.isfile(cand):
                    sd = fuse_lora(
                        sd, load_torch_state_dict(cand), self.cfg.lora_scale
                    )
                    break
        model = UNet2DCondition(unet_cfg)
        params = jax.tree_util.tree_map(
            jnp.asarray,
            torch_unet_to_flax(
                sd, use_linear_projection=unet_cfg.use_linear_projection
            ),
        )
        if self.cfg.half_precision_weights:
            params = cast_params_half(params)  # norms stay f32
        # exposed so callers (scripts/ingest_weights.py) can size prompt
        # embeddings to the checkpoint's context width
        self._ctx_dim = unet_cfg.cross_attention_dim
        self._load_local_vae(path)

        def denoiser(noisy, t, key, emb):
            # CFG pair batch: [uncond | cond]; emb (L, D) shared or (B, L, D)
            # per-sample (view-dependent prompting)
            b = noisy.shape[0]
            if emb.ndim == 2:
                ctx_c = jnp.broadcast_to(emb, (b,) + emb.shape)
            else:
                ctx_c = emb
            ctx_u = jnp.zeros_like(ctx_c)
            both = jnp.concatenate([noisy, noisy], axis=0)
            ts = jnp.concatenate([t, t], axis=0)
            ctxs = jnp.concatenate([ctx_u, ctx_c], axis=0)
            eps = model.apply(params, both, ts, ctxs)
            return eps[:b], eps[b:]

        return denoiser

    def _load_local_vae(self, path: str) -> None:
        """Attach a differentiable rgb -> scaled-latent encoder when the
        checkpoint dir ships a VAE (the reference's `encode_images`,
        threestudio SD guidance).  Without one, SDS runs directly on rgb
        ("rgb_as_latents" semantics) -- only valid if the UNet was built for
        image space."""
        import os

        vae_file = None
        for cand in (
            "vae/diffusion_pytorch_model.safetensors",
            "vae/diffusion_pytorch_model.bin",
        ):
            if os.path.exists(os.path.join(path, cand)):
                vae_file = os.path.join(path, cand)
                break
        if vae_file is None:
            self.encode_rgb = None
            return
        from ..diffusion import SD_VAE, VAEEncoder, torch_vae_encoder_to_flax
        from ..diffusion.convert import (
            load_torch_state_dict,
            vae_config_from_diffusers_json,
        )

        vae_cfg = SD_VAE
        cfg_json = os.path.join(path, "vae", "config.json")
        if os.path.isfile(cfg_json):
            vae_cfg = vae_config_from_diffusers_json(cfg_json)
        from ..diffusion.convert import cast_params_half, tpu_fast_model_config

        vae_cfg = tpu_fast_model_config(vae_cfg, self.cfg.half_precision_weights)
        enc = VAEEncoder(vae_cfg)
        enc_params = jax.tree_util.tree_map(
            jnp.asarray, torch_vae_encoder_to_flax(load_torch_state_dict(vae_file))
        )
        if self.cfg.half_precision_weights:
            enc_params = cast_params_half(enc_params)

        def encode_rgb(rgb, key):
            # rgb (B, H, W, 3) in [0, 1] -> scaled latents (B, H/8, W/8, C)
            from ..diffusion.vae import sample_latents

            moments = enc.apply(enc_params, rgb * 2.0 - 1.0)
            return sample_latents(moments, key, vae_cfg.scaling_factor)

        self.encode_rgb = encode_rgb

    def set_denoiser(self, fn):
        """fn(noisy, t, key, text_embedding) -> (eps_uncond, eps_cond)."""
        self.denoiser = fn

    def sched_scalars(self, step: int) -> dict:
        return sds_sched_scalars(self.sds_cfg, step)

    def __call__(self, rgb, prompt_utils, batch, key=None, sched=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        if sched is None:
            sched = sds_sched_scalars(self.sds_cfg, 0)
        ac = self.alphas_cumprod

        latents = rgb
        if self.denoiser is not None:
            emb = (
                prompt_utils.get_text_embeddings(
                    batch.get("elevation"), batch.get("azimuth")
                )
                if prompt_utils
                else None
            )

            def denoise_fn(noisy, t, k):
                return self.denoiser(noisy, t, k, emb)

            if self.encode_rgb is not None:
                # real pipeline: rgb -> VAE latents (reference encode_images);
                # SDS gradients flow back through the encoder into the render
                key, k_enc = jax.random.split(key)
                latents = self.encode_rgb(rgb, k_enc)
        else:
            # analytic fallback prior: prompt-derived target palette
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

        loss, aux = sds_loss(latents, denoise_fn, key, sched, self.sds_cfg, ac)
        return {"loss_sds": loss, "grad_norm": aux["grad_norm"]}


@register("stable-diffusion-lora-guidance")
class StableDiffusionLoRAGuidance(StableDiffusionGuidance):
    """LoRA-personalized SD guidance (reference
    guidance/stable_diffusion_lora_guidance.py): same SDS path; a LoRA
    adapter would be fused into the denoiser when local weights exist."""
