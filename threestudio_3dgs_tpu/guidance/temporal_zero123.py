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


def zero123_context(clip_emb: jnp.ndarray, cam_emb: jnp.ndarray,
                    cc_w: jnp.ndarray, cc_b: jnp.ndarray) -> jnp.ndarray:
    """Zero123 conditioning context: concat the CLIP image embedding (B, 768)
    with the 4-d relative camera (reference :260-272), project through the
    cc_projection linear (772 -> 768), one token per sample (B, 1, 768)."""
    x = jnp.concatenate([clip_emb, cam_emb.astype(clip_emb.dtype)], axis=-1)
    return (x @ cc_w + cc_b)[:, None, :]


def _clip_image_encode_local(image_encoder_dir: str, frames: np.ndarray):
    """Per-frame projected CLIP image embeddings (T, 768) from a LOCAL
    diffusers-layout image_encoder/, or None.  Host CPU, once per video --
    the reference's precompute pattern (:200-215)."""
    import os

    if not os.path.isdir(image_encoder_dir):
        return None
    try:
        import torch
        from transformers import CLIPVisionModelWithProjection

        model = CLIPVisionModelWithProjection.from_pretrained(image_encoder_dir)
        size = model.config.image_size
        mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
        import jax as _jax

        resized = _jax.image.resize(
            jnp.asarray(frames, jnp.float32),
            (frames.shape[0], size, size, 3),
            "bilinear",
        )
        x = (np.asarray(resized) - mean) / std
        with torch.no_grad():
            out = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        return out.image_embeds.numpy()
    except Exception:
        return None


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
    # bf16 UNet/VAE compute on TPU (the reference runs the zero123 stack
    # half-precision under vram_O); norms/softmax stay f32
    half_precision_weights: bool = True
    # zero123 conditioning resolution (the reference hard-codes 256,
    # reference guidance/temporal_zero123_guidance.py:207-215); tiny test
    # checkpoints override for CPU-sized attention
    cond_image_size: int = 256


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
        self.encode_latents = None
        # per-frame conditioning; filled by prepare_embeddings
        self.cond_targets = jnp.full((cfg.num_frames, 3), 0.5)

    def prepare_embeddings(self, frames: np.ndarray) -> None:
        """frames (T, H, W, 3) in [0, 1]: the reference runs CLIP + VAE here
        (:200-215).  With a local diffusers-layout checkpoint dir (unet/ +
        vae/ + image_encoder/ [+ clip_camera_projection/]) the REAL path is
        built: per-frame CLIP image embeddings (c_crossattn, host CPU once),
        per-frame VAE mode latents (c_concat), the camera-conditioned context
        projection, and the 8-channel Zero123 UNet denoiser.  Otherwise the
        analytic prior keeps the per-frame images (downsampled mean color
        target) for frame-conditioned SDS."""
        t = frames.shape[0]
        means = frames.reshape(t, -1, 3).mean(axis=1)
        self.cond_targets = jnp.asarray(means, jnp.float32)
        self._cond_frames = jnp.asarray(frames, jnp.float32)
        path = str(self.cfg.pretrained_model_name_or_path)
        import os

        if os.path.isdir(path):
            self._try_load_local(path, frames)
        elif os.path.isfile(path) and path.endswith(
            (".ckpt", ".safetensors", ".bin", ".pt")
        ):
            self._try_load_ldm_ckpt(path, frames)

    def _try_load_local(self, path: str, frames: np.ndarray) -> None:
        """Diffusers-layout checkpoint directory (unet/ + vae/ +
        image_encoder/ [+ clip_camera_projection/])."""
        import os

        def find(sub):
            for cand in (
                f"{sub}/diffusion_pytorch_model.safetensors",
                f"{sub}/diffusion_pytorch_model.bin",
                f"{sub}/model.safetensors",
                f"{sub}/pytorch_model.bin",
            ):
                full = os.path.join(path, cand)
                if os.path.exists(full):
                    return full
            return None

        unet_file = find("unet")
        vae_file = find("vae")
        if unet_file is None or vae_file is None:
            return
        clip_embs = _clip_image_encode_local(os.path.join(path, "image_encoder"), frames)
        if clip_embs is None:
            return
        from ..diffusion.convert import load_torch_state_dict

        cc_w = cc_b = None
        ccp_file = find("clip_camera_projection")
        if ccp_file is not None:
            ccp_sd = load_torch_state_dict(ccp_file)
            wkey = [k for k in ccp_sd if k.endswith("weight")][0]
            bkey = [k for k in ccp_sd if k.endswith("bias")][0]
            cc_w, cc_b = np.transpose(ccp_sd[wkey]), ccp_sd[bkey]
        self._build_denoiser(
            frames,
            load_torch_state_dict(unet_file),
            load_torch_state_dict(vae_file),
            clip_embs,
            cc_w,
            cc_b,
        )

    def _try_load_ldm_ckpt(self, path: str, frames: np.ndarray) -> None:
        """Single-file CompVis/ldm checkpoint (zero123-xl.ckpt /
        stable_zero123.ckpt) -- the reference's actual on-disk format
        (reference guidance/temporal_zero123_guidance.py:42-74 loads it via
        ldm's load_model_from_config).  The UNet, VAE encoder, and
        cc_projection all live in one state dict; CLIP image embeddings come
        from a sibling image_encoder/ dir when present (the ldm CLIP vision
        tower itself is not ported -- deterministic stand-in embeddings keep
        the real UNet/VAE path runnable, with c_concat carrying the image
        identity)."""
        import os

        from ..diffusion.convert import (
            is_ldm_state_dict,
            ldm_unet_to_diffusers,
            ldm_vae_encoder_to_diffusers,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(path)
        if not is_ldm_state_dict(sd):
            return
        cc_w = cc_b = None
        if "cc_projection.weight" in sd:
            cc_w = np.transpose(np.asarray(sd["cc_projection.weight"]))
            cc_b = np.asarray(sd["cc_projection.bias"])
        clip_embs = _clip_image_encode_local(
            os.path.join(os.path.dirname(path), "image_encoder"), frames
        )
        if clip_embs is None:
            # stand-in embeddings sized from the checkpoint's own
            # cc_projection (in = clip_dim + 4 camera channels)
            clip_dim = cc_w.shape[0] - 4 if cc_w is not None else 768
            rng = np.random.default_rng(0)
            clip_embs = (
                rng.standard_normal((frames.shape[0], clip_dim)).astype(
                    np.float32
                )
                * 0.1
            )
        self._build_denoiser(
            frames,
            ldm_unet_to_diffusers(sd),
            ldm_vae_encoder_to_diffusers(sd),
            clip_embs,
            cc_w,
            cc_b,
        )

    def _build_denoiser(
        self,
        frames: np.ndarray,
        unet_sd: dict,
        vae_sd: dict,
        clip_embs: np.ndarray,
        cc_w,
        cc_b,
    ) -> None:
        """Wire the real Zero123 denoiser from diffusers-naming state dicts
        (whatever checkpoint format they came from)."""
        from ..diffusion import ZERO123_UNET, UNet2DCondition, torch_unet_to_flax
        from ..diffusion.convert import (
            cast_params_half,
            infer_unet_config_from_state_dict,
            infer_vae_config_from_state_dict,
            torch_vae_encoder_to_flax,
            tpu_fast_model_config,
        )
        from ..diffusion.vae import SD_VAE, VAEEncoder

        half = bool(getattr(self.cfg, "half_precision_weights", True))
        unet_cfg = infer_unet_config_from_state_dict(unet_sd, ZERO123_UNET)
        vae_cfg = infer_vae_config_from_state_dict(vae_sd, SD_VAE)
        # bf16 compute + flash attention on TPU (forward-only flash is valid:
        # SDS stop-gradients the denoiser; the VAE encode IS differentiated
        # but uses the einsum attention path -- single mid-block layer)
        unet_cfg = tpu_fast_model_config(unet_cfg, half)
        vae_cfg = tpu_fast_model_config(vae_cfg, half)
        enc = VAEEncoder(vae_cfg)
        enc_params = jax.tree_util.tree_map(
            jnp.asarray, torch_vae_encoder_to_flax(vae_sd)
        )
        if half:
            enc_params = cast_params_half(enc_params)

        csz = int(getattr(self.cfg, "cond_image_size", 256))

        def vae_mode(rgb):
            # zero123 c_concat = unscaled posterior MODE of the cond image
            x = jax.image.resize(
                rgb * 2.0 - 1.0, (rgb.shape[0], csz, csz, 3), "bilinear"
            )
            moments = enc.apply(enc_params, x)
            return moments[..., : moments.shape[-1] // 2]

        self.cond_concat = vae_mode(jnp.asarray(frames, jnp.float32))  # (T,32,32,4)
        self.cond_crossattn = jnp.asarray(clip_embs)  # (T, 768)

        # camera-conditioned context projection: linear (768+4 -> 768),
        # shipped as clip_camera_projection/ in the diffusers zero123 ports
        # or as `cc_projection.{weight,bias}` in the ldm checkpoint
        if cc_w is not None:
            self.cc_w = jnp.asarray(cc_w)
            self.cc_b = jnp.asarray(cc_b)
        else:
            self.cc_w = jnp.eye(772, 768)  # degenerate fallback: slice
            self.cc_b = jnp.zeros(768)

        model = UNet2DCondition(unet_cfg)
        params = jax.tree_util.tree_map(
            jnp.asarray,
            torch_unet_to_flax(
                unet_sd, use_linear_projection=unet_cfg.use_linear_projection
            ),
        )
        if half:
            params = cast_params_half(params)  # norms stay f32

        def denoiser(noisy, t, key, frame_idx, cam_emb):
            b = noisy.shape[0]
            ctx_c = zero123_context(
                self.cond_crossattn[frame_idx], cam_emb, self.cc_w, self.cc_b
            )  # (B, 1, 768)
            ctx_u = jnp.zeros_like(ctx_c)
            concat_c = self.cond_concat[frame_idx]  # (B, 32, 32, 4)
            concat_u = jnp.zeros_like(concat_c)
            x_c = jnp.concatenate([noisy, concat_c], axis=-1)
            x_u = jnp.concatenate([noisy, concat_u], axis=-1)
            both = jnp.concatenate([x_u, x_c], axis=0)
            ts = jnp.concatenate([t, t], axis=0)
            ctxs = jnp.concatenate([ctx_u, ctx_c], axis=0)
            eps = model.apply(params, both, ts, ctxs)
            return eps[:b], eps[b:]

        self.denoiser = denoiser

        def encode(rgb, key):
            from ..diffusion.vae import sample_latents

            x = jax.image.resize(
                rgb * 2.0 - 1.0, (rgb.shape[0], csz, csz, 3), "bilinear"
            )
            moments = enc.apply(enc_params, x)
            return sample_latents(moments, key, vae_cfg.scaling_factor)

        self.encode_latents = encode

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
            latents = rgb
            if self.encode_latents is not None:
                k_enc, key = jax.random.split(key)
                latents = self.encode_latents(rgb, k_enc)

            def denoise_fn(noisy, t, k):
                return self.denoiser(noisy, t, k, frame_idx, cam_emb)

            loss, aux = sds_loss(
                latents, denoise_fn, key, sched, self.sds_cfg, ac
            )
            return {"loss_sds": loss, "grad_norm": aux["grad_norm"]}

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
