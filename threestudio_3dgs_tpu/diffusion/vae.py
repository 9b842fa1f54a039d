"""AutoencoderKL (SD VAE) encoder/decoder in Flax, NHWC, TPU-first.

The guidance path needs encode (rgb -> latent, for SDS with
rgb_as_latents=False and for Zero123's c_concat, reference
guidance/temporal_zero123_guidance.py:200-215) and decode (for validation
previews).  Matches diffusers' AutoencoderKL graph so torch weights load via
convert.py; test-sized configs run randomly initialized on CPU.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet import ResnetBlock


@dataclasses.dataclass(frozen=True)
class AutoencoderKLConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: jnp.dtype = jnp.float32


SD_VAE = AutoencoderKLConfig()


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial positions (diffusers
    Attention in the VAE mid block: qkv with bias, residual add)."""

    channels: int
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(self.norm_groups, epsilon=1e-6, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        scale = 1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32))
        logits = jnp.einsum("bnc,bmc->bnm", q, k) * scale
        wgt = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        y = jnp.einsum("bnm,bmc->bnc", wgt, v)
        y = nn.Dense(c, dtype=self.dtype, name="to_out_0")(y)
        return residual + y.reshape(b, h, w, c)


class VAEEncoder(nn.Module):
    """rgb (B,H,W,3) in [-1,1] -> latent moments (B,H/8,W/8,2*latent)."""

    cfg: AutoencoderKLConfig = SD_VAE

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.dtype
        temb = None  # diffusers VAE resnets carry no time_emb_proj weights
        h = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=dt, name="conv_in"
        )(x.astype(dt))
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(
                    ch, dt, cfg.norm_groups, name=f"down_{i}_resnet_{j}"
                )(h, temb)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers Downsample2D: asymmetric (0,1) pad + VALID stride-2
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(
                    ch, (3, 3), strides=2, padding="VALID", dtype=dt,
                    name=f"down_{i}_downsample",
                )(h)
        ch = cfg.block_out_channels[-1]
        h = ResnetBlock(ch, dt, cfg.norm_groups, name="mid_resnet_0")(h, temb)
        h = VAEAttention(ch, cfg.norm_groups, dt, name="mid_attn")(h)
        h = ResnetBlock(ch, dt, cfg.norm_groups, name="mid_resnet_1")(h, temb)
        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=1, dtype=jnp.float32,
            name="conv_out",
        )(h)
        # quant_conv folds the 1x1 moment projection
        return nn.Conv(
            2 * cfg.latent_channels, (1, 1), dtype=jnp.float32, name="quant_conv"
        )(h.astype(jnp.float32))


class VAEDecoder(nn.Module):
    """latent (B,h,w,latent) (unscaled) -> rgb (B,8h,8w,3) in [-1,1]."""

    cfg: AutoencoderKLConfig = SD_VAE

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        dt = cfg.dtype
        z = nn.Conv(
            cfg.latent_channels, (1, 1), dtype=jnp.float32, name="post_quant_conv"
        )(z)
        ch = cfg.block_out_channels[-1]
        temb = None  # diffusers VAE resnets carry no time_emb_proj weights
        h = nn.Conv(ch, (3, 3), padding=1, dtype=dt, name="conv_in")(z.astype(dt))
        h = ResnetBlock(ch, dt, cfg.norm_groups, name="mid_resnet_0")(h, temb)
        h = VAEAttention(ch, cfg.norm_groups, dt, name="mid_attn")(h)
        h = ResnetBlock(ch, dt, cfg.norm_groups, name="mid_resnet_1")(h, temb)
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(
                    ch, dt, cfg.norm_groups, name=f"up_{i}_resnet_{j}"
                )(h, temb)
            if i < len(cfg.block_out_channels) - 1:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(
                    cc, (3, 3), padding=1, dtype=dt, name=f"up_{i}_upsample"
                )(h)
        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(
            cfg.in_channels, (3, 3), padding=1, dtype=jnp.float32, name="conv_out"
        )(h.astype(jnp.float32))


def sample_latents(moments: jnp.ndarray, key, scaling_factor: float):
    """moments (B,h,w,2C) -> scaled latent sample (B,h,w,C)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return (mean + std * jax.random.normal(key, mean.shape)) * scaling_factor
