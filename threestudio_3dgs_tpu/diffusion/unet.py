"""Conditional UNet for latent diffusion (SD 2.1 / Zero123 class), Flax.

Mirrors diffusers' UNet2DConditionModel graph (the denoiser the reference
drives through `self.unet(...)` in its guidance modules) re-built TPU-first:

  * NHWC layout end-to-end (XLA TPU conv layout; torch OIHW weights are
    transposed once at load time in convert.py);
  * attention as batched einsum on the MXU, f32 softmax accumulators;
  * optional bf16 compute dtype (params stay f32; matmuls run bf16 on MXU);
  * no python control flow on data -- one jit-able apply.

Architecture knobs cover SD 2.1 (4-ch latents, 1024-d text context,
linear transformer projections), Zero123 (8-ch input: noisy latent concat
conditioning latent, 768-d CLIP-image+camera context, conv projections), and
MVDream-class multiview models (`num_views` > 1 turns every self-attention
into 3D attention over all views jointly, `camera_embed_dim` = 16 adds a
flattened-c2w camera MLP to the time embedding) -- the denoiser behind the
reference's `mvdream-multiview-diffusion-guidance`
(reference configs/gaussian_splatting_mvdream.yaml:83).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.flash_attention import attention as _attention


@dataclasses.dataclass(frozen=True)
class UNet2DConditionConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_head_dim: Tuple[int, ...] = (5, 10, 20, 20)  # heads per level
    cross_attention_dim: int = 1024
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    use_linear_projection: bool = True  # SD 2.x; Zero123/SD1.x use conv
    freq_shift: float = 0.0
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32  # compute dtype (bf16 for TPU speed)
    # Pallas flash attention for long self-attention sequences (TPU only;
    # forward-only -- valid because SDS stop-gradients the denoiser)
    use_flash_attention: bool = False
    # multiview (MVDream): batch is V consecutive views of one scene;
    # self-attention attends across all V*H*W tokens jointly
    num_views: int = 1
    camera_embed_dim: int = 0  # 16 = flattened 4x4 c2w (MVDream)


SD21_UNET = UNet2DConditionConfig()
ZERO123_UNET = UNet2DConditionConfig(
    in_channels=8,
    cross_attention_dim=768,
    attention_head_dim=(8, 8, 8, 8),
    use_linear_projection=False,
)
MVDREAM_UNET = UNet2DConditionConfig(num_views=4, camera_embed_dim=16)


def timestep_embedding(t: jnp.ndarray, dim: int, freq_shift: float = 0.0):
    """Sinusoidal timestep features, diffusers `Timesteps` semantics
    (flip_sin_to_cos=True): [cos | sin]."""
    half = dim // 2
    exponent = -jnp.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    norm_groups: int = 32

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-5, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            # the VAE passes temb=None: diffusers VAE resnets have NO
            # time_emb_proj weights, and a genuine checkpoint must load
            # without leftover param leaves
            t = nn.Dense(
                self.out_channels, dtype=self.dtype, name="time_emb_proj"
            )(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-5, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class Attention(nn.Module):
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32
    flash: bool = False

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, m, self.heads, self.dim_head)
        v = v.reshape(b, m, self.heads, self.dim_head)
        scale = 1.0 / math.sqrt(float(self.dim_head))
        # Pallas flash kernel for long self-attention (f32 softmax inside);
        # einsum with f32 softmax otherwise -- ops/flash_attention.py
        out = _attention(q, k, v, scale, use_flash=self.flash)
        out = out.reshape(b, n, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out_0")(out)


class TransformerBlock(nn.Module):
    heads: int
    dim_head: int
    cross_dim: int
    dtype: jnp.dtype = jnp.float32
    num_views: int = 1
    flash: bool = False

    @nn.compact
    def __call__(self, x, context):
        h1 = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        if self.num_views > 1:
            # MVDream 3D attention: fold the view axis into the token axis so
            # every view attends to every other view's tokens (one larger MXU
            # matmul instead of V small ones -- TPU-friendly by construction)
            bv, n, c = h1.shape
            v = self.num_views
            h1 = h1.reshape(bv // v, v * n, c)
            a1 = Attention(
                self.heads, self.dim_head, self.dtype, self.flash, name="attn1"
            )(h1)
            x = x + a1.reshape(bv, n, c)
        else:
            x = x + Attention(
                self.heads, self.dim_head, self.dtype, self.flash, name="attn1"
            )(h1)
        x = x + Attention(
            self.heads, self.dim_head, self.dtype, self.flash, name="attn2"
        )(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context
        )
        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(x)
        inner = self.heads * self.dim_head
        # GEGLU feed-forward
        hg = nn.Dense(inner * 8, dtype=self.dtype, name="ff_proj")(h)
        a, gate = jnp.split(hg, 2, axis=-1)
        h = a * nn.gelu(gate)
        return x + nn.Dense(inner, dtype=self.dtype, name="ff_out")(h)


class Transformer2D(nn.Module):
    heads: int
    dim_head: int
    cross_dim: int
    use_linear: bool
    dtype: jnp.dtype = jnp.float32
    norm_groups: int = 32
    num_views: int = 1
    flash: bool = False

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(self.norm_groups, epsilon=1e-6, name="norm")(x)
        if self.use_linear:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(c, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, c)
        x = TransformerBlock(
            self.heads, self.dim_head, self.cross_dim, self.dtype,
            self.num_views, self.flash, name="transformer_blocks_0",
        )(x, context)
        if self.use_linear:
            x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, c)
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


class UNet2DCondition(nn.Module):
    """apply(params, latent (B,H,W,Cin), t (B,), context (B,L,D)) -> eps.

    Multiview configs additionally take camera (B, camera_embed_dim); B must
    be a multiple of num_views with views of one scene consecutive."""

    cfg: UNet2DConditionConfig = SD21_UNET

    @nn.compact
    def __call__(self, x, t, context, camera=None):
        cfg = self.cfg
        dt = cfg.dtype
        ch0 = cfg.block_out_channels[0]
        temb_dim = ch0 * 4
        temb = timestep_embedding(t, ch0, cfg.freq_shift)
        temb = nn.Dense(temb_dim, dtype=dt, name="time_embedding_linear_1")(temb)
        temb = nn.Dense(temb_dim, dtype=dt, name="time_embedding_linear_2")(
            nn.silu(temb)
        )
        if cfg.camera_embed_dim > 0:
            # MVDream camera conditioning: flattened c2w -> MLP, added to temb
            cam = jnp.zeros((x.shape[0], cfg.camera_embed_dim), dt) if (
                camera is None
            ) else camera.astype(dt)
            cemb = nn.Dense(temb_dim, dtype=dt, name="camera_embedding_linear_1")(cam)
            cemb = nn.Dense(temb_dim, dtype=dt, name="camera_embedding_linear_2")(
                nn.silu(cemb)
            )
            temb = temb + cemb

        context = context.astype(dt)
        x = x.astype(dt)
        h = nn.Conv(ch0, (3, 3), padding=1, dtype=dt, name="conv_in")(x)

        skips = [h]
        # ---- down ----
        for i, (btype, ch) in enumerate(
            zip(cfg.down_block_types, cfg.block_out_channels)
        ):
            heads = cfg.attention_head_dim[i]
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(
                    ch, dt, cfg.norm_groups, name=f"down_{i}_resnet_{j}"
                )(h, temb)
                if btype == "CrossAttnDownBlock2D":
                    h = Transformer2D(
                        heads, ch // heads, cfg.cross_attention_dim,
                        cfg.use_linear_projection, dt, cfg.norm_groups,
                        cfg.num_views, cfg.use_flash_attention,
                        name=f"down_{i}_attn_{j}",
                    )(h, context)
                skips.append(h)
            if i < len(cfg.block_out_channels) - 1:
                h = nn.Conv(
                    ch, (3, 3), strides=2, padding=1, dtype=dt,
                    name=f"down_{i}_downsample",
                )(h)
                skips.append(h)

        # ---- mid ----
        ch = cfg.block_out_channels[-1]
        heads = cfg.attention_head_dim[-1]
        h = ResnetBlock(ch, dt, cfg.norm_groups, name="mid_resnet_0")(h, temb)
        h = Transformer2D(
            heads, ch // heads, cfg.cross_attention_dim,
            cfg.use_linear_projection, dt, cfg.norm_groups, cfg.num_views,
            cfg.use_flash_attention, name="mid_attn",
        )(h, context)
        h = ResnetBlock(ch, dt, cfg.norm_groups, name="mid_resnet_1")(h, temb)

        # ---- up ----
        rev_ch = tuple(reversed(cfg.block_out_channels))
        rev_heads = tuple(reversed(cfg.attention_head_dim))
        for i, (btype, ch) in enumerate(zip(cfg.up_block_types, rev_ch)):
            heads = rev_heads[i]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(
                    ch, dt, cfg.norm_groups, name=f"up_{i}_resnet_{j}"
                )(h, temb)
                if btype == "CrossAttnUpBlock2D":
                    h = Transformer2D(
                        heads, ch // heads, cfg.cross_attention_dim,
                        cfg.use_linear_projection, dt, cfg.norm_groups,
                        cfg.num_views, cfg.use_flash_attention,
                        name=f"up_{i}_attn_{j}",
                    )(h, context)
            if i < len(cfg.up_block_types) - 1:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(
                    ch, (3, 3), padding=1, dtype=dt, name=f"up_{i}_upsample"
                )(h)

        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-5, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=jnp.float32,
            name="conv_out",
        )(h)
        return h.astype(jnp.float32)
