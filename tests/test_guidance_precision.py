"""bf16 guidance-stack parity: the production TPU configuration (bf16
conv/dense params + compute, f32 norms/softmax, flash-attention flag) must
produce SDS gradients close to the all-f32 path.

The SDS gradient w.r.t. the rendered image is d/d(img) of
0.5*||latents - stop_grad(latents - w*(eps_pred - eps))||^2, i.e. the
w*(eps_pred - eps) direction pulled back through the (differentiated) VAE
encoder -- so both the UNet's eps values AND the VAE's VJP enter the
comparison."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from threestudio_3dgs_tpu.diffusion import (
    UNet2DCondition,
    VAEEncoder,
)
from threestudio_3dgs_tpu.diffusion.convert import (
    cast_params_half,
    tpu_fast_model_config,
)
from threestudio_3dgs_tpu.diffusion.vae import sample_latents
from threestudio_3dgs_tpu.guidance.sds import (
    SDSConfig,
    ddpm_alphas_cumprod,
    sds_loss,
)
from tests.test_diffusion import TINY_UNET, TINY_VAE


def _sds_grad(unet_cfg, vae_cfg, unet_params, vae_params, img, key):
    unet = UNet2DCondition(unet_cfg)
    vae = VAEEncoder(vae_cfg)
    cfg = SDSConfig(guidance_scale=3.0)
    ac = ddpm_alphas_cumprod(cfg.num_train_timesteps)
    sched = {"min_step": jnp.int32(20), "max_step": jnp.int32(980)}
    b = img.shape[0]
    ctx_c = jax.random.normal(
        jax.random.PRNGKey(7), (b, 5, unet_cfg.cross_attention_dim)
    ) * 0.02

    def denoise(noisy, t, _k):
        both = jnp.concatenate([noisy, noisy], axis=0)
        ts = jnp.concatenate([t, t], axis=0)
        ctx = jnp.concatenate([jnp.zeros_like(ctx_c), ctx_c], axis=0)
        eps = unet.apply(unet_params, both, ts, ctx)
        return eps[:b], eps[b:]

    def loss_fn(im):
        moments = vae.apply(vae_params, im * 2.0 - 1.0)
        k_lat, k_sds = jax.random.split(key)
        latents = sample_latents(moments, k_lat, 0.18215)
        loss, _ = sds_loss(latents, denoise, k_sds, sched, cfg, ac)
        return loss

    return jax.grad(loss_fn)(img)


def test_bf16_sds_gradient_parity():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    img = jax.random.uniform(k3, (2, 32, 32, 3))

    unet = UNet2DCondition(TINY_UNET)
    vae = VAEEncoder(TINY_VAE)
    lat = jnp.zeros((2, 4, 4, 4))
    ts = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 5, TINY_UNET.cross_attention_dim))
    unet_params = unet.init(k1, lat, ts, ctx)
    vae_params = vae.init(k2, jnp.zeros((1, 32, 32, 3)))

    g_f32 = _sds_grad(TINY_UNET, TINY_VAE, unet_params, vae_params, img, k4)

    unet_cfg16 = tpu_fast_model_config(TINY_UNET, half_precision=True)
    vae_cfg16 = tpu_fast_model_config(TINY_VAE, half_precision=True)
    assert unet_cfg16.dtype == jnp.bfloat16
    assert unet_cfg16.use_flash_attention
    g_bf16 = _sds_grad(
        unet_cfg16,
        vae_cfg16,
        cast_params_half(unet_params),
        cast_params_half(vae_params),
        img,
        k4,
    )
    assert g_bf16.dtype == jnp.float32  # gradient surface stays f32

    ref = np.asarray(g_f32)
    got = np.asarray(g_bf16)
    assert np.isfinite(got).all()
    # SDS gradients are stochastic-direction signals; bf16 matmuls carry
    # ~2^-8 relative error per op.  Budget: 5% relative L2 on the full
    # gradient field, finite everywhere.
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
    assert rel < 5e-2, rel


def test_cast_params_half_preserves_norm_leaves():
    unet = UNet2DCondition(TINY_UNET)
    lat = jnp.zeros((1, 4, 4, 4))
    params = unet.init(
        jax.random.PRNGKey(0), lat, jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 5, TINY_UNET.cross_attention_dim)),
    )
    half = cast_params_half(params)

    flat = jax.tree_util.tree_flatten_with_path(half)[0]
    n_f32 = n_bf16 = 0
    for path, leaf in flat:
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        if "norm" in names:
            assert leaf.dtype == jnp.float32, names
            n_f32 += 1
        else:
            assert leaf.dtype == jnp.bfloat16, names
            n_bf16 += 1
    assert n_f32 > 0 and n_bf16 > 0
