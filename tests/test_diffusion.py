"""Latent-diffusion stack: tiny-config UNet/VAE forward shapes, timestep
embedding oracle, and torch->flax converter coverage (structure + transform
round trip against the flax init tree)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threestudio_3dgs_tpu.diffusion import (
    UNet2DConditionConfig,
    UNet2DCondition,
    AutoencoderKLConfig,
    VAEEncoder,
    VAEDecoder,
    torch_unet_to_flax,
    torch_vae_encoder_to_flax,
    torch_vae_decoder_to_flax,
)
from threestudio_3dgs_tpu.diffusion.unet import timestep_embedding
from threestudio_3dgs_tpu.diffusion.vae import sample_latents

TINY_UNET = UNet2DConditionConfig(
    block_out_channels=(32, 64),
    attention_head_dim=(2, 4),
    cross_attention_dim=48,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    norm_groups=8,
)
TINY_VAE = AutoencoderKLConfig(
    block_out_channels=(16, 32), latent_channels=4, norm_groups=8
)


def test_timestep_embedding_matches_diffusers_formula():
    t = np.array([0.0, 1.0, 500.0, 999.0], np.float32)
    dim = 32
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = t[:, None] * freqs[None, :]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    got = np.asarray(timestep_embedding(jnp.asarray(t), dim))
    # f32 exp/log chain vs f64 oracle: tiny-frequency sins carry ~0.5% rel err
    np.testing.assert_allclose(got, expected, rtol=1e-2, atol=2e-5)


def test_unet_forward_shapes():
    model = UNet2DCondition(TINY_UNET)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([10, 500], jnp.int32)
    ctx = jnp.zeros((2, 7, 48))
    params = model.init(key, x, t, ctx)
    out = model.apply(params, x, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert bool(jnp.isfinite(out).all())


def test_vae_roundtrip_shapes():
    enc = VAEEncoder(TINY_VAE)
    dec = VAEDecoder(TINY_VAE)
    key = jax.random.PRNGKey(0)
    rgb = jax.random.uniform(key, (1, 32, 32, 3)) * 2 - 1
    pe = enc.init(key, rgb)
    moments = enc.apply(pe, rgb)
    assert moments.shape == (1, 16, 16, 8)  # one downsample level
    z = sample_latents(moments, key, TINY_VAE.scaling_factor)
    assert z.shape == (1, 16, 16, 4)
    pd = dec.init(key, z)
    out = dec.apply(pd, z / TINY_VAE.scaling_factor)
    assert out.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())


# ---------------------------------------------------------------------------
# Converter: build a torch-layout state dict by inverse-walking the flax init
# tree, convert it back, and require exact structural + numerical agreement.
# ---------------------------------------------------------------------------


def _unflax_leaf(flax_path, leaf_name, value):
    """Inverse of convert._leaf from the flax side."""
    v = np.asarray(value)
    if leaf_name == "kernel":
        if v.ndim == 4:  # conv HWIO -> OIHW
            return "weight", np.transpose(v, (3, 2, 0, 1))
        return "weight", np.transpose(v, (1, 0))  # dense
    if leaf_name == "scale":
        return "weight", v
    return "bias", v


def _torch_name_unet(flax_path):
    """Map a flax module path back to the diffusers key prefix."""
    name = flax_path[0]
    import re

    if name == "conv_in":
        return "conv_in"
    if name.startswith("time_embedding_linear_"):
        return f"time_embedding.linear_{name[-1]}"
    if name == "conv_norm_out":
        return "conv_norm_out"
    if name == "conv_out":
        return "conv_out"
    m = re.match(r"(down|up)_(\d)_resnet_(\d)$", name)
    if m:
        base = f"{m.group(1)}_blocks.{m.group(2)}.resnets.{m.group(3)}"
        return base + "." + ".".join(flax_path[1:])
    m = re.match(r"(down|up)_(\d)_downsample$", name)
    if m:
        return f"down_blocks.{m.group(2)}.downsamplers.0.conv"
    m = re.match(r"(down|up)_(\d)_upsample$", name)
    if m:
        return f"up_blocks.{m.group(2)}.upsamplers.0.conv"
    m = re.match(r"mid_resnet_(\d)$", name)
    if m:
        return f"mid_block.resnets.{m.group(1)}." + ".".join(flax_path[1:])
    m = re.match(r"(down|up)_(\d)_attn_(\d)$", name) or re.match(
        r"(mid)()_?attn()$", name
    )
    if name == "mid_attn":
        base = "mid_block.attentions.0"
        sub = flax_path[1:]
    elif m:
        base = f"{m.group(1)}_blocks.{m.group(2)}.attentions.{m.group(3)}"
        sub = flax_path[1:]
    else:
        raise KeyError(flax_path)
    # transformer subpaths
    out = [base]
    for part in sub:
        if part == "transformer_blocks_0":
            out.append("transformer_blocks.0")
        elif part == "to_out_0":
            out.append("to_out.0")
        elif part == "ff_proj":
            out.append("ff.net.0.proj")
        elif part == "ff_out":
            out.append("ff.net.2")
        else:
            out.append(part)
    return ".".join(out)


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def test_unet_converter_round_trip():
    model = UNet2DCondition(TINY_UNET)
    key = jax.random.PRNGKey(1)
    params = model.init(
        key,
        jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 3, 48)),
    )
    # resnet paths end with (module, submodule, leaf); attn paths deeper
    torch_sd = {}
    for path, value in _flatten(params["params"]):
        *mods, leaf = path
        tname, tval = _unflax_leaf(path, leaf, value)
        if mods[0].endswith(("resnet_0", "resnet_1", "resnet_2")) or mods[
            0
        ].startswith("mid_resnet"):
            prefix = _torch_name_unet((mods[0],) + tuple(mods[1:]))
        else:
            prefix = _torch_name_unet(tuple(mods))
        torch_sd[prefix + "." + tname] = tval
    converted = torch_unet_to_flax(torch_sd, use_linear_projection=True)
    flat_a = dict(_flatten(params["params"]))
    flat_b = dict(_flatten(converted["params"]))
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), flat_b[k])


def test_vae_converter_round_trip():
    enc = VAEEncoder(TINY_VAE)
    key = jax.random.PRNGKey(2)
    params = enc.init(key, jnp.zeros((1, 16, 16, 3)))
    torch_sd = {}
    for path, value in _flatten(params["params"]):
        *mods, leaf = path
        tname, tval = _unflax_leaf(path, leaf, value)
        name = mods[0]
        import re

        if name == "quant_conv":
            k = "quant_conv"
        elif name == "conv_in":
            k = "encoder.conv_in"
        elif name == "conv_norm_out":
            k = "encoder.conv_norm_out"
        elif name == "conv_out":
            k = "encoder.conv_out"
        elif (m := re.match(r"down_(\d)_resnet_(\d)$", name)):
            k = (
                f"encoder.down_blocks.{m.group(1)}.resnets.{m.group(2)}."
                + ".".join(mods[1:])
            )
        elif (m := re.match(r"down_(\d)_downsample$", name)):
            k = f"encoder.down_blocks.{m.group(1)}.downsamplers.0.conv"
        elif (m := re.match(r"mid_resnet_(\d)$", name)):
            k = f"encoder.mid_block.resnets.{m.group(1)}." + ".".join(mods[1:])
        elif name == "mid_attn":
            k = "encoder.mid_block.attentions.0." + ".".join(
                "to_out.0" if p == "to_out_0" else p for p in mods[1:]
            )
        else:
            raise KeyError(name)
        torch_sd[k + "." + tname] = tval
    converted = torch_vae_encoder_to_flax(torch_sd)
    flat_a = dict(_flatten(params["params"]))
    flat_b = dict(_flatten(converted["params"]))
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), flat_b[k])


# ---------------------------------------------------------------------------
# Multiview (MVDream): 3D attention coupling, camera embedding, converter
# ---------------------------------------------------------------------------

TINY_MV_UNET = UNet2DConditionConfig(
    block_out_channels=(32, 64),
    attention_head_dim=(2, 4),
    cross_attention_dim=48,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    norm_groups=8,
    num_views=2,
    camera_embed_dim=16,
)


def test_multiview_unet_views_coupled():
    """With num_views=2, perturbing view 0's latent must change view 1's
    output (3D attention attends across views); with num_views=1 it must not."""
    key = jax.random.PRNGKey(3)
    t = jnp.array([10, 10], jnp.int32)
    ctx = jnp.zeros((2, 3, 48))
    cam = jax.random.normal(key, (2, 16))
    x = jax.random.normal(key, (2, 8, 8, 4))
    x_pert = x.at[0].add(1.0)

    mv = UNet2DCondition(TINY_MV_UNET)
    p = mv.init(key, x, t, ctx, cam)
    base = mv.apply(p, x, t, ctx, cam)
    pert = mv.apply(p, x_pert, t, ctx, cam)
    assert float(jnp.abs(pert[1] - base[1]).max()) > 1e-6

    import dataclasses as dc

    sv = UNet2DCondition(dc.replace(TINY_MV_UNET, num_views=1))
    p1 = sv.init(key, x, t, ctx, cam)
    base1 = sv.apply(p1, x, t, ctx, cam)
    pert1 = sv.apply(p1, x_pert, t, ctx, cam)
    np.testing.assert_array_equal(np.asarray(base1[1]), np.asarray(pert1[1]))


def test_multiview_camera_embedding_changes_output():
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (2, 8, 8, 4))
    t = jnp.array([10, 10], jnp.int32)
    ctx = jnp.zeros((2, 3, 48))
    cam_a = jnp.zeros((2, 16))
    cam_b = jnp.ones((2, 16))
    mv = UNet2DCondition(TINY_MV_UNET)
    p = mv.init(key, x, t, ctx, cam_a)
    out_a = mv.apply(p, x, t, ctx, cam_a)
    out_b = mv.apply(p, x, t, ctx, cam_b)
    assert float(jnp.abs(out_a - out_b).max()) > 1e-6


def test_multiview_unet_converter_round_trip():
    """Multiview adds camera_embedding.linear_{1,2}; the rest of the torch
    name mapping is unchanged."""
    model = UNet2DCondition(TINY_MV_UNET)
    key = jax.random.PRNGKey(5)
    params = model.init(
        key,
        jnp.zeros((2, 8, 8, 4)),
        jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 3, 48)),
        jnp.zeros((2, 16)),
    )
    torch_sd = {}
    for path, value in _flatten(params["params"]):
        *mods, leaf = path
        tname, tval = _unflax_leaf(path, leaf, value)
        name = mods[0]
        if name.startswith("camera_embedding_linear_"):
            prefix = f"camera_embedding.linear_{name[-1]}"
        elif name.endswith(("resnet_0", "resnet_1", "resnet_2")) or name.startswith(
            "mid_resnet"
        ):
            prefix = _torch_name_unet((name,) + tuple(mods[1:]))
        else:
            prefix = _torch_name_unet(tuple(mods))
        torch_sd[prefix + "." + tname] = tval
    converted = torch_unet_to_flax(torch_sd, use_linear_projection=True)
    flat_a = dict(_flatten(params["params"]))
    flat_b = dict(_flatten(converted["params"]))
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]), flat_b[k])


def test_multiview_guidance_fallback_and_recon_loss():
    """multiview-diffusion-guidance trains without weights: analytic prior,
    recon-mode loss pulls the render toward the prompt palette."""
    from threestudio_3dgs_tpu.guidance.mvdream import MultiviewDiffusionGuidance
    from threestudio_3dgs_tpu.utils.registry import find

    assert find("mvdream-multiview-diffusion-guidance") is MultiviewDiffusionGuidance
    assert find("multiview-diffusion-guidance") is MultiviewDiffusionGuidance

    g = MultiviewDiffusionGuidance(
        cfg={"n_view": 4, "guidance_scale": 50.0, "recon_loss": True,
             "recon_std_rescale": 0.5}
    )
    key = jax.random.PRNGKey(0)
    rgb = jax.random.uniform(key, (4, 16, 16, 3))
    c2w = jnp.broadcast_to(jnp.eye(4), (4, 4, 4))
    batch = {"c2w": c2w}

    class _PU:
        def get_text_embeddings(self):
            return jnp.full((77, 1024), 2.0)  # palette -> sigmoid(2) ~ 0.88

    def loss_fn(x):
        out = g(x, _PU(), batch, key=key)
        return out["loss_sds"]

    loss, grad = jax.value_and_grad(loss_fn)(rgb)
    assert bool(jnp.isfinite(loss)) and bool(jnp.isfinite(grad).all())
    # gradient descends toward the bright palette: step along -grad must move
    # the mean pixel value up (rgb starts uniform in [0,1], target ~0.88)
    stepped = rgb - 1e-3 * grad
    assert float(stepped.mean()) > float(rgb.mean())


def test_multiview_sds_shared_timestep():
    """recon-mode SDS uses one timestep per scene: with a denoiser that
    records t, all views of a scene must agree."""
    from threestudio_3dgs_tpu.guidance.sds import (
        SDSConfig,
        sds_recon_loss,
        sds_sched_scalars,
    )

    seen = {}

    def denoise_fn(noisy, t, k):
        seen["t"] = t
        return jnp.zeros_like(noisy), jnp.zeros_like(noisy)

    cfg = SDSConfig(guidance_scale=1.0)
    sched = sds_sched_scalars(cfg, 0)
    latents = jnp.zeros((8, 4, 4, 3))
    sds_recon_loss(latents, denoise_fn, jax.random.PRNGKey(1), sched, cfg,
                   n_view=4)
    t = np.asarray(seen["t"])
    assert (t[:4] == t[0]).all() and (t[4:] == t[4]).all()
