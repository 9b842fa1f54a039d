"""Converter proof against GENUINE checkpoint formats (VERDICT round-1 #3).

The round-1 converter tests synthesized torch-layout dicts from the flax
tree itself, so a drift between convert.py's key mapping and real diffusers /
ldm naming could never be caught.  Here the torch state dicts are generated
from AUTHORITATIVE, hand-derived manifests of the published formats:

  * `diffusers_unet_manifest` -- the exact key names + torch shapes of a
    diffusers `UNet2DConditionModel` state dict (conv_in, time_embedding,
    down_blocks.i.{resnets,attentions,downsamplers}.j..., transformer
    blocks with bias-free to_q/k/v, GEGLU ff.net.0.proj, up blocks with
    layers_per_block+1 resnets fed by the skip stack, conv_norm_out/out);
  * `diffusers_vae_encoder_manifest` -- the VAE encoder half: resnets WITHOUT
    time_emb_proj, single-head mid attention with biased to_q/k/v,
    quant_conv;
  * `ldm_rename` -- the CompVis/ldm (zero123-xl.ckpt) renaming of the same
    structure (input_blocks/middle_block/output_blocks, in_layers/out_layers,
    time_embed.0/2, out.0/2) nested under model.diffusion_model in a
    lightning-style {"state_dict": ...} pickle.

These manifests are written from the published formats and independently of
both convert.py and the flax modules, so a mapping drift on either side
fails loudly (unmapped key, missing leaf, or shape mismatch).  The final
test runs SDS end-to-end from a checkpoint directory in the genuine layout
(unet/config.json + unet/diffusion_pytorch_model.safetensors + vae/...),
through StableDiffusionGuidance's local-loading path -- the reference's
whole loss model runs real weights this way
(reference guidance/stable_diffusion_lora_guidance.py:27-50,
reference guidance/temporal_zero123_guidance.py:42-74)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from threestudio_3dgs_tpu.diffusion import (
    UNet2DCondition,
    VAEEncoder,
)
from threestudio_3dgs_tpu.diffusion.convert import (
    is_ldm_state_dict,
    ldm_unet_to_diffusers,
    load_torch_state_dict,
    torch_unet_to_flax,
    torch_vae_encoder_to_flax,
    unet_config_from_diffusers_json,
    vae_config_from_diffusers_json,
)
from threestudio_3dgs_tpu.diffusion.unet import UNet2DConditionConfig
from threestudio_3dgs_tpu.diffusion.vae import AutoencoderKLConfig

# tiny architectures, same shapes the flax-side tests use
TINY_SD = dict(
    in_channels=4,
    out_channels=4,
    block_out_channels=(32, 64),
    layers_per_block=2,
    cross_attention_dim=48,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    use_linear_projection=True,
)
TINY_ZERO123 = dict(
    in_channels=8,
    out_channels=4,
    block_out_channels=(32, 64),
    layers_per_block=2,
    cross_attention_dim=48,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    use_linear_projection=False,  # SD1.x / zero123: conv proj_in/out
)


def diffusers_unet_manifest(
    in_channels,
    out_channels,
    block_out_channels,
    layers_per_block,
    cross_attention_dim,
    down_block_types,
    up_block_types,
    use_linear_projection,
):
    """{key: torch shape} of a genuine diffusers UNet2DConditionModel
    state dict for this architecture."""
    keys = {}
    temb = block_out_channels[0] * 4

    def norm(name, c):
        keys[f"{name}.weight"] = (c,)
        keys[f"{name}.bias"] = (c,)

    def conv(name, o, i, k=3):
        keys[f"{name}.weight"] = (o, i, k, k)
        keys[f"{name}.bias"] = (o,)

    def lin(name, o, i, bias=True):
        keys[f"{name}.weight"] = (o, i)
        if bias:
            keys[f"{name}.bias"] = (o,)

    def resnet(p, cin, cout):
        norm(f"{p}.norm1", cin)
        conv(f"{p}.conv1", cout, cin)
        lin(f"{p}.time_emb_proj", cout, temb)
        norm(f"{p}.norm2", cout)
        conv(f"{p}.conv2", cout, cout)
        if cin != cout:
            conv(f"{p}.conv_shortcut", cout, cin, 1)

    def attention(p, d):
        norm(f"{p}.norm", d)
        if use_linear_projection:
            lin(f"{p}.proj_in", d, d)
            lin(f"{p}.proj_out", d, d)
        else:
            conv(f"{p}.proj_in", d, d, 1)
            conv(f"{p}.proj_out", d, d, 1)
        tb = f"{p}.transformer_blocks.0"
        for n in ("norm1", "norm2", "norm3"):
            norm(f"{tb}.{n}", d)
        for a, kdim in (("attn1", d), ("attn2", cross_attention_dim)):
            lin(f"{tb}.{a}.to_q", d, d, bias=False)
            lin(f"{tb}.{a}.to_k", d, kdim, bias=False)
            lin(f"{tb}.{a}.to_v", d, kdim, bias=False)
            lin(f"{tb}.{a}.to_out.0", d, d)
        lin(f"{tb}.ff.net.0.proj", d * 8, d)  # GEGLU: 2 * 4d
        lin(f"{tb}.ff.net.2", d, d * 4)

    conv("conv_in", block_out_channels[0], in_channels)
    lin("time_embedding.linear_1", temb, block_out_channels[0])
    lin("time_embedding.linear_2", temb, temb)

    skips = [block_out_channels[0]]
    cin = block_out_channels[0]
    n_levels = len(block_out_channels)
    for i, (btype, ch) in enumerate(zip(down_block_types, block_out_channels)):
        for j in range(layers_per_block):
            resnet(f"down_blocks.{i}.resnets.{j}", cin, ch)
            cin = ch
            skips.append(ch)
            if btype == "CrossAttnDownBlock2D":
                attention(f"down_blocks.{i}.attentions.{j}", ch)
        if i < n_levels - 1:
            conv(f"down_blocks.{i}.downsamplers.0.conv", ch, ch)
            skips.append(ch)

    resnet("mid_block.resnets.0", cin, cin)
    attention("mid_block.attentions.0", cin)
    resnet("mid_block.resnets.1", cin, cin)

    rev = list(reversed(block_out_channels))
    for i, (btype, ch) in enumerate(zip(up_block_types, rev)):
        for j in range(layers_per_block + 1):
            skip = skips.pop()
            resnet(f"up_blocks.{i}.resnets.{j}", cin + skip, ch)
            cin = ch
            if btype == "CrossAttnUpBlock2D":
                attention(f"up_blocks.{i}.attentions.{j}", ch)
        if i < n_levels - 1:
            conv(f"up_blocks.{i}.upsamplers.0.conv", ch, ch)

    norm("conv_norm_out", block_out_channels[0])
    conv("conv_out", out_channels, block_out_channels[0])
    return keys


def diffusers_vae_encoder_manifest(block_out_channels, layers_per_block,
                                   latent_channels, in_channels=3):
    """Genuine diffusers AutoencoderKL ENCODER keys (+quant_conv): VAE
    resnets carry NO time_emb_proj; mid attention is the biased-qkv
    Attention module."""
    keys = {}

    def norm(name, c):
        keys[f"{name}.weight"] = (c,)
        keys[f"{name}.bias"] = (c,)

    def conv(name, o, i, k=3):
        keys[f"{name}.weight"] = (o, i, k, k)
        keys[f"{name}.bias"] = (o,)

    def lin(name, o, i):
        keys[f"{name}.weight"] = (o, i)
        keys[f"{name}.bias"] = (o,)

    def resnet(p, cin, cout):
        norm(f"{p}.norm1", cin)
        conv(f"{p}.conv1", cout, cin)
        norm(f"{p}.norm2", cout)
        conv(f"{p}.conv2", cout, cout)
        if cin != cout:
            conv(f"{p}.conv_shortcut", cout, cin, 1)

    conv("encoder.conv_in", block_out_channels[0], in_channels)
    cin = block_out_channels[0]
    for i, ch in enumerate(block_out_channels):
        for j in range(layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin, ch)
            cin = ch
        if i < len(block_out_channels) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", ch, ch)
    resnet("encoder.mid_block.resnets.0", cin, cin)
    norm("encoder.mid_block.attentions.0.group_norm", cin)
    for nm in ("to_q", "to_k", "to_v", "to_out.0"):
        lin(f"encoder.mid_block.attentions.0.{nm}", cin, cin)
    resnet("encoder.mid_block.resnets.1", cin, cin)
    norm("encoder.conv_norm_out", cin)
    conv("encoder.conv_out", 2 * latent_channels, cin)
    conv("quant_conv", 2 * latent_channels, 2 * latent_channels, 1)
    return keys


def fill(manifest, seed=0):
    rng = np.random.default_rng(seed)
    return {
        k: (rng.standard_normal(shape) * 0.02).astype(np.float32)
        for k, shape in manifest.items()
    }


def flat_leaves(tree, prefix=()):
    for k, v in sorted(tree.items()):
        if isinstance(v, dict):
            yield from flat_leaves(v, prefix + (k,))
        else:
            yield prefix + (k,), v


# ---------------------------------------------------------------------------


class TestDiffusersUNetFormat:
    def test_manifest_converts_and_matches_flax_tree(self):
        manifest = diffusers_unet_manifest(**TINY_SD)
        sd = fill(manifest)
        converted = torch_unet_to_flax(sd, use_linear_projection=True)

        cfg = UNet2DConditionConfig(
            in_channels=TINY_SD["in_channels"],
            out_channels=TINY_SD["out_channels"],
            block_out_channels=TINY_SD["block_out_channels"],
            attention_head_dim=(2, 4),
            cross_attention_dim=TINY_SD["cross_attention_dim"],
            down_block_types=TINY_SD["down_block_types"],
            up_block_types=TINY_SD["up_block_types"],
            use_linear_projection=True,
            norm_groups=8,
        )
        model = UNet2DCondition(cfg)
        ref = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, 8, 4)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 3, 48)),
        )
        got = dict(flat_leaves(converted["params"]))
        want = dict(flat_leaves(ref["params"]))
        assert set(got) == set(want), (
            sorted(set(want) - set(got))[:5],
            sorted(set(got) - set(want))[:5],
        )
        for k in want:
            assert got[k].shape == want[k].shape, (k, got[k].shape, want[k].shape)
        # and the converted params actually run
        out = model.apply(
            jax.tree_util.tree_map(jnp.asarray, converted),
            jnp.ones((1, 8, 8, 4)) * 0.1,
            jnp.full((1,), 10, jnp.int32),
            jnp.ones((1, 3, 48)) * 0.1,
        )
        assert out.shape == (1, 8, 8, 4)
        assert np.isfinite(np.asarray(out)).all()

    def test_unknown_key_raises(self):
        sd = fill(diffusers_unet_manifest(**TINY_SD))
        sd["down_blocks.0.resnets.0.bogus.weight"] = np.zeros((3,), np.float32)
        with pytest.raises(KeyError):
            torch_unet_to_flax(sd, use_linear_projection=True)


class TestDiffusersVAEFormat:
    def test_encoder_manifest_converts_and_runs(self):
        manifest = diffusers_vae_encoder_manifest((16, 32), 2, 4)
        sd = fill(manifest, seed=1)
        converted = torch_vae_encoder_to_flax(sd)
        cfg = AutoencoderKLConfig(
            block_out_channels=(16, 32), latent_channels=4, norm_groups=8
        )
        enc = VAEEncoder(cfg)
        ref = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        got = dict(flat_leaves(converted["params"]))
        want = dict(flat_leaves(ref["params"]))
        assert set(got) == set(want), (
            sorted(set(want) - set(got))[:5],
            sorted(set(got) - set(want))[:5],
        )
        for k in want:
            assert got[k].shape == want[k].shape, k
        moments = enc.apply(
            jax.tree_util.tree_map(jnp.asarray, converted),
            jnp.ones((1, 16, 16, 3)) * 0.3,
        )
        assert moments.shape == (1, 8, 8, 8)
        assert np.isfinite(np.asarray(moments)).all()


class TestLDMFormat:
    @staticmethod
    def ldm_rename(diff_keys, layers_per_block=2, n_levels=2,
                   has_attn=(True, False)):
        """diffusers key -> ldm (CompVis UNetModel) key for this
        architecture; written from the published zero123/SD1.x layout,
        independent of convert.py."""
        k = layers_per_block + 1
        res_sub = {
            "norm1": "in_layers.0",
            "conv1": "in_layers.2",
            "time_emb_proj": "emb_layers.1",
            "norm2": "out_layers.0",
            "conv2": "out_layers.3",
            "conv_shortcut": "skip_connection",
        }

        def sub_resnet(rest):
            head, _, tail = rest.partition(".")
            return res_sub[head] + "." + tail

        out = {}
        for key in diff_keys:
            parts = key.split(".")
            if key.startswith("time_embedding.linear_1."):
                nk = "time_embed.0." + parts[-1]
            elif key.startswith("time_embedding.linear_2."):
                nk = "time_embed.2." + parts[-1]
            elif key.startswith("conv_in."):
                nk = "input_blocks.0.0." + parts[-1]
            elif key.startswith("conv_norm_out."):
                nk = "out.0." + parts[-1]
            elif key.startswith("conv_out."):
                nk = "out.2." + parts[-1]
            elif parts[0] == "down_blocks":
                i, kind, j = int(parts[1]), parts[2], int(parts[3])
                rest = ".".join(parts[4:])
                if kind == "resnets":
                    nk = f"input_blocks.{i * k + j + 1}.0." + sub_resnet(rest)
                elif kind == "attentions":
                    nk = f"input_blocks.{i * k + j + 1}.1." + rest
                else:  # downsamplers.0.conv
                    nk = f"input_blocks.{(i + 1) * k}.0.op." + parts[-1]
            elif parts[0] == "mid_block":
                kind, j = parts[1], int(parts[2])
                rest = ".".join(parts[3:])
                if kind == "resnets":
                    nk = f"middle_block.{0 if j == 0 else 2}." + sub_resnet(rest)
                else:
                    nk = "middle_block.1." + rest
            elif parts[0] == "up_blocks":
                i, kind, j = int(parts[1]), parts[2], int(parts[3])
                rest = ".".join(parts[4:])
                if kind == "resnets":
                    nk = f"output_blocks.{i * k + j}.0." + sub_resnet(rest)
                elif kind == "attentions":
                    nk = f"output_blocks.{i * k + j}.1." + rest
                else:  # upsamplers.0.conv: last sub-block of the level;
                    # index 1 without attention, 2 with
                    level_has_attn = has_attn[::-1][i]
                    d = 2 if level_has_attn else 1
                    nk = f"output_blocks.{i * k + (k - 1)}.{d}.conv." + parts[-1]
            else:
                raise KeyError(key)
            out[key] = nk
        return out

    def test_ldm_zero123_dict_matches_diffusers_naming(self):
        manifest = diffusers_unet_manifest(**TINY_ZERO123)
        sd_diff = fill(manifest, seed=2)
        rename = self.ldm_rename(sd_diff.keys())
        sd_ldm = {
            "model.diffusion_model." + rename[key]: value
            for key, value in sd_diff.items()
        }
        # full ldm checkpoints carry other submodels; they must be ignored
        sd_ldm["first_stage_model.encoder.conv_in.weight"] = np.zeros(
            (4, 3, 3, 3), np.float32
        )
        sd_ldm["cond_stage_model.transformer.x.weight"] = np.zeros(
            (4, 4), np.float32
        )
        assert is_ldm_state_dict(sd_ldm)
        back = ldm_unet_to_diffusers(sd_ldm, num_res_blocks=2, num_levels=2)
        assert set(back) == set(sd_diff), (
            sorted(set(sd_diff) - set(back))[:5],
            sorted(set(back) - set(sd_diff))[:5],
        )
        for key in sd_diff:
            np.testing.assert_array_equal(back[key], sd_diff[key])

    def test_ldm_ckpt_file_roundtrip_and_forward(self, tmp_path):
        import torch

        manifest = diffusers_unet_manifest(**TINY_ZERO123)
        sd_diff = fill(manifest, seed=3)
        rename = self.ldm_rename(sd_diff.keys())
        sd_ldm = {
            "model.diffusion_model." + rename[k]: torch.from_numpy(v)
            for k, v in sd_diff.items()
        }
        ckpt = tmp_path / "zero123-tiny.ckpt"
        torch.save({"state_dict": sd_ldm, "global_step": 1}, str(ckpt))

        loaded = load_torch_state_dict(str(ckpt))
        assert is_ldm_state_dict(loaded)
        converted = torch_unet_to_flax(
            ldm_unet_to_diffusers(loaded), use_linear_projection=False
        )
        cfg = UNet2DConditionConfig(
            in_channels=8,
            block_out_channels=(32, 64),
            attention_head_dim=(2, 4),
            cross_attention_dim=48,
            down_block_types=TINY_ZERO123["down_block_types"],
            up_block_types=TINY_ZERO123["up_block_types"],
            use_linear_projection=False,
            norm_groups=8,
        )
        model = UNet2DCondition(cfg)
        ref = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, 8, 8)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 3, 48)),
        )
        got = dict(flat_leaves(converted["params"]))
        want = dict(flat_leaves(ref["params"]))
        assert set(got) == set(want), (
            sorted(set(want) - set(got))[:5],
            sorted(set(got) - set(want))[:5],
        )
        out = model.apply(
            jax.tree_util.tree_map(jnp.asarray, converted),
            jnp.ones((1, 8, 8, 8)) * 0.1,
            jnp.full((1,), 5, jnp.int32),
            jnp.ones((1, 3, 48)) * 0.1,
        )
        assert out.shape == (1, 8, 8, 4)
        assert np.isfinite(np.asarray(out)).all()


class TestLocalCheckpointEndToEnd:
    """SDS end-to-end from a checkpoint directory in the GENUINE diffusers
    layout: config.json files + safetensors, loaded through the guidance's
    local path -- nothing here knows about test-only key synthesis."""

    def make_checkpoint_dir(self, root):
        from safetensors.numpy import save_file

        unet_dir = os.path.join(root, "unet")
        vae_dir = os.path.join(root, "vae")
        os.makedirs(unet_dir)
        os.makedirs(vae_dir)
        # genuine diffusers config.json contents (subset of fields)
        with open(os.path.join(unet_dir, "config.json"), "w") as f:
            json.dump(
                {
                    "_class_name": "UNet2DConditionModel",
                    "in_channels": 4,
                    "out_channels": 4,
                    "block_out_channels": [32, 64],
                    "layers_per_block": 2,
                    "attention_head_dim": [2, 4],
                    "cross_attention_dim": 48,
                    "down_block_types": [
                        "CrossAttnDownBlock2D",
                        "DownBlock2D",
                    ],
                    "up_block_types": ["UpBlock2D", "CrossAttnUpBlock2D"],
                    "use_linear_projection": True,
                    "norm_num_groups": 8,
                },
                f,
            )
        with open(os.path.join(vae_dir, "config.json"), "w") as f:
            json.dump(
                {
                    "_class_name": "AutoencoderKL",
                    "in_channels": 3,
                    "latent_channels": 4,
                    "block_out_channels": [16, 32],
                    "layers_per_block": 2,
                    "norm_num_groups": 8,
                    "scaling_factor": 0.18215,
                },
                f,
            )
        save_file(
            fill(diffusers_unet_manifest(**TINY_SD), seed=4),
            os.path.join(unet_dir, "diffusion_pytorch_model.safetensors"),
        )
        save_file(
            fill(diffusers_vae_encoder_manifest((16, 32), 2, 4), seed=5),
            os.path.join(vae_dir, "diffusion_pytorch_model.safetensors"),
        )
        return root

    def test_sds_from_local_checkpoint(self, tmp_path):
        from threestudio_3dgs_tpu.guidance.stable_diffusion import (
            StableDiffusionGuidance,
        )

        root = self.make_checkpoint_dir(str(tmp_path / "sd-tiny"))
        guidance = StableDiffusionGuidance(
            pretrained_model_name_or_path=root,
        )
        assert guidance.denoiser is not None, "local UNet did not load"
        assert guidance.encode_rgb is not None, "local VAE did not load"

        class FakePrompt:
            def get_text_embeddings(self, *a, **k):
                return jnp.ones((3, 48)) * 0.1

        rgb = jnp.ones((2, 16, 16, 3)) * 0.5

        def loss_fn(x):
            # latent path: VAE encode -> UNet eps -> SDS
            out = guidance(x, FakePrompt(), {"elevation": None, "azimuth": None},
                           key=jax.random.PRNGKey(0))
            return out["loss_sds"]

        loss, grad = jax.value_and_grad(loss_fn)(rgb)
        assert np.isfinite(float(loss))
        g = np.asarray(grad)
        assert g.shape == rgb.shape
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0, "no gradient flowed through the VAE+UNet"


def ldm_vae_encoder_manifest(block_out_channels, layers_per_block,
                             latent_channels, in_channels=3):
    """Genuine CompVis/ldm AutoencoderKL encoder keys (zero123-xl.ckpt
    first_stage_model half): encoder.down.{i}.block.{j}, nin_shortcut,
    mid.block_1/attn_1/block_2 with 1x1-CONV q/k/v/proj_out, norm_out,
    quant_conv."""
    keys = {}

    def norm(name, c):
        keys[f"{name}.weight"] = (c,)
        keys[f"{name}.bias"] = (c,)

    def conv(name, o, i, k=3):
        keys[f"{name}.weight"] = (o, i, k, k)
        keys[f"{name}.bias"] = (o,)

    def resnet(p, cin, cout):
        norm(f"{p}.norm1", cin)
        conv(f"{p}.conv1", cout, cin)
        norm(f"{p}.norm2", cout)
        conv(f"{p}.conv2", cout, cout)
        if cin != cout:
            conv(f"{p}.nin_shortcut", cout, cin, 1)

    pre = "first_stage_model."
    conv(pre + "encoder.conv_in", block_out_channels[0], in_channels)
    cin = block_out_channels[0]
    for i, ch in enumerate(block_out_channels):
        for j in range(layers_per_block):
            resnet(pre + f"encoder.down.{i}.block.{j}", cin, ch)
            cin = ch
        if i < len(block_out_channels) - 1:
            conv(pre + f"encoder.down.{i}.downsample.conv", ch, ch)
    resnet(pre + "encoder.mid.block_1", cin, cin)
    norm(pre + "encoder.mid.attn_1.norm", cin)
    for nm in ("q", "k", "v", "proj_out"):
        conv(pre + f"encoder.mid.attn_1.{nm}", cin, cin, 1)
    resnet(pre + "encoder.mid.block_2", cin, cin)
    norm(pre + "encoder.norm_out", cin)
    conv(pre + "encoder.conv_out", 2 * latent_channels, cin)
    conv(pre + "quant_conv", 2 * latent_channels, 2 * latent_channels, 1)
    return keys


class TestZero123SingleFileCkpt:
    """The reference's actual Zero123 checkpoint format: ONE ldm .ckpt with
    model.diffusion_model + first_stage_model + cc_projection (reference
    guidance/temporal_zero123_guidance.py:42-74)."""

    def make_ckpt(self, path):
        import torch

        unet_arch = dict(
            in_channels=8,
            out_channels=4,
            block_out_channels=(16, 32),
            layers_per_block=2,
            cross_attention_dim=48,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            use_linear_projection=False,
        )
        sd_diff = fill(diffusers_unet_manifest(**unet_arch), seed=6)
        rename = TestLDMFormat.ldm_rename(sd_diff.keys())
        sd = {
            "model.diffusion_model." + rename[k]: torch.from_numpy(v)
            for k, v in sd_diff.items()
        }
        # 4-level VAE: 256^2 cond image -> 32^2 latents like the real model
        for k, shape in ldm_vae_encoder_manifest(
            (8, 8, 16, 16), 1, 4
        ).items():
            rng = np.random.default_rng(abs(hash(k)) % (2**32))
            sd[k] = torch.from_numpy(
                (rng.standard_normal(shape) * 0.02).astype(np.float32)
            )
        rng = np.random.default_rng(7)
        sd["cc_projection.weight"] = torch.from_numpy(
            (rng.standard_normal((48, 772)) * 0.02).astype(np.float32)
        )
        sd["cc_projection.bias"] = torch.zeros(48)
        # junk the loader must skip
        sd["model_ema.decay"] = torch.tensor(0.999)
        sd["betas"] = torch.zeros(1000)
        torch.save({"state_dict": sd, "global_step": 1}, path)

    def test_temporal_zero123_from_single_ckpt(self, tmp_path):
        from threestudio_3dgs_tpu.guidance.temporal_zero123 import (
            TemporalZero123Guidance,
        )

        ckpt = str(tmp_path / "zero123-tiny.ckpt")
        self.make_ckpt(ckpt)
        guidance = TemporalZero123Guidance(
            pretrained_model_name_or_path=ckpt, num_frames=2
        )
        frames = np.stack(
            [np.full((32, 32, 3), 0.3, np.float32),
             np.full((32, 32, 3), 0.7, np.float32)]
        )
        guidance.prepare_embeddings(frames)
        assert guidance.denoiser is not None, "ldm ckpt did not load"
        assert guidance.encode_latents is not None
        assert guidance.cc_w.shape == (772, 48)

        batch = {
            "elevation": jnp.zeros((2,)),
            "azimuth": jnp.asarray([30.0, 60.0]),
            "camera_distances": jnp.full((2,), 1.2),
            "frame_indices": jnp.asarray([0, 1], jnp.int32),
        }
        rgb = jnp.ones((2, 32, 32, 3)) * 0.5

        def loss_fn(x):
            out = guidance(x, None, batch, key=jax.random.PRNGKey(0))
            return out["loss_sds"]

        loss, grad = jax.value_and_grad(loss_fn)(rgb)
        assert np.isfinite(float(loss))
        assert np.isfinite(np.asarray(grad)).all()
        assert np.abs(np.asarray(grad)).max() > 0
