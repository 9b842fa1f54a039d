"""Torch (diffusers-layout) checkpoint -> Flax parameter tree conversion.

Lets the TPU UNet/VAE (unet.py, vae.py) load real Stable-Diffusion / Zero123
weights from a LOCAL diffusers directory (`unet/diffusion_pytorch_model.bin`,
`vae/...`) -- the reference pulls the same weights via `diffusers`
(reference guidance/stable_diffusion_lora_guidance.py:27-44); this
environment has no egress, so conversion is offline-only and unit-tested
against randomly initialized torch-layout dicts.

Transforms: conv OIHW -> HWIO, linear (O,I) -> (I,O), norm weight -> scale.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dense(w):
    return np.transpose(np.asarray(w), (1, 0))


def _set(tree: dict, path: tuple, leaf):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(leaf)


_NORM_KIND = {"weight": "scale", "bias": "bias"}


def _leaf(kind: str, param: str, value):
    """kind: conv|dense|norm -> (leaf_name, transformed_value)."""
    if kind == "conv":
        return ("kernel", _conv(value)) if param == "weight" else ("bias", value)
    if kind == "dense":
        return ("kernel", _dense(value)) if param == "weight" else ("bias", value)
    return (_NORM_KIND[param], value)


def _attention_paths(prefix: tuple, rest: str):
    """Map diffusers attention subkeys under an Attention module."""
    m = re.match(r"(to_q|to_k|to_v)\.(weight|bias)$", rest)
    if m:
        return prefix + (m.group(1),), "dense", m.group(2)
    m = re.match(r"to_out\.0\.(weight|bias)$", rest)
    if m:
        return prefix + ("to_out_0",), "dense", m.group(1)
    # legacy VAE naming
    m = re.match(r"(query|key|value)\.(weight|bias)$", rest)
    if m:
        name = {"query": "to_q", "key": "to_k", "value": "to_v"}[m.group(1)]
        return prefix + (name,), "dense", m.group(2)
    m = re.match(r"proj_attn\.(weight|bias)$", rest)
    if m:
        return prefix + ("to_out_0",), "dense", m.group(1)
    m = re.match(r"group_norm\.(weight|bias)$", rest)
    if m:
        return prefix + ("group_norm",), "norm", m.group(1)
    raise KeyError(rest)


def _transformer_paths(prefix: tuple, rest: str, use_linear: bool):
    m = re.match(r"norm\.(weight|bias)$", rest)
    if m:
        return prefix + ("norm",), "norm", m.group(1)
    m = re.match(r"proj_(in|out)\.(weight|bias)$", rest)
    if m:
        kind = "dense" if use_linear else "conv"
        return prefix + (f"proj_{m.group(1)}",), kind, m.group(2)
    m = re.match(r"transformer_blocks\.0\.(.*)$", rest)
    if not m:
        raise KeyError(rest)
    sub = m.group(1)
    tb = prefix + ("transformer_blocks_0",)
    m = re.match(r"(norm[123])\.(weight|bias)$", sub)
    if m:
        return tb + (m.group(1),), "norm", m.group(2)
    m = re.match(r"(attn[12])\.(.*)$", sub)
    if m:
        return _attention_paths(tb + (m.group(1),), m.group(2))
    m = re.match(r"ff\.net\.0\.proj\.(weight|bias)$", sub)
    if m:
        return tb + ("ff_proj",), "dense", m.group(1)
    m = re.match(r"ff\.net\.2\.(weight|bias)$", sub)
    if m:
        return tb + ("ff_out",), "dense", m.group(1)
    raise KeyError(rest)


def _resnet_paths(prefix: tuple, rest: str):
    m = re.match(r"(norm[12])\.(weight|bias)$", rest)
    if m:
        return prefix + (m.group(1),), "norm", m.group(2)
    m = re.match(r"(conv[12]|conv_shortcut)\.(weight|bias)$", rest)
    if m:
        return prefix + (m.group(1),), "conv", m.group(2)
    m = re.match(r"time_emb_proj\.(weight|bias)$", rest)
    if m:
        return prefix + ("time_emb_proj",), "dense", m.group(1)
    raise KeyError(rest)


def torch_unet_to_flax(sd: Dict[str, "object"], use_linear_projection=True) -> dict:
    """diffusers UNet2DConditionModel state_dict -> {'params': ...} tree for
    unet.UNet2DCondition."""
    params: dict = {}

    def put(path, kind, param, value):
        leaf, v = _leaf(kind, param, value)
        _set(params, path + (leaf,), v)

    for key, value in sd.items():
        if re.match(r"conv_in\.(weight|bias)$", key):
            put(("conv_in",), "conv", key.split(".")[-1], value)
        elif (m := re.match(r"time_embedding\.linear_(\d)\.(weight|bias)$", key)):
            put((f"time_embedding_linear_{m.group(1)}",), "dense", m.group(2), value)
        elif (m := re.match(r"camera_embedding\.linear_(\d)\.(weight|bias)$", key)):
            # MVDream camera-matrix MLP (unet.py camera_embed_dim)
            put((f"camera_embedding_linear_{m.group(1)}",), "dense", m.group(2), value)
        elif (m := re.match(r"conv_norm_out\.(weight|bias)$", key)):
            put(("conv_norm_out",), "norm", m.group(1), value)
        elif (m := re.match(r"conv_out\.(weight|bias)$", key)):
            put(("conv_out",), "conv", m.group(1), value)
        elif (m := re.match(r"(down|up)_blocks\.(\d)\.resnets\.(\d)\.(.*)$", key)):
            path, kind, param = _resnet_paths(
                (f"{m.group(1)}_{m.group(2)}_resnet_{m.group(3)}",), m.group(4)
            )
            put(path[:-1] + (path[-1],), kind, param, value)
        elif (m := re.match(r"(down|up)_blocks\.(\d)\.attentions\.(\d)\.(.*)$", key)):
            path, kind, param = _transformer_paths(
                (f"{m.group(1)}_{m.group(2)}_attn_{m.group(3)}",),
                m.group(4),
                use_linear_projection,
            )
            put(path, kind, param, value)
        elif (m := re.match(r"down_blocks\.(\d)\.downsamplers\.0\.conv\.(weight|bias)$", key)):
            put((f"down_{m.group(1)}_downsample",), "conv", m.group(2), value)
        elif (m := re.match(r"up_blocks\.(\d)\.upsamplers\.0\.conv\.(weight|bias)$", key)):
            put((f"up_{m.group(1)}_upsample",), "conv", m.group(2), value)
        elif (m := re.match(r"mid_block\.resnets\.(\d)\.(.*)$", key)):
            path, kind, param = _resnet_paths(
                (f"mid_resnet_{m.group(1)}",), m.group(2)
            )
            put(path, kind, param, value)
        elif (m := re.match(r"mid_block\.attentions\.0\.(.*)$", key)):
            path, kind, param = _transformer_paths(
                ("mid_attn",), m.group(1), use_linear_projection
            )
            put(path, kind, param, value)
        else:
            raise KeyError(f"unmapped UNet key: {key}")
    return {"params": params}


def _vae_half_to_flax(sd, half: str, quant_key: str) -> dict:
    params: dict = {}

    def put(path, kind, param, value):
        leaf, v = _leaf(kind, param, value)
        _set(params, path + (leaf,), v)

    for key, value in sd.items():
        if key.startswith(quant_key + "."):
            put((quant_key,), "conv", key.split(".")[-1], value)
            continue
        if not key.startswith(half + "."):
            continue
        rest = key[len(half) + 1 :]
        if (m := re.match(r"conv_in\.(weight|bias)$", rest)):
            put(("conv_in",), "conv", m.group(1), value)
        elif (m := re.match(r"conv_norm_out\.(weight|bias)$", rest)):
            put(("conv_norm_out",), "norm", m.group(1), value)
        elif (m := re.match(r"conv_out\.(weight|bias)$", rest)):
            put(("conv_out",), "conv", m.group(1), value)
        elif (m := re.match(r"(down|up)_blocks\.(\d)\.resnets\.(\d)\.(.*)$", rest)):
            path, kind, param = _resnet_paths(
                (f"{m.group(1)}_{m.group(2)}_resnet_{m.group(3)}",), m.group(4)
            )
            put(path, kind, param, value)
        elif (m := re.match(r"down_blocks\.(\d)\.downsamplers\.0\.conv\.(weight|bias)$", rest)):
            put((f"down_{m.group(1)}_downsample",), "conv", m.group(2), value)
        elif (m := re.match(r"up_blocks\.(\d)\.upsamplers\.0\.conv\.(weight|bias)$", rest)):
            put((f"up_{m.group(1)}_upsample",), "conv", m.group(2), value)
        elif (m := re.match(r"mid_block\.resnets\.(\d)\.(.*)$", rest)):
            path, kind, param = _resnet_paths(
                (f"mid_resnet_{m.group(1)}",), m.group(2)
            )
            put(path, kind, param, value)
        elif (m := re.match(r"mid_block\.attentions\.0\.(.*)$", rest)):
            path, kind, param = _attention_paths(("mid_attn",), m.group(1))
            put(path, kind, param, value)
        else:
            raise KeyError(f"unmapped VAE key: {key}")
    return {"params": params}


def torch_vae_encoder_to_flax(sd) -> dict:
    return _vae_half_to_flax(sd, "encoder", "quant_conv")


def torch_vae_decoder_to_flax(sd) -> dict:
    return _vae_half_to_flax(sd, "decoder", "post_quant_conv")


def ldm_unet_to_diffusers(
    sd: Dict[str, "object"],
    num_res_blocks: int = 2,
    num_levels: int = 4,
) -> Dict[str, "object"]:
    """CompVis/ldm UNetModel state dict -> diffusers UNet2DConditionModel
    key naming (then `torch_unet_to_flax` takes it the rest of the way).

    This is the checkpoint format of Zero123 / Stable-Zero123 (a single
    `zero123-xl.ckpt` with `model.diffusion_model.*` keys), which the
    reference loads through ldm's `load_model_from_config`
    (reference guidance/temporal_zero123_guidance.py:42-74).  The mapping is
    the standard one (diffusers' convert_from_ckpt):

      time_embed.0/2                 -> time_embedding.linear_1/linear_2
      input_blocks.0.0               -> conv_in
      input_blocks.{3i+j+1}.0        -> down_blocks.{i}.resnets.{j}
      input_blocks.{3i+j+1}.1        -> down_blocks.{i}.attentions.{j}
      input_blocks.{3(i+1)}.0.op     -> down_blocks.{i}.downsamplers.0.conv
      middle_block.{0,2}             -> mid_block.resnets.{0,1}
      middle_block.1                 -> mid_block.attentions.0
      output_blocks.{ki+j}.0         -> up_blocks.{i}.resnets.{j}   (k=nres+1)
      output_blocks.{ki+j}.1         -> up_blocks.{i}.attentions.{j} (if attn)
      output_blocks.{...}.{1|2}.conv -> up_blocks.{i}.upsamplers.0.conv
      out.0 / out.2                  -> conv_norm_out / conv_out

    ldm resnet subkeys: in_layers.0 -> norm1, in_layers.2 -> conv1,
    emb_layers.1 -> time_emb_proj, out_layers.0 -> norm2, out_layers.3 ->
    conv2, skip_connection -> conv_shortcut.  SpatialTransformer subkeys
    already share diffusers' inner naming."""
    k = num_res_blocks + 1
    res_sub = {
        "in_layers.0": "norm1",
        "in_layers.2": "conv1",
        "emb_layers.1": "time_emb_proj",
        "out_layers.0": "norm2",
        "out_layers.3": "conv2",
        "skip_connection": "conv_shortcut",
    }

    def map_resnet(rest: str) -> str:
        for src, dst in res_sub.items():
            if rest.startswith(src + "."):
                return dst + rest[len(src):]
        raise KeyError(f"unmapped ldm resnet subkey: {rest}")

    unet_roots = (
        "time_embed.",
        "input_blocks.",
        "middle_block.",
        "output_blocks.",
        "out.",
    )
    out: Dict[str, "object"] = {}
    for key, value in sd.items():
        had_prefix = False
        for pre in ("model.diffusion_model.", "diffusion_model."):
            if key.startswith(pre):
                key = key[len(pre):]
                had_prefix = True
                break
        if not had_prefix and not key.startswith(unet_roots):
            # full ldm checkpoints also carry first_stage_model (VAE),
            # cond_stage_model (CLIP), model_ema, schedule buffers -- those
            # are not this UNet's keys
            continue
        if (m := re.match(r"time_embed\.(0|2)\.(weight|bias)$", key)):
            n = "1" if m.group(1) == "0" else "2"
            out[f"time_embedding.linear_{n}.{m.group(2)}"] = value
        elif (m := re.match(r"input_blocks\.0\.0\.(weight|bias)$", key)):
            out[f"conv_in.{m.group(1)}"] = value
        elif (m := re.match(r"input_blocks\.(\d+)\.0\.op\.(weight|bias)$", key)):
            level = int(m.group(1)) // k - 1
            out[f"down_blocks.{level}.downsamplers.0.conv.{m.group(2)}"] = value
        elif (m := re.match(r"input_blocks\.(\d+)\.(0|1)\.(.*)$", key)):
            n = int(m.group(1))
            level, j = (n - 1) // k, (n - 1) % k
            if m.group(2) == "0":
                out[
                    f"down_blocks.{level}.resnets.{j}." + map_resnet(m.group(3))
                ] = value
            else:
                out[f"down_blocks.{level}.attentions.{j}.{m.group(3)}"] = value
        elif (m := re.match(r"middle_block\.(0|2)\.(.*)$", key)):
            j = 0 if m.group(1) == "0" else 1
            out[f"mid_block.resnets.{j}." + map_resnet(m.group(2))] = value
        elif (m := re.match(r"middle_block\.1\.(.*)$", key)):
            out[f"mid_block.attentions.0.{m.group(1)}"] = value
        elif (m := re.match(r"output_blocks\.(\d+)\.(\d)\.conv\.(weight|bias)$", key)):
            level = int(m.group(1)) // k
            out[f"up_blocks.{level}.upsamplers.0.conv.{m.group(3)}"] = value
        elif (m := re.match(r"output_blocks\.(\d+)\.(0|1)\.(.*)$", key)):
            n = int(m.group(1))
            level, j = n // k, n % k
            if m.group(2) == "0":
                out[
                    f"up_blocks.{level}.resnets.{j}." + map_resnet(m.group(3))
                ] = value
            else:
                out[f"up_blocks.{level}.attentions.{j}.{m.group(3)}"] = value
        elif (m := re.match(r"out\.(0|2)\.(weight|bias)$", key)):
            name = "conv_norm_out" if m.group(1) == "0" else "conv_out"
            out[f"{name}.{m.group(2)}"] = value
        else:
            raise KeyError(f"unmapped ldm UNet key: {key}")
    return out


def ldm_vae_encoder_to_diffusers(sd: Dict[str, "object"]) -> Dict[str, "object"]:
    """CompVis/ldm AutoencoderKL ENCODER keys (first_stage_model.encoder.*)
    -> diffusers naming, ready for `torch_vae_encoder_to_flax`.

    ldm: encoder.down.{i}.block.{j}.{norm1,conv1,norm2,conv2,nin_shortcut},
    encoder.down.{i}.downsample.conv, encoder.mid.{block_1,attn_1,block_2},
    encoder.norm_out, quant_conv.  ldm attention q/k/v/proj_out are 1x1
    convs; diffusers uses Linear -- reshape (C,C,1,1) -> (C,C)."""
    out: Dict[str, "object"] = {}
    attn_map = {"q": "to_q", "k": "to_k", "v": "to_v", "proj_out": "to_out.0"}
    for key, value in sd.items():
        for pre in ("first_stage_model.",):
            if key.startswith(pre):
                key = key[len(pre):]
                break
        if key.startswith("quant_conv."):
            out[key] = value
            continue
        if not key.startswith("encoder."):
            continue
        rest = key[len("encoder."):]
        if (m := re.match(r"conv_in\.(weight|bias)$", rest)):
            out[f"encoder.conv_in.{m.group(1)}"] = value
        elif (m := re.match(r"norm_out\.(weight|bias)$", rest)):
            out[f"encoder.conv_norm_out.{m.group(1)}"] = value
        elif (m := re.match(r"conv_out\.(weight|bias)$", rest)):
            out[f"encoder.conv_out.{m.group(1)}"] = value
        elif (m := re.match(
            r"down\.(\d+)\.block\.(\d+)\.(norm1|conv1|norm2|conv2|nin_shortcut)\.(weight|bias)$",
            rest,
        )):
            name = "conv_shortcut" if m.group(3) == "nin_shortcut" else m.group(3)
            out[
                f"encoder.down_blocks.{m.group(1)}.resnets.{m.group(2)}."
                f"{name}.{m.group(4)}"
            ] = value
        elif (m := re.match(r"down\.(\d+)\.downsample\.conv\.(weight|bias)$", rest)):
            out[
                f"encoder.down_blocks.{m.group(1)}.downsamplers.0.conv.{m.group(2)}"
            ] = value
        elif (m := re.match(r"mid\.block_([12])\.(.*)$", rest)):
            j = int(m.group(1)) - 1
            sub = m.group(2).replace("nin_shortcut.", "conv_shortcut.")
            out[f"encoder.mid_block.resnets.{j}.{sub}"] = value
        elif (m := re.match(r"mid\.attn_1\.norm\.(weight|bias)$", rest)):
            out[f"encoder.mid_block.attentions.0.group_norm.{m.group(1)}"] = value
        elif (m := re.match(r"mid\.attn_1\.(q|k|v|proj_out)\.(weight|bias)$", rest)):
            v = np.asarray(value)
            if m.group(2) == "weight" and v.ndim == 4:
                v = v[:, :, 0, 0]  # 1x1 conv -> linear
            out[
                f"encoder.mid_block.attentions.0.{attn_map[m.group(1)]}.{m.group(2)}"
            ] = v
        else:
            raise KeyError(f"unmapped ldm VAE encoder key: {key}")
    return out


def is_ldm_state_dict(sd: Dict[str, "object"]) -> bool:
    """True when the dict carries CompVis/ldm UNet naming (zero123-xl.ckpt
    style) rather than diffusers naming."""
    return any(
        k.startswith(("model.diffusion_model.", "diffusion_model.", "input_blocks."))
        for k in sd
    )


def fuse_lora(base_sd: Dict[str, "object"], lora_sd: Dict[str, "object"],
              scale: float = 1.0) -> Dict[str, "object"]:
    """Fuse a LoRA adapter into a torch-layout base state dict:
    W' = W + scale * (alpha/r) * up @ down  (reference
    guidance/stable_diffusion_lora_guidance.py:27-50 does this through
    diffusers `fuse_lora`; here it happens once, offline, before the
    torch->flax conversion so the TPU denoiser runs the personalized prior
    with zero runtime overhead).

    Supports the two common namings:
      * peft:      "{module}.lora_A.weight" / "{module}.lora_B.weight"
      * diffusers: "{module}.lora.down.weight" / "{module}.lora.up.weight"
    Optional per-module "...alpha" scalars rescale by alpha/rank."""
    fused = dict(base_sd)
    pairs: Dict[str, dict] = {}
    for key, value in lora_sd.items():
        for suffix, role in (
            (".lora_A.weight", "down"),
            (".lora_B.weight", "up"),
            (".lora.down.weight", "down"),
            (".lora.up.weight", "up"),
            (".lora_down.weight", "down"),
            (".lora_up.weight", "up"),
            (".alpha", "alpha"),
        ):
            if key.endswith(suffix):
                module = key[: -len(suffix)]
                pairs.setdefault(module, {})[role] = np.asarray(value)
                break
    for module, d in pairs.items():
        if "down" not in d or "up" not in d:
            continue
        down, up = d["down"], d["up"]
        rank = down.shape[0]
        alpha = float(d.get("alpha", rank))
        target = module + ".weight"
        if target not in fused:
            # peft sometimes prefixes "base_model.model."
            stripped = target
            for pre in ("base_model.model.", "unet."):
                if stripped.startswith(pre):
                    stripped = stripped[len(pre):]
            if stripped not in fused:
                raise KeyError(f"LoRA target not in base state dict: {target}")
            target = stripped
        w = np.asarray(fused[target], np.float32)
        delta = (up.reshape(up.shape[0], -1) @ down.reshape(rank, -1)).reshape(
            w.shape
        )
        fused[target] = w + scale * (alpha / rank) * delta.astype(np.float32)
    return fused


def unet_config_from_diffusers_json(path: str):
    """Read a genuine diffusers `unet/config.json` into our
    UNet2DConditionConfig, so local checkpoints load with their true
    architecture (the reference gets this for free from
    `UNet2DConditionModel.from_pretrained`)."""
    import json

    from .unet import UNet2DConditionConfig

    with open(path) as f:
        cfg = json.load(f)
    n = len(cfg["block_out_channels"])
    ahd = cfg.get("attention_head_dim", 8)
    if isinstance(ahd, int):
        ahd = [ahd] * n
    return UNet2DConditionConfig(
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        attention_head_dim=tuple(ahd),
        cross_attention_dim=cfg.get("cross_attention_dim", 1280),
        down_block_types=tuple(cfg["down_block_types"]),
        up_block_types=tuple(cfg["up_block_types"]),
        use_linear_projection=cfg.get("use_linear_projection", False),
        freq_shift=cfg.get("freq_shift", 0),
        norm_groups=cfg.get("norm_num_groups", 32),
    )


def vae_config_from_diffusers_json(path: str):
    """Read a genuine diffusers `vae/config.json` into AutoencoderKLConfig."""
    import json

    from .vae import AutoencoderKLConfig

    with open(path) as f:
        cfg = json.load(f)
    return AutoencoderKLConfig(
        in_channels=cfg.get("in_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg["block_out_channels"]),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_groups=cfg.get("norm_num_groups", 32),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
    )


def infer_unet_config_from_state_dict(sd: Dict[str, "object"], base=None):
    """Infer a UNet2DConditionConfig from a diffusers-naming state dict's
    shapes (block channels, in/out channels, cross-attn dim, block types,
    layers per block, linear-vs-conv projection).  Head counts and norm
    groups come from `base` (default ZERO123_UNET), shrunk to divide the
    observed channels -- checkpoints do not encode them in shapes."""
    import dataclasses

    from .unet import ZERO123_UNET

    base = base or ZERO123_UNET
    chans = []
    while f"down_blocks.{len(chans)}.resnets.0.conv1.weight" in sd:
        chans.append(int(np.shape(sd[f"down_blocks.{len(chans)}.resnets.0.conv1.weight"])[0]))
    n = len(chans)
    layers = 0
    while f"down_blocks.0.resnets.{layers}.conv1.weight" in sd:
        layers += 1
    cross = base.cross_attention_dim
    use_linear = base.use_linear_projection
    down_types, up_types = [], []
    for i in range(n):
        has = f"down_blocks.{i}.attentions.0.norm.weight" in sd
        down_types.append("CrossAttnDownBlock2D" if has else "DownBlock2D")
        k = f"down_blocks.{i}.attentions.0.transformer_blocks.0.attn2.to_k.weight"
        if k in sd:
            cross = int(np.shape(sd[k])[1])
        pk = f"down_blocks.{i}.attentions.0.proj_in.weight"
        if pk in sd:
            use_linear = len(np.shape(sd[pk])) == 2
    for i in range(n):
        has = f"up_blocks.{i}.attentions.0.norm.weight" in sd
        up_types.append("CrossAttnUpBlock2D" if has else "UpBlock2D")
    heads = list(base.attention_head_dim[:n]) + [8] * max(0, n - len(base.attention_head_dim))
    heads = tuple(h if c % h == 0 else 1 for h, c in zip(heads, chans))
    ng = base.norm_groups
    while ng > 1 and any(c % ng for c in chans):
        ng //= 2
    return dataclasses.replace(
        base,
        in_channels=int(np.shape(sd["conv_in.weight"])[1]),
        out_channels=int(np.shape(sd["conv_out.weight"])[0]),
        block_out_channels=tuple(chans),
        layers_per_block=layers,
        attention_head_dim=heads,
        cross_attention_dim=cross,
        down_block_types=tuple(down_types),
        up_block_types=tuple(up_types),
        use_linear_projection=use_linear,
        norm_groups=ng,
    )


def infer_vae_config_from_state_dict(sd: Dict[str, "object"], base=None):
    """Infer an AutoencoderKLConfig from a diffusers-naming ENCODER state
    dict's shapes."""
    import dataclasses

    from .vae import SD_VAE

    base = base or SD_VAE
    chans = []
    while f"encoder.down_blocks.{len(chans)}.resnets.0.conv1.weight" in sd:
        chans.append(
            int(np.shape(sd[f"encoder.down_blocks.{len(chans)}.resnets.0.conv1.weight"])[0])
        )
    layers = 0
    while f"encoder.down_blocks.0.resnets.{layers}.conv1.weight" in sd:
        layers += 1
    ng = base.norm_groups
    while ng > 1 and any(c % ng for c in chans):
        ng //= 2
    return dataclasses.replace(
        base,
        in_channels=int(np.shape(sd["encoder.conv_in.weight"])[1]),
        latent_channels=int(np.shape(sd["quant_conv.weight"])[0]) // 2,
        block_out_channels=tuple(chans),
        layers_per_block=layers,
        norm_groups=ng,
    )


def load_torch_state_dict(path: str):
    """Load a .bin (torch pickle) or .safetensors file as numpy dict."""
    if path.endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file

            return load_file(path)
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("safetensors not available") from e
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # ldm/lightning checkpoints (zero123-xl.ckpt) nest under "state_dict"
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {
        k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")
    }


def cast_params_half(params, dtype=None):
    """Cast conv/dense parameter leaves to bf16 for TPU compute, keeping every
    normalization scale/bias f32.

    With flax modules built at dtype=bf16 the params would be cast at every
    apply anyway; storing them half up front additionally halves the weight
    HBM read per UNet call (~3.5 GB f32 for SD 2.1).  Normalization leaves
    stay f32: GroupNorm/LayerNorm statistics promote to f32 only when at
    least one operand is f32 (flax dtype promotion), and their epsilons
    (1e-5/1e-6) sit below bf16 resolution.  Norm modules are identified by
    name ("norm1", "group_norm", "conv_norm_out", ... -- every norm in
    unet.py/vae.py contains "norm")."""
    import jax.numpy as jnp
    from jax import tree_util

    dtype = dtype or jnp.bfloat16

    def cast(path, leaf):
        names = "/".join(str(getattr(p, "key", p)) for p in path)
        if "norm" in names:
            return leaf
        return leaf.astype(dtype)

    return tree_util.tree_map_with_path(cast, params)


def tpu_fast_model_config(model_cfg, half_precision: bool):
    """Production TPU speed knobs for a UNet/VAE config: bf16 compute dtype
    when `half_precision` (the reference's `half_precision_weights: True`
    default, threestudio SD guidance), and Pallas flash attention for UNet
    configs (safe to set unconditionally -- the attention wrapper falls back
    to einsum off-TPU and for short sequences)."""
    import dataclasses

    import jax.numpy as jnp

    kw = {}
    if hasattr(model_cfg, "use_flash_attention"):
        kw["use_flash_attention"] = True
    if half_precision:
        kw["dtype"] = jnp.bfloat16
    return dataclasses.replace(model_cfg, **kw) if kw else model_cfg
