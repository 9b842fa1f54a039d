"""TPU-native latent-diffusion model stack (Flax/linen, NHWC, bf16-capable).

Replaces the reference's torch/diffusers dependency for the guidance layer
(reference guidance/stable_diffusion_lora_guidance.py:6 `from diffusers
import ...`, guidance/temporal_zero123_guidance.py:21 ldm UNet): a faithful
UNet2DCondition + AutoencoderKL pair whose parameters load from local
diffusers-layout torch checkpoints (convert.py); no network egress needed at
runtime.  Architectures are configurable so tests run tiny randomly
initialized variants on CPU.
"""

from .unet import (
    MVDREAM_UNET,
    SD21_UNET,
    ZERO123_UNET,
    UNet2DCondition,
    UNet2DConditionConfig,
)
from .vae import AutoencoderKLConfig, VAEEncoder, VAEDecoder, SD_VAE
from .convert import torch_unet_to_flax, torch_vae_encoder_to_flax, torch_vae_decoder_to_flax
