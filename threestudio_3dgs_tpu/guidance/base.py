"""Guidance interface and prompt processing.

The guidance contract (SURVEY.md L5, reference
guidance/temporal_zero123_guidance.py:298-373):
  guidance(rgb (B, H, W, 3), prompt_utils, **batch) -> {"loss_sds": ..., ...}
All loss terms are traced scalars; everything named loss_* is weighted by the
matching lambda_* in the system config (reference system/gaussian_splatting.py
:83-87)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax.numpy as jnp

from ..utils.registry import register


class BaseGuidance:
    """Subclasses implement __call__(rgb, prompt_utils, batch, key, step)."""

    def __call__(
        self,
        rgb: jnp.ndarray,
        prompt_utils: Any,
        batch: Dict[str, Any],
        key=None,
        step: int = 0,
    ) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def update_step(self, epoch: int, global_step: int) -> None:
        pass


@dataclasses.dataclass
class PromptProcessorConfig:
    prompt: str = "a hamburger"
    negative_prompt: str = ""
    spawn: bool = False  # accepted for reference-config compatibility
    pretrained_model_name_or_path: str = ""
    # reference prompt processors hold many more knobs; unknown keys are kept
    # in .extra by parse_structured


class PromptUtils:
    """Carrier for text conditioning.  With a local CLIP checkpoint directory
    (diffusers layout: text_encoder/ + tokenizer/) the embedding is the real
    CLIP hidden state, computed ONCE on the host CPU via transformers --
    exactly the reference's precompute-and-cache pattern
    (guidance/temporal_zero123_guidance.py:200-215).  Without weights (this
    environment has no egress) it is a deterministic hash-derived vector so
    downstream math is exercised."""

    def __init__(self, prompt: str, negative_prompt: str = "", model_dir: str = ""):
        import numpy as np

        self.prompt = prompt
        self.negative_prompt = negative_prompt
        emb = None
        if model_dir:
            emb = _clip_encode_local(model_dir, prompt)
        if emb is None:
            rng = np.random.default_rng(abs(hash(prompt)) % (2 ** 32))
            emb = rng.normal(size=(77, 1024)).astype("float32")
        self.text_embedding = jnp.asarray(emb)

    def get_text_embeddings(self, *args, **kwargs):
        return self.text_embedding


def _clip_encode_local(model_dir: str, prompt: str):
    """CLIP text hidden states from a LOCAL diffusers-layout dir, or None."""
    import os

    te = os.path.join(model_dir, "text_encoder")
    tok = os.path.join(model_dir, "tokenizer")
    if not (os.path.isdir(te) and os.path.isdir(tok)):
        return None
    try:  # torch CPU inference, once per prompt
        import torch
        from transformers import CLIPTextModel, CLIPTokenizer

        tokenizer = CLIPTokenizer.from_pretrained(tok)
        encoder = CLIPTextModel.from_pretrained(te)
        with torch.no_grad():
            ids = tokenizer(
                prompt, padding="max_length", max_length=77, truncation=True,
                return_tensors="pt",
            ).input_ids
            return encoder(ids)[0][0].numpy()
    except Exception:
        return None


@register("dummy-prompt-processor")
@register("stable-diffusion-prompt-processor")
@register("stable-zero123-prompt-processor")
@register("zero123-prompt-processor")
class PromptProcessor:
    """Offline prompt processor: carries the prompt text and a deterministic
    embedding.  Real CLIP/T5 encoding would slot in here when weights exist
    locally (pass pretrained_model_name_or_path to a local dir)."""

    Config = PromptProcessorConfig

    def __init__(self, cfg=None, **kwargs):
        if cfg is None:
            cfg = PromptProcessorConfig(**kwargs)
        elif isinstance(cfg, dict):
            from ..utils.config import parse_structured

            cfg = parse_structured(PromptProcessorConfig, cfg)
        self.cfg = cfg

    def __call__(self) -> PromptUtils:
        return PromptUtils(
            self.cfg.prompt,
            self.cfg.negative_prompt,
            model_dir=str(self.cfg.pretrained_model_name_or_path or ""),
        )
