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
    """Carrier for text conditioning.  Real text encoders need checkpoint
    weights (not available in this offline environment); the embedding field
    is a deterministic hash-derived vector so downstream math is exercised."""

    def __init__(self, prompt: str, negative_prompt: str = ""):
        import numpy as np

        self.prompt = prompt
        self.negative_prompt = negative_prompt
        rng = np.random.default_rng(abs(hash(prompt)) % (2 ** 32))
        self.text_embedding = jnp.asarray(
            rng.normal(size=(77, 1024)).astype("float32")
        )

    def get_text_embeddings(self, *args, **kwargs):
        return self.text_embedding


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
        return PromptUtils(self.cfg.prompt, self.cfg.negative_prompt)
