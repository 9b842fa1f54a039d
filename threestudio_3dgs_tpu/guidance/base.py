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
    # view-dependent prompting (threestudio prompt-processor semantics the
    # reference configs set via front/back_threshold,
    # e.g. reference configs/gaussian_splatting_mvdream.yaml:80-81):
    # azimuth within +-front_threshold of 0 -> ", front view", within
    # back_threshold of 180 -> ", back view", else ", side view";
    # elevation > overhead_threshold -> ", overhead view"
    use_perp_neg: bool = False  # accepted for config compatibility
    front_threshold: float = 30.0
    back_threshold: float = 30.0
    overhead_threshold: float = 60.0
    view_dependent_prompting: bool = True
    # reference prompt processors hold many more knobs; unknown keys are kept
    # in .extra by parse_structured


VIEW_SUFFIXES = (", front view", ", side view", ", back view", ", overhead view")


class PromptUtils:
    """Carrier for text conditioning.  With a local CLIP checkpoint directory
    (diffusers layout: text_encoder/ + tokenizer/) the embeddings are the real
    CLIP hidden states, computed ONCE on the host CPU via transformers --
    exactly the reference's precompute-and-cache pattern
    (guidance/temporal_zero123_guidance.py:200-215).  Without weights (this
    environment has no egress) they are deterministic hash-derived vectors so
    downstream math is exercised.

    View-dependent prompting (threestudio semantics driven by the reference
    configs' front/back_threshold): four direction-suffixed prompt variants
    are encoded up front; `get_text_embeddings(elevation, azimuth)` selects
    per-sample embeddings inside jit with a jnp.where cascade."""

    def __init__(self, prompt: str, negative_prompt: str = "",
                 model_dir: str = "", cfg: "PromptProcessorConfig" = None):
        import numpy as np

        self.prompt = prompt
        self.negative_prompt = negative_prompt
        self.cfg = cfg or PromptProcessorConfig(prompt=prompt)

        def encode(text):
            emb = _clip_encode_local(model_dir, text) if model_dir else None
            if emb is None:
                rng = np.random.default_rng(abs(hash(text)) % (2 ** 32))
                emb = rng.normal(size=(77, 1024)).astype("float32")
            return emb

        self.text_embedding = jnp.asarray(encode(prompt))
        if self.cfg.view_dependent_prompting:
            self.view_embeddings = jnp.stack(
                [jnp.asarray(encode(prompt + s)) for s in VIEW_SUFFIXES]
            )  # (4, 77, D)
        else:
            self.view_embeddings = None

    def view_index(self, elevation, azimuth):
        """(B,) int32 index into VIEW_SUFFIXES, reference threestudio
        direction rules: overhead wins, then front/back by azimuth window."""
        azim = (jnp.asarray(azimuth) + 180.0) % 360.0 - 180.0  # [-180, 180)
        front = jnp.abs(azim) < self.cfg.front_threshold
        back = jnp.abs(azim) > 180.0 - self.cfg.back_threshold
        idx = jnp.where(front, 0, jnp.where(back, 2, 1))
        return jnp.where(
            jnp.asarray(elevation) > self.cfg.overhead_threshold, 3, idx
        ).astype(jnp.int32)

    def get_text_embeddings(self, elevation=None, azimuth=None, **_):
        """No args: the base prompt embedding (L, D).  With per-sample
        elevation/azimuth (B,): view-dependent embeddings (B, L, D)."""
        if (
            elevation is None
            or azimuth is None
            or self.view_embeddings is None
        ):
            return self.text_embedding
        return self.view_embeddings[self.view_index(elevation, azimuth)]


_CLIP_CACHE: dict = {}


def _clip_encode_local(model_dir: str, prompt: str):
    """CLIP text hidden states from a LOCAL diffusers-layout dir, or None.
    The tokenizer/encoder pair is cached per directory (view-dependent
    prompting encodes 5 variants per prompt)."""
    import os

    te = os.path.join(model_dir, "text_encoder")
    tok = os.path.join(model_dir, "tokenizer")
    if not (os.path.isdir(te) and os.path.isdir(tok)):
        return None
    try:  # torch CPU inference, once per prompt variant
        import torch
        from transformers import CLIPTextModel, CLIPTokenizer

        if model_dir not in _CLIP_CACHE:
            _CLIP_CACHE[model_dir] = (
                CLIPTokenizer.from_pretrained(tok),
                CLIPTextModel.from_pretrained(te),
            )
        tokenizer, encoder = _CLIP_CACHE[model_dir]
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
            cfg=self.cfg,
        )
