"""Trivial backgrounds: solid color and random solid color (the defaults the
reference inherits from its host framework's `solid-color-background`)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.registry import register


@dataclasses.dataclass
class SolidColorBackgroundConfig:
    n_output_dims: int = 3
    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    learned: bool = False
    random_aug: bool = False
    random_aug_prob: float = 0.5


@register("solid-color-background")
class SolidColorBackground:
    Config = SolidColorBackgroundConfig

    def __init__(self, cfg=None, **kwargs):
        if cfg is None:
            cfg = SolidColorBackgroundConfig(**kwargs)
        elif isinstance(cfg, dict):
            from ..utils.config import parse_structured

            cfg = parse_structured(SolidColorBackgroundConfig, cfg)
        self.cfg = cfg

    def init_params(self, key=None):
        return {}

    def __call__(self, params, dirs, key=None, training=False):
        color = jnp.asarray(self.cfg.color, jnp.float32)
        out = jnp.broadcast_to(color, dirs.shape[:-1] + (3,))
        if training and self.cfg.random_aug and key is not None:
            k1, k2, k3 = jax.random.split(key, 3)
            use = jax.random.uniform(k1) < self.cfg.random_aug_prob
            rand_color = jnp.broadcast_to(jax.random.uniform(k2, (3,)), out.shape)
            out = jnp.where(use, rand_color, out)
        return out
