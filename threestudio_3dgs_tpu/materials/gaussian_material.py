"""Lambertian point-light material (reference material/gaussian_material.py:13-116).

Functional: `shade(...)` is pure and traced.  The stochastic augmentation
(albedo / textureless / diffuse, reference :80-104) is driven by a JAX PRNG
key instead of host `random.random()`, so one compiled graph covers all
branches via select -- no retraces.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.image import normalize_vec
from ..utils.registry import register


@dataclasses.dataclass
class GaussianMaterialConfig:
    ambient_light_color: Tuple[float, float, float] = (0.1, 0.1, 0.1)
    diffuse_light_color: Tuple[float, float, float] = (0.9, 0.9, 0.9)
    ambient_only_steps: int = 1000
    diffuse_prob: float = 0.75
    textureless_prob: float = 0.5
    soft_shading: bool = False


@register("gaussian-diffuse-with-point-light-material")
class GaussianDiffuseWithPointLightMaterial:
    Config = GaussianMaterialConfig
    requires_normal = True

    def __init__(self, cfg=None, **kwargs):
        if cfg is None:
            cfg = GaussianMaterialConfig(**kwargs)
        elif isinstance(cfg, dict):
            from ..utils.config import parse_structured

            cfg = parse_structured(GaussianMaterialConfig, cfg)
        self.cfg = cfg

    def shade(
        self,
        positions: jnp.ndarray,  # (..., 3)
        shading_normal: jnp.ndarray,  # (..., 3)
        light_positions: jnp.ndarray,  # (..., 3) or (3,)
        albedo: jnp.ndarray,  # (..., 3)
        key: Optional[jnp.ndarray] = None,
        ambient_only=None,  # traced bool (host computes step < ambient_only_steps)
        training: bool = False,
        ambient_ratio: Optional[float] = None,
        shading: Optional[str] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        amb = jnp.asarray(cfg.ambient_light_color, jnp.float32)
        dif = jnp.asarray(cfg.diffuse_light_color, jnp.float32)
        if ambient_ratio is not None:
            dif = jnp.full_like(dif, 1.0 - ambient_ratio)
            amb = jnp.full_like(amb, ambient_ratio)
        elif training and cfg.soft_shading and key is not None:
            key, sub = jax.random.split(key)
            r = jax.random.uniform(sub)
            dif = jnp.full_like(dif, r)
            amb = 1.0 - dif

        light_dirs = normalize_vec(light_positions - positions)
        diffuse_light = (
            jnp.clip(
                jnp.sum(shading_normal * light_dirs, axis=-1, keepdims=True), 0.0, None
            )
            * dif
        )
        textureless = diffuse_light + amb
        shaded = jnp.clip(albedo, 0.0, 1.0) * textureless

        if ambient_only is None:
            ambient_only = jnp.asarray(False)
        if shading == "albedo":
            return albedo
        if shading == "textureless":
            return textureless
        if shading == "diffuse":
            return shaded
        if not training or key is None:
            # eval: albedo during warmup, shaded afterwards (reference :95-100)
            return jnp.where(ambient_only, albedo, shaded)
        # stochastic augmentation, one draw per call (whole batch shares it,
        # matching the reference's per-step host randomness :80-93)
        k1, k2 = jax.random.split(key)
        u1 = jax.random.uniform(k1)
        u2 = jax.random.uniform(k2)
        mode = jnp.where(
            ambient_only | (u1 > cfg.diffuse_prob),
            0,  # albedo
            jnp.where(u2 < cfg.textureless_prob, 1, 2),
        )
        stacked = jnp.stack([albedo, textureless, shaded])
        return stacked[mode]
