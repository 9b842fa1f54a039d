"""Null material (`no-material` in reference configs, provided by the host
framework there)."""

from __future__ import annotations

import dataclasses

from ..utils.registry import register


@dataclasses.dataclass
class NoMaterialConfig:
    n_output_dims: int = 3
    color_activation: str = "sigmoid"


@register("no-material")
class NoMaterial:
    Config = NoMaterialConfig
    requires_normal = False

    def __init__(self, cfg=None, **kwargs):
        if cfg is None:
            cfg = NoMaterialConfig(**kwargs)
        elif isinstance(cfg, dict):
            from ..utils.config import parse_structured

            cfg = parse_structured(NoMaterialConfig, cfg)
        self.cfg = cfg

    def shade(self, positions, shading_normal, light_positions, albedo, **kwargs):
        return albedo
