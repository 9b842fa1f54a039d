"""Minimal per-frame dynamic Gaussians (reference geometry/gaussian_dynamic.py
:33-77): the spacetime field restricted to per-frame delta_xyz/delta_rot.
The reference registers both delta params under the name "normal" in its
optimizer -- a documented bug (SURVEY.md quirks) not replicated here."""

from __future__ import annotations

from ..utils.registry import register
from .spacetime import SpacetimeConfig, SpacetimeGaussianField


@register("gaussian-splatting-dynamic")
class GaussianDynamicModel(SpacetimeGaussianField):
    Config = SpacetimeConfig

    def __init__(self, cfg=None, **kwargs):
        if isinstance(cfg, dict):
            cfg = dict(cfg)
            cfg.setdefault("enable_dynamic", True)
            cfg.setdefault("enable_spacetime", False)
            cfg.setdefault("use_spline", False)
        super().__init__(cfg, **kwargs)
