"""Neural environment-map background (reference
background/gaussian_mvdream_background.py:14-72).

The reference uses tiny-cuda-nn's SphericalHarmonics encoding (degree 3) +
VanillaMLP (2x16, ReLU) + sigmoid.  Here: our SH basis (ops.sh) + a plain
parameterized MLP in jnp -- a few thousand FLOPs per ray, fused by XLA.
Params live in the training state (functional), not in the module object.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.sh import sh_basis
from ..utils.registry import register


@dataclasses.dataclass
class NeuralEnvBackgroundConfig:
    # only 'sigmoid' supported (what every reference config uses)
    color_activation: str = "sigmoid"
    n_output_dims: int = 3
    sh_degree: int = 3  # dir_encoding degree (tcnn SphericalHarmonics deg 3)
    n_neurons: int = 16
    n_hidden_layers: int = 2
    random_aug: bool = False
    random_aug_prob: float = 0.5
    eval_color: Optional[Tuple[float, float, float]] = None
    share_aug_bg: bool = False


@register("gaussian-mvdream-neural-environment-map-background")
class NeuralEnvironmentMapBackground:
    Config = NeuralEnvBackgroundConfig

    def __init__(self, cfg=None, **kwargs):
        if cfg is None:
            cfg = NeuralEnvBackgroundConfig(**kwargs)
        elif isinstance(cfg, dict):
            from ..utils.config import parse_structured

            cfg = parse_structured(NeuralEnvBackgroundConfig, cfg)
        self.cfg = cfg
        # tcnn SH encoding degree d emits d^2 features (degree is 1-indexed)
        self.in_dim = self.cfg.sh_degree ** 2

    def init_params(self, key) -> Dict[str, Any]:
        cfg = self.cfg
        dims = [self.in_dim] + [cfg.n_neurons] * cfg.n_hidden_layers + [
            cfg.n_output_dims
        ]
        params = {}
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            key, sub = jax.random.split(key)
            scale = (2.0 / din) ** 0.5
            params[f"w{i}"] = jax.random.normal(sub, (din, dout)) * scale
            params[f"b{i}"] = jnp.zeros(dout)
        return params

    def __call__(
        self,
        params: Dict[str, Any],
        dirs: jnp.ndarray,  # (..., 3) normalized view directions
        key: Optional[jnp.ndarray] = None,
        training: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        if not training and cfg.eval_color is not None:
            return jnp.broadcast_to(
                jnp.asarray(cfg.eval_color, jnp.float32), dirs.shape[:-1] + (3,)
            )
        # the reference rescales dirs to (0,1) before the tcnn encoding; our
        # SH basis takes the raw unit vectors -- same expressive family
        x = sh_basis(dirs, cfg.sh_degree - 1)
        n_layers = cfg.n_hidden_layers + 1
        for i in range(n_layers):
            x = x @ params[f"w{i}"] + params[f"b{i}"]
            if i < n_layers - 1:
                x = jax.nn.relu(x)
        color = jax.nn.sigmoid(x)
        if training and cfg.random_aug and key is not None:
            k1, k2 = jax.random.split(key)
            use = jax.random.uniform(k1) < cfg.random_aug_prob
            value = (jax.random.uniform(k2) < 0.5).astype(jnp.float32)
            color = jnp.where(use, jnp.full_like(color, value), color)
        return color
