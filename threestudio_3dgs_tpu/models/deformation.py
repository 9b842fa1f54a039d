"""HexPlane / K-planes deformation field (functional JAX).

Re-implementation of the reference's 4D deformation network
(reference geometry/deformation.py:177-545): six (coordinate-pair) 2D feature
planes per scale, bilinear sampling, feature product over planes, concat over
multires scales [1, 2, 4, 8], a trunk MLP and four heads emitting residual
deltas for position / scale / rotation / opacity.  Head weights can be
zero-initialized so the deformation starts as identity (reference :346-368).

Params are a plain dict pytree (lives inside the system's extra_params, so
the same Adam path trains it); all functions are pure and jittable."""

from __future__ import annotations

import dataclasses
import itertools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class DeformationConfig:
    # mirrors ModelHiddenParams (reference deformation.py:47-70)
    net_width: int = 64
    defor_depth: int = 1
    bounds: float = 1.0
    grid_out_dim: int = 32
    grid_resolution: Tuple[int, int, int, int] = (64, 64, 64, 25)
    multires: Tuple[int, ...] = (1, 2, 4, 8)
    no_grid: bool = False
    no_ds: bool = False
    no_dr: bool = False
    no_do: bool = True
    use_res: bool = True  # zero-init residual heads


_COO_COMBS = list(itertools.combinations(range(4), 2))  # 6 planes


def init_deformation_params(key, cfg: DeformationConfig) -> Dict[str, Any]:
    params: Dict[str, Any] = {"grids": []}
    for res_mult in cfg.multires:
        scale_planes = []
        reso = [r * res_mult for r in cfg.grid_resolution[:3]] + [
            cfg.grid_resolution[3]
        ]
        for comb in _COO_COMBS:
            key, sub = jax.random.split(key)
            h, w = reso[comb[1]], reso[comb[0]]
            if 3 in comb:  # time planes init to 1 (reference :132-136)
                plane = jnp.ones((cfg.grid_out_dim, h, w))
            else:
                plane = jax.random.uniform(
                    sub, (cfg.grid_out_dim, h, w), minval=0.1, maxval=0.5
                )
            scale_planes.append(plane)
        params["grids"].append(scale_planes)

    feat_dim = cfg.grid_out_dim * len(cfg.multires)
    w = cfg.net_width

    def linear(key, din, dout, zero=False):
        if zero:
            return {"w": jnp.zeros((din, dout)), "b": jnp.zeros(dout)}
        k1, key = jax.random.split(key)
        scale = (2.0 / din) ** 0.5
        return {"w": jax.random.normal(k1, (din, dout)) * scale, "b": jnp.zeros(dout)}

    key, *ks = jax.random.split(key, 8)
    trunk = [linear(ks[0], feat_dim, w)]
    for i in range(cfg.defor_depth - 1):
        key, sub = jax.random.split(key)
        trunk.append(linear(sub, w, w))
    params["trunk"] = trunk
    zero = cfg.use_res
    params["head_pos"] = [linear(ks[1], w, w, zero), linear(ks[2], w, 3, zero)]
    params["head_scale"] = [linear(ks[3], w, w, zero), linear(ks[4], w, 3, zero)]
    params["head_rot"] = [linear(ks[5], w, w, zero), linear(ks[6], w, 4, zero)]
    key, k7, k8 = jax.random.split(key, 3)
    params["head_opacity"] = [linear(k7, w, w, zero), linear(k8, w, 1, zero)]
    return params


def _grid_sample_2d(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample: plane (C, H, W), coords (N, 2) in [-1, 1]
    (align_corners=True, border padding -- torch grid_sample semantics)."""
    c, h, w = plane.shape
    x = (coords[:, 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (h - 1)
    x0 = jnp.clip(jnp.floor(x), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    x0i, x1i, y0i, y1i = (v.astype(jnp.int32) for v in (x0, x1, y0, y1))
    p00 = plane[:, y0i, x0i]  # (C, N)
    p01 = plane[:, y0i, x1i]
    p10 = plane[:, y1i, x0i]
    p11 = plane[:, y1i, x1i]
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    return (top * (1 - fy) + bot * fy).T  # (N, C)


def hexplane_features(
    params: Dict[str, Any], cfg: DeformationConfig, xyz: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """xyz (N, 3) world, t (N,) in [-1, 1] -> features (N, 32 * n_scales)."""
    pts = jnp.clip(xyz / cfg.bounds, -1.0, 1.0)
    coords4 = jnp.concatenate([pts, t[:, None]], axis=1)  # (N, 4)
    outs = []
    for scale_planes in params["grids"]:
        interp = 1.0
        for plane, comb in zip(scale_planes, _COO_COMBS):
            interp = interp * _grid_sample_2d(plane, coords4[:, list(comb)])
        outs.append(interp)
    return jnp.concatenate(outs, axis=-1)


def _mlp(layers: List[Dict[str, jnp.ndarray]], x, relu_first=False):
    for i, layer in enumerate(layers):
        if relu_first or i > 0:
            x = jax.nn.relu(x)
        x = x @ layer["w"] + layer["b"]
    return x


def deformation_apply(
    params: Dict[str, Any],
    cfg: DeformationConfig,
    xyz: jnp.ndarray,  # (N, 3)
    scaling: jnp.ndarray,  # (N, 3) raw (pre-activation)
    rotation: jnp.ndarray,  # (N, 4) raw
    opacity: jnp.ndarray,  # (N, 1) raw
    t: jnp.ndarray,  # (N,) in [-1, 1] (timestamp * 2 - 1)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """forward_dynamic semantics (reference deformation.py:397-440):
    residual deltas on raw parameters."""
    feats = hexplane_features(params, cfg, xyz, t)
    hidden = _mlp(params["trunk"], feats)
    dx = _mlp(params["head_pos"], hidden, relu_first=True)
    new_xyz = xyz + dx
    new_scaling = scaling if cfg.no_ds else scaling + _mlp(
        params["head_scale"], hidden, relu_first=True
    )
    new_rotation = rotation if cfg.no_dr else rotation + _mlp(
        params["head_rot"], hidden, relu_first=True
    )
    new_opacity = opacity if cfg.no_do else opacity + _mlp(
        params["head_opacity"], hidden, relu_first=True
    )
    return new_xyz, new_scaling, new_rotation, new_opacity


def deformation_xyz_rotation(
    params, cfg, xyz, rotation, t
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """forward_dynamic_xyz_and_rotation (reference :435-441): deltas only."""
    feats = hexplane_features(params, cfg, xyz, t)
    hidden = _mlp(params["trunk"], feats)
    dx = _mlp(params["head_pos"], hidden, relu_first=True)
    dr = _mlp(params["head_rot"], hidden, relu_first=True)
    return dx, dr
