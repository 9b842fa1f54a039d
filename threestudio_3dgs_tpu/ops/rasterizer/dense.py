"""Dense differentiable renderer (tests only): vectorizes the blend over ALL
depth-sorted Gaussians x pixels with no binning, using plain `jnp.cumprod`, so
JAX autodiff can differentiate straight through it.  Its gradients validate
the hand-derived VJP of the production blend (SURVEY.md section 4, level 1).

Matches the tiled kernels' semantics bit-for-bit in f32-exact arithmetic:
tile-rect membership gating (not a per-pixel radius test), alpha skip rules,
and the raw-transmittance threshold form of early termination.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .blend_jax import ALPHA_MAX, ALPHA_MIN, T_EPS


def dense_render(
    means2d,  # (N, 2)
    depths,  # (N,)
    conics,  # (N, 3)
    colors,  # (N, C)
    opacities,  # (N,)
    visible,  # (N,) bool
    tiles_min,  # (N, 2) int32
    tiles_max,  # (N, 2) int32
    height: int,
    width: int,
    tile_size: int,
):
    """Returns (image (H, W, C), alpha (H, W))."""
    n, c = colors.shape
    order = jnp.argsort(jnp.where(visible, depths, jnp.inf))
    means2d = means2d[order]
    conics = conics[order]
    colors = colors[order]
    opacities = opacities[order]
    visible = visible[order]
    tiles_min = tiles_min[order]
    tiles_max = tiles_max[order]

    xs = jnp.arange(width, dtype=jnp.float32)
    ys = jnp.arange(height, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys, indexing="xy")  # (H, W)
    px = px.reshape(-1)
    py = py.reshape(-1)
    tile_x = (px // tile_size).astype(jnp.int32)
    tile_y = (py // tile_size).astype(jnp.int32)

    dx = px[None, :] - means2d[:, 0:1]
    dy = py[None, :] - means2d[:, 1:2]
    ca, cb, cc = conics[:, 0:1], conics[:, 1:2], conics[:, 2:3]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    gauss = jnp.exp(jnp.minimum(power, 0.0))
    alpha = opacities[:, None] * gauss
    in_rect = (
        (tile_x[None, :] >= tiles_min[:, 0:1])
        & (tile_x[None, :] < tiles_max[:, 0:1])
        & (tile_y[None, :] >= tiles_min[:, 1:2])
        & (tile_y[None, :] < tiles_max[:, 1:2])
    )
    ok = (power <= 0.0) & (alpha >= ALPHA_MIN) & in_rect & visible[:, None]
    alpha = jnp.where(ok, jnp.minimum(alpha, ALPHA_MAX), 0.0)

    cum_incl = jnp.cumprod(1.0 - alpha, axis=0)
    include = cum_incl >= T_EPS
    cum_excl = jnp.concatenate([jnp.ones((1, alpha.shape[1])), cum_incl[:-1]], 0)
    w = jnp.where(include, alpha * cum_excl, 0.0)  # (N, HW)
    img = jnp.einsum("np,nc->pc", w, colors, precision=jax.lax.Precision.HIGHEST)
    alpha_map = jnp.sum(w, axis=0)
    return img.reshape(height, width, c), alpha_map.reshape(height, width)
