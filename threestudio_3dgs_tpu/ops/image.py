"""Small image-space ops used by the renderer variants."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_to_normal(xyz_map: jnp.ndarray) -> jnp.ndarray:
    """Screen-space normals from an xyz map (H, W, 3) via central differences.

    Matches the reference Depth2Normal conv (reference
    renderer/diff_gaussian_rasterizer_normal.py:22-51): ddx kernel [-1, 0, 1]
    along x, ddy along y (zero padding), normal = -cross(ddx, ddy).
    """
    padded = jnp.pad(xyz_map, ((1, 1), (1, 1), (0, 0)))
    ddx = padded[1:-1, 2:] - padded[1:-1, :-2]
    ddy = padded[2:, 1:-1] - padded[:-2, 1:-1]
    normal = -jnp.cross(ddx, ddy)
    return normal


def normalize_vec(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Gradient-safe L2 normalize: zero vectors map to zero with FINITE
    gradients.  `v / max(norm(v), eps)` is NOT safe -- the reverse-mode
    derivative of norm at v=0 is NaN and 0*NaN poisons the whole backward
    pass (this silently NaN'd every shading/normal-renderer config: the
    background pixels of the depth->normal map are exactly zero)."""
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    is_zero = sq < eps * eps
    safe_sq = jnp.where(is_zero, 1.0, sq)  # double-where: keep rsqrt off 0
    return jnp.where(is_zero, 0.0, v * jax.lax.rsqrt(safe_sq))
