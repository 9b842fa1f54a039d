"""NumPy golden oracle for the rasterizer (tests only; never on the hot path).

An intentionally *independent* re-derivation of the CUDA renderCUDA loop
(SURVEY.md section 4, test level 1): per Gaussian in depth order, sequential
front-to-back blending with the exact termination semantics --

    alpha = min(0.99, opacity * exp(power));  skip if power > 0 or alpha < 1/255
    test_T = T * (1 - alpha); if test_T < 1e-4: done (gaussian NOT blended)
    C += color * alpha * T;  D += depth * alpha * T;  T = test_T

The production blend expresses the same recurrence as a vectorized
cumprod-with-threshold (valid because T is monotone non-increasing); testing
against this sequential version proves that equivalence.

Inclusion is by tile-rect membership, exactly like the tiled CUDA kernel: a
pixel evaluates a Gaussian iff its tile lies in the Gaussian's rect -- there
is no per-pixel radius test.
"""

from __future__ import annotations

import numpy as np


def oracle_render(
    means2d: np.ndarray,  # (N, 2) pixel coords
    depths: np.ndarray,  # (N,)
    conics: np.ndarray,  # (N, 3)
    colors: np.ndarray,  # (N, C)
    opacities: np.ndarray,  # (N,)
    visible: np.ndarray,  # (N,) bool
    tiles_min: np.ndarray,  # (N, 2) int
    tiles_max: np.ndarray,  # (N, 2) int
    height: int,
    width: int,
    tile_size: int,
):
    """Returns (image (H, W, C), alpha (H, W), contrib_T (H, W) final
    transmittance)."""
    n, c = colors.shape
    image = np.zeros((height, width, c), np.float64)
    trans = np.ones((height, width), np.float64)
    done = np.zeros((height, width), bool)

    xs = np.arange(width, dtype=np.float64)
    ys = np.arange(height, dtype=np.float64)
    px, py = np.meshgrid(xs, ys, indexing="xy")  # (H, W)
    tile_x = (np.arange(width) // tile_size)[None, :].repeat(height, 0)
    tile_y = (np.arange(height) // tile_size)[:, None].repeat(width, 1)

    order = np.argsort(np.where(visible, depths, np.inf), kind="stable")
    for i in order:
        if not visible[i]:
            continue
        in_rect = (
            (tile_x >= tiles_min[i, 0])
            & (tile_x < tiles_max[i, 0])
            & (tile_y >= tiles_min[i, 1])
            & (tile_y < tiles_max[i, 1])
        )
        dx = px - means2d[i, 0]
        dy = py - means2d[i, 1]
        a, b, cc = conics[i]
        power = -0.5 * (a * dx * dx + cc * dy * dy) - b * dx * dy
        alpha = np.minimum(0.99, opacities[i] * np.exp(power))
        contribute = in_rect & (power <= 0.0) & (alpha >= 1.0 / 255.0) & ~done
        test_t = trans * (1.0 - alpha)
        newly_done = contribute & (test_t < 1e-4)
        blend = contribute & ~newly_done
        w = np.where(blend, alpha * trans, 0.0)
        image += w[..., None] * colors[i][None, None, :]
        trans = np.where(blend, test_t, trans)
        done |= newly_done
    return image, 1.0 - trans, trans
