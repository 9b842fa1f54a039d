"""Tile binning: expand (Gaussian x covered-tile) pairs into a static-capacity
table, sort by tile with depth order preserved, and compute per-tile ranges.

This reproduces the CUDA rasterizer's duplicate-with-keys + radix-sort +
identifyTileRanges pipeline (SURVEY.md section 2.2) with static shapes:

  1. argsort Gaussians by view depth once (globally).  Any subsequence is then
     depth-ordered, so the pair sort only needs the tile id as key with a
     stable sort -- cheaper than the CUDA (tile|depth) 64-bit key.
  2. per-Gaussian tile counts -> exclusive cumsum offsets; pair p maps back to
     itsAussian via searchsorted(offsets, p) and to its tile via the rect
     row/col decomposition of (p - offset).
  3. pairs beyond `max_pairs` capacity are dropped (they are the globally
     deepest Gaussians; `n_dropped` is reported, never silently wrong).

Everything here is index math: wrapped in stop_gradient by the caller.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import Projected


class Binning(NamedTuple):
    pair_gauss: jnp.ndarray  # (P,) int32 original Gaussian index per pair
    pair_tile: jnp.ndarray  # (P,) int32 tile id per pair (num_tiles = invalid)
    tile_ranges: jnp.ndarray  # (T + 1,) int32; tile t owns [r[t], r[t+1])
    n_pairs: jnp.ndarray  # () int32 valid pairs (<= max_pairs)
    n_dropped: jnp.ndarray  # () int32 pairs dropped due to capacity
    depth_order: jnp.ndarray  # (N,) int32 Gaussian indices sorted by depth


def bin_gaussians(
    proj: Projected,
    grid_x: int,
    grid_y: int,
    max_pairs: int,
) -> Binning:
    n = proj.depths.shape[0]
    num_tiles = grid_x * grid_y

    # ---- global depth sort (invisible last) ------------------------------
    sort_depth = jnp.where(proj.visible, proj.depths, jnp.inf)
    depth_order = jnp.argsort(sort_depth).astype(jnp.int32)

    rect_w = (proj.tiles_max[:, 0] - proj.tiles_min[:, 0]).astype(jnp.int32)
    rect_h = (proj.tiles_max[:, 1] - proj.tiles_min[:, 1]).astype(jnp.int32)
    counts = jnp.where(proj.visible, rect_w * rect_h, 0).astype(jnp.int32)

    counts_sorted = counts[depth_order]
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts_sorted)[:-1]]
    )
    total = offsets[-1] + counts_sorted[-1]
    n_pairs = jnp.minimum(total, max_pairs)
    n_dropped = total - n_pairs

    # ---- expand pairs ----------------------------------------------------
    p = jnp.arange(max_pairs, dtype=jnp.int32)
    slot = jnp.searchsorted(offsets, p, side="right").astype(jnp.int32) - 1
    slot = jnp.clip(slot, 0, n - 1)
    g = depth_order[slot]
    r = p - offsets[slot]
    w = jnp.maximum(rect_w[g], 1)
    tx = proj.tiles_min[g, 0] + r % w
    ty = proj.tiles_min[g, 1] + r // w
    tile_id = ty * grid_x + tx
    valid = p < n_pairs
    key = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)

    # ---- stable sort by tile (keeps depth order within a tile) -----------
    sorted_key, sorted_gauss = jax.lax.sort(
        (key, g.astype(jnp.int32)), is_stable=True, num_keys=1
    )

    # ---- per-tile ranges -------------------------------------------------
    tile_ranges = jnp.searchsorted(
        sorted_key, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    return Binning(
        pair_gauss=sorted_gauss,
        pair_tile=sorted_key,
        tile_ranges=tile_ranges,
        n_pairs=n_pairs,
        n_dropped=n_dropped,
        depth_order=depth_order,
    )
