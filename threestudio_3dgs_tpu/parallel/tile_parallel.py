"""Tile-sharded (intra-view) multi-chip rendering.

The second sharding axis from BASELINE.json's north star ("image tiles
sharded across devices, Gaussians replicated, per-Gaussian parameter
gradients all-reduced via psum"): each device renders one horizontal band of
tile rows against the replicated Gaussian set, so a SINGLE view scales across
chips -- the regime where camera data-parallelism (parallel/data_parallel.py)
has nothing to shard (e.g. the zero123 reference substep renders one fixed
camera, reference system/gaussian_zero123.py:115).

Mechanics: `rasterize(..., tile_band=(row0, rows))` runs the full-camera
projection (identical means2d/conics/radii on every device) and bins/blends
only the band, with pixel y re-based.  Inside shard_map the band index comes
from lax.axis_index, the (H_band, W, C) outputs concatenate along H via the
output sharding, and the backward of the replicated-in/sharded-out function
psums the per-Gaussian gradients over the mesh axis automatically (shard_map
transpose).  Per-pixel results are bit-identical to the single-device render:
a band contains exactly the pairs whose tile falls inside it, in the same
per-tile depth order.

The reference has no distributed execution at all (SURVEY.md section 2.4);
this component is designed TPU-first rather than ported.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec

from ..ops.rasterizer import RasterizeConfig, rasterize



def make_tile_parallel_rasterize(
    mesh: Mesh,
    axis: str,
    camera,
    bg_color,
    with_depth: bool = True,
    config: RasterizeConfig = RasterizeConfig(),
):
    """Build a shard_map'd single-view renderer: Gaussians replicated, image
    tile-rows sharded over `axis`.  Returns
    f(means3d, scales, quats, opacities, colors) -> dict with the global
    (H, W, *) image/alpha/depth (sharded along H), replicated radii, and the
    band-union visibility.  Differentiable: per-Gaussian grads psum over
    `axis` via the shard_map transpose of the replicated inputs."""
    n_dev = mesh.shape[axis]
    ts = config.tile_size
    assert camera.height % (ts * n_dev) == 0, (
        f"height {camera.height} must split into {n_dev} tile-row bands"
    )
    band_rows = camera.height // ts // n_dev

    def band_render(means3d, scales, quats, opacities, colors):
        r0 = jax.lax.axis_index(axis) * band_rows
        out = rasterize(
            means3d,
            scales,
            quats,
            opacities,
            camera,
            bg_color,
            colors=colors,
            with_depth=with_depth,
            config=config,
            tile_band=(r0, band_rows),
        )
        # visibility is band-local; union it so every device returns the
        # same replicated value (what the densifier reads)
        vis = jax.lax.psum(out["visibility"].astype(jnp.int32), axis) > 0
        n_dropped = jax.lax.psum(out["n_dropped"], axis)
        n_pairs = jax.lax.pmax(out["n_pairs"], axis)
        res = {
            "image": out["image"],
            "alpha": out["alpha"],
            "radii": out["radii"],
            "visibility": vis,
            "n_pairs": n_pairs,
            "n_dropped": n_dropped,
        }
        if with_depth:
            res["depth"] = out["depth"]
        return res

    repl = PartitionSpec()
    row_sharded = PartitionSpec(axis)
    out_specs = {
        "image": row_sharded,
        "alpha": row_sharded,
        "radii": repl,
        "visibility": repl,
        "n_pairs": repl,
        "n_dropped": repl,
    }
    if with_depth:
        out_specs["depth"] = row_sharded

    specs = dict(mesh=mesh, in_specs=(repl,) * 5, out_specs=out_specs)
    try:
        from jax import shard_map

        return shard_map(band_render, check_vma=False, **specs)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map

        return shard_map(band_render, check_rep=False, **specs)
