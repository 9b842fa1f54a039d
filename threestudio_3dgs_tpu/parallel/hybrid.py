"""Hybrid 2D-mesh rendering: cameras sharded on one axis, image tile-rows on
the other.

Composes the two scaling axes this workload has (SURVEY.md section 2.4; the
reference renders a camera batch in a sequential loop on one GPU): on a
(data, tile) `jax.sharding.Mesh`, device (i, j) renders tile-row band j of
camera shard i against the replicated Gaussian set.  This is the layout for
pod-scale rendering: camera parallelism amortizes the batch, tile parallelism
scales a SINGLE high-resolution view beyond one chip, and per-Gaussian
parameter gradients all-reduce over BOTH mesh axes via the shard_map
transpose of the replicated inputs (one fused psum over the 2D mesh, riding
ICI).

Per-pixel results are bit-identical to the single-device batched render: a
band contains exactly the pairs whose tiles fall inside it, in the same
per-tile depth order (see ops/rasterizer/api.py `tile_band`).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec

from ..ops.rasterizer import RasterizeConfig, rasterize


def _shard_map(fn, **specs):
    try:
        from jax import shard_map

        return shard_map(fn, check_vma=False, **specs)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map

        return shard_map(fn, check_rep=False, **specs)


def make_hybrid_rasterize(
    mesh: Mesh,
    cameras,  # sequence of B Camera (equal sizes)
    bg_color,
    data_axis: str = "data",
    tile_axis: str = "tile",
    with_depth: bool = True,
    config: RasterizeConfig = RasterizeConfig(),
):
    """Build a 2D-mesh sharded batch renderer over replicated Gaussians.

    Returns f(means3d, scales, quats, opacities, colors) -> dict with the
    global image (B, H, W, 3) sharded (data_axis, tile_axis) over (B, H),
    alpha/depth likewise, plus replicated radii (B, N) and band-union
    visibility (B, N).  Differentiable: the shard_map transpose psums
    per-Gaussian grads over both mesh axes."""
    b = len(cameras)
    n_cam = mesh.shape[data_axis]
    n_band = mesh.shape[tile_axis]
    assert b % n_cam == 0, (b, n_cam)
    local_b = b // n_cam
    height, width = cameras[0].height, cameras[0].width
    ts = config.tile_size
    assert height % (ts * n_band) == 0, (
        f"height {height} must split into {n_band} tile-row bands"
    )
    band_rows = height // ts // n_band

    def device_render(means3d, scales, quats, opacities, colors):
        ci = jax.lax.axis_index(data_axis)
        r0 = jax.lax.axis_index(tile_axis) * band_rows
        outs = []
        for v in range(local_b):
            # local camera v of shard ci: select the traced camera pytree by
            # global index (cameras are host-side python objects with traced
            # array leaves; switch over the static list)
            def render_with(cam):
                return rasterize(
                    means3d,
                    scales,
                    quats,
                    opacities,
                    cam,
                    bg_color,
                    colors=colors,
                    with_depth=with_depth,
                    config=config,
                    tile_band=(r0, band_rows),
                )

            branches = [
                (lambda cam=cameras[c * local_b + v]: render_with(cam))
                for c in range(n_cam)
            ]
            outs.append(jax.lax.switch(ci, branches))
        img = jnp.stack([o["image"] for o in outs])  # (local_b, band_h, W, 3)
        alpha = jnp.stack([o["alpha"] for o in outs])
        vis = jnp.stack([o["visibility"] for o in outs])
        vis = jax.lax.psum(vis.astype(jnp.int32), tile_axis) > 0
        radii = jnp.stack([o["radii"] for o in outs])
        n_dropped = jax.lax.psum(
            sum(o["n_dropped"] for o in outs), (data_axis, tile_axis)
        )
        n_pairs = jax.lax.pmax(
            sum(o["n_pairs"] for o in outs), (data_axis, tile_axis)
        )
        res = {
            "image": img,
            "alpha": alpha,
            "radii": radii,
            "visibility": vis,
            "n_pairs": n_pairs,
            "n_dropped": n_dropped,
        }
        if with_depth:
            res["depth"] = jnp.stack([o["depth"] for o in outs])
        return res

    repl = PartitionSpec()
    img_spec = PartitionSpec(data_axis, tile_axis)  # (B, H, ...)
    cam_spec = PartitionSpec(data_axis)
    out_specs = {
        "image": img_spec,
        "alpha": img_spec,
        "radii": cam_spec,
        "visibility": cam_spec,
        "n_pairs": repl,
        "n_dropped": repl,
    }
    if with_depth:
        out_specs["depth"] = img_spec

    return _shard_map(
        device_render,
        mesh=mesh,
        in_specs=(repl,) * 5,
        out_specs=out_specs,
    )
