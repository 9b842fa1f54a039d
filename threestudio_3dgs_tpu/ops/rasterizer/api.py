"""Public rasterization API: the TPU-native replacement for the CUDA
`GaussianRasterizer` call (reference renderer/diff_gaussian_rasterizer.py:122-131
and the ashawkey 4-tuple variant at renderer/diff_gaussian_rasterizer_advanced.py:122).

Pipeline:  project (pure JAX, autodiff) -> bin (index math, stop-gradient) ->
gather per-pair features (autodiff gather; its transpose is the per-Gaussian
gradient scatter-add) -> blend (custom VJP; Pallas kernel on TPU, portable JAX
twin elsewhere) -> assemble channels + background composite.

One kernel pass blends every requested channel (rgb, view depth, arbitrary
extra features such as per-Gaussian normals) plus the implicit weight-sum
channel (= alpha map), where the reference needs separate rasterizer calls
per quantity (e.g. renderer/diff_gaussian_rasterizer_normal.py:175-187).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import Camera
from . import blend_jax
from .binning import bin_gaussians_with_feats, pair_gather, pair_select
from .preprocess import project_gaussians, sh_colors


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    tile_size: int = 32
    max_pairs: int = 2**21
    impl: str = "auto"  # 'pallas' | 'jax' | 'auto' (pallas on TPU)


def _resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    return "pallas" if jax.default_backend() == "tpu" else "jax"


# ---------------------------------------------------------------------------
# Blend with custom VJP (the only hand-differentiated boundary)
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _blend(pair_feats, tile_ranges, grid_x, grid_y, tile_size, n_channels, impl):
    return _blend_fwd_impl(
        pair_feats, tile_ranges, grid_x, grid_y, tile_size, n_channels, impl
    )


def _blend_fwd_impl(pair_feats, tile_ranges, grid_x, grid_y, tile_size, n_channels, impl):
    if impl == "pallas":
        from .blend_pallas import blend_forward_pallas

        return blend_forward_pallas(
            pair_feats, tile_ranges, grid_x, grid_y, tile_size, n_channels
        )
    return blend_jax.blend_forward(
        pair_feats, tile_ranges, grid_x, grid_y, tile_size, n_channels
    )


def _blend_fwd(pair_feats, tile_ranges, grid_x, grid_y, tile_size, n_channels, impl):
    out = _blend_fwd_impl(
        pair_feats, tile_ranges, grid_x, grid_y, tile_size, n_channels, impl
    )
    return out, (pair_feats, tile_ranges, out)


def _blend_bwd(grid_x, grid_y, tile_size, n_channels, impl, res, g_out):
    pair_feats, tile_ranges, out = res
    if impl == "pallas":
        from .blend_pallas import blend_backward_pallas

        d_feats = blend_backward_pallas(
            pair_feats, tile_ranges, out, g_out, grid_x, grid_y, tile_size, n_channels
        )
    else:
        d_feats = blend_jax.blend_backward(
            pair_feats, tile_ranges, out, g_out, grid_x, grid_y, tile_size, n_channels
        )
    zero_int = np.zeros(tile_ranges.shape, jax.dtypes.float0)
    return (d_feats, zero_int)


_blend.defvjp(_blend_fwd, _blend_bwd)


# ---------------------------------------------------------------------------
# Top-level rasterize
# ---------------------------------------------------------------------------


def rasterize(
    means3d: jnp.ndarray,  # (N, 3)
    scales: jnp.ndarray,  # (N, 3) activated
    quats: jnp.ndarray,  # (N, 4)
    opacities: jnp.ndarray,  # (N,) activated
    camera: Camera,
    bg_color: jnp.ndarray,  # (3,)
    colors: Optional[jnp.ndarray] = None,  # (N, 3) precomputed (colors_precomp)
    sh_coeffs: Optional[jnp.ndarray] = None,  # (N, K, 3)
    sh_degree: int = 0,
    extra_features: Optional[jnp.ndarray] = None,  # (N, E) blended linearly
    alive: Optional[jnp.ndarray] = None,  # (N,) bool capacity mask
    means2d_offset: Optional[jnp.ndarray] = None,  # (N, 2) grad side-channel
    scaling_modifier: float = 1.0,
    with_depth: bool = True,
    config: RasterizeConfig = RasterizeConfig(),
    tile_band: Optional[tuple] = None,  # (row0_tiles traced, n_tile_rows static)
) -> Dict[str, Any]:
    """Render one view.  Returns a dict with:
      image (H, W, 3)  rgb composited over bg_color
      alpha (H, W)     1 - final transmittance
      depth (H, W)     alpha-weighted view depth (no bg), if with_depth
      extra (H, W, E)  blended extra features, if given
      radii (N,), visibility (N,), n_pairs, n_dropped

    With `tile_band = (row0, rows)` only the horizontal band of tile rows
    [row0, row0 + rows) is rendered (H becomes rows * tile_size): projection
    runs against the FULL camera (identical means2d/conic/radii and
    gradients), then tile rects are clipped + re-based and pixel y
    coordinates shift into band space.  This is the per-device body of the
    tile-sharded multi-chip renderer (parallel/tile_parallel.py): each chip
    renders one band, per-Gaussian grads psum over the mesh axis.  `row0`
    may be traced (lax.axis_index); `rows` must be static."""
    height, width = camera.height, camera.width
    ts = config.tile_size
    grid_x = (width + ts - 1) // ts
    grid_y = (height + ts - 1) // ts

    proj = project_gaussians(
        means3d,
        scales,
        quats,
        camera,
        tile_size=ts,
        scaling_modifier=scaling_modifier,
        alive=alive,
        means2d_offset=means2d_offset,
    )

    if tile_band is not None:
        row0, n_tile_rows = tile_band
        r0 = jnp.asarray(row0, jnp.int32)
        grid_y = int(n_tile_rows)
        height = grid_y * ts
        tmin_y = jnp.clip(proj.tiles_min[:, 1], r0, r0 + grid_y) - r0
        tmax_y = jnp.clip(proj.tiles_max[:, 1], r0, r0 + grid_y) - r0
        band_shift = jnp.stack(
            [jnp.zeros((), jnp.float32), (r0 * ts).astype(jnp.float32)]
        )
        proj = proj._replace(
            means2d=proj.means2d - band_shift,
            tiles_min=jnp.stack([proj.tiles_min[:, 0], tmin_y], axis=1),
            tiles_max=jnp.stack([proj.tiles_max[:, 0], tmax_y], axis=1),
            visible=proj.visible & (tmax_y > tmin_y),
        )

    if colors is None:
        if sh_coeffs is None:
            raise ValueError("provide colors or sh_coeffs")
        colors = sh_colors(means3d, sh_coeffs, camera.campos, sh_degree)
    chans = [colors]
    if with_depth:
        chans.append(proj.depths[:, None])
    if extra_features is not None:
        chans.append(extra_features)
    channels = jnp.concatenate(chans, axis=1)  # (N, C)
    n_channels = channels.shape[1]

    binning, pair_feats_fused = bin_gaussians_with_feats(
        jax.tree_util.tree_map(jax.lax.stop_gradient, proj), grid_x, grid_y,
        config.max_pairs, ts, opacities, channels,
    )

    # per-pair features: on the TPU/Pallas path the fused expand kernel emits
    # them and the tile sort carries them as payloads (pair_feats_fused); the
    # fallback is a (P, F) row gather.  Either way the backward is the same
    # scatter-free transpose (sort-permute + segmented sum).
    feats = jnp.concatenate(
        [
            proj.means2d,
            proj.conics,
            opacities[:, None],
            channels,
        ],
        axis=1,
    )  # (N, 6 + C)
    if pair_feats_fused is not None:
        pair_feats = pair_select(feats, pair_feats_fused, binning)
    else:
        pair_feats = pair_gather(feats, binning)
    # invalid pairs (beyond n_pairs) have tile id == num_tiles; their rows fall
    # outside every tile range, so garbage values there are never read.

    out_tiled = _blend(
        pair_feats,
        binning.tile_ranges,
        grid_x,
        grid_y,
        ts,
        n_channels,
        _resolve_impl(config.impl),
    )  # (T, C+1, npix)

    img_full = blend_jax.tiles_to_image(out_tiled, grid_x, grid_y, ts, height, width)
    rgb = img_full[..., :3]
    alpha = img_full[..., n_channels]
    rgb = rgb + (1.0 - alpha[..., None]) * bg_color

    result: Dict[str, Any] = {
        "image": rgb,
        "alpha": alpha,
        "radii": proj.radii,
        "visibility": proj.visible & (proj.radii > 0),
        "n_pairs": binning.n_pairs,
        "n_dropped": binning.n_dropped,
    }
    idx = 3
    if with_depth:
        result["depth"] = img_full[..., idx]
        idx += 1
    if extra_features is not None:
        result["extra"] = img_full[..., idx : idx + extra_features.shape[1]]
    return result
