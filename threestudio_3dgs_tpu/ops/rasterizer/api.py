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


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def _blend(
    pair_feats, tile_ranges, grid_x, grid_y, tile_size, n_channels, impl,
    view_grid_y=0,
):
    return _blend_fwd_impl(
        pair_feats, tile_ranges, grid_x, grid_y, tile_size, n_channels, impl,
        view_grid_y,
    )


def _blend_fwd_impl(
    pair_feats, tile_ranges, grid_x, grid_y, tile_size, n_channels, impl,
    view_grid_y=0,
):
    if impl == "pallas":
        from .blend_pallas import blend_forward_pallas

        return blend_forward_pallas(
            pair_feats, tile_ranges, grid_x, grid_y, tile_size, n_channels,
            view_grid_y=view_grid_y,
        )
    return blend_jax.blend_forward(
        pair_feats, tile_ranges, grid_x, grid_y, tile_size, n_channels,
        view_grid_y=view_grid_y,
    )


def _blend_fwd(
    pair_feats, tile_ranges, grid_x, grid_y, tile_size, n_channels, impl,
    view_grid_y=0,
):
    out = _blend_fwd_impl(
        pair_feats, tile_ranges, grid_x, grid_y, tile_size, n_channels, impl,
        view_grid_y,
    )
    return out, (pair_feats, tile_ranges, out)


# Per-quadrant compacted blend kernels: built and measured round 4, DELETED
# round 5.  The probe data stands (scripts/probe_quadrants.py: ~0.35x
# touched elements) but the blend stages are walk-bound, not element-bound
# (bench 79.96 vs 79.87 ms), and the ~8.6e-4-vs-1.2e-1 outlier margin is a
# discrete power<=0 gate-flip class already budgeted by the quality floor
# (tests/test_quality_regression.py ALPHA_MAX_ERR) and the all-packs ledger.
# A default-OFF twin of the hottest kernel was pure drift risk -- see
# PERF.md "Round-5 quadrant kernel decision" and git history (b6c8fad) for
# the kernel.


def _blend_bwd(grid_x, grid_y, tile_size, n_channels, impl, view_grid_y, res, g_out):
    pair_feats, tile_ranges, out = res
    if impl == "pallas":
        from .blend_pallas import blend_backward_pallas

        d_feats = blend_backward_pallas(
            pair_feats, tile_ranges, out, g_out, grid_x, grid_y, tile_size,
            n_channels, view_grid_y=view_grid_y,
        )
    else:
        d_feats = blend_jax.blend_backward(
            pair_feats, tile_ranges, out, g_out, grid_x, grid_y, tile_size,
            n_channels, view_grid_y=view_grid_y,
        )
    zero_int = np.zeros(tile_ranges.shape, jax.dtypes.float0)
    return (d_feats, zero_int)


_blend.defvjp(_blend_fwd, _blend_bwd)


# ---------------------------------------------------------------------------
# Shared post-projection core (single-view and batched paths)
# ---------------------------------------------------------------------------


def _raster_core(
    proj,
    opacities,  # (M,) activated, M = N or B*N
    channels,  # (M, C)
    grid_x: int,
    grid_y: int,
    tile_size: int,
    max_pairs: int,
    impl: str,
    height: int,
    width: int,
    view_grid_y: int = 0,
):
    """Everything after projection: bin -> per-pair features -> blend ->
    image assembly.  Operates on a flat 'scene' of M gaussians over a
    (grid_y, grid_x) tile grid; the batched path stacks B views vertically
    into one tall grid so this runs ONCE for the whole camera batch."""
    n_channels = channels.shape[1]
    binning, pair_feats_fused = bin_gaussians_with_feats(
        jax.tree_util.tree_map(jax.lax.stop_gradient, proj), grid_x, grid_y,
        max_pairs, tile_size, opacities, channels, view_grid_y=view_grid_y,
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
    )  # (M, 6 + C)
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
        tile_size,
        n_channels,
        impl,
        view_grid_y,
    )  # (T, npix, C+1)

    img_full = blend_jax.tiles_to_image(
        out_tiled, grid_x, grid_y, tile_size, height, width
    )
    return img_full, binning


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

    img_full, binning = _raster_core(
        proj,
        opacities,
        channels,
        grid_x,
        grid_y,
        ts,
        config.max_pairs,
        _resolve_impl(config.impl),
        height,
        width,
    )
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


def rasterize_batched(
    means3d: jnp.ndarray,  # (N, 3) or (B, N, 3) per-view (e.g. timed 4D)
    scales: jnp.ndarray,  # (N, 3) or (B, N, 3), activated
    quats: jnp.ndarray,  # (N, 4) or (B, N, 4)
    opacities: jnp.ndarray,  # (N,) or (B, N), activated
    cameras,  # sequence of B Camera (same height/width)
    bg_color: jnp.ndarray,  # (3,) or (B, 3)
    colors: Optional[jnp.ndarray] = None,  # (N, 3) or (B, N, 3)
    sh_coeffs: Optional[jnp.ndarray] = None,  # (N, K, 3) or (B, N, K, 3)
    sh_degree: int = 0,
    extra_features: Optional[jnp.ndarray] = None,  # (N, E) or (B, N, E)
    alive: Optional[jnp.ndarray] = None,  # (N,) or (B, N)
    means2d_offset: Optional[jnp.ndarray] = None,  # (B, N, 2)
    scaling_modifier: float = 1.0,
    with_depth: bool = True,
    config: RasterizeConfig = RasterizeConfig(),
) -> Dict[str, Any]:
    """Render B views of one scene in a SINGLE pipeline pass.

    The reference loops its CUDA rasterizer per view
    (renderer/gaussian_batch_renderer.py:21); the earlier TPU design unrolled
    that loop inside one jit, which still issues B copies of every sort /
    expand / blend dispatch.  Here the views are stacked VERTICALLY as extra
    tile rows of one tall (B * grid_y, grid_x) tile grid: per view v,
    means2d.y += v * grid_y * tile_size and the tile rects shift by
    v * grid_y, then ONE depth sort, ONE fused expand, ONE tile sort and ONE
    blend over B*T tiles render everything.  Each tile belongs to exactly one
    view and a global depth sort keeps any subsequence depth-ordered, so
    per-tile blend order is identical to the per-view renders; outputs match
    the unrolled loop exactly (same kernels, same numerics, modulo the shared
    global pair capacity).

    `config.max_pairs` is the GLOBAL capacity shared by all views (capacity
    pressure drops globally-deepest pairs, fair across views).

    Returns the same dict as `rasterize` with a leading batch axis:
    image (B, H, W, 3), alpha (B, H, W), depth, extra, radii (B, N),
    visibility (B, N); n_pairs / n_dropped are global scalars.
    """
    b = len(cameras)

    def _per_view(arr, base_ndim, v):
        """Index a per-view leading axis if present (time-varying 4D
        attributes render each view at its own timestamp)."""
        if arr is None:
            return None
        return arr if arr.ndim == base_ndim else arr[v]

    if b == 1:
        # degenerate case: identical to single-view, skip the stacking
        out = rasterize(
            _per_view(means3d, 2, 0), _per_view(scales, 2, 0),
            _per_view(quats, 2, 0), _per_view(opacities, 1, 0), cameras[0],
            jnp.asarray(bg_color, jnp.float32).reshape(-1, 3)[0] if jnp.ndim(bg_color) > 1 else bg_color,
            colors=_per_view(colors, 2, 0),
            sh_coeffs=_per_view(sh_coeffs, 3, 0), sh_degree=sh_degree,
            extra_features=_per_view(extra_features, 2, 0),
            alive=_per_view(alive, 1, 0),
            means2d_offset=None if means2d_offset is None else means2d_offset[0],
            scaling_modifier=scaling_modifier, with_depth=with_depth,
            config=config,
        )
        return {
            **{k: out[k][None] for k in ("image", "alpha", "radii", "visibility")},
            **({"depth": out["depth"][None]} if with_depth else {}),
            **({"extra": out["extra"][None]} if "extra" in out else {}),
            "n_pairs": out["n_pairs"],
            "n_dropped": out["n_dropped"],
        }

    height, width = cameras[0].height, cameras[0].width
    ts = config.tile_size
    grid_x = (width + ts - 1) // ts
    grid_y = (height + ts - 1) // ts
    n = means3d.shape[-2]
    view_h = grid_y * ts  # view stride in stacked pixel rows (tile-aligned)

    projs = []
    chans_v = []
    opac_v = []
    for v, cam in enumerate(cameras):
        assert cam.height == height and cam.width == width, \
            "rasterize_batched requires equal view sizes"
        m_v = _per_view(means3d, 2, v)
        proj = project_gaussians(
            m_v,
            _per_view(scales, 2, v),
            _per_view(quats, 2, v),
            cam,
            tile_size=ts,
            scaling_modifier=scaling_modifier,
            alive=_per_view(alive, 1, v),
            means2d_offset=None if means2d_offset is None else means2d_offset[v],
        )
        opac_v.append(_per_view(opacities, 1, v))
        # stack view v as tile rows [v*grid_y, (v+1)*grid_y); means2d stay
        # VIEW-LOCAL (the blend/cull use ty mod grid_y pixel frames), so all
        # per-pair math is bit-identical to the single-view render
        gshift = jnp.asarray([0, v * grid_y], jnp.int32)
        proj = proj._replace(
            tiles_min=proj.tiles_min + gshift,
            tiles_max=proj.tiles_max + gshift,
        )
        projs.append(proj)

        if colors is not None:
            col_v = _per_view(colors, 2, v)
        else:
            if sh_coeffs is None:
                raise ValueError("provide colors or sh_coeffs")
            col_v = sh_colors(
                m_v, _per_view(sh_coeffs, 3, v), cam.campos, sh_degree
            )
        ch = [col_v]
        if with_depth:
            ch.append(proj.depths[:, None])
        if extra_features is not None:
            ch.append(_per_view(extra_features, 2, v))
        chans_v.append(jnp.concatenate(ch, axis=1))

    proj_flat = jax.tree_util.tree_map(
        lambda *leaves: jnp.concatenate(leaves, axis=0), *projs
    )
    channels = jnp.concatenate(chans_v, axis=0)  # (B*N, C)
    n_channels = channels.shape[1]
    opac_flat = jnp.concatenate(opac_v, axis=0)

    img_full, binning = _raster_core(
        proj_flat,
        opac_flat,
        channels,
        grid_x,
        b * grid_y,
        ts,
        config.max_pairs,
        _resolve_impl(config.impl),
        b * view_h,
        width,
        view_grid_y=grid_y,
    )  # (B*view_h, W, C+1)
    img = img_full.reshape(b, view_h, width, n_channels + 1)[:, :height]

    rgb = img[..., :3]
    alpha = img[..., n_channels]
    bg = jnp.asarray(bg_color, jnp.float32)
    bg = jnp.broadcast_to(bg.reshape(-1, 3), (b, 3))[:, None, None, :]
    rgb = rgb + (1.0 - alpha[..., None]) * bg

    radii = proj_flat.radii.reshape(b, n)
    visible = (proj_flat.visible & (proj_flat.radii > 0)).reshape(b, n)
    result: Dict[str, Any] = {
        "image": rgb,
        "alpha": alpha,
        "radii": radii,
        "visibility": visible,
        "n_pairs": binning.n_pairs,
        "n_dropped": binning.n_dropped,
    }
    idx = 3
    if with_depth:
        result["depth"] = img[..., idx]
        idx += 1
    if extra_features is not None:
        e = extra_features.shape[-1]
        result["extra"] = img[..., idx : idx + e]
    return result
