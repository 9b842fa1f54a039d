"""SuGaR rasterizer frontends (reference renderer/diff_sugar_rasterizer_normal
.py:55-223, _shading.py:55-227, _temporal.py:57-224).

One kernel pass blends rgb + depth + the per-Gaussian mesh-face normals as
extra channels (the reference issues a second full rasterizer call for the
normal splat, reference diff_sugar_rasterizer_normal.py:181-191)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import camera as cam_ops
from ..ops.image import depth_to_normal, normalize_vec
from ..ops.rasterizer import RasterizeConfig, rasterize
from ..utils.registry import register
from .gaussian import GaussianRendererBase


class SuGaRRendererBase(GaussianRendererBase):
    supports_batched = True
    with_depth = True
    with_mask = True
    with_shading = False

    def _batched_attrs(
        self, sugar_state, cameras, color_clip, override_color, deformation_params
    ):
        arrays = self.geometry.as_gaussian_arrays(sugar_state, color_clip)
        return dict(
            means3d=arrays["means3d"],
            scales=arrays["scales"],
            quats=arrays["quats"],
            opacities=arrays["opacities"],
            sh_coeffs=arrays.get("sh_coeffs"),
            colors=arrays.get("colors"),
            sh_degree=self.geometry.active_sh_degree,
            extra_features=arrays["normals"],
        )

    def _post_view(
        self,
        out,
        *,
        bg_params=None,
        rays_o=None,
        rays_d=None,
        light_positions=None,
        key=None,
        ambient_only=None,
        training=False,
        ambient_ratio=None,
        shading=None,
    ) -> Dict[str, Any]:
        alpha = out["alpha"]
        depth = out["depth"]
        # splatted face normals; the reference flips the sign to match its
        # pytorch3d camera convention (diff_sugar_rasterizer_normal.py:193)
        normal_splat = -out["extra"]
        normal_map = normal_splat * 0.5 + 0.5

        result: Dict[str, Any] = {
            "render": jnp.clip(out["image"], 0.0, 1.0),
            "radii": out["radii"],
            "visibility_filter": out["visibility"],
            "n_dropped": out["n_dropped"],
            "n_pairs": out["n_pairs"],
            "mask": alpha,
            "depth": depth,
            "normal": jnp.clip(normal_map, 0.0, 1.0),
        }
        if rays_o is not None and rays_d is not None:
            xyz_map = rays_o + depth[..., None] * rays_d
            nfd = normalize_vec(depth_to_normal(xyz_map))
            result["normal_from_dist"] = nfd * 0.5 * alpha[..., None] + 0.5

        if self.with_shading and self.material is not None:
            safe_alpha = jnp.maximum(alpha[..., None], 1e-4)
            albedo = jnp.clip(out["image"] / safe_alpha, 0.0, 1.0)
            xyz_map = rays_o + depth[..., None] * rays_d
            shaded = self.material.shade(
                xyz_map,
                normal_splat,
                light_positions,
                albedo,
                key=key,
                ambient_only=ambient_only,
                training=training,
                ambient_ratio=ambient_ratio,
                shading=shading,
            )
            comp = shaded * alpha[..., None]
            if self.background is not None:
                bg_color = self.background(
                    bg_params, rays_d, key=key, training=training
                )
                comp = comp + (1.0 - alpha[..., None]) * bg_color
                result["comp_rgb_bg"] = bg_color
            result["render"] = jnp.clip(comp, 0.0, 1.0)
        return result

    def render_one(
        self,
        sugar_state,
        camera: cam_ops.Camera,
        *,
        bg_params=None,
        rays_o=None,
        rays_d=None,
        light_positions=None,
        key=None,
        ambient_only=None,
        training: bool = False,
        color_clip: float = float("inf"),
        means2d_offset=None,
        override_color=None,
        scaling_modifier: float = 1.0,
        ambient_ratio=None,
        shading: Optional[str] = None,
        deformation_params=None,
        timed_arrays=None,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        geo = self.geometry

        kernel_bg, key = self._kernel_bg(key, training)

        arrays = (
            timed_arrays
            if timed_arrays is not None
            else geo.as_gaussian_arrays(sugar_state, color_clip)
        )

        out = rasterize(
            arrays["means3d"],
            arrays["scales"],
            arrays["quats"],
            arrays["opacities"],
            camera,
            kernel_bg,
            sh_coeffs=arrays.get("sh_coeffs"),
            colors=arrays.get("colors"),
            sh_degree=geo.active_sh_degree,
            extra_features=arrays["normals"],
            means2d_offset=means2d_offset,
            scaling_modifier=scaling_modifier,
            with_depth=True,
            config=RasterizeConfig(
                tile_size=cfg.tile_size,
                max_pairs=self.max_pairs_override or cfg.max_pairs,
                impl=cfg.impl,
            ),
        )
        return self._post_view(
            out,
            bg_params=bg_params,
            rays_o=rays_o,
            rays_d=rays_d,
            light_positions=light_positions,
            key=key,
            ambient_only=ambient_only,
            training=training,
            ambient_ratio=ambient_ratio,
            shading=shading,
        )


@register("diff-sugar-rasterizer-normal")
class DiffSugarRasterizerNormal(SuGaRRendererBase):
    pass


@register("diff-sugar-rasterizer-shading")
class DiffSugarRasterizerShading(SuGaRRendererBase):
    with_shading = True


@register("diff-sugar-rasterizer-temporal")
class DiffSugarRasterizerTemporal(SuGaRRendererBase):
    """Timed SuGaR render (reference diff_sugar_rasterizer_temporal.py:57-224):
    the dynamic geometry produces the timed Gaussian arrays per view."""

    def render_one(self, sugar_state, camera, **kwargs):
        timestamp = camera.timestamp if camera.timestamp is not None else 0.0
        frame_idx = camera.frame_idx if camera.frame_idx is not None else 0
        timed = self.geometry.get_timed_gs_arrays(
            sugar_state,
            timestamp,
            frame_idx,
            kwargs.get("deformation_params"),
            kwargs.get("color_clip", float("inf")),
        )
        kwargs["timed_arrays"] = timed
        return super().render_one(sugar_state, camera, **kwargs)

    def _batched_attrs(
        self, sugar_state, cameras, color_clip, override_color, deformation_params
    ):
        """Per-view TIMED mesh-bound gaussians stacked to (B, N, ...): the
        whole (frame x camera) batch renders in one pipeline pass."""
        stacked: Dict[str, list] = {}
        for cam in cameras:
            timestamp = cam.timestamp if cam.timestamp is not None else 0.0
            frame_idx = cam.frame_idx if cam.frame_idx is not None else 0
            arrays = self.geometry.get_timed_gs_arrays(
                sugar_state, timestamp, frame_idx, deformation_params,
                color_clip,
            )
            for k, v in arrays.items():
                stacked.setdefault(k, []).append(v)
        arr = {k: jnp.stack(v) for k, v in stacked.items()}
        return dict(
            means3d=arr["means3d"],
            scales=arr["scales"],
            quats=arr["quats"],
            opacities=arr["opacities"],
            sh_coeffs=arr.get("sh_coeffs"),
            colors=arr.get("colors"),
            sh_degree=self.geometry.active_sh_degree,
            extra_features=arr["normals"],
        )
