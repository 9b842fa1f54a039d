"""Temporal (4D) rasterizer: `diff-gaussian-rasterizer-spacetime`
(reference renderer/diff_gaussian_rasterizer_st.py:25-165).

Per view: evaluate the spacetime field at the camera's timestamp/frame index
(polynomial / per-frame / deformation / spline motion, see models/spacetime),
then rasterize with precomputed colors -- the reference's quirk of rendering
SH2RGB(f_dc) as colors_precomp is preserved."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models import gaussian_field as gf
from ..ops import camera as cam_ops
from ..ops.rasterizer import RasterizeConfig, rasterize
from ..utils.registry import register
from .gaussian import GaussianRendererBase


@register("diff-gaussian-rasterizer-spacetime")
class DiffGaussianRasterizerSpacetime(GaussianRendererBase):
    with_depth = True
    with_mask = True

    def _batched_attrs(
        self, gauss, cameras, color_clip, override_color, deformation_params
    ):
        """Per-view TIMED attributes (each camera carries its own
        timestamp/frame index) stacked to (B, N, ...): the whole frame batch
        renders in one rasterizer pipeline pass."""
        geo = self.geometry
        m_v, s_v, q_v, o_v, c_v = [], [], [], [], []
        for cam in cameras:
            timestamp = cam.timestamp if cam.timestamp is not None else 0.0
            frame_idx = cam.frame_idx if cam.frame_idx is not None else 0
            means3d, scales, rotations, opacity, colors = geo.get_timed_all(
                gauss, timestamp, frame_idx, deformation_params
            )
            m_v.append(means3d)
            s_v.append(scales)
            q_v.append(rotations)
            o_v.append(opacity[:, 0])
            c_v.append(colors if override_color is None else override_color)
        return dict(
            means3d=jnp.stack(m_v),
            scales=jnp.stack(s_v),
            quats=jnp.stack(q_v),
            opacities=jnp.stack(o_v),
            colors=jnp.stack(c_v),
            alive=gauss.alive,
        )

    def render_one(
        self,
        gauss,
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
    ) -> Dict[str, Any]:
        cfg = self.cfg
        geo = self.geometry

        kernel_bg, key = self._kernel_bg(key, training)

        timestamp = camera.timestamp if camera.timestamp is not None else 0.0
        frame_idx = camera.frame_idx if camera.frame_idx is not None else 0

        means3d, scales, rotations, opacity, colors = geo.get_timed_all(
            gauss, timestamp, frame_idx, deformation_params
        )
        if override_color is not None:
            colors = override_color

        out = rasterize(
            means3d,
            scales,
            rotations,
            opacity[:, 0],
            camera,
            kernel_bg,
            colors=colors,
            alive=gauss.alive,
            means2d_offset=means2d_offset,
            scaling_modifier=scaling_modifier,
            with_depth=True,
            config=RasterizeConfig(
                tile_size=cfg.tile_size,
                max_pairs=self.max_pairs_override or cfg.max_pairs,
                impl=cfg.impl,
            ),
        )
        return {
            "render": jnp.clip(out["image"], 0.0, 1.0),
            "radii": out["radii"],
            "visibility_filter": out["visibility"],
            "n_dropped": out["n_dropped"],
            "n_pairs": out["n_pairs"],
            "mask": out["alpha"],
            "depth": out["depth"],
        }
