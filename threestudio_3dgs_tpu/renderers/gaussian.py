"""Static Gaussian renderer variants.

Replaces the reference's five wrapper rasterizers
(renderer/diff_gaussian_rasterizer{,_advanced,_background,_normal,_shading}.py)
and its sequential `GaussianBatchRenderer.batch_forward` python loop
(renderer/gaussian_batch_renderer.py:21).  Differences by design:

  * the per-view loop is unrolled *inside* one jitted step (XLA schedules
    views back-to-back on-device; nothing returns to host between views);
  * depth / alpha / splatted per-Gaussian normals come out of the SAME
    kernel pass as extra blended channels -- the reference needs a second
    full rasterizer call just to splat normals
    (renderer/diff_gaussian_rasterizer_normal.py:175-187);
  * stochastic bits (bg inversion, material augmentation, neural-bg random
    aug) consume a JAX PRNG key: one compiled graph, no host randomness.

Output dict keys mirror the reference batch renderer: comp_rgb, comp_depth,
comp_mask, comp_normal, comp_pred_normal, comp_rgb_bg (B, H, W, C), plus the
per-view stacked radii / visibility / means2d-gradient channels used by
adaptive density control.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import gaussian_field as gf
from ..ops import camera as cam_ops
from ..ops.image import depth_to_normal, normalize_vec
from ..ops.rasterizer import RasterizeConfig, rasterize, rasterize_batched
from ..utils.registry import register


@dataclasses.dataclass
class RendererConfig:
    invert_bg_prob: float = 1.0
    back_ground_color: Tuple[float, float, float] = (1, 1, 1)
    tile_size: int = 32
    max_pairs: int = 2 ** 21  # ceiling; adaptive sizing stays below this
    impl: str = "auto"
    # adaptive pair capacity: every pair-stage op (expand, sorts, gathers,
    # blend) runs at the static capacity, so right-sizing it to the live
    # scene is a direct throughput win (the CUDA reference allocates pair
    # buffers exactly per frame -- bucketed static capacities are the XLA
    # equivalent; each bucket change costs one retrace)
    adaptive_max_pairs: bool = False
    min_pairs: int = 256 * 1024
    # render the whole camera batch in ONE pipeline pass (views stacked as
    # tile rows; see ops/rasterizer/api.py::rasterize_batched); falls back to
    # the per-view loop for renderers that override render_one
    batched: bool = True
    # Per-view capacity bound on the single-pass path's B*cap shared pool.
    # The FAIR round-5 A/B (scripts/profile_batched_vmap.py, equal-capacity
    # pools with zero drops asserted on both sides -- an earlier measurement
    # that handed the tall grid 1/4 capacity is retracted in PERF.md) at
    # B=4 @512^2, 100k gaussians, cap 256k/view: per-view loop 69.3 ms,
    # tall-grid 71.8, vmap-segmented 89.0.  A wash at this boundary, and
    # above it the packed tile-sort key (tile << pair_bits | p,
    # ops/rasterizer/binning.py:154-158) cannot represent the B*cap pool
    # (pair_bits + tile_bits <= 31) -- see _batched_key_fits.  The batched
    # pass therefore serves small/early-training capacities, where its
    # dispatch amortization pays; the loop is the path at training scale.
    batched_max_pairs: int = 256 * 1024


class GaussianRendererBase:
    """Shared machinery.  Subclasses set class flags for channels."""

    Config = RendererConfig
    max_pairs_override: Optional[int] = None
    supports_batched = True  # single-pass whole-batch rendering available

    def _batched_key_fits(self, bs: int, per_view_cap: int,
                          height: int, width: int) -> bool:
        """Whether the packed tile-sort key can represent the batched pass.

        The tile sort packs (tile << pair_bits | p) into one int32
        (ops/rasterizer/binning.py:154-158,318), which needs
        pair_bits + tile_bits <= 31.  The batched pass shares a bs*cap pair
        pool over bs*grid tiles, so e.g. B=4 @512^2 with a 2M/view cap needs
        23 + 11 bits and cannot run; fall back to the per-view loop (whose
        per-view capacity keeps the key small) instead of crashing the
        binning assert."""
        ts = self.cfg.tile_size
        grid = ((width + ts - 1) // ts) * ((height + ts - 1) // ts)
        num_tiles = bs * grid
        pair_bits = max(int(bs * per_view_cap - 1).bit_length(), 1)
        tile_bits = int(num_tiles).bit_length()
        return pair_bits + tile_bits <= 31
    with_depth = False
    with_mask = False
    with_normal = False
    with_background = False
    with_shading = False

    def __init__(self, cfg=None, geometry=None, material=None, background=None, **kw):
        if cfg is None:
            cfg = RendererConfig(**kw)
        elif isinstance(cfg, dict):
            from ..utils.config import parse_structured

            cfg = parse_structured(RendererConfig, cfg)
        self.cfg = cfg
        self.geometry = geometry
        self.material = material
        self.background = background

    def _kernel_bg(self, key, training):
        """Per-view kernel background color + the key to use downstream
        (reference diff_gaussian_rasterizer.py:59-64)."""
        cfg = self.cfg
        base_bg = jnp.asarray(cfg.back_ground_color, jnp.float32)
        if self.with_background:
            return jnp.zeros(3), key  # composite neural bg outside
        if training and key is not None:
            key, sub = jax.random.split(key)
            invert = jax.random.uniform(sub) > cfg.invert_bg_prob
            return jnp.where(invert, 1.0 - base_bg, base_bg), key
        return 1.0 - base_bg, key  # eval always inverts (reference quirk)

    def _post_view(
        self,
        out: Dict[str, Any],
        *,
        bg_params=None,
        rays_o=None,
        rays_d=None,
        light_positions=None,
        key=None,
        ambient_only=None,
        training: bool = False,
        ambient_ratio=None,
        shading: Optional[str] = None,
    ) -> Dict[str, Any]:
        """Channel post-processing for ONE view's rasterizer output
        (background composite, depth->normal, material shading)."""
        result: Dict[str, Any] = {
            "render": jnp.clip(out["image"], 0.0, 1.0),
            "radii": out["radii"],
            "visibility_filter": out["visibility"],
            "n_dropped": out["n_dropped"],
            "n_pairs": out["n_pairs"],
        }
        alpha = out["alpha"]
        depth = out["depth"]
        if self.with_mask:
            result["mask"] = alpha
        if self.with_depth:
            result["depth"] = depth

        if self.with_background and self.background is not None:
            bg_color = self.background(
                bg_params, rays_d, key=key, training=training
            )  # (H, W, 3)
            comp = out["image"] + (1.0 - alpha[..., None]) * bg_color
            result["render"] = jnp.clip(comp, 0.0, 1.0)
            result["comp_rgb_bg"] = bg_color
            result["mask"] = alpha
            result["depth"] = depth

        if self.with_normal:
            # depth -> xyz -> screen-space normal (reference
            # diff_gaussian_rasterizer_normal.py:172-193)
            xyz_map = rays_o + depth[..., None] * rays_d
            normal_map = normalize_vec(depth_to_normal(xyz_map))
            normal_map = normal_map * 0.5 * alpha[..., None] + 0.5
            # gradient detach outside the confident-alpha mask
            confident = (alpha > 0.99)[..., None]
            normal_map = jnp.where(
                confident, normal_map, jax.lax.stop_gradient(normal_map)
            )
            depth_out = jnp.where(
                confident[..., 0], depth, jax.lax.stop_gradient(depth)
            )
            result["normal"] = normal_map
            result["depth"] = depth_out
            result["mask"] = alpha
            if "extra" in out:
                # splatted per-Gaussian predicted normals (same kernel pass)
                result["pred_normal"] = out["extra"]

        if self.with_shading and self.material is not None:
            albedo_rgb = out["image"]
            safe_alpha = jnp.maximum(alpha[..., None], 1e-4)
            albedo = jnp.clip(albedo_rgb / safe_alpha, 0.0, 1.0)
            xyz_map = rays_o + depth[..., None] * rays_d
            normal_for_shading = result["normal"] * 2.0 - 1.0
            shaded = self.material.shade(
                xyz_map,
                normal_for_shading,
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
                bg_color = self.background(bg_params, rays_d, key=key, training=training)
                comp = comp + (1.0 - alpha[..., None]) * bg_color
                result["comp_rgb_bg"] = bg_color
            result["render"] = jnp.clip(comp, 0.0, 1.0)

        return result

    # -- single view -------------------------------------------------------
    def render_one(
        self,
        gauss: gf.GaussianState,
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
        means2d_offset: Optional[jnp.ndarray] = None,
        override_color: Optional[jnp.ndarray] = None,
        scaling_modifier: float = 1.0,
        ambient_ratio=None,
        shading: Optional[str] = None,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        geo = self.geometry
        params = gauss.params

        kernel_bg, key = self._kernel_bg(key, training)

        sh_coeffs = None
        colors = override_color
        if colors is None:
            sh_coeffs = gf.get_features(params, color_clip)

        extra = None
        if self.with_normal and params.normal is not None:
            extra = params.normal

        out = rasterize(
            params.xyz,
            gf.get_scaling(params, geo.cfg.sphere if geo is not None else False),
            params.rotation,
            gf.get_opacity(params)[:, 0],
            camera,
            kernel_bg,
            colors=colors,
            sh_coeffs=sh_coeffs,
            sh_degree=geo.active_sh_degree if geo is not None else 0,
            extra_features=extra,
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

    # -- batch (replaces GaussianBatchRenderer.batch_forward) --------------
    def batch_forward(
        self,
        gauss: gf.GaussianState,
        batch: Dict[str, Any],
        *,
        bg_params=None,
        key=None,
        ambient_only=None,
        training: bool = False,
        color_clip: float = float("inf"),
        means2d_offset: Optional[jnp.ndarray] = None,  # (B, N, 2) dummy zeros
        override_color=None,
        ambient_ratio=None,
        shading: Optional[str] = None,
        deformation_params=None,
    ) -> Dict[str, Any]:
        c2w = batch["c2w"]
        bs = c2w.shape[0]
        height = int(batch["height"])
        width = int(batch["width"])
        if key is None:
            keys = [None] * bs
        elif "view_index" in batch:
            # per-view keys from the GLOBAL view index: identical per-view
            # randomness no matter how the camera batch is sharded across a
            # device mesh (data_parallel shard == single device)
            keys = [
                jax.random.fold_in(key, batch["view_index"][i])
                for i in range(bs)
            ]
        else:
            keys = jax.random.split(key, bs)
        cameras = []
        for i in range(bs):
            fovy = batch["fovy"][i]
            cameras.append(cam_ops.camera_from_c2w(
                c2w[i],
                fovy,
                fovy,  # fovx = fovy, reference gaussian_batch_renderer.py:24-25
                height,
                width,
                znear=0.1,
                zfar=100.0,
                timestamp=batch["timestamp"][i] if "timestamp" in batch else None,
                frame_idx=batch["frame_indices"][i]
                if "frame_indices" in batch
                else None,
            ))

        # fast path: the whole camera batch in ONE rasterizer pipeline pass
        # (views stacked as tile rows; ops/rasterizer/api.py).  Renderers
        # that override render_one (sugar/spacetime) keep the per-view loop.
        # At the measured capacity boundary the two paths are a wash (see
        # cfg.batched_max_pairs); beyond it the packed tile-sort key cannot
        # represent the B*cap pool, so _batched_key_fits falls back to the
        # loop instead of tripping the binning assert.
        per_view_cap = self.max_pairs_override or self.cfg.max_pairs
        use_batched = (
            self.cfg.batched
            and bs > 1
            and self.supports_batched
            and per_view_cap <= self.cfg.batched_max_pairs
            and self._batched_key_fits(bs, per_view_cap, height, width)
        )
        if use_batched:
            return self._batch_forward_batched(
                gauss, batch, cameras, keys,
                bg_params=bg_params,
                ambient_only=ambient_only,
                training=training,
                color_clip=color_clip,
                means2d_offset=means2d_offset,
                override_color=override_color,
                ambient_ratio=ambient_ratio,
                shading=shading,
                deformation_params=deformation_params,
            )

        per_view = []
        for i, camera in enumerate(cameras):
            per_view.append(
                self.render_one(
                    gauss,
                    camera,
                    bg_params=bg_params,
                    rays_o=batch["rays_o"][i] if "rays_o" in batch else None,
                    rays_d=batch["rays_d"][i] if "rays_d" in batch else None,
                    light_positions=batch["light_positions"][i]
                    if "light_positions" in batch
                    else None,
                    key=keys[i],
                    ambient_only=ambient_only,
                    training=training,
                    color_clip=color_clip,
                    means2d_offset=means2d_offset[i]
                    if means2d_offset is not None
                    else None,
                    override_color=override_color,
                    ambient_ratio=ambient_ratio,
                    shading=shading,
                    **({"deformation_params": deformation_params}
                       if deformation_params is not None else {}),
                )
            )

        return self._stack_views(per_view)

    @staticmethod
    def _stack_views(per_view) -> Dict[str, Any]:
        outputs: Dict[str, Any] = {
            "comp_rgb": jnp.stack([o["render"] for o in per_view]),
            "radii": jnp.stack([o["radii"] for o in per_view]),
            "visibility_filter": jnp.stack(
                [o["visibility_filter"] for o in per_view]
            ),
            "n_dropped": jnp.stack([o["n_dropped"] for o in per_view]),
            "n_pairs": jnp.stack([o["n_pairs"] for o in per_view]),
        }
        for name, out_name in [
            ("depth", "comp_depth"),
            ("mask", "comp_mask"),
            ("normal", "comp_normal"),
            ("pred_normal", "comp_pred_normal"),
            ("normal_from_dist", "comp_normal_from_dist"),
            ("comp_rgb_bg", "comp_rgb_bg"),
        ]:
            if name in per_view[0]:
                stacked = jnp.stack([o[name] for o in per_view])
                if stacked.ndim == 3:
                    stacked = stacked[..., None]
                outputs[out_name] = stacked
        return outputs

    def _batched_attrs(
        self, gauss, cameras, color_clip, override_color, deformation_params
    ) -> Dict[str, Any]:
        """kwargs for rasterize_batched; subclasses with per-view attributes
        (e.g. the timed spacetime field) override this hook."""
        geo = self.geometry
        params = gauss.params
        sh_coeffs = None
        colors = override_color
        if colors is None:
            sh_coeffs = gf.get_features(params, color_clip)
        extra = None
        if self.with_normal and params.normal is not None:
            extra = params.normal
        return dict(
            means3d=params.xyz,
            scales=gf.get_scaling(
                params, geo.cfg.sphere if geo is not None else False
            ),
            quats=params.rotation,
            opacities=gf.get_opacity(params)[:, 0],
            colors=colors,
            sh_coeffs=sh_coeffs,
            sh_degree=geo.active_sh_degree if geo is not None else 0,
            extra_features=extra,
            alive=gauss.alive,
        )

    def _batch_forward_batched(
        self,
        gauss: gf.GaussianState,
        batch: Dict[str, Any],
        cameras,
        keys,
        *,
        bg_params=None,
        ambient_only=None,
        training: bool = False,
        color_clip: float = float("inf"),
        means2d_offset: Optional[jnp.ndarray] = None,
        override_color=None,
        ambient_ratio=None,
        shading: Optional[str] = None,
        deformation_params=None,
    ) -> Dict[str, Any]:
        """One rasterizer pipeline pass for the whole camera batch.

        The pair capacity becomes a SHARED pool of bs * max_pairs (a view
        over demand borrows headroom from the others); per-view n_pairs /
        n_dropped are reported as the per-view share of the global totals so
        the adaptive-capacity controller sees pool-equivalent demand."""
        bs = len(cameras)

        bgs, post_keys = [], []
        for i in range(bs):
            bg_i, k_i = self._kernel_bg(keys[i], training)
            bgs.append(bg_i)
            post_keys.append(k_i)

        attrs = self._batched_attrs(
            gauss, cameras, color_clip, override_color, deformation_params
        )
        per_view_cap = self.max_pairs_override or self.cfg.max_pairs
        out = rasterize_batched(
            cameras=cameras,
            bg_color=jnp.stack(bgs),
            means2d_offset=means2d_offset,
            with_depth=True,
            config=RasterizeConfig(
                tile_size=self.cfg.tile_size,
                max_pairs=per_view_cap * bs,
                impl=self.cfg.impl,
            ),
            **attrs,
        )

        # per-view share of the shared-pool totals (ceil keeps dropped > 0
        # visible to the grow trigger)
        n_pairs_v = (out["n_pairs"] + bs - 1) // bs
        n_dropped_v = (out["n_dropped"] + bs - 1) // bs

        per_view = []
        for i in range(bs):
            view_out = {
                "image": out["image"][i],
                "alpha": out["alpha"][i],
                "depth": out["depth"][i],
                "radii": out["radii"][i],
                "visibility": out["visibility"][i],
                "n_pairs": n_pairs_v,
                "n_dropped": n_dropped_v,
            }
            if "extra" in out:
                view_out["extra"] = out["extra"][i]
            per_view.append(
                self._post_view(
                    view_out,
                    bg_params=bg_params,
                    rays_o=batch["rays_o"][i] if "rays_o" in batch else None,
                    rays_d=batch["rays_d"][i] if "rays_d" in batch else None,
                    light_positions=batch["light_positions"][i]
                    if "light_positions" in batch
                    else None,
                    key=post_keys[i],
                    ambient_only=ambient_only,
                    training=training,
                    ambient_ratio=ambient_ratio,
                    shading=shading,
                )
            )
        return self._stack_views(per_view)


@register("diff-gaussian-rasterizer")
class DiffGaussianRasterizer(GaussianRendererBase):
    """Vanilla render: rgb only (reference renderer/diff_gaussian_rasterizer.py)."""


@register("diff-gaussian-rasterizer-advanced")
class DiffGaussianRasterizerAdvanced(GaussianRendererBase):
    """Also returns depth + alpha mask (ashawkey-fork 4-tuple, reference
    renderer/diff_gaussian_rasterizer_advanced.py:122,139-146)."""

    with_depth = True
    with_mask = True


@register("diff-gaussian-rasterizer-background")
class DiffGaussianRasterizerBackground(GaussianRendererBase):
    """Neural env-map background composited over zero-bg render (reference
    renderer/diff_gaussian_rasterizer_background.py:57-58,116-132)."""

    with_depth = True
    with_mask = True
    with_background = True


@register("diff-gaussian-rasterizer-normal")
class DiffGaussianRasterizerNormal(GaussianRendererBase):
    """Depth-derived screen-space normals + optional splatted pred normals
    (reference renderer/diff_gaussian_rasterizer_normal.py)."""

    with_depth = True
    with_mask = True
    with_normal = True


@register("diff-gaussian-rasterizer-shading")
class DiffGaussianRasterizerShading(GaussianRendererBase):
    """Normals + lambertian point-light shading + neural background
    (reference renderer/diff_gaussian_rasterizer_shading.py:169-213)."""

    with_depth = True
    with_mask = True
    with_normal = True
    with_shading = True
    with_background = True
