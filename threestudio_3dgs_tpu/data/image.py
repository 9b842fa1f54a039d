"""Single reference-image data module for image-to-3D (reference
data/image.py:33-355): a fixed default camera with RGBA image + mask +
optional depth/normal maps, and an embedded random-camera generator whose
batch rides along as ``batch["random_camera"]`` (reference :271-272)."""

from __future__ import annotations

import bisect
import dataclasses
import os
from typing import Any, Dict, List, Optional

import numpy as np

from ..utils.config import parse_structured
from ..utils.registry import register
from .uncond import (
    RandomCameraDataModuleConfig,
    RandomCameraSampler,
    build_c2w,
    fixed_circle_views,
    mvp_from_c2w,
    rays_from_c2w,
    spherical_to_position,
)


@dataclasses.dataclass
class SingleImageDataModuleConfig:
    height: Any = 96
    width: Any = 96
    resolution_milestones: List[int] = dataclasses.field(default_factory=list)
    default_elevation_deg: float = 0.0
    default_azimuth_deg: float = -180.0
    default_camera_distance: float = 1.2
    default_fovy_deg: float = 60.0
    image_path: str = ""
    use_random_camera: bool = True
    random_camera: dict = dataclasses.field(default_factory=dict)
    rays_noise_scale: float = 2e-3
    batch_size: int = 1
    requires_depth: bool = False
    requires_normal: bool = False
    rays_d_normalize: bool = True


def _load_rgba(path: str, width: int, height: int):
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.shape[-1] == 4:
        rgba = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
    else:
        rgba = np.concatenate(
            [cv2.cvtColor(img, cv2.COLOR_BGR2RGB), np.full_like(img[..., :1], 255)],
            axis=-1,
        )
    rgba = (
        cv2.resize(rgba, (width, height), interpolation=cv2.INTER_AREA).astype(
            np.float32
        )
        / 255.0
    )
    return rgba


@register("single-image-gs-datamodule")
@register("single-image-datamodule")
class SingleImageDataModule:
    Config = SingleImageDataModuleConfig

    def __init__(self, cfg=None, seed: int = 0, **kwargs):
        if cfg is None:
            cfg = SingleImageDataModuleConfig(**kwargs)
        elif isinstance(cfg, dict):
            cfg = parse_structured(SingleImageDataModuleConfig, cfg)
        self.cfg = cfg

        self.random_camera_cfg = parse_structured(
            RandomCameraDataModuleConfig, dict(cfg.random_camera)
        )
        self.random_sampler = (
            RandomCameraSampler(self.random_camera_cfg, seed)
            if cfg.use_random_camera
            else None
        )

        self.heights = [cfg.height] if isinstance(cfg.height, int) else list(cfg.height)
        self.widths = [cfg.width] if isinstance(cfg.width, int) else list(cfg.width)
        if len(self.heights) == 1:
            self.resolution_milestones = [-1]
        else:
            self.resolution_milestones = [-1] + list(cfg.resolution_milestones)

        elevation = np.deg2rad(np.array([cfg.default_elevation_deg], np.float32))
        azimuth = np.deg2rad(np.array([cfg.default_azimuth_deg], np.float32))
        distance = np.array([cfg.default_camera_distance], np.float32)
        self.camera_position = spherical_to_position(elevation, azimuth, distance)
        self.c2w = build_c2w(self.camera_position)
        self.fovy = np.deg2rad(
            np.array([cfg.default_fovy_deg], np.float32)
        )
        self.elevation_deg = np.array([cfg.default_elevation_deg], np.float32)
        self.azimuth_deg = np.array([cfg.default_azimuth_deg], np.float32)
        self.distance = distance

        self._size_idx = -1
        self._set_resolution(0)

    # -- resolution handling ----------------------------------------------
    def _set_resolution(self, global_step: int):
        idx = bisect.bisect_right(self.resolution_milestones, global_step) - 1
        if idx == self._size_idx:
            return
        self._size_idx = idx
        self.height = self.heights[idx]
        self.width = self.widths[idx]
        self.rays_o, self.rays_d = rays_from_c2w(
            self.c2w, self.fovy, self.height, self.width, self.cfg.rays_d_normalize
        )
        self.mvp = mvp_from_c2w(self.c2w, self.fovy, self.height, self.width)
        self._load_images()

    def _load_images(self):
        cfg = self.cfg
        if not cfg.image_path:
            # synthetic fallback (tests / smoke runs without assets)
            self.rgb = np.full((1, self.height, self.width, 3), 0.5, np.float32)
            self.mask = np.ones((1, self.height, self.width, 1), np.float32)
            self.depth = None
            self.normal = None
            return
        rgba = _load_rgba(cfg.image_path, self.width, self.height)
        self.rgb = rgba[None, ..., :3]
        self.mask = (rgba[None, ..., 3:] > 0.5).astype(np.float32)
        self.depth = None
        self.normal = None
        if cfg.requires_depth:
            import cv2

            dpath = cfg.image_path.replace("_rgba.png", "_depth.png")
            depth = cv2.imread(dpath, cv2.IMREAD_UNCHANGED)
            depth = cv2.resize(
                depth, (self.width, self.height), interpolation=cv2.INTER_AREA
            )
            if depth.ndim == 3:
                depth = depth[..., 0]
            self.depth = (depth.astype(np.float32) / 255.0)[None, ..., None]
        if cfg.requires_normal:
            import cv2

            npath = cfg.image_path.replace("_rgba.png", "_normal.png")
            normal = cv2.imread(npath, cv2.IMREAD_UNCHANGED)
            normal = cv2.resize(
                normal, (self.width, self.height), interpolation=cv2.INTER_AREA
            )
            self.normal = (normal.astype(np.float32) / 255.0)[None]

    # -- batches -----------------------------------------------------------
    def train_batch(self, global_step: int) -> Dict[str, Any]:
        self._set_resolution(global_step)
        batch = {
            "rays_o": self.rays_o,
            "rays_d": self.rays_d,
            "mvp_mtx": self.mvp,
            "camera_positions": self.camera_position,
            "c2w": self.c2w,
            "light_positions": self.camera_position,
            "elevation": self.elevation_deg,
            "azimuth": self.azimuth_deg,
            "camera_distances": self.distance,
            "height": self.height,
            "width": self.width,
            "fovy": self.fovy,
            "rgb": self.rgb,
            "mask": self.mask,
            "ref_depth": self.depth,
            "ref_normal": self.normal,
        }
        if self.random_sampler is not None:
            self.random_sampler.update_step(global_step)
            batch["random_camera"] = self.random_sampler.sample()
        return batch

    def val_views(self):
        return fixed_circle_views(self.random_camera_cfg, "val")

    def test_views(self):
        return fixed_circle_views(self.random_camera_cfg, "test")
