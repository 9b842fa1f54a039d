"""Temporal (video) reference data for 4D generation (reference
data/temporal_image.py:40-393): per-frame RGBA images composited over white,
a random frame subset per batch with timestamps in [0, 1], and random cameras
replicated per frame (random_camera batch_size is multiplied by num_frames,
reference :56-60)."""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional

import numpy as np

from ..utils.config import parse_structured
from ..utils.registry import register
from .image import SingleImageDataModuleConfig, _load_rgba
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
class TemporalRandomImageDataModuleConfig(SingleImageDataModuleConfig):
    video_frames_dir: Optional[str] = None
    video_length: int = 14
    num_frames: int = 14
    norm_timestamp: bool = False
    white_background: bool = True


@register("temporal-image-datamodule")
class TemporalImageDataModule:
    Config = TemporalRandomImageDataModuleConfig

    def __init__(self, cfg=None, seed: int = 0, **kwargs):
        if cfg is None:
            cfg = TemporalRandomImageDataModuleConfig(**kwargs)
        elif isinstance(cfg, dict):
            cfg = parse_structured(TemporalRandomImageDataModuleConfig, cfg)
        self.cfg = cfg
        self.rng = np.random.default_rng(seed)

        # random cameras: one camera batch per frame (reference :56-60)
        rc = dict(cfg.random_camera)
        self.rand_cam_bs = int(rc.get("batch_size", 1))
        rc["batch_size"] = cfg.num_frames * self.rand_cam_bs
        self.random_camera_cfg = parse_structured(RandomCameraDataModuleConfig, rc)
        self.random_sampler = (
            RandomCameraSampler(self.random_camera_cfg, seed)
            if cfg.use_random_camera
            else None
        )

        self.height = (
            cfg.height if isinstance(cfg.height, int) else list(cfg.height)[0]
        )
        self.width = cfg.width if isinstance(cfg.width, int) else list(cfg.width)[0]

        elevation = np.deg2rad(np.array([cfg.default_elevation_deg], np.float32))
        azimuth = np.deg2rad(np.array([cfg.default_azimuth_deg], np.float32))
        distance = np.array([cfg.default_camera_distance], np.float32)
        self.camera_position = spherical_to_position(elevation, azimuth, distance)
        self.c2w = build_c2w(self.camera_position)
        self.fovy = np.deg2rad(np.array([cfg.default_fovy_deg], np.float32))
        self.elevation_deg = np.array([cfg.default_elevation_deg], np.float32)
        self.azimuth_deg = np.array([cfg.default_azimuth_deg], np.float32)
        self.distance = distance
        self.rays_o, self.rays_d = rays_from_c2w(
            self.c2w, self.fovy, self.height, self.width, cfg.rays_d_normalize
        )
        self.mvp = mvp_from_c2w(self.c2w, self.fovy, self.height, self.width)

        self.frame_indices = np.arange(cfg.video_length, dtype=np.int32)
        denom = cfg.video_length if cfg.norm_timestamp else max(cfg.video_length - 1, 1)
        self.timestamps = (self.frame_indices / denom).astype(np.float32)
        self._load_video_frames()

    def _load_video_frames(self):
        cfg = self.cfg
        rgbs, masks = [], []
        for idx in range(cfg.video_length):
            if cfg.video_frames_dir and os.path.isdir(cfg.video_frames_dir):
                path = os.path.join(cfg.video_frames_dir, f"{idx:03}_rgba.png")
                if not os.path.exists(path):
                    path = os.path.join(cfg.video_frames_dir, f"{idx}.png")
                rgba = _load_rgba(path, self.width, self.height)
            else:
                # synthetic fallback for tests: a moving bright square
                rgba = np.zeros((self.height, self.width, 4), np.float32)
                s = self.height // 4
                off = int((idx / max(cfg.video_length - 1, 1)) * (self.height - s))
                rgba[off : off + s, off : off + s] = [0.8, 0.4, 0.2, 1.0]
            rgb = rgba[..., :3]
            mask = (rgba[..., 3:] > 0.5).astype(np.float32)
            if cfg.white_background:
                rgb = rgb * mask + (1.0 - mask)  # composite over white
            rgbs.append(rgb)
            masks.append(mask)
        self.rgbs = np.stack(rgbs)
        self.masks = np.stack(masks)

    def train_batch(self, global_step: int) -> Dict[str, Any]:
        cfg = self.cfg
        idx = self.rng.choice(cfg.video_length, (cfg.num_frames,), replace=False)
        idx = np.sort(idx)
        timestamps = self.timestamps[idx]
        frame_indices = self.frame_indices[idx]
        nf = cfg.num_frames
        batch = {
            "rays_o": np.repeat(self.rays_o, nf, axis=0),
            "rays_d": np.repeat(self.rays_d, nf, axis=0),
            "mvp_mtx": np.repeat(self.mvp, nf, axis=0),
            "camera_positions": self.camera_position,
            "light_positions": self.camera_position,
            "elevation": self.elevation_deg,
            "azimuth": self.azimuth_deg,
            "camera_distances": self.distance,
            "rgb": self.rgbs[idx],
            "mask": self.masks[idx],
            "ref_depth": None,
            "ref_normal": None,
            "height": self.height,
            "width": self.width,
            "c2w": np.repeat(self.c2w, nf, axis=0),
            "fovy": np.repeat(self.fovy, nf),
            "timestamp": timestamps,
            "frame_indices": frame_indices,
        }
        if self.random_sampler is not None:
            self.random_sampler.update_step(global_step)
            rand = self.random_sampler.sample()
            rand["timestamp"] = np.repeat(timestamps, self.rand_cam_bs)
            rand["frame_indices"] = np.repeat(frame_indices, self.rand_cam_bs)
            batch["random_camera"] = rand
        return batch

    def val_views(self):
        views = fixed_circle_views(self.random_camera_cfg, "val")
        return self._with_time(views)

    def test_views(self):
        views = fixed_circle_views(self.random_camera_cfg, "test")
        return self._with_time(views)

    def _with_time(self, views: List[Dict[str, Any]]):
        n = len(views)
        for i, v in enumerate(views):
            t = i / max(n - 1, 1)
            v["timestamp"] = np.array([t], np.float32)
            v["frame_indices"] = np.array(
                [min(int(t * self.cfg.video_length), self.cfg.video_length - 1)],
                np.int32,
            )
        return views
