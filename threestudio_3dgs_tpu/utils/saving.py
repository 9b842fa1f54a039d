"""Image-grid and video saving (host-framework utilities the reference relies
on: save_image_grid / save_img_sequence, reference system/gaussian_splatting.py
:144-212)."""

from __future__ import annotations

import os
import re
from typing import List, Optional

import numpy as np


def to_uint8(img: np.ndarray, data_range=(0, 1)) -> np.ndarray:
    lo, hi = data_range
    img = (np.asarray(img, np.float32) - lo) / max(hi - lo, 1e-8)
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)


def save_image_grid(path: str, images: List[np.ndarray], data_range=(0, 1)) -> None:
    """Horizontally concatenate (H, W, C) images and save as png."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rows = []
    for img in images:
        img = np.asarray(img)
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        rows.append(to_uint8(img, data_range))
    grid = np.concatenate(rows, axis=1)
    import imageio.v2 as imageio

    imageio.imwrite(path, grid)


def save_img_sequence(
    out_path: str, img_dir: str, pattern: str = r"(\d+)\.png", fps: int = 30
) -> Optional[str]:
    """Collect numbered frames from img_dir into an mp4 (or gif fallback)."""
    rx = re.compile(pattern)
    frames = []
    for name in os.listdir(img_dir):
        m = rx.match(name)
        if m:
            frames.append((int(m.group(1)), os.path.join(img_dir, name)))
    if not frames:
        return None
    frames.sort()
    import imageio.v2 as imageio

    imgs = [imageio.imread(f) for _, f in frames]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    try:
        imageio.mimwrite(out_path, imgs, fps=fps)
    except Exception:
        out_path = os.path.splitext(out_path)[0] + ".gif"
        imageio.mimwrite(out_path, imgs, duration=1.0 / fps)
    return out_path
