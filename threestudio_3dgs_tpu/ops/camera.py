"""Camera math: world/view/projection transforms and ray generation (pure JAX).

Provides the host-framework camera utilities the reference assumes
(`get_cam_info_gaussian`, `get_ray_directions`, `get_rays`,
`get_projection_matrix`, `get_mvp_matrix` -- see SURVEY.md L1, reference
renderer/gaussian_batch_renderer.py:24-26 and data/uncond.py:18-23), with a
clean row-major convention instead of the transposed-matrix legacy of the CUDA
rasterizer:

  * data-side camera-to-world `c2w` is OpenGL-style (camera looks along -z,
    y up) -- what the reference's random-camera sampler produces;
  * the rasterizer consumes `Camera.w2c` in OpenCV convention (x right,
    y down, z forward) so view-space depth is +z, matching the flip the
    reference applies inside get_cam_info_gaussian (convert_pose);
  * `full_proj = proj @ w2c` maps world points to clip space; pixel centers
    sit at integer coordinates via pix = ((ndc + 1) * S - 1) / 2, identical to
    the CUDA rasterizer's ndc2Pix.
"""

from __future__ import annotations

import dataclasses
import jax
import math
from typing import Tuple

import jax.numpy as jnp
from flax import struct


def fov_to_focal(fov: float, pixels: float):
    return pixels / (2.0 * jnp.tan(fov / 2.0))


def focal_to_fov(focal: float, pixels: float):
    return 2.0 * jnp.arctan(pixels / (2.0 * focal))


@struct.dataclass
class Camera:
    """A single pinhole camera for rasterization.  Array fields are pytree
    leaves (vmappable over a batch of cameras); height/width are static."""

    w2c: jnp.ndarray  # (4, 4) world->camera, OpenCV convention
    full_proj: jnp.ndarray  # (4, 4) world->clip
    campos: jnp.ndarray  # (3,) camera center in world space
    tanfovx: jnp.ndarray  # () tan(FoVx / 2)
    tanfovy: jnp.ndarray  # () tan(FoVy / 2)
    znear: float = struct.field(pytree_node=False, default=0.1)
    zfar: float = struct.field(pytree_node=False, default=100.0)
    height: int = struct.field(pytree_node=False, default=512)
    width: int = struct.field(pytree_node=False, default=512)
    timestamp: jnp.ndarray = None  # optional (), 4D variants
    frame_idx: jnp.ndarray = None  # optional (), int32


def projection_matrix(znear, zfar, fovx, fovy, dtype=jnp.float32) -> jnp.ndarray:
    """Perspective projection (row-major, OpenCV view space: z forward).

    Matches the reference rasterizer's getProjectionMatrix semantics
    (reference utils/sugar_utils.py:808-829) without the transpose dance.
    """
    tan_x = jnp.tan(fovx / 2.0)
    tan_y = jnp.tan(fovy / 2.0)
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    z_sign = one
    row0 = jnp.stack([1.0 / tan_x, zero, zero, zero])
    row1 = jnp.stack([zero, 1.0 / tan_y, zero, zero])
    row2 = jnp.stack(
        [zero, zero, z_sign * zfar / (zfar - znear), -(zfar * znear) / (zfar - znear)]
    )
    row3 = jnp.stack([zero, zero, z_sign, zero])
    return jnp.stack([row0, row1, row2, row3]).astype(dtype)


def convert_gl_to_cv(c2w: jnp.ndarray) -> jnp.ndarray:
    """Flip the y and z camera axes: OpenGL (look -z) -> OpenCV (look +z)."""
    flip = jnp.array([1.0, -1.0, -1.0, 1.0], dtype=c2w.dtype)
    return c2w * flip[None, :]


def invert_rigid(mat: jnp.ndarray) -> jnp.ndarray:
    """Invert a rigid 4x4 transform exactly (R^T, -R^T t)."""
    rot_t = mat[:3, :3].T
    t = mat[:3, 3]
    top = jnp.concatenate([rot_t, (-rot_t @ t)[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=mat.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def camera_from_c2w(
    c2w: jnp.ndarray,
    fovx,
    fovy,
    height: int,
    width: int,
    znear: float = 0.1,
    zfar: float = 100.0,
    timestamp=None,
    frame_idx=None,
) -> Camera:
    """Build a rasterization camera from an OpenGL-convention c2w matrix.

    Mirrors get_cam_info_gaussian's pipeline (convert pose -> w2c -> proj)
    as called at reference renderer/gaussian_batch_renderer.py:24-26 (which
    passes fovx=fovy; callers here may pass distinct values).
    """
    fovx = jnp.asarray(fovx, jnp.float32)
    fovy = jnp.asarray(fovy, jnp.float32)
    c2w_cv = convert_gl_to_cv(jnp.asarray(c2w, jnp.float32))
    w2c = invert_rigid(c2w_cv)
    proj = projection_matrix(znear, zfar, fovx, fovy)
    # 4x4 camera matrices must not go through the MXU's bf16 default path:
    # the projection constants (e.g. zfar/(zfar-znear)=1.001) round to 1.0
    # and corrupt depth.  Force full f32 precision; it is a 4x4, cost-free.
    full_proj = jnp.matmul(proj, w2c, precision=jax.lax.Precision.HIGHEST)
    return Camera(
        w2c=w2c,
        full_proj=full_proj,
        campos=c2w_cv[:3, 3],
        tanfovx=jnp.tan(fovx / 2.0),
        tanfovy=jnp.tan(fovy / 2.0),
        znear=znear,
        zfar=zfar,
        height=height,
        width=width,
        timestamp=timestamp,
        frame_idx=frame_idx,
    )


def get_ray_directions(
    height: int, width: int, fovy, use_pixel_center: bool = True
) -> jnp.ndarray:
    """Camera-space ray directions (H, W, 3), OpenGL convention (-z forward).

    Matches threestudio's get_ray_directions with half-pixel centers as used
    by the reference data modules (reference data/uncond.py:317-334).
    """
    focal = 0.5 * height / jnp.tan(0.5 * jnp.asarray(fovy, jnp.float32))
    offset = 0.5 if use_pixel_center else 0.0
    xs = jnp.arange(width, dtype=jnp.float32) + offset
    ys = jnp.arange(height, dtype=jnp.float32) + offset
    grid_x, grid_y = jnp.meshgrid(xs, ys, indexing="xy")
    dirs = jnp.stack(
        [
            (grid_x - width * 0.5) / focal,
            -(grid_y - height * 0.5) / focal,
            -jnp.ones_like(grid_x),
        ],
        axis=-1,
    )
    return dirs


def get_rays(
    directions: jnp.ndarray, c2w: jnp.ndarray, keepdim: bool = True, normalize: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate camera-space directions into world space and broadcast origins.

    directions: (..., 3); c2w: (4, 4) or batched (B, 4, 4).
    """
    if c2w.ndim == 2:
        rays_d = jnp.einsum("...c,rc->...r", directions, c2w[:3, :3])
        origins = c2w[:3, 3]
    else:
        # batched cameras: directions (B, ..., 3), c2w (B, 4, 4); origins
        # (B, 3) broadcast over the pixel dims
        rays_d = jnp.einsum("b...c,brc->b...r", directions, c2w[:, :3, :3])
        origins = c2w[:, :3, 3].reshape(
            (c2w.shape[0],) + (1,) * (rays_d.ndim - 2) + (3,)
        )
    if normalize:
        rays_d = rays_d / jnp.maximum(
            jnp.linalg.norm(rays_d, axis=-1, keepdims=True), 1e-12
        )
    rays_o = jnp.broadcast_to(origins, rays_d.shape)
    if not keepdim:
        rays_o = rays_o.reshape(-1, 3)
        rays_d = rays_d.reshape(-1, 3)
    return rays_o, rays_d


def get_mvp_matrix(c2w: jnp.ndarray, proj: jnp.ndarray) -> jnp.ndarray:
    """Model-view-projection from an OpenGL c2w and a projection matrix."""
    return proj @ invert_rigid(convert_gl_to_cv(c2w))
