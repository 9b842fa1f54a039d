"""Per-Gaussian view preprocessing: frustum cull, EWA 3D->2D covariance
projection, conic/radius computation, tile-rect extents, SH color evaluation.

This is the `preprocessCUDA` stage of diff-gaussian-rasterization re-derived
as vectorized, differentiable JAX (XLA fuses the whole thing into a handful of
elementwise kernels; no Pallas needed here).  Semantics matched to the CUDA
original the reference installs (SURVEY.md section 2.2):
  * view-space cull at z <= 0.2
  * Jacobian clamp at 1.3 * tan(fov/2)
  * 0.3-pixel low-pass dilation on the 2D covariance diagonal
  * radius = ceil(3 * sqrt(max eigenvalue)), eigenvalue discriminant
    clamped at 0.1
  * pixel coords pix = ((ndc + 1) * size - 1) / 2
Gradients flow to means/scales/rotations/opacity/SH; masked lanes use the
double-where pattern so culled Gaussians cannot poison gradients with NaNs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import quaternion
from ..camera import Camera
from ..gaussian_math import covariance_from_scaling_rotation
from ..sh import eval_sh_color


def _cov3d_entries(scales, quats, modifier):
    """Upper-triangular entries of Sigma = R diag(s^2) R^T, hand-expanded in
    scalar (VPU) form -- batched 3x3 matmuls at N=1M lower poorly on TPU."""
    q = quats / jnp.maximum(
        jnp.linalg.norm(quats, axis=-1, keepdims=True), 1e-12
    )
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s2 = (modifier * scales) ** 2
    a, b, c = s2[..., 0], s2[..., 1], s2[..., 2]
    s00 = r00 * r00 * a + r01 * r01 * b + r02 * r02 * c
    s01 = r00 * r10 * a + r01 * r11 * b + r02 * r12 * c
    s02 = r00 * r20 * a + r01 * r21 * b + r02 * r22 * c
    s11 = r10 * r10 * a + r11 * r11 * b + r12 * r12 * c
    s12 = r10 * r20 * a + r11 * r21 * b + r12 * r22 * c
    s22 = r20 * r20 * a + r21 * r21 * b + r22 * r22 * c
    return s00, s01, s02, s11, s12, s22


class Projected(NamedTuple):
    means2d: jnp.ndarray  # (N, 2) pixel coordinates
    depths: jnp.ndarray  # (N,) view-space z
    conics: jnp.ndarray  # (N, 3) inverse 2D covariance [a, b, c]
    radii: jnp.ndarray  # (N,) int32 screen radius, 0 = invisible
    tiles_min: jnp.ndarray  # (N, 2) int32 inclusive tile rect min (x, y)
    tiles_max: jnp.ndarray  # (N, 2) int32 exclusive tile rect max (x, y)
    visible: jnp.ndarray  # (N,) bool


def project_gaussians(
    means3d: jnp.ndarray,  # (N, 3)
    scales: jnp.ndarray,  # (N, 3) activated (exp'd) scales
    quats: jnp.ndarray,  # (N, 4) unnormalized wxyz
    camera: Camera,
    tile_size: int,
    scaling_modifier: float = 1.0,
    alive: Optional[jnp.ndarray] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
) -> Projected:
    """Project all Gaussians into one camera.

    `means2d_offset` (N, 2), if given, is added to the NDC-scaled screen
    position: the gradient side-channel the densifier reads, mirroring the
    zero `screenspace_points` tensor trick of the reference
    (renderer/diff_gaussian_rasterizer.py:68-77, geometry/gaussian_base.py:815-819).
    Its gradient is d(loss)/d(means2d in NDC units): pixel-space gradients
    scaled by (W/2, H/2), matching the CUDA backward's ddelx_dx = 0.5 * W.
    """
    height, width = camera.height, camera.width
    n = means3d.shape[0]

    # ---- view transform + frustum cull -----------------------------------
    # hand-expanded matvecs: a (N, 3) @ (3, 3) dot_general pads K=N=3 up to
    # the 128x128 MXU tile (~40x wasted work at 1M rows) or forces relayouts;
    # 9 VPU multiply-adds on the already-split columns fuse into the
    # surrounding elementwise chain instead (PERF.md round 3)
    m_x, m_y, m_z = means3d[..., 0], means3d[..., 1], means3d[..., 2]
    w2c = camera.w2c

    def _mv3(r):
        return m_x * r[0] + m_y * r[1] + m_z * r[2] + r[3]

    p_view_x = _mv3(w2c[0])
    p_view_y = _mv3(w2c[1])
    depth = _mv3(w2c[2])
    in_frustum = depth > 0.2
    if alive is not None:
        in_frustum = in_frustum & alive
    safe_depth = jnp.where(in_frustum, depth, 1.0)

    # ---- perspective projection to pixels --------------------------------
    fp = camera.full_proj
    hom_x = _mv3(fp[0])
    hom_y = _mv3(fp[1])
    w_hom = _mv3(fp[3])
    rw = 1.0 / (jnp.where(in_frustum, w_hom, 1.0) + 1e-7)
    ndc_xy = jnp.stack([hom_x, hom_y], axis=-1) * rw[..., None]
    sizes = jnp.array([width, height], jnp.float32)
    means2d = ((ndc_xy + 1.0) * sizes - 1.0) * 0.5
    if means2d_offset is not None:
        means2d = means2d + means2d_offset * (sizes * 0.5)

    # ---- EWA covariance projection ---------------------------------------
    s00, s01, s02, s11, s12, s22 = _cov3d_entries(scales, quats, scaling_modifier)
    focal_x = width / (2.0 * camera.tanfovx)
    focal_y = height / (2.0 * camera.tanfovy)
    limx = 1.3 * camera.tanfovx
    limy = 1.3 * camera.tanfovy
    tx = jnp.clip(p_view_x / safe_depth, -limx, limx) * safe_depth
    ty = jnp.clip(p_view_y / safe_depth, -limy, limy) * safe_depth
    tz = safe_depth

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows (the projective Jacobian; third row irrelevant for the 2x2 block)
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2
    rot_w = camera.w2c[:3, :3]  # world->view rotation
    # T = J @ W : (N, 2, 3); hand-expanded -- tiny batched einsums lower to
    # pathological 2x3x3 matmul loops on TPU, scalar math stays on the VPU
    t0 = j00[..., None] * rot_w[0] + j02[..., None] * rot_w[2]  # (N, 3)
    t1 = j11[..., None] * rot_w[1] + j12[..., None] * rot_w[2]  # (N, 3)
    # cov2d = T Sigma T^T, with Sigma symmetric given by its 6 entries
    def sigma_vec(vx, vy, vz):
        return (
            s00 * vx + s01 * vy + s02 * vz,
            s01 * vx + s11 * vy + s12 * vz,
            s02 * vx + s12 * vy + s22 * vz,
        )

    st0 = sigma_vec(t0[..., 0], t0[..., 1], t0[..., 2])
    st1 = sigma_vec(t1[..., 0], t1[..., 1], t1[..., 2])
    c00 = t0[..., 0] * st0[0] + t0[..., 1] * st0[1] + t0[..., 2] * st0[2] + 0.3
    c01 = t1[..., 0] * st0[0] + t1[..., 1] * st0[1] + t1[..., 2] * st0[2]
    c11 = t1[..., 0] * st1[0] + t1[..., 1] * st1[1] + t1[..., 2] * st1[2] + 0.3

    det = c00 * c11 - c01 * c01
    det_ok = det > 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / safe_det
    conic = jnp.stack([c11 * inv_det, -c01 * inv_det, c00 * inv_det], axis=-1)

    mid = 0.5 * (c00 + c11)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    # ---- tile rect (getRect semantics) -----------------------------------
    grid_x = (width + tile_size - 1) // tile_size
    grid_y = (height + tile_size - 1) // tile_size
    mx, my = means2d[..., 0], means2d[..., 1]
    x0 = jnp.clip(jnp.floor((mx - radius_f) / tile_size), 0, grid_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - radius_f) / tile_size), 0, grid_y).astype(jnp.int32)
    x1 = jnp.clip(
        jnp.floor((mx + radius_f + tile_size - 1) / tile_size), 0, grid_x
    ).astype(jnp.int32)
    y1 = jnp.clip(
        jnp.floor((my + radius_f + tile_size - 1) / tile_size), 0, grid_y
    ).astype(jnp.int32)
    tiles_touched = (x1 - x0) * (y1 - y0)

    visible = in_frustum & det_ok & (radius_f > 0.0) & (tiles_touched > 0)
    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    return Projected(
        means2d=means2d,
        depths=depth,
        conics=conic,
        radii=radii,
        tiles_min=jnp.stack([x0, y0], axis=-1),
        tiles_max=jnp.stack([x1, y1], axis=-1),
        visible=visible,
    )


def sh_colors(
    means3d: jnp.ndarray,
    sh_coeffs: jnp.ndarray,  # (N, K, 3)
    campos: jnp.ndarray,  # (3,)
    degree: int,
) -> jnp.ndarray:
    """View-dependent RGB from SH, as the CUDA preprocess does (dir from
    camera center to point, clamped at 0 after the +0.5 offset)."""
    dirs = means3d - campos
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    return eval_sh_color(sh_coeffs, dirs, degree)
