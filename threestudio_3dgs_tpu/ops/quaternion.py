"""Quaternion algebra in JAX (wxyz convention, batched, fully differentiable).

Replaces the reference's torch `build_rotation` (geometry/gaussian_base.py:99-121)
and the pytorch3d quaternion ops it uses elsewhere
(`matrix_to_quaternion/quaternion_to_matrix/quaternion_apply`,
reference geometry/sugar.py:25).  Quaternions are (…, 4) arrays ordered
(w, x, y, z) to match the 3DGS convention (identity rotation = [1,0,0,0],
reference geometry/gaussian_base.py:436-438).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Gradient-safe: an all-zero quaternion returns zero with finite (zero)
    gradients instead of poisoning the backward pass with 0/0 NaNs."""
    sq = jnp.sum(q * q, axis=-1, keepdims=True)
    is_zero = sq < eps * eps
    safe_sq = jnp.where(is_zero, 1.0, sq)
    return jnp.where(is_zero, 0.0, q * jax.lax.rsqrt(safe_sq))


def to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(…, 4) wxyz quaternion -> (…, 3, 3) rotation matrix.  Normalizes first,
    matching reference build_rotation (geometry/gaussian_base.py:99-121)."""
    q = normalize(q)
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
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def from_rotation_matrix(m: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """(…, 3, 3) rotation matrix -> (…, 4) wxyz quaternion.

    Branch-free formulation (all four candidate constructions computed, the
    numerically best selected with `where`) so it is safely jittable/vmappable.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidates, indexed by which diagonal element dominates
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, eps))

    qw0 = safe_sqrt(1.0 + tr) / 2.0
    cand0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)],
        axis=-1,
    )
    qx1 = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    cand1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)],
        axis=-1,
    )
    qy2 = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    cand2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)],
        axis=-1,
    )
    qz3 = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0
    cand3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3],
        axis=-1,
    )

    use0 = (tr > 0.0)[..., None]
    use1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    use2 = (m11 >= m22)[..., None]
    q = jnp.where(use0, cand0, jnp.where(use1, cand1, jnp.where(use2, cand2, cand3)))
    return normalize(q)


def multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, both (…, 4) wxyz."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def apply(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (…, 3) by unit quaternions q (…, 4)."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)
