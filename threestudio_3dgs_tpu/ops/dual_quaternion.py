"""Dual-quaternion algebra in JAX (wxyz real part).

Replaces the reference's pypose-backed DualQuaternion class
(reference utils/dual_quaternions.py:19-254).  A dual quaternion is a pair
(q_r, q_d); rigid transform (q, t) maps to q_r = q, q_d = 0.5 * t_quat * q.
Used for dual-quaternion skinning (reference geometry/dynamic_sugar.py:523-550)."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from . import quaternion


def from_quat_translation(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(…, 4), (…, 3) -> (…, 8) [q_r | q_d]."""
    q = quaternion.normalize(q)
    t_quat = jnp.concatenate([jnp.zeros_like(t[..., :1]), t], axis=-1)
    q_d = 0.5 * quaternion.multiply(t_quat, q)
    return jnp.concatenate([q, q_d], axis=-1)


def real(dq: jnp.ndarray) -> jnp.ndarray:
    return dq[..., :4]


def dual(dq: jnp.ndarray) -> jnp.ndarray:
    return dq[..., 4:]


def multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    qr = quaternion.multiply(real(a), real(b))
    qd = quaternion.multiply(real(a), dual(b)) + quaternion.multiply(dual(a), real(b))
    return jnp.concatenate([qr, qd], axis=-1)


def conjugate(dq: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate(
        [quaternion.conjugate(real(dq)), quaternion.conjugate(dual(dq))], axis=-1
    )


def normalize(dq: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-normalize: |q_r| = 1 and <q_r, q_d> = 0."""
    qr = real(dq)
    qd = dual(dq)
    norm = jnp.maximum(jnp.linalg.norm(qr, axis=-1, keepdims=True), eps)
    qr = qr / norm
    qd = qd / norm
    # remove the component of q_d along q_r
    dot = jnp.sum(qr * qd, axis=-1, keepdims=True)
    qd = qd - dot * qr
    return jnp.concatenate([qr, qd], axis=-1)


def to_quat_translation(dq: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    qr = real(dq)
    t_quat = 2.0 * quaternion.multiply(dual(dq), quaternion.conjugate(qr))
    return qr, t_quat[..., 1:]


def transform_point(dq: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply the rigid transform encoded by a unit dual quaternion."""
    q, t = to_quat_translation(dq)
    return quaternion.apply(q, p) + t


def blend(dqs: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Dual-quaternion linear blending (DQS): weighted sum with hemisphere
    alignment to the dominant rotation, then normalization."""
    # align: flip dqs whose real part opposes the first
    pivot = dqs[..., 0:1, :4]
    sign = jnp.sign(jnp.sum(dqs[..., :4] * pivot, axis=-1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    blended = jnp.sum(dqs * sign * weights[..., None], axis=-2)
    return normalize(blended)
