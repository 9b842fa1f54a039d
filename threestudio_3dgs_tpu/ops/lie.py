"""SO(3)/SE(3) Lie-group ops on wxyz quaternions (pure JAX).

Replaces the pypose Lie tensors the reference leans on
(reference geometry/spline_utils.py:8, geometry/dynamic_sugar.py:23).
All ops are batched over leading dims and eps-guarded at the small-angle
limit (the reference clamps at _EPS=1e-6, spline_utils.py:16)."""

from __future__ import annotations

import jax.numpy as jnp

from . import quaternion

_EPS = 1e-8


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (…, 3) -> unit quaternion (…, 4) wxyz.

    Gradient-safe at phi = 0 via the double-where pattern: the norm (whose
    gradient is phi/|phi|, NaN at zero) is only evaluated on safe inputs."""
    sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = sq < 1e-12
    safe_sq = jnp.where(small, 1.0, sq)
    angle = jnp.sqrt(safe_sq)
    half = 0.5 * angle
    k_large = jnp.sin(half) / angle
    k = jnp.where(small, 0.5 - sq / 48.0, k_large)
    w = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, phi * k], axis=-1)


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (…, 4) wxyz -> axis-angle (…, 3), |angle| <= pi.

    Gradient-safe at the identity (double-where on the vector norm)."""
    q = quaternion.normalize(q)
    # force w >= 0 for the principal branch
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    vec = q[..., 1:]
    sq = jnp.sum(vec * vec, axis=-1, keepdims=True)
    small = sq < 1e-12
    safe_sq = jnp.where(small, 1.0, sq)
    sin_half = jnp.sqrt(safe_sq)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    k_large = angle / sin_half
    # Taylor: 2/w * (1 - sq/(3 w^2) ...) ~ 2 + O(sq); grads stay finite
    k = jnp.where(small, 2.0 / jnp.maximum(w, _EPS) - 2.0 * sq / 3.0, k_large)
    return vec * k


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) twist (…, 6) [rho, phi] -> (…, 7) [t, q_wxyz] with the exact
    left-Jacobian translation coupling."""
    rho, phi = xi[..., :3], xi[..., 3:]
    q = so3_exp(phi)
    a2_raw = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = a2_raw < 1e-12
    a2 = jnp.where(small, 1.0, a2_raw)
    angle = jnp.sqrt(a2)
    # V = I + (1-cos)/a^2 [phi]x + (a - sin a)/a^3 [phi]x^2
    c1 = jnp.where(small, 0.5 - a2_raw / 24.0, (1.0 - jnp.cos(angle)) / a2)
    c2 = jnp.where(
        small, 1.0 / 6.0 - a2_raw / 120.0, (angle - jnp.sin(angle)) / (a2 * angle)
    )
    px = jnp.cross(phi, rho)
    ppx = jnp.cross(phi, px)
    t = rho + c1 * px + c2 * ppx
    return jnp.concatenate([t, q], axis=-1)


def se3_log(tq: jnp.ndarray) -> jnp.ndarray:
    """(…, 7) [t, q_wxyz] -> twist (…, 6) [rho, phi]."""
    t, q = tq[..., :3], tq[..., 3:]
    phi = so3_log(q)
    a2_raw = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = a2_raw < 1e-12
    a2 = jnp.where(small, 1.0, a2_raw)
    angle = jnp.sqrt(a2)
    half = 0.5 * angle
    # V^-1 = I - 0.5 [phi]x + (1/a^2 - cot(a/2)/(2a)) [phi]x^2
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + a2_raw / 720.0,
        (1.0 / a2)
        - jnp.cos(half) / jnp.maximum(2.0 * angle * jnp.sin(half), _EPS),
    )
    px = jnp.cross(phi, t)
    ppx = jnp.cross(phi, px)
    rho = t - 0.5 * px + cot_term * ppx
    return jnp.concatenate([rho, phi], axis=-1)


def se3_compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(…, 7) SE3 composition a*b (apply b then a)."""
    ta, qa = a[..., :3], a[..., 3:]
    tb, qb = b[..., :3], b[..., 3:]
    t = ta + quaternion.apply(qa, tb)
    q = quaternion.multiply(qa, qb)
    return jnp.concatenate([t, q], axis=-1)


def se3_inverse(a: jnp.ndarray) -> jnp.ndarray:
    t, q = a[..., :3], a[..., 3:]
    qi = quaternion.conjugate(quaternion.normalize(q))
    return jnp.concatenate([-quaternion.apply(qi, t), qi], axis=-1)


def se3_apply(a: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    return quaternion.apply(a[..., 3:], p) + a[..., :3]


def se3_identity(shape=()) -> jnp.ndarray:
    base = jnp.zeros(shape + (7,))
    return base.at[..., 3].set(1.0)
