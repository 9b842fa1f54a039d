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
    """Axis-angle (…, 3) -> unit quaternion (…, 4) wxyz."""
    angle = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sinc-safe: sin(x/2)/x -> 0.5 as x -> 0
    small = angle < 1e-6
    k = jnp.where(small, 0.5 - angle * angle / 48.0, jnp.sin(half) / jnp.maximum(angle, _EPS))
    w = jnp.cos(half)
    return jnp.concatenate([w, phi * k], axis=-1)


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (…, 4) wxyz -> axis-angle (…, 3), |angle| <= pi."""
    q = quaternion.normalize(q)
    # force w >= 0 for the principal branch
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    vec = q[..., 1:]
    sin_half = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    small = sin_half < 1e-6
    k = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), angle / jnp.maximum(sin_half, _EPS))
    return vec * k


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) twist (…, 6) [rho, phi] -> (…, 7) [t, q_wxyz] with the exact
    left-Jacobian translation coupling."""
    rho, phi = xi[..., :3], xi[..., 3:]
    q = so3_exp(phi)
    angle = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    small = angle < 1e-6
    a2 = angle * angle
    # V = I + (1-cos)/a^2 [phi]x + (a - sin a)/a^3 [phi]x^2
    c1 = jnp.where(small, 0.5 - a2 / 24.0, (1.0 - jnp.cos(angle)) / jnp.maximum(a2, _EPS))
    c2 = jnp.where(
        small, 1.0 / 6.0 - a2 / 120.0, (angle - jnp.sin(angle)) / jnp.maximum(a2 * angle, _EPS)
    )
    px = jnp.cross(phi, rho)
    ppx = jnp.cross(phi, px)
    t = rho + c1 * px + c2 * ppx
    return jnp.concatenate([t, q], axis=-1)


def se3_log(tq: jnp.ndarray) -> jnp.ndarray:
    """(…, 7) [t, q_wxyz] -> twist (…, 6) [rho, phi]."""
    t, q = tq[..., :3], tq[..., 3:]
    phi = so3_log(q)
    angle = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    small = angle < 1e-6
    a2 = angle * angle
    half = 0.5 * angle
    # V^-1 = I - 0.5 [phi]x + (1/a^2 - cot(a/2)/(2a)) [phi]x^2
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + a2 / 720.0,
        (1.0 / jnp.maximum(a2, _EPS))
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
