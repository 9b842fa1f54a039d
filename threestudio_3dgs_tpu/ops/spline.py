"""SE(3) B-spline trajectories in JAX (cubic + linear).

Re-derivation of the reference's pypose spline library
(reference geometry/spline_utils.py:84-371): translations interpolate as a
plain basis-weighted sum; rotations use the cumulative form
q(u) = q0 * Exp(c1 * Log(q0^-1 q1)) * Exp(c2 * Log(q1^-1 q2)) * Exp(c3 * Log(q2^-1 q3))
with the cumulative cubic-B-spline basis.  Timing follows the reference's
spacetime setup: sampling interval 1/(K-3), start time -interval, valid range
clamped so every lookup owns a full 4-knot segment
(reference geometry/spacetime_gaussian.py:363-370)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import quaternion
from .lie import so3_exp, so3_log

_EPS = 1e-6


def cubic_coeffs(u: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (coeffs_t (…, 4), coeffs_r (…, 3)) for u in [0, 1]
    (reference spline_utils.py:113-131)."""
    uu = u * u
    uuu = uu * u
    oos = 1.0 / 6.0
    ct = jnp.stack(
        [
            oos - 0.5 * u + 0.5 * uu - oos * uuu,
            4.0 * oos - uu + 0.5 * uuu,
            oos + 0.5 * u + 0.5 * uu - 0.5 * uuu,
            oos * uuu,
        ],
        axis=-1,
    )
    cr = jnp.stack(
        [
            5.0 * oos + 0.5 * u - 0.5 * uu + oos * uuu,
            oos + 0.5 * u + 0.5 * uu - 2.0 * oos * uuu,
            oos * uuu,
        ],
        axis=-1,
    )
    return ct, cr


def cubic_bspline_interpolation(
    ctrl_xyz: jnp.ndarray,  # (..., 4, 3)
    ctrl_quat: jnp.ndarray,  # (..., 4, 4) wxyz unit quaternions
    u: jnp.ndarray,  # (...,) in [0, 1]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One segment of the cubic SE(3) B-spline."""
    u = jnp.clip(u, _EPS, 1.0 - _EPS)
    ct, cr = cubic_coeffs(u)
    xyz = jnp.sum(ct[..., None] * ctrl_xyz, axis=-2)

    q = ctrl_quat
    q_rel = quaternion.multiply(quaternion.conjugate(q[..., :-1, :]), q[..., 1:, :])
    r_rel = so3_log(q_rel)  # (..., 3, 3)
    q_steps = so3_exp(cr[..., None] * r_rel)  # (..., 3, 4)
    out_q = q[..., 0, :]
    for k in range(3):
        out_q = quaternion.multiply(out_q, q_steps[..., k, :])
    return xyz, quaternion.normalize(out_q)


def linear_interpolation(
    ctrl_xyz: jnp.ndarray,  # (..., 2, 3)
    ctrl_quat: jnp.ndarray,  # (..., 2, 4)
    u: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    u1 = u[..., None]
    xyz = (1.0 - u1) * ctrl_xyz[..., 0, :] + u1 * ctrl_xyz[..., 1, :]
    q_rel = quaternion.multiply(
        quaternion.conjugate(ctrl_quat[..., 0, :]), ctrl_quat[..., 1, :]
    )
    q = quaternion.multiply(ctrl_quat[..., 0, :], so3_exp(u1 * so3_log(q_rel)))
    return xyz, quaternion.normalize(q)


def spline_timing(n_knots: int, degree: int = 3):
    """(interval, start_time, t_lower, t_upper) per the spacetime setup:
    interval = 1/(n-3), start = -interval -> the usable [0, 1] range maps to
    interior segments (reference spacetime_gaussian.py:363-370)."""
    if degree == 3:
        interval = 1.0 / (n_knots - 3)
        start = -interval
        t_low = start + interval
        t_up = start + (n_knots - 2) * interval
    else:
        interval = 1.0 / (n_knots - 1)
        start = 0.0
        t_low = start
        t_up = start + (n_knots - 1) * interval
    return interval, start, t_low, t_up


def spline_eval_vec(
    knots: jnp.ndarray,  # (N, K, C) per-point control vectors
    t: jnp.ndarray,  # () or (N,) timestamps in spline time
    degree: int = 3,
) -> jnp.ndarray:
    """Euclidean-only twin of `spline_eval` for vector-valued knot tracks
    (per-node scale / opacity deltas: the reference splines them with the same
    basis-weighted sum it uses for translations,
    reference geometry/dynamic_sugar.py:389-392,415-417)."""
    n, k = knots.shape[0], knots.shape[1]
    order = degree + 1
    interval, start, t_low, t_up = spline_timing(k, degree)
    tt = jnp.clip(jnp.asarray(t), t_low + _EPS, t_up - _EPS)
    normalized = (tt - start) / interval
    idx = jnp.floor(normalized).astype(jnp.int32)
    u = normalized - idx
    if degree == 3:
        idx = idx - 1
    idx = jnp.clip(idx, 0, k - order)
    offsets = jnp.arange(order, dtype=jnp.int32)
    seg_idx = idx + offsets if jnp.ndim(idx) == 0 else idx[..., None] + offsets
    if jnp.ndim(idx) == 0:
        seg = knots[:, seg_idx]
        uu = jnp.broadcast_to(u, (n,))
    else:
        seg = jnp.take_along_axis(knots, seg_idx[:, :, None], axis=1)
        uu = u
    if degree == 3:
        ct, _ = cubic_coeffs(jnp.clip(uu, _EPS, 1.0 - _EPS))
    else:
        u1 = uu[..., None]
        ct = jnp.concatenate([1.0 - u1, u1], axis=-1)
    return jnp.sum(ct[..., None] * seg, axis=-2)


def spline_eval(
    knots_xyz: jnp.ndarray,  # (N, K, 3) per-point control translations
    knots_quat: jnp.ndarray,  # (N, K, 4) wxyz
    t: jnp.ndarray,  # () or (N,) timestamps in spline time
    degree: int = 3,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the spline at time t for every point (static shapes)."""
    n, k = knots_xyz.shape[0], knots_xyz.shape[1]
    order = degree + 1
    interval, start, t_low, t_up = spline_timing(k, degree)
    tt = jnp.clip(jnp.asarray(t), t_low + _EPS, t_up - _EPS)
    normalized = (tt - start) / interval
    idx = jnp.floor(normalized).astype(jnp.int32)
    u = normalized - idx
    if degree == 3:
        idx = idx - 1
    idx = jnp.clip(idx, 0, k - order)

    # gather the segment knots: (N, order, ·)
    offsets = jnp.arange(order, dtype=jnp.int32)
    seg_idx = idx + offsets if jnp.ndim(idx) == 0 else idx[..., None] + offsets
    if jnp.ndim(idx) == 0:
        seg_xyz = knots_xyz[:, seg_idx]
        seg_quat = knots_quat[:, seg_idx]
        uu = jnp.broadcast_to(u, (n,))
    else:
        seg_xyz = jnp.take_along_axis(knots_xyz, seg_idx[:, :, None], axis=1)
        seg_quat = jnp.take_along_axis(knots_quat, seg_idx[:, :, None], axis=1)
        uu = u
    if degree == 3:
        return cubic_bspline_interpolation(seg_xyz, seg_quat, uu)
    return linear_interpolation(seg_xyz, seg_quat, uu)
