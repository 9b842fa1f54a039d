"""Per-Gaussian covariance math (pure JAX, differentiable, batched).

Replaces the reference's torch helpers: `strip_symmetric`,
`build_scaling_rotation`, `build_covariance_from_scaling_rotation`,
`gaussian_3d_coeff`, `inverse_sigmoid`
(reference geometry/gaussian_base.py:42-134, :233-248).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import quaternion


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1.0 - x))


def build_scaling_rotation(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """L = R(q) @ diag(s): (…, 3) x (…, 4) -> (…, 3, 3)."""
    rot = quaternion.to_rotation_matrix(quats)
    return rot * scales[..., None, :]


def covariance_from_scaling_rotation(
    scales: jnp.ndarray, quats: jnp.ndarray, scaling_modifier: float = 1.0
) -> jnp.ndarray:
    """Full 3D covariance Sigma = L L^T, (…, 3, 3)."""
    length = build_scaling_rotation(scaling_modifier * scales, quats)
    return length @ jnp.swapaxes(length, -1, -2)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 3) symmetric -> (…, 6) upper-triangular
    [xx, xy, xz, yy, yz, zz] (reference geometry/gaussian_base.py:46-60)."""
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def unstrip_symmetric(cov6: jnp.ndarray) -> jnp.ndarray:
    """(…, 6) -> (…, 3, 3) symmetric."""
    a, b, c, d, e, f = (cov6[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([a, b, c], axis=-1),
            jnp.stack([b, d, e], axis=-1),
            jnp.stack([c, e, f], axis=-1),
        ],
        axis=-2,
    )


def gaussian_3d_coeff(xyzs: jnp.ndarray, covs6: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized Gaussian density exp(-0.5 d^T Sigma^-1 d) at offsets `xyzs`
    (…, 3) for stripped covariances `covs6` (…, 6).  Used by density-grid mesh
    extraction (reference geometry/gaussian_base.py:63-96)."""
    x, y, z = xyzs[..., 0], xyzs[..., 1], xyzs[..., 2]
    a, b, c, d, e, f = (covs6[..., i] for i in range(6))
    det = a * d * f + 2 * e * c * b - e * e * a - c * c * d - b * b * f
    inv_det = 1.0 / (det + 1e-24)
    inv_a = (d * f - e * e) * inv_det
    inv_b = (e * c - b * f) * inv_det
    inv_c = (e * b - c * d) * inv_det
    inv_d = (a * f - c * c) * inv_det
    inv_e = (b * c - e * a) * inv_det
    inv_f = (a * d - b * b) * inv_det
    power = (
        -0.5 * (x * x * inv_a + y * y * inv_d + z * z * inv_f)
        - x * y * inv_b
        - x * z * inv_c
        - y * z * inv_e
    )
    power = jnp.where(power > 0.0, -1e10, power)
    return jnp.exp(power)
