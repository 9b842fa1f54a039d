"""SuGaR density/SDF regularization (reference utils/sugar_utils.py:79-759).

Drives free Gaussians toward a thin surface before mesh extraction:
  * sample points inside Gaussians proportionally to their volume
    (reference :183-230);
  * estimate the density field at a sample from the K tracked neighbors of
    its source Gaussian -- sum of opacity-weighted anisotropic quadratic
    forms (reference get_field_values :278-353);
  * the SDF estimate at a sample compares its camera-space depth with the
    rendered depth map at its projected pixel; the density target is
    exp(-sdf^2 / (2 beta^2)) and the loss is an L1 between estimated and
    target densities (reference :476-759);
  * beta comes from the mean minimal scale of the neighborhood
    ('average' mode, reference :400-474);
  * the better-normal loss aligns the density-field gradient (via autodiff,
    where the reference hand-derives it) with each Gaussian's smallest axis.

All shapes static: K neighbors per Gaussian, fixed sample count."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import quaternion


@dataclasses.dataclass
class SuGaRRegConfig:
    # mirrors the reference's `sugar` system block (configs/gs4d_spline.yaml:199+)
    reset_neighbors_every: int = 50
    n_samples_for_sdf_regularization: int = 50000
    start_regularization_from: int = 0
    start_sdf_better_normal_from: int = 500
    use_sdf_better_normal_loss: bool = True
    prune_hard_opacity_threshold: float = 0.5
    prune_low_opacity_gaussians_at: Optional[int] = None
    knn_to_track: int = 16


def sample_points_in_gaussians(
    key,
    means: jnp.ndarray,  # (N, 3)
    scales: jnp.ndarray,  # (N, 3) activated
    quats: jnp.ndarray,  # (N, 4)
    alive: jnp.ndarray,  # (N,) bool
    n_samples: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Volume-proportional sampling (reference :183-230).
    Returns (points (S, 3), source index (S,))."""
    k1, k2 = jax.random.split(key)
    log_vol = jnp.sum(jnp.log(jnp.maximum(scales, 1e-12)), axis=-1)
    logits = jnp.where(alive, log_vol, -jnp.inf)
    idx = jax.random.categorical(k1, logits, shape=(n_samples,))
    eps = jax.random.normal(k2, (n_samples, 3)) * scales[idx]
    rot = quaternion.to_rotation_matrix(quats[idx])
    pts = means[idx] + jnp.einsum("nij,nj->ni", rot, eps)
    return pts, idx


def density_at_points(
    points: jnp.ndarray,  # (S, 3)
    source_idx: jnp.ndarray,  # (S,)
    knn_idx: jnp.ndarray,  # (N, K) neighbor table over Gaussians
    means: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,  # (N,)
    alive: jnp.ndarray,
) -> jnp.ndarray:
    """Density = sum over the source Gaussian's neighborhood of
    alpha_j * exp(-1/2 d^T Sigma_j^-1 d) (reference :278-353)."""
    nbrs = knn_idx[source_idx]  # (S, K)
    d = points[:, None, :] - means[nbrs]  # (S, K, 3)
    rot = quaternion.to_rotation_matrix(quats[nbrs])  # (S, K, 3, 3)
    local = jnp.einsum("skij,ski->skj", rot, d)  # R^T d
    inv_var = 1.0 / jnp.maximum(scales[nbrs] ** 2, 1e-12)
    q = jnp.sum(local * local * inv_var, axis=-1)
    w = opacities[nbrs] * alive[nbrs].astype(points.dtype)
    return jnp.sum(w * jnp.exp(-0.5 * q), axis=-1)


def estimate_beta(scales: jnp.ndarray, alive: jnp.ndarray) -> jnp.ndarray:
    """'average' beta mode: mean of the minimal scale over live Gaussians
    (reference :400-474)."""
    min_scale = jnp.min(scales, axis=-1)
    alive_f = alive.astype(scales.dtype)
    return jnp.sum(min_scale * alive_f) / jnp.maximum(jnp.sum(alive_f), 1.0)


def project_to_depth(points: jnp.ndarray, camera, depth_map: jnp.ndarray):
    """Per-sample camera depth + the rendered depth at its pixel.
    Returns (sample_depth (S,), surface_depth (S,), valid (S,))."""
    height, width = depth_map.shape
    p_view = points @ camera.w2c[:3, :3].T + camera.w2c[:3, 3]
    z = p_view[:, 2]
    p_hom = points @ camera.full_proj[:3, :3].T + camera.full_proj[:3, 3]
    w_hom = points @ camera.full_proj[3, :3] + camera.full_proj[3, 3]
    ndc = p_hom[:, :2] / jnp.maximum(w_hom[:, None], 1e-6)
    px = ((ndc[:, 0] + 1.0) * width - 1.0) * 0.5
    py = ((ndc[:, 1] + 1.0) * height - 1.0) * 0.5
    xi = jnp.clip(jnp.round(px).astype(jnp.int32), 0, width - 1)
    yi = jnp.clip(jnp.round(py).astype(jnp.int32), 0, height - 1)
    surf = depth_map[yi, xi]
    valid = (
        (z > 0.2)
        & (px >= 0)
        & (px <= width - 1)
        & (py >= 0)
        & (py <= height - 1)
        & (surf > 0.0)
    )
    return z, surf, valid


def density_regulation_loss(
    key,
    gaussians: dict,  # means, scales, quats, opacities, alive
    knn_idx: jnp.ndarray,
    camera,
    depth_map: jnp.ndarray,
    n_samples: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """L1 between the estimated density and the ideal-SDF density target
    (reference :476-759).  Returns (loss, beta)."""
    pts, idx = sample_points_in_gaussians(
        key,
        gaussians["means"],
        gaussians["scales"],
        gaussians["quats"],
        gaussians["alive"],
        n_samples,
    )
    dens = density_at_points(
        pts, idx, knn_idx,
        gaussians["means"], gaussians["scales"], gaussians["quats"],
        gaussians["opacities"], gaussians["alive"],
    )
    beta = estimate_beta(gaussians["scales"], gaussians["alive"])
    z, surf, valid = project_to_depth(pts, camera, depth_map)
    sdf = z - surf
    target = jnp.exp(-0.5 * (sdf / jnp.maximum(beta, 1e-6)) ** 2)
    err = jnp.abs(jnp.clip(dens, 0.0, 1.0) - target) * valid
    return jnp.sum(err) / jnp.maximum(jnp.sum(valid), 1.0), beta


def sdf_better_normal_loss(
    key,
    gaussians: dict,
    knn_idx: jnp.ndarray,
    n_samples: int,
    normals_from_points: bool = False,
    neighborhood_size: int = 32,
) -> jnp.ndarray:
    """Align the density-field gradient at samples with the source Gaussian's
    normal.  The reference hand-derives this gradient (:476-759); autodiff
    does it here.  The normal is the Gaussian's smallest-scale axis by
    default; with `normals_from_points` it is PCA-estimated from the center
    cloud instead (reference get_normals(estimate_from_points=True),
    reference/utils/sugar_utils.py:384-389)."""
    pts, idx = sample_points_in_gaussians(
        key,
        gaussians["means"],
        gaussians["scales"],
        gaussians["quats"],
        gaussians["alive"],
        n_samples,
    )

    def dens_fn(p, i):
        return density_at_points(
            p[None], i[None], knn_idx,
            gaussians["means"], gaussians["scales"], gaussians["quats"],
            gaussians["opacities"], gaussians["alive"],
        )[0]

    grads = jax.vmap(jax.grad(dens_fn), in_axes=(0, 0))(pts, idx)
    # gradient-safe normalize (double-where): an all-underflowed neighborhood
    # gives grads == 0, where norm's reverse-mode is NaN and max() does not
    # stop 0 * NaN (see ops/image.py normalize_vec)
    from .image import normalize_vec

    grad_dir = normalize_vec(grads)
    if normals_from_points:
        from .mesh import estimate_pointcloud_normals

        all_normals = estimate_pointcloud_normals(
            jax.lax.stop_gradient(gaussians["means"]), neighborhood_size
        )
        normal_axis = all_normals[idx]
    else:
        # smallest-scale axis of the source Gaussian
        rot = quaternion.to_rotation_matrix(gaussians["quats"][idx])
        axis_id = jnp.argmin(gaussians["scales"][idx], axis=-1)
        normal_axis = jnp.take_along_axis(
            jnp.swapaxes(rot, -1, -2), axis_id[:, None, None], axis=1
        )[:, 0]
    cos = jnp.abs(jnp.sum(grad_dir * normal_axis, axis=-1))
    return jnp.mean(1.0 - cos)
