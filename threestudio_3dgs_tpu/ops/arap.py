"""As-rigid-as-possible (ARAP) energy in JAX.

Re-derivation of the reference ARAPCoach (reference utils/arap_utils.py:16-189):
one-ring neighborhoods with cotangent edge weights (via Heron's formula),
ARAP energy with either given per-vertex rotations or SVD-fitted optimal
rotations (determinant-flip corrected).  Static shapes: neighborhoods are
fixed-width padded index matrices."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_one_ring(faces: np.ndarray, n_verts: int, max_degree: int = 16):
    """Padded one-ring neighbor table from a triangle list (host-side numpy,
    done once per mesh).  Returns (nbr_idx (V, D) int32, nbr_mask (V, D)).
    `max_degree` is a lower bound on the table width: it grows to the mesh's
    true maximum degree, because silently truncating a high-degree vertex
    would drop edges in one direction only (asymmetric ARAP/Laplacian)."""
    neighbors = [[] for _ in range(n_verts)]
    for tri in faces:
        for a in range(3):
            i, j = int(tri[a]), int(tri[(a + 1) % 3])
            if j not in neighbors[i]:
                neighbors[i].append(j)
            if i not in neighbors[j]:
                neighbors[j].append(i)
    degree = max((len(nb) for nb in neighbors), default=0)
    width = max(max_degree, degree)
    idx = np.zeros((n_verts, width), np.int32)
    mask = np.zeros((n_verts, width), np.float32)
    for i, nbrs in enumerate(neighbors):
        idx[i, : len(nbrs)] = nbrs
        mask[i, : len(nbrs)] = 1.0
    return idx, mask


def cotangent_weights(
    verts: jnp.ndarray,  # (V, 3) rest positions
    faces: jnp.ndarray,  # (F, 3) int32
    nbr_idx: jnp.ndarray,  # (V, D)
    nbr_mask: jnp.ndarray,  # (V, D)
) -> jnp.ndarray:
    """Per-edge cotangent weights accumulated into the padded neighbor table
    (reference arap_utils.py:66-140 computes them per edge via Heron areas)."""
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    # cotangent at each corner
    def cot(a, b):
        # cot of angle between edge vectors a, b
        cos = jnp.sum(a * b, axis=-1)
        sin = jnp.linalg.norm(jnp.cross(a, b), axis=-1)
        return cos / jnp.maximum(sin, 1e-8)

    cot0 = cot(v1 - v0, v2 - v0)  # angle at v0, opposite edge (1,2)
    cot1 = cot(v0 - v1, v2 - v1)  # opposite edge (0,2)
    cot2 = cot(v0 - v2, v1 - v2)  # opposite edge (0,1)

    n_verts = verts.shape[0]
    # accumulate 0.5 * cot(opposite) on each edge, both directions
    w = jnp.zeros((n_verts, n_verts))  # only for modest V (SuGaR meshes ok)
    pairs = [
        (faces[:, 1], faces[:, 2], cot0),
        (faces[:, 0], faces[:, 2], cot1),
        (faces[:, 0], faces[:, 1], cot2),
    ]
    for i, j, c in pairs:
        w = w.at[i, j].add(0.5 * c)
        w = w.at[j, i].add(0.5 * c)
    # gather into padded table
    table = w[jnp.arange(n_verts)[:, None], nbr_idx] * nbr_mask
    return jnp.maximum(table, 0.0)


def fit_rotations(
    p_rest: jnp.ndarray,  # (V, D, 3) rest edge vectors
    p_def: jnp.ndarray,  # (V, D, 3) deformed edge vectors
    weights: jnp.ndarray,  # (V, D)
) -> jnp.ndarray:
    """Per-vertex optimal rotations via SVD of the weighted covariance,
    with the determinant flip fix (reference arap_utils.py:148-189)."""
    cov = jnp.einsum("vdi,vd,vdj->vij", p_rest, weights, p_def)
    u, _, vt = jnp.linalg.svd(cov)
    r = jnp.einsum("vji,vkj->vik", vt, u)  # V @ U^T (transposes composed)
    det = jnp.linalg.det(r)
    # flip the last column of V where det < 0
    vt_fixed = vt.at[:, -1, :].multiply(jnp.where(det < 0, -1.0, 1.0)[:, None])
    r = jnp.einsum("vji,vkj->vik", vt_fixed, u)
    return r


def arap_energy(
    verts_rest: jnp.ndarray,  # (V, 3)
    verts_def: jnp.ndarray,  # (V, 3)
    nbr_idx: jnp.ndarray,  # (V, D)
    nbr_mask: jnp.ndarray,  # (V, D)
    weights: Optional[jnp.ndarray] = None,  # (V, D) cotangent or uniform
    rotations: Optional[jnp.ndarray] = None,  # (V, 3, 3) or None -> SVD fit
) -> jnp.ndarray:
    """Sum_i sum_j w_ij || (p_i' - p_j') - R_i (p_i - p_j) ||^2."""
    if weights is None:
        weights = nbr_mask
    e_rest = verts_rest[:, None, :] - verts_rest[nbr_idx]  # (V, D, 3)
    e_def = verts_def[:, None, :] - verts_def[nbr_idx]
    e_rest = e_rest * nbr_mask[..., None]
    e_def = e_def * nbr_mask[..., None]
    if rotations is None:
        rotations = jax.lax.stop_gradient(
            fit_rotations(e_rest, e_def, weights)
        )
    rot_rest = jnp.einsum("vij,vdj->vdi", rotations, e_rest)
    diff = e_def - rot_rest
    return jnp.sum(weights * jnp.sum(diff * diff, axis=-1))


def arap_energy_knn(
    pts_rest: jnp.ndarray,  # (N, 3)
    pts_def: jnp.ndarray,  # (N, 3)
    nbr_idx: jnp.ndarray,  # (N, K) KNN indices in the rest cloud
    nbr_mask: Optional[jnp.ndarray] = None,
    rotations: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """ARAP-lite on a point cloud with KNN neighborhoods (the 4dgen spec's
    lite ARAP, reference system/gaussian_4dgen.py:438-477 commented code)."""
    if nbr_mask is None:
        nbr_mask = jnp.ones(nbr_idx.shape, pts_rest.dtype)
    return arap_energy(pts_rest, pts_def, nbr_idx, nbr_mask, rotations=rotations)
