"""Triangle-mesh ops in JAX (pytorch3d equivalents the reference depends on:
`Meshes.faces_normals_list` at reference geometry/sugar.py:588-596,
`mesh_normal_consistency` / `mesh_laplacian_smoothing` at reference
system/sugar_4dgen.py:23,241-250).

Connectivity (edges, face-pair adjacency, vertex degrees) is precomputed
host-side in numpy once per topology; the energies are pure jitted JAX over
vertex positions, so they differentiate through deformations."""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _safe_unit(v: jnp.ndarray, eps: float) -> jnp.ndarray:
    """L2-normalize with zero vectors -> zero output AND zero gradient.
    `v / max(norm(v), eps)` leaks NaN through reverse-mode at v=0 (the
    norm derivative is 0/0 and 0*NaN = NaN); degenerate faces/padded
    vertices hit this in the SuGaR smoothness losses."""
    sq = jnp.sum(v * v, axis=-1, keepdims=True)
    is_zero = sq < eps * eps
    safe_sq = jnp.where(is_zero, 1.0, sq)
    return jnp.where(is_zero, 0.0, v * jax.lax.rsqrt(safe_sq))


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray, eps=1e-12) -> jnp.ndarray:
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    n = jnp.cross(v1 - v0, v2 - v0)
    return _safe_unit(n, eps)


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray, eps=1e-12) -> jnp.ndarray:
    """Area-weighted vertex normals (scatter-add of face normals)."""
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    return _safe_unit(vn, eps)


class MeshTopology(NamedTuple):
    """Host-precomputed connectivity for the smoothness energies."""

    edge_faces: np.ndarray  # (E2, 2) pairs of faces sharing an interior edge
    vert_nbr_idx: np.ndarray  # (V, D) padded one-ring
    vert_nbr_mask: np.ndarray  # (V, D)


def build_topology(faces: np.ndarray, n_verts: int, max_degree: int = 16) -> MeshTopology:
    from .arap import build_one_ring

    edge_map = {}
    for fi, tri in enumerate(faces):
        for a in range(3):
            i, j = int(tri[a]), int(tri[(a + 1) % 3])
            key = (min(i, j), max(i, j))
            edge_map.setdefault(key, []).append(fi)
    pairs = [fs[:2] for fs in edge_map.values() if len(fs) >= 2]
    edge_faces = (
        np.asarray(pairs, np.int32) if pairs else np.zeros((0, 2), np.int32)
    )
    nbr_idx, nbr_mask = build_one_ring(faces, n_verts, max_degree)
    return MeshTopology(edge_faces, nbr_idx, nbr_mask)


def normal_consistency_loss(
    verts: jnp.ndarray, faces: jnp.ndarray, edge_faces: jnp.ndarray
) -> jnp.ndarray:
    """Mean (1 - cos) between normals of faces sharing an edge (pytorch3d
    mesh_normal_consistency semantics)."""
    if edge_faces.shape[0] == 0:
        return jnp.float32(0.0)
    fn = face_normals(verts, faces)
    n0 = fn[edge_faces[:, 0]]
    n1 = fn[edge_faces[:, 1]]
    return jnp.mean(1.0 - jnp.sum(n0 * n1, axis=-1))


def laplacian_smoothing_loss(
    verts: jnp.ndarray, nbr_idx: jnp.ndarray, nbr_mask: jnp.ndarray
) -> jnp.ndarray:
    """Uniform-weight Laplacian magnitude (pytorch3d
    mesh_laplacian_smoothing(method="uniform"))."""
    nbrs = verts[nbr_idx]  # (V, D, 3)
    deg = jnp.maximum(jnp.sum(nbr_mask, axis=1, keepdims=True), 1.0)
    mean_nbr = jnp.sum(nbrs * nbr_mask[..., None], axis=1) / deg
    lap = mean_nbr - verts
    has_nbr = (jnp.sum(nbr_mask, axis=1) > 0).astype(verts.dtype)
    # gradient-safe |lap|: sqrt at exactly 0 has a NaN derivative that the
    # has_nbr mask does NOT stop in reverse mode (0 * NaN = NaN)
    sq = jnp.sum(lap * lap, axis=-1)
    is_zero = sq < 1e-24
    lap_norm = jnp.where(is_zero, 0.0, jnp.sqrt(jnp.where(is_zero, 1.0, sq)))
    return jnp.sum(lap_norm * has_nbr) / jnp.maximum(jnp.sum(has_nbr), 1.0)


def prune_isolated_components(
    verts: np.ndarray, faces: np.ndarray, vert_attrs: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Keep only the largest connected component (reference BFS prune,
    geometry/sugar.py:124-166).  Host-side union-find."""
    n = len(verts)
    parent = np.arange(n)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for tri in faces:
        a = find(int(tri[0]))
        for k in (1, 2):
            b = find(int(tri[k]))
            if a != b:
                parent[b] = a
    roots = np.array([find(i) for i in range(n)])
    unique, counts = np.unique(roots, return_counts=True)
    main = unique[np.argmax(counts)]
    keep = roots == main
    remap = -np.ones(n, np.int64)
    remap[keep] = np.arange(keep.sum())
    keep_face = keep[faces].all(axis=1)
    new_faces = remap[faces[keep_face]]
    return verts[keep], new_faces.astype(np.int32), vert_attrs[keep]


def estimate_pointcloud_normals(
    points: jnp.ndarray,
    neighborhood_size: int = 32,
    disambiguate_directions: bool = True,
) -> jnp.ndarray:
    """Per-point PCA normals (pytorch3d `estimate_pointcloud_normals`
    equivalent, used by the reference SuGaR better-normal branch at
    reference/utils/sugar_utils.py:385): covariance of the K-neighborhood,
    normal = eigenvector of the smallest eigenvalue; directions flipped to
    point away from the local centroid (pytorch3d's disambiguation), i.e.
    outward on a convex surface."""
    from .knn import knn

    points = jnp.asarray(points, jnp.float32)
    _, idx = knn(points, points, neighborhood_size)
    nbr = points[idx]  # (N, K, 3), includes self
    mean = nbr.mean(axis=1)
    d = nbr - mean[:, None, :]
    cov = jnp.einsum("nki,nkj->nij", d, d) / neighborhood_size
    _, v = jnp.linalg.eigh(cov)  # ascending eigenvalues
    normals = v[..., 0]
    if disambiguate_directions:
        proj = jnp.sum(normals * (mean - points), axis=-1)
        normals = jnp.where(proj[:, None] > 0, -normals, normals)
    return normals


def peel_border_faces(faces: np.ndarray, iterations: int = 5) -> np.ndarray:
    """Iteratively mark border faces (reference postprocess_mesh,
    system/base.py:340-356): a face is INSIDE when each of its 3 edges is
    shared with at least one other face still in the mask; every iteration
    peels the current border ring.  The reference detects duplicate edges
    with a KNN self-query at distance < 0.01 over (i, j) vertex-index pairs
    -- exact integer duplicate counting is the same predicate.  Returns the
    boolean keep-mask over faces (host-side numpy)."""
    faces = np.asarray(faces, np.int64)
    face_mask = np.ones(len(faces), bool)
    edges = np.stack(
        [faces[:, (0, 1)], faces[:, (1, 2)], faces[:, (2, 0)]], axis=1
    )
    edges = np.sort(edges, axis=-1)
    n_verts = int(faces.max()) + 1 if len(faces) else 0
    keys = edges[..., 0] * n_verts + edges[..., 1]  # (F, 3)
    for _ in range(iterations):
        live = np.nonzero(face_mask)[0]
        sub = keys[live]
        uniq, counts = np.unique(sub, return_counts=True)
        cnt = counts[np.searchsorted(uniq, sub)]
        inside = (cnt >= 2).all(axis=1)
        if inside.all():
            break
        face_mask[live] = inside
    return face_mask


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ reader: triangles + fan-triangulated polygons, positive or
    negative (relative) vertex indices."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                raw = [int(tok.split("/")[0]) for tok in line.split()[1:]]
                idx = [i - 1 if i > 0 else len(verts) + i for i in raw]
                for a, b in zip(idx[1:-1], idx[2:]):  # fan: quads and beyond
                    faces.append([idx[0], a, b])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)
