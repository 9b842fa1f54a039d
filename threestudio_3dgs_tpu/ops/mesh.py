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


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray, eps=1e-12) -> jnp.ndarray:
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    n = jnp.cross(v1 - v0, v2 - v0)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), eps)


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray, eps=1e-12) -> jnp.ndarray:
    """Area-weighted vertex normals (scatter-add of face normals)."""
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)  # area-weighted
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), eps)


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
    return jnp.sum(jnp.linalg.norm(lap, axis=-1) * has_nbr) / jnp.maximum(
        jnp.sum(has_nbr), 1.0
    )


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


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:4]]
                faces.append(idx)
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)
