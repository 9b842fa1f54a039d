"""Native (C++) host-side components.

The reference's host-side native dependencies (pymeshlab / pyfqmr / open3d --
all C++ under python bindings) cover export-time mesh processing (SURVEY.md
section 2.2).  This package provides from-scratch C++ equivalents, compiled
on first use with g++ and bound via ctypes (no pybind11 in this image).
Every entry point has a pure-python fallback so the framework never hard
-fails without a toolchain."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libnative.so")
_lib = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    srcs = [
        os.path.join(_HERE, "decimate.cpp"),
        os.path.join(_HERE, "heat_geodesic.cpp"),
    ]
    try:
        newest_src = max(os.path.getmtime(s) for s in srcs)
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < newest_src:
            subprocess.run(
                [
                    "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                    *srcs, "-o", _LIB_PATH,
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.decimate_mesh.restype = ctypes.c_int
        lib.decimate_mesh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long),
        ]
        lib.heat_geodesic.restype = ctypes.c_int
        lib.heat_geodesic.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float),
        ]
        return lib
    except Exception:
        _build_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        _lib = _build()
    return _lib


def decimate_mesh(
    verts: np.ndarray, faces: np.ndarray, target_faces: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Quadric edge-collapse simplification down to ~target_faces.

    C++ fast path; falls back to vertex-clustering decimation in numpy when
    no toolchain is available."""
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    if len(faces) <= target_faces:
        return verts, faces
    lib = _get_lib()
    if lib is not None:
        out_v = np.empty_like(verts)
        out_f = np.empty_like(faces)
        nv = ctypes.c_long(0)
        nf = ctypes.c_long(0)
        ret = lib.decimate_mesh(
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(verts),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(faces),
            int(target_faces),
            out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(nv),
            out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ctypes.byref(nf),
        )
        if ret == 0 and nf.value > 0:
            return out_v[: nv.value].copy(), out_f[: nf.value].copy()
    return _cluster_decimate(verts, faces, target_faces)


def _cluster_decimate(verts, faces, target_faces):
    """Fallback: uniform-grid vertex clustering (coarse but dependency-free)."""
    ratio = max(target_faces / max(len(faces), 1), 1e-3)
    grid_res = max(int(np.cbrt(len(verts) * ratio) * 2), 4)
    lo = verts.min(axis=0)
    span = np.maximum(verts.max(axis=0) - lo, 1e-6)
    cell = np.floor((verts - lo) / span * (grid_res - 1)).astype(np.int64)
    key = cell[:, 0] * grid_res * grid_res + cell[:, 1] * grid_res + cell[:, 2]
    uniq, inverse = np.unique(key, return_inverse=True)
    new_verts = np.zeros((len(uniq), 3), np.float64)
    counts = np.zeros(len(uniq), np.int64)
    np.add.at(new_verts, inverse, verts)
    np.add.at(counts, inverse, 1)
    new_verts = (new_verts / counts[:, None]).astype(np.float32)
    new_faces = inverse[faces]
    keep = (
        (new_faces[:, 0] != new_faces[:, 1])
        & (new_faces[:, 1] != new_faces[:, 2])
        & (new_faces[:, 0] != new_faces[:, 2])
    )
    return new_verts, new_faces[keep].astype(np.int32)


# ---------------------------------------------------------------------------
# Heat-method geodesic distances (potpourri3d equivalent, reference
# geometry/dynamic_sugar.py:38,741-766)
# ---------------------------------------------------------------------------


def heat_geodesic_distances(
    verts: np.ndarray, faces: np.ndarray, sources: np.ndarray
) -> np.ndarray:
    """Geodesic distance from each source vertex to all vertices, (S, V).

    C++ fast path (CSR cotan Laplacian + Jacobi-CG, native/heat_geodesic.cpp);
    scipy.sparse sparse-LU fallback implementing the same heat method."""
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    sources = np.ascontiguousarray(sources, np.int32)
    lib = _get_lib()
    if lib is not None:
        out = np.empty((len(sources), len(verts)), np.float32)
        ret = lib.heat_geodesic(
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(verts),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(faces),
            sources.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(sources),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if ret == 0:
            return out
    return _heat_geodesic_scipy(verts, faces, sources)


def _heat_geodesic_scipy(verts, faces, sources):
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    v = verts.astype(np.float64)
    nv = len(v)
    i, j, k = faces[:, 0], faces[:, 1], faces[:, 2]
    e0 = v[k] - v[j]  # opposite i
    e1 = v[i] - v[k]  # opposite j
    e2 = v[j] - v[i]  # opposite k
    n = np.cross(e1, e2)
    area = 0.5 * np.maximum(np.linalg.norm(n, axis=1), 1e-16)
    nrm = n / (2 * area)[:, None]

    rows, cols, vals = [], [], []
    mass = np.zeros(nv)
    for (a, b, opp_e1, opp_e2) in ((j, k, e1, e2), (k, i, e2, e0), (i, j, e0, e1)):
        cot = -np.einsum("fd,fd->f", opp_e1, opp_e2) / (2 * area)
        w = 0.5 * cot
        rows += [a, b, a, b]
        cols += [b, a, a, b]
        vals += [-w, -w, w, w]
    for vidx in (i, j, k):
        np.add.at(mass, vidx, area / 3.0)
    L = sp.csr_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(nv, nv),
    )
    h = np.mean(
        [np.linalg.norm(e, axis=1).mean() for e in (e0, e1, e2)]
    )
    t = h * h
    M = sp.diags(mass)
    solve_heat = spla.factorized((M + t * L).tocsc())
    solve_pois = spla.factorized((L + 1e-8 * M).tocsc())

    out = np.empty((len(sources), nv), np.float32)
    for s_i, src in enumerate(sources):
        delta = np.zeros(nv)
        delta[src] = 1.0
        u = solve_heat(delta)
        # face gradients, normalized, negated
        g = (
            u[i][:, None] * np.cross(nrm, e0)
            + u[j][:, None] * np.cross(nrm, e1)
            + u[k][:, None] * np.cross(nrm, e2)
        )
        g = -g / (np.linalg.norm(g, axis=1, keepdims=True) + 1e-30)
        # vertex divergence
        div = np.zeros(nv)
        for (p, q, r) in ((i, j, k), (j, k, i), (k, i, j)):
            ep1 = v[q] - v[p]
            ep2 = v[r] - v[p]
            cot_r = np.einsum("fd,fd->f", v[p] - v[r], v[q] - v[r])
            cot_r /= np.linalg.norm(np.cross(v[p] - v[r], v[q] - v[r]), axis=1) + 1e-30
            cot_q = np.einsum("fd,fd->f", v[p] - v[q], v[r] - v[q])
            cot_q /= np.linalg.norm(np.cross(v[p] - v[q], v[r] - v[q]), axis=1) + 1e-30
            contrib = 0.5 * (
                cot_r * np.einsum("fd,fd->f", ep1, g)
                + cot_q * np.einsum("fd,fd->f", ep2, g)
            )
            np.add.at(div, p, contrib)
        # PSD stiffness = -Laplacian in weak form: solve L phi = -div
        phi = solve_pois(-div)
        out[s_i] = np.maximum(phi - phi[src], 0.0)
    return out
