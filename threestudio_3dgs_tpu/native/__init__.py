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
    src = os.path.join(_HERE, "decimate.cpp")
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(src):
            subprocess.run(
                [
                    "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                    src, "-o", _LIB_PATH,
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
