"""Heat-method geodesics: flat-grid oracle (geodesic == euclidean on a plane),
C++ vs scipy agreement, and sphere great-circle sanity."""

import numpy as np
import pytest

from threestudio_3dgs_tpu.native import (
    _get_lib,
    _heat_geodesic_scipy,
    heat_geodesic_distances,
)


def grid_mesh(n=20, scale=1.0):
    xs, ys = np.meshgrid(np.linspace(0, scale, n), np.linspace(0, scale, n))
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], axis=1)
    faces = []
    for r in range(n - 1):
        for c in range(n - 1):
            a = r * n + c
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    return verts.astype(np.float32), np.asarray(faces, np.int32)


def sphere_mesh(nu=24, nv=12):
    us = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    vs = np.linspace(1e-3, np.pi - 1e-3, nv)
    verts = []
    for v in vs:
        for u in us:
            verts.append(
                [np.sin(v) * np.cos(u), np.sin(v) * np.sin(u), np.cos(v)]
            )
    faces = []
    for r in range(nv - 1):
        for c in range(nu):
            a = r * nu + c
            b = r * nu + (c + 1) % nu
            faces.append([a, b, a + nu])
            faces.append([b, b + nu, a + nu])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def test_flat_grid_matches_euclidean():
    verts, faces = grid_mesh(20)
    src = np.array([0], np.int32)  # corner
    d = heat_geodesic_distances(verts, faces, src)[0]
    eu = np.linalg.norm(verts - verts[0], axis=1)
    # heat method smooths slightly; agreement within a few % of the diagonal
    err = np.abs(d - eu)
    assert err.max() < 0.06 * eu.max(), err.max()


def test_native_matches_scipy():
    verts, faces = grid_mesh(12)
    src = np.array([0, 77], np.int32)
    lib = _get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain")
    d_cpp = heat_geodesic_distances(verts, faces, src)
    d_sp = _heat_geodesic_scipy(verts, faces, src)
    np.testing.assert_allclose(d_cpp, d_sp, atol=2e-3)


def test_sphere_great_circle():
    verts, faces = sphere_mesh()
    # source near the north pole; distance to near-south-pole ~ pi
    src = np.array([0], np.int32)
    d = heat_geodesic_distances(verts, faces, src)[0]
    far = d[-1]  # a vertex on the last (southern) ring
    assert 2.6 < far < 3.6, far  # great-circle distance ~= pi


def test_dynamic_sugar_geodesic_weights():
    """DynamicSuGaR init with dg_dist_mode='geodesic' builds normalized
    skinning weights over geodesically-nearest nodes."""
    from test_sugar import make_sphere_mesh
    from threestudio_3dgs_tpu.models.dynamic_sugar import (
        DynamicSuGaRConfig,
        DynamicSuGaRModel,
    )

    cfg = DynamicSuGaRConfig(
        n_gaussians_per_surface_triangle=1,
        n_dg_nodes=16,
        dg_node_connectivity=4,
        num_frames=4,
        use_spline=False,
        dg_dist_mode="geodesic",
    )
    model = DynamicSuGaRModel(cfg)
    verts, faces = make_sphere_mesh()
    model.bind_mesh(verts, faces)
    state = model.init_state(0)
    w = np.asarray(state.skin_w)
    assert w.shape[1] == 4
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)
    assert (w >= 0).all()
