"""Unit tests for Lie ops, SE(3) splines, dual quaternions, ARAP
(SURVEY.md section 4 level 2: spline vs dense reimplementation, DQS vs LBS on
rigid motion, ARAP zero under rigid transform)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threestudio_3dgs_tpu.ops import arap, dual_quaternion as dq, lie, quaternion, spline


def rand_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestLie:
    def test_so3_exp_log_roundtrip(self, rng):
        # log returns the principal branch, so keep |phi| < pi
        raw = rng.normal(size=(64, 3))
        raw = raw / np.linalg.norm(raw, axis=-1, keepdims=True)
        phi = jnp.asarray(raw * rng.uniform(0.0, 3.0, size=(64, 1)))
        out = lie.so3_log(lie.so3_exp(phi))
        np.testing.assert_allclose(np.asarray(out), np.asarray(phi), atol=1e-4)

    def test_so3_exp_small_angle(self):
        phi = jnp.array([[1e-9, 0, 0], [0.0, 0, 0]])
        q = lie.so3_exp(phi)
        np.testing.assert_allclose(np.asarray(q[:, 0]), 1.0, atol=1e-6)
        assert np.isfinite(np.asarray(lie.so3_log(q))).all()

    def test_so3_exp_matches_rotation(self, rng):
        phi = jnp.asarray(rng.normal(size=(16, 3)))
        v = jnp.asarray(rng.normal(size=(16, 3)))
        out1 = quaternion.apply(lie.so3_exp(phi), v)
        # Rodrigues formula oracle
        angle = np.linalg.norm(np.asarray(phi), axis=-1, keepdims=True)
        axis = np.asarray(phi) / angle
        vn = np.asarray(v)
        cos, sin = np.cos(angle), np.sin(angle)
        out2 = (
            vn * cos
            + np.cross(axis, vn) * sin
            + axis * np.sum(axis * vn, -1, keepdims=True) * (1 - cos)
        )
        np.testing.assert_allclose(np.asarray(out1), out2, atol=1e-5)

    def test_se3_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 6)))
        out = lie.se3_log(lie.se3_exp(xi))
        np.testing.assert_allclose(np.asarray(out), np.asarray(xi), atol=1e-4)

    def test_se3_compose_inverse(self, rng):
        a = lie.se3_exp(jnp.asarray(rng.normal(size=(8, 6))))
        ident = lie.se3_compose(a, lie.se3_inverse(a))
        np.testing.assert_allclose(np.asarray(ident[:, :3]), 0.0, atol=1e-5)
        np.testing.assert_allclose(
            np.abs(np.asarray(ident[:, 3])), 1.0, atol=1e-5
        )


class TestSpline:
    def test_cubic_constant_knots(self, rng):
        # all knots equal -> spline is constant
        q = jnp.asarray(rand_quats(rng, 1))
        xyz = jnp.asarray(rng.normal(size=(1, 3)))
        k_xyz = jnp.tile(xyz[:, None], (1, 8, 1))
        k_q = jnp.tile(q[:, None], (1, 8, 1))
        for t in [0.0, 0.3, 0.7, 1.0]:
            out_xyz, out_q = spline.spline_eval(k_xyz, k_q, jnp.float32(t))
            np.testing.assert_allclose(np.asarray(out_xyz), np.asarray(xyz), atol=1e-5)
            dot = np.abs(np.sum(np.asarray(out_q) * np.asarray(q), -1))
            np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_cubic_partition_of_unity(self, rng):
        u = jnp.asarray(rng.uniform(size=(100,)))
        ct, _ = spline.cubic_coeffs(u)
        np.testing.assert_allclose(np.asarray(jnp.sum(ct, -1)), 1.0, atol=1e-6)

    def test_matches_dense_bspline_translation(self, rng):
        # oracle: evaluate the cubic B-spline basis directly over all knots
        k = 10
        knots = rng.normal(size=(1, k, 3)).astype(np.float32)
        k_q = np.tile(np.array([1.0, 0, 0, 0], np.float32), (1, k, 1))
        interval, start, t_low, t_up = spline.spline_timing(k)

        def bspline_basis(x):
            # cardinal cubic B-spline centered at 0 on knots spaced 1 apart
            ax = abs(x)
            if ax < 1:
                return 2.0 / 3 - ax * ax + ax ** 3 / 2
            if ax < 2:
                return (2 - ax) ** 3 / 6
            return 0.0

        for t in [0.15, 0.4, 0.8]:
            out_xyz, _ = spline.spline_eval(
                jnp.asarray(knots), jnp.asarray(k_q), jnp.float32(t)
            )
            x = (t - start) / interval
            # knot i is the cardinal basis centered at normalized time i
            oracle = sum(bspline_basis(x - i) * knots[0, i] for i in range(k))
            np.testing.assert_allclose(
                np.asarray(out_xyz[0]), oracle, atol=1e-4,
                err_msg=f"t={t}",
            )

    def test_interpolates_smooth_rotation(self, rng):
        # knots rotating about z at constant rate: spline should track it
        k = 12
        angles = np.linspace(0, np.pi / 2, k)
        k_q = np.stack(
            [np.cos(angles / 2), np.zeros(k), np.zeros(k), np.sin(angles / 2)], -1
        )[None].astype(np.float32)
        k_xyz = np.zeros((1, k, 3), np.float32)
        _, out_q = spline.spline_eval(
            jnp.asarray(k_xyz), jnp.asarray(k_q), jnp.float32(0.5)
        )
        out_angle = 2 * np.arctan2(np.asarray(out_q)[0, 3], np.asarray(out_q)[0, 0])
        # mid-trajectory angle should be near the middle of the range
        assert abs(out_angle - np.pi / 4) < 0.1


class TestDualQuaternion:
    def test_transform_matches_direct(self, rng):
        q = jnp.asarray(rand_quats(rng, 16))
        t = jnp.asarray(rng.normal(size=(16, 3)))
        p = jnp.asarray(rng.normal(size=(16, 3)))
        d = dq.from_quat_translation(q, t)
        out1 = dq.transform_point(d, p)
        out2 = quaternion.apply(q, p) + t
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    def test_multiply_composes(self, rng):
        q1, q2 = (jnp.asarray(rand_quats(rng, 8)) for _ in range(2))
        t1, t2 = (jnp.asarray(rng.normal(size=(8, 3))) for _ in range(2))
        p = jnp.asarray(rng.normal(size=(8, 3)))
        d = dq.multiply(
            dq.from_quat_translation(q1, t1), dq.from_quat_translation(q2, t2)
        )
        out1 = dq.transform_point(d, p)
        out2 = quaternion.apply(q1, quaternion.apply(q2, p) + t2) + t1
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    def test_blend_rigid_equals_lbs_on_identical_transforms(self, rng):
        # all bones identical -> DQS == LBS == the transform itself
        q = jnp.asarray(rand_quats(rng, 1))
        t = jnp.asarray(rng.normal(size=(1, 3)))
        d = dq.from_quat_translation(q, t)
        dqs = jnp.tile(d[:, None], (1, 4, 1))
        weights = jnp.asarray(rng.dirichlet(np.ones(4), size=(1,)))
        blended = dq.blend(dqs, weights)
        p = jnp.asarray(rng.normal(size=(1, 3)))
        np.testing.assert_allclose(
            np.asarray(dq.transform_point(blended, p)),
            np.asarray(dq.transform_point(d, p)),
            atol=1e-5,
        )


class TestARAP:
    def _mesh(self):
        # a small grid mesh
        xs, ys = np.meshgrid(np.arange(4), np.arange(4))
        verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(16)], -1).astype(
            np.float32
        )
        faces = []
        for i in range(3):
            for j in range(3):
                a = i * 4 + j
                faces.append([a, a + 1, a + 4])
                faces.append([a + 1, a + 5, a + 4])
        return verts, np.array(faces, np.int32)

    def test_zero_under_rigid_transform(self, rng):
        verts, faces = self._mesh()
        nbr_idx, nbr_mask = arap.build_one_ring(faces, len(verts))
        q = jnp.asarray(rand_quats(rng, 1))[0]
        t = jnp.asarray(rng.normal(size=(3,)))
        deformed = quaternion.apply(q[None], jnp.asarray(verts)) + t
        e = arap.arap_energy(
            jnp.asarray(verts), deformed, jnp.asarray(nbr_idx), jnp.asarray(nbr_mask)
        )
        assert float(e) < 1e-8

    def test_positive_under_nonrigid(self, rng):
        verts, faces = self._mesh()
        nbr_idx, nbr_mask = arap.build_one_ring(faces, len(verts))
        deformed = jnp.asarray(verts) * jnp.asarray([2.0, 1.0, 1.0])
        e = arap.arap_energy(
            jnp.asarray(verts), deformed, jnp.asarray(nbr_idx), jnp.asarray(nbr_mask)
        )
        assert float(e) > 0.1

    def test_cotangent_weights_positive_interior(self):
        verts, faces = self._mesh()
        nbr_idx, nbr_mask = arap.build_one_ring(faces, len(verts))
        w = arap.cotangent_weights(
            jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(nbr_idx),
            jnp.asarray(nbr_mask),
        )
        assert np.isfinite(np.asarray(w)).all()
        assert float(jnp.sum(w)) > 0
