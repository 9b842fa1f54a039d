"""M0 unit tests: quaternions, SH, covariance, camera math, KNN
(test pyramid level 2, SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threestudio_3dgs_tpu.ops import quaternion, sh, gaussian_math, camera, knn


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternion:
    def test_identity(self):
        q = jnp.array([[1.0, 0, 0, 0]])
        np.testing.assert_allclose(
            quaternion.to_rotation_matrix(q)[0], np.eye(3), atol=1e-6
        )

    def test_rotation_properties(self, rng):
        q = jnp.asarray(random_quats(rng, 64))
        R = np.asarray(quaternion.to_rotation_matrix(q))
        # orthonormal, det +1
        np.testing.assert_allclose(
            R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (64, 1, 1)), atol=1e-5
        )
        np.testing.assert_allclose(np.linalg.det(R), np.ones(64), atol=1e-5)

    def test_unnormalized_input_matches_reference_semantics(self, rng):
        # reference build_rotation normalizes first (gaussian_base.py:99-105)
        q = jnp.asarray(rng.normal(size=(16, 4)) * 3.0)
        R1 = quaternion.to_rotation_matrix(q)
        R2 = quaternion.to_rotation_matrix(quaternion.normalize(q))
        np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-5)

    def test_roundtrip_matrix(self, rng):
        q = jnp.asarray(random_quats(rng, 128))
        R = quaternion.to_rotation_matrix(q)
        q2 = quaternion.from_rotation_matrix(R)
        R2 = quaternion.to_rotation_matrix(q2)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-4)

    def test_apply_matches_matrix(self, rng):
        q = jnp.asarray(random_quats(rng, 32))
        v = jnp.asarray(rng.normal(size=(32, 3)))
        out1 = quaternion.apply(q, v)
        out2 = jnp.einsum("nij,nj->ni", quaternion.to_rotation_matrix(q), v)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)

    def test_multiply_compose(self, rng):
        a = jnp.asarray(random_quats(rng, 32))
        b = jnp.asarray(random_quats(rng, 32))
        v = jnp.asarray(rng.normal(size=(32, 3)))
        out1 = quaternion.apply(quaternion.multiply(a, b), v)
        out2 = quaternion.apply(a, quaternion.apply(b, v))
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


class TestSH:
    def test_dc_only(self, rng):
        coeffs = jnp.asarray(rng.normal(size=(8, 1, 3)))
        dirs = jnp.asarray(rng.normal(size=(8, 3)))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh.eval_sh(coeffs, dirs, 0)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(coeffs[:, 0] * sh.C0), atol=1e-6
        )

    def test_rgb_sh_roundtrip(self, rng):
        rgb = jnp.asarray(rng.uniform(size=(16, 3)))
        np.testing.assert_allclose(
            np.asarray(sh.sh_to_rgb(sh.rgb_to_sh(rgb))), np.asarray(rgb), atol=1e-6
        )

    @pytest.mark.parametrize("degree", [1, 2, 3, 4])
    def test_orthonormality(self, degree, rng):
        # Monte-Carlo check: int basis_i basis_j over the sphere = delta_ij/(4pi)
        n = 200_000
        v = rng.normal(size=(n, 3))
        v = v / np.linalg.norm(v, axis=-1, keepdims=True)
        basis = np.asarray(sh.sh_basis(jnp.asarray(v), degree))
        gram = basis.T @ basis / n * (4 * np.pi)
        np.testing.assert_allclose(gram, np.eye(basis.shape[1]), atol=0.15)

    def test_color_clamp(self):
        coeffs = jnp.full((4, 1, 3), -10.0)
        dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1))
        out = sh.eval_sh_color(coeffs, dirs, 0)
        assert np.all(np.asarray(out) == 0.0)


class TestCovariance:
    def test_isotropic(self):
        scales = jnp.full((4, 3), 0.5)
        quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (4, 1))
        cov = gaussian_math.covariance_from_scaling_rotation(scales, quats)
        np.testing.assert_allclose(
            np.asarray(cov), np.tile(np.eye(3) * 0.25, (4, 1, 1)), atol=1e-6
        )

    def test_rotation_invariance_of_eigenvalues(self, rng):
        scales = jnp.asarray(np.exp(rng.normal(size=(16, 3))))
        quats = jnp.asarray(random_quats(rng, 16))
        cov = gaussian_math.covariance_from_scaling_rotation(scales, quats)
        eig = np.sort(np.linalg.eigvalsh(np.asarray(cov)), axis=-1)
        np.testing.assert_allclose(
            eig, np.sort(np.asarray(scales) ** 2, axis=-1), rtol=1e-2, atol=1e-5
        )

    def test_strip_roundtrip(self, rng):
        scales = jnp.asarray(np.exp(rng.normal(size=(8, 3))))
        quats = jnp.asarray(random_quats(rng, 8))
        cov = gaussian_math.covariance_from_scaling_rotation(scales, quats)
        cov6 = gaussian_math.strip_symmetric(cov)
        np.testing.assert_allclose(
            np.asarray(gaussian_math.unstrip_symmetric(cov6)),
            np.asarray(cov),
            atol=1e-6,
        )

    def test_scaling_modifier(self, rng):
        scales = jnp.asarray(np.exp(rng.normal(size=(8, 3))))
        quats = jnp.asarray(random_quats(rng, 8))
        c1 = gaussian_math.covariance_from_scaling_rotation(scales, quats, 2.0)
        c2 = gaussian_math.covariance_from_scaling_rotation(scales, quats, 1.0)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2) * 4.0, rtol=1e-5)

    def test_gaussian_3d_coeff_center_is_one(self, rng):
        cov6 = gaussian_math.strip_symmetric(
            gaussian_math.covariance_from_scaling_rotation(
                jnp.asarray(np.exp(rng.normal(size=(4, 3)))),
                jnp.asarray(random_quats(rng, 4)),
            )
        )
        val = gaussian_math.gaussian_3d_coeff(jnp.zeros((4, 3)), cov6)
        np.testing.assert_allclose(np.asarray(val), np.ones(4), atol=1e-5)


class TestCamera:
    def _lookat_c2w(self, eye, target=(0, 0, 0), up=(0, 0, 1)):
        eye = np.asarray(eye, np.float64)
        target = np.asarray(target, np.float64)
        up = np.asarray(up, np.float64)
        fwd = target - eye
        fwd /= np.linalg.norm(fwd)
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        up2 = np.cross(right, fwd)
        c2w = np.eye(4)
        c2w[:3, 0] = right
        c2w[:3, 1] = up2
        c2w[:3, 2] = -fwd  # OpenGL: camera looks along -z
        c2w[:3, 3] = eye
        return c2w

    def test_view_transform(self):
        c2w = jnp.asarray(self._lookat_c2w([0, -3, 0]), jnp.float32)
        cam = camera.camera_from_c2w(c2w, 0.8, 0.8, 64, 64)
        # target at origin should be directly ahead at depth 3 (OpenCV +z)
        p = cam.w2c @ jnp.array([0.0, 0, 0, 1])
        np.testing.assert_allclose(np.asarray(p), [0, 0, 3, 1], atol=1e-5)
        np.testing.assert_allclose(np.asarray(cam.campos), [0, -3, 0], atol=1e-5)

    def test_projection_center_and_depth_range(self):
        c2w = jnp.asarray(self._lookat_c2w([0, -3, 0]), jnp.float32)
        cam = camera.camera_from_c2w(c2w, 0.8, 0.8, 64, 64, znear=0.1, zfar=100.0)
        clip = cam.full_proj @ jnp.array([0.0, 0, 0, 1])
        ndc = clip[:3] / clip[3]
        np.testing.assert_allclose(np.asarray(ndc[:2]), [0, 0], atol=1e-5)
        # point at zfar maps to ndc z=1
        far_pt = jnp.array([0.0, 100.0 - 3.0, 0.0, 1.0])
        clip_far = cam.full_proj @ far_pt
        np.testing.assert_allclose(float(clip_far[2] / clip_far[3]), 1.0, atol=1e-4)

    def test_projection_edge_of_fov(self):
        fov = 0.8
        c2w = jnp.asarray(self._lookat_c2w([0, -3, 0]), jnp.float32)
        cam = camera.camera_from_c2w(c2w, fov, fov, 64, 64)
        # point at x = z * tan(fov/2), depth 3 -> ndc x = 1
        x_world = 3.0 * np.tan(fov / 2)
        clip = cam.full_proj @ jnp.array([x_world, 0.0, 0.0, 1.0])
        np.testing.assert_allclose(float(clip[0] / clip[3]), 1.0, atol=1e-5)

    def test_rays_through_center(self):
        c2w = jnp.asarray(self._lookat_c2w([0, -3, 0]), jnp.float32)
        dirs = camera.get_ray_directions(4, 4, 0.8)
        rays_o, rays_d = camera.get_rays(dirs, c2w)
        assert rays_o.shape == (4, 4, 3) and rays_d.shape == (4, 4, 3)
        # mean ray direction should point from eye toward origin
        mean_d = np.asarray(rays_d).reshape(-1, 3).mean(0)
        mean_d /= np.linalg.norm(mean_d)
        np.testing.assert_allclose(mean_d, [0, 1, 0], atol=1e-2)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(rays_d), axis=-1), 1.0, atol=1e-5
        )


class TestKNN:
    def test_exact_small(self, rng):
        pts = jnp.asarray(rng.normal(size=(100, 3)))
        d2, idx = knn.knn(pts, pts, k=3, chunk=32, exclude_self=True)
        # brute-force oracle
        full = np.sum(
            (np.asarray(pts)[:, None] - np.asarray(pts)[None]) ** 2, axis=-1
        )
        np.fill_diagonal(full, np.inf)
        oracle = np.sort(full, axis=-1)[:, :3]
        np.testing.assert_allclose(np.sort(np.asarray(d2), -1), oracle, atol=1e-4)

    def test_mean_knn_sq_dist_grid(self):
        # regular 1D-embedded grid: 3-NN of interior points are at distance 1,1,2
        xs = np.arange(32, dtype=np.float32)
        pts = jnp.asarray(np.stack([xs, np.zeros(32), np.zeros(32)], -1))
        d2 = np.asarray(knn.mean_knn_sq_dist(pts, k=3, chunk=16))
        np.testing.assert_allclose(d2[5], (1.0 + 1.0 + 4.0) / 3.0, atol=1e-5)
