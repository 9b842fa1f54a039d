"""Hybrid 2D-mesh sharded rendering (cameras x tile-rows) must match the
single-device renders exactly, with per-Gaussian gradients psum'd over both
mesh axes (SURVEY.md section 2.4 north star; the reference has no
distributed execution at all)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig, rasterize
from threestudio_3dgs_tpu.parallel.hybrid import make_hybrid_rasterize
from threestudio_3dgs_tpu.parallel.mesh import make_mesh


def _scene(n=400, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.4),
        jnp.asarray(
            np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.4 - 2.6)
        ),
        jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
    )


def _cameras(b, height, width):
    cams = []
    for v in range(b):
        ang = 0.8 * v + 0.3
        eye = np.array([2.1 * np.sin(ang), -2.1 * np.cos(ang), 0.5])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0, 0, 1.0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
        cams.append(
            cam_mod.camera_from_c2w(jnp.asarray(c2w), 0.85, 0.85, height, width)
        )
    return cams


@pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device virtual CPU mesh"
)
class TestHybrid2DMesh:
    def setup_method(self, _):
        self.mesh = make_mesh(8, axis_names=("data", "tile"), shape=(2, 4))
        self.height, self.width = 64, 64
        self.cfg = RasterizeConfig(tile_size=16, max_pairs=1 << 14, impl="jax")
        self.cams = _cameras(2, self.height, self.width)
        self.scene = _scene()
        self.bg = jnp.asarray([0.1, 0.1, 0.1])
        self.render = make_hybrid_rasterize(
            self.mesh, self.cams, self.bg, config=self.cfg
        )

    def test_forward_matches_single_device(self):
        out = jax.jit(self.render)(*self.scene)
        for v, cam in enumerate(self.cams):
            ref = rasterize(*self.scene[:4], cam, self.bg,
                            colors=self.scene[4], config=self.cfg)
            np.testing.assert_allclose(
                np.asarray(out["image"][v]), np.asarray(ref["image"]),
                rtol=0, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(out["depth"][v]), np.asarray(ref["depth"]),
                rtol=0, atol=1e-4,
            )
            np.testing.assert_array_equal(
                np.asarray(out["visibility"][v]), np.asarray(ref["visibility"])
            )

    def test_grads_psum_over_both_axes(self):
        def loss_h(*scene):
            out = self.render(*scene)
            return jnp.sum(out["image"] ** 2) + jnp.sum(out["alpha"])

        def loss_ref(*scene):
            t = 0.0
            for cam in self.cams:
                o = rasterize(*scene[:4], cam, self.bg, colors=scene[4],
                              config=self.cfg)
                t = t + jnp.sum(o["image"] ** 2) + jnp.sum(o["alpha"])
            return t

        gh = jax.jit(jax.grad(loss_h, argnums=(0, 1, 2, 3, 4)))(*self.scene)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*self.scene)
        for a, b in zip(gh, gr):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(1.0, float(np.abs(b).max()))
            np.testing.assert_allclose(a, b, rtol=0, atol=3e-4 * scale)
