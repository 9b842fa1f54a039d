"""Rasterizer golden tests (SURVEY.md section 4, level 1):
  * tiled forward (binning + chunked blend) vs the independent sequential
    numpy oracle
  * tiled forward vs the dense differentiable renderer
  * hand-derived custom VJP vs JAX autodiff through the dense renderer
  * finite-difference spot checks
  * means2d gradient side-channel (densification stats)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig, rasterize
from threestudio_3dgs_tpu.ops.rasterizer.binning import bin_gaussians
from threestudio_3dgs_tpu.ops.rasterizer.dense import dense_render
from threestudio_3dgs_tpu.ops.rasterizer.oracle import oracle_render
from threestudio_3dgs_tpu.ops.rasterizer.preprocess import project_gaussians


def lookat_c2w(eye, target=(0, 0, 0), up=(0, 0, 1)):
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    up = np.asarray(up, np.float64)
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    up2 = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up2, -fwd, eye
    return c2w


def make_scene(n=300, seed=0, height=64, width=64, spread=0.8, opacity_hi=0.95):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32) * spread * 0.4
    scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.5 - 3.0)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opacities = rng.uniform(0.05, opacity_hi, size=(n,)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    cam = cam_mod.camera_from_c2w(
        jnp.asarray(lookat_c2w([0, -2.5, 0.3]), jnp.float32),
        0.9,
        0.9,
        height,
        width,
    )
    return (
        jnp.asarray(means),
        jnp.asarray(scales),
        jnp.asarray(quats),
        jnp.asarray(opacities),
        jnp.asarray(colors),
        cam,
    )


def run_oracle(means, scales, quats, opacities, colors, cam, tile_size):
    proj = project_gaussians(means, scales, quats, cam, tile_size)
    depths_ch = np.asarray(proj.depths)[:, None]
    chans = np.concatenate([np.asarray(colors), depths_ch], axis=1)
    img, alpha, trans = oracle_render(
        np.asarray(proj.means2d),
        np.asarray(proj.depths),
        np.asarray(proj.conics),
        chans,
        np.asarray(opacities),
        np.asarray(proj.visible),
        np.asarray(proj.tiles_min),
        np.asarray(proj.tiles_max),
        cam.height,
        cam.width,
        tile_size,
    )
    return img, alpha, trans


class TestForwardParity:
    @pytest.mark.parametrize("tile_size", [16, 32])
    def test_tiled_matches_oracle(self, tile_size):
        scene = make_scene(n=300)
        means, scales, quats, opacities, colors, cam = scene
        bg = jnp.array([1.0, 1.0, 1.0])
        out = rasterize(
            means, scales, quats, opacities, cam, bg, colors=colors,
            config=RasterizeConfig(tile_size=tile_size, max_pairs=2**15, impl="jax"),
        )
        o_img, o_alpha, o_trans = run_oracle(
            means, scales, quats, opacities, colors, cam, tile_size
        )
        o_rgb = o_img[..., :3] + o_trans[..., None] * np.asarray(bg)
        assert int(out["n_dropped"]) == 0
        np.testing.assert_allclose(np.asarray(out["alpha"]), o_alpha, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out["image"]), o_rgb, atol=3e-5)
        np.testing.assert_allclose(np.asarray(out["depth"]), o_img[..., 3], atol=2e-4)

    def test_tiled_matches_dense(self):
        means, scales, quats, opacities, colors, cam = make_scene(n=400, seed=3)
        ts = 16
        proj = project_gaussians(means, scales, quats, cam, ts)
        chans = jnp.concatenate([colors, proj.depths[:, None]], axis=1)
        d_img, d_alpha = dense_render(
            proj.means2d, proj.depths, proj.conics, chans, opacities,
            proj.visible, proj.tiles_min, proj.tiles_max,
            cam.height, cam.width, ts,
        )
        out = rasterize(
            means, scales, quats, opacities, cam, jnp.zeros(3), colors=colors,
            config=RasterizeConfig(tile_size=ts, max_pairs=2**15, impl="jax"),
        )
        np.testing.assert_allclose(
            np.asarray(out["alpha"]), np.asarray(d_alpha), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["image"]), np.asarray(d_img[..., :3]), atol=1e-5
        )

    def test_high_opacity_early_termination(self):
        # near-opaque overlapping gaussians exercise the T<1e-4 freeze path
        means, scales, quats, opacities, colors, cam = make_scene(
            n=200, seed=5, spread=0.1, opacity_hi=0.999
        )
        opacities = jnp.minimum(opacities * 50.0, 0.999)
        o_img, o_alpha, o_trans = run_oracle(
            means, scales, quats, opacities, colors, cam, 16
        )
        out = rasterize(
            means, scales, quats, opacities, cam, jnp.zeros(3), colors=colors,
            config=RasterizeConfig(tile_size=16, max_pairs=2**15, impl="jax"),
        )
        np.testing.assert_allclose(np.asarray(out["alpha"]), o_alpha, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(out["image"]), o_img[..., :3], atol=3e-5
        )

    def test_empty_scene(self):
        means, scales, quats, opacities, colors, cam = make_scene(n=16)
        alive = jnp.zeros(16, bool)
        out = rasterize(
            means, scales, quats, opacities, cam, jnp.ones(3) * 0.5,
            colors=colors, alive=alive,
            config=RasterizeConfig(tile_size=16, max_pairs=1024, impl="jax"),
        )
        np.testing.assert_allclose(np.asarray(out["image"]), 0.5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["alpha"]), 0.0, atol=1e-6)

    def test_pair_overflow_reported(self):
        means, scales, quats, opacities, colors, cam = make_scene(n=500)
        out = rasterize(
            means, scales, quats, opacities, cam, jnp.zeros(3), colors=colors,
            config=RasterizeConfig(tile_size=16, max_pairs=128, impl="jax"),
        )
        assert int(out["n_dropped"]) > 0


class TestGradients:
    def _loss_tiled(self, params, cam, wmaps, ts):
        means, scales, quats, opacities, colors = params
        out = rasterize(
            means, scales, quats, opacities, cam, jnp.array([0.2, 0.3, 0.4]),
            colors=colors,
            config=RasterizeConfig(tile_size=ts, max_pairs=2**15, impl="jax"),
        )
        return (
            jnp.sum(out["image"] * wmaps[0])
            + jnp.sum(out["alpha"] * wmaps[1])
            + jnp.sum(out["depth"] * wmaps[2])
        )

    def _loss_dense(self, params, cam, wmaps, ts):
        means, scales, quats, opacities, colors = params
        proj = project_gaussians(means, scales, quats, cam, ts)
        chans = jnp.concatenate([colors, proj.depths[:, None]], axis=1)
        img, alpha = dense_render(
            proj.means2d, proj.depths, proj.conics, chans, opacities,
            proj.visible, proj.tiles_min, proj.tiles_max,
            cam.height, cam.width, ts,
        )
        rgb = img[..., :3] + (1.0 - alpha[..., None]) * jnp.array([0.2, 0.3, 0.4])
        return (
            jnp.sum(rgb * wmaps[0])
            + jnp.sum(alpha * wmaps[1])
            + jnp.sum(img[..., 3] * wmaps[2])
        )

    def test_custom_vjp_matches_dense_autodiff(self):
        means, scales, quats, opacities, colors, cam = make_scene(
            n=150, height=32, width=32
        )
        rng = np.random.default_rng(7)
        wmaps = (
            jnp.asarray(rng.normal(size=(32, 32, 3)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32)),
        )
        params = (means, scales, quats, opacities, colors)
        g_tiled = jax.grad(self._loss_tiled)(params, cam, wmaps, 16)
        g_dense = jax.grad(self._loss_dense)(params, cam, wmaps, 16)
        names = ["means", "scales", "quats", "opacities", "colors"]
        for name, gt, gd in zip(names, g_tiled, g_dense):
            scale = np.maximum(np.abs(np.asarray(gd)).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(gt) / scale,
                np.asarray(gd) / scale,
                atol=2e-4,
                err_msg=f"grad mismatch for {name}",
            )

    def test_finite_differences_means(self):
        means, scales, quats, opacities, colors, cam = make_scene(
            n=40, height=32, width=32
        )
        rng = np.random.default_rng(11)
        wmaps = (
            jnp.asarray(rng.normal(size=(32, 32, 3)).astype(np.float32)),
            jnp.zeros((32, 32)),
            jnp.zeros((32, 32)),
        )

        def loss_means(m):
            return self._loss_tiled((m, scales, quats, opacities, colors), cam, wmaps, 16)

        g = np.asarray(jax.grad(loss_means)(means))
        # pick the 5 largest-gradient coordinates for FD probing
        flat_idx = np.argsort(-np.abs(g).ravel())[:5]
        eps = 3e-4
        for fi in flat_idx:
            i, j = np.unravel_index(fi, g.shape)
            m_plus = means.at[i, j].add(eps)
            m_minus = means.at[i, j].add(-eps)
            fd = (float(loss_means(m_plus)) - float(loss_means(m_minus))) / (2 * eps)
            assert abs(fd - g[i, j]) < 2e-2 * max(abs(fd), abs(g[i, j]), 1.0), (
                f"FD mismatch at {i},{j}: fd={fd}, ad={g[i, j]}"
            )

    def test_means2d_side_channel(self):
        means, scales, quats, opacities, colors, cam = make_scene(
            n=100, height=32, width=32
        )
        offset = jnp.zeros((100, 2))

        def loss(off):
            out = rasterize(
                means, scales, quats, opacities, cam, jnp.zeros(3),
                colors=colors, means2d_offset=off,
                config=RasterizeConfig(tile_size=16, max_pairs=2**14, impl="jax"),
            )
            return jnp.sum(out["image"] ** 2)

        g = np.asarray(jax.grad(loss)(offset))
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0.0  # the side channel carries signal

    def test_no_nan_gradients_with_culled(self):
        means, scales, quats, opacities, colors, cam = make_scene(n=60)
        # push a third of the gaussians behind the camera
        means = means.at[:20, 1].add(-10.0)

        def loss(m):
            out = rasterize(
                m, scales, quats, opacities, cam, jnp.zeros(3), colors=colors,
                config=RasterizeConfig(tile_size=16, max_pairs=2**14, impl="jax"),
            )
            return jnp.sum(out["image"]) + jnp.sum(out["alpha"])

        g = np.asarray(jax.grad(loss)(means))
        assert np.isfinite(g).all()


class TestBinning:
    def test_tile_ranges_partition(self):
        means, scales, quats, opacities, colors, cam = make_scene(n=200)
        ts = 16
        proj = project_gaussians(means, scales, quats, cam, ts)
        gx = (cam.width + ts - 1) // ts
        gy = (cam.height + ts - 1) // ts
        b = bin_gaussians(proj, gx, gy, 2**14)
        ranges = np.asarray(b.tile_ranges)
        assert ranges[0] == 0
        assert (np.diff(ranges) >= 0).all()
        assert ranges[-1] == int(b.n_pairs)

    def test_depth_order_within_tile(self):
        means, scales, quats, opacities, colors, cam = make_scene(n=200)
        ts = 16
        proj = project_gaussians(means, scales, quats, cam, ts)
        gx = (cam.width + ts - 1) // ts
        gy = (cam.height + ts - 1) // ts
        b = bin_gaussians(proj, gx, gy, 2**14)
        ranges = np.asarray(b.tile_ranges)
        depths = np.asarray(proj.depths)
        pg = np.asarray(b.pair_gauss)
        for t in range(gx * gy):
            seg = pg[ranges[t] : ranges[t + 1]]
            d = depths[seg]
            assert (np.diff(d) >= -1e-6).all(), f"tile {t} not depth sorted"
