"""Batched multi-view rasterization (views stacked as tile rows) must match
the per-view loop exactly: same kernels, same numerics, shared pair capacity.

Reference contrast: the CUDA reference renders each view in a sequential
python loop (renderer/gaussian_batch_renderer.py:21); our batched path issues
ONE depth sort / expand / tile sort / blend for the whole camera batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import (
    RasterizeConfig,
    rasterize,
    rasterize_batched,
)


def _scene(n=600, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.4 - 2.6)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    return (
        jnp.asarray(means),
        jnp.asarray(scales),
        jnp.asarray(quats),
        jnp.asarray(opac),
        jnp.asarray(colors),
    )


def _cameras(b=3, height=48, width=64):
    cams = []
    for v in range(b):
        ang = 0.7 * v + 0.3
        eye = np.array([2.2 * np.sin(ang), -2.2 * np.cos(ang), 0.4 + 0.2 * v])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0, 0, 1.0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
        cams.append(
            cam_mod.camera_from_c2w(jnp.asarray(c2w), 0.8, 0.8, height, width)
        )
    return cams


CFG = RasterizeConfig(tile_size=16, max_pairs=1 << 14, impl="jax")


def test_batched_matches_loop_forward():
    means, scales, quats, opac, colors = _scene()
    cams = _cameras()
    bg = jnp.asarray([0.1, 0.2, 0.3])

    out_b = rasterize_batched(
        means, scales, quats, opac, cams, bg, colors=colors, config=CFG
    )
    for v, cam in enumerate(cams):
        out_1 = rasterize(
            means, scales, quats, opac, cam, bg, colors=colors, config=CFG
        )
        assert out_1["n_dropped"] == 0 and out_b["n_dropped"] == 0
        # bit-identical: view-local pixel frames (ty mod grid_y) keep every
        # per-pair computation exactly equal to the single-view render
        np.testing.assert_array_equal(
            np.asarray(out_b["image"][v]), np.asarray(out_1["image"])
        )
        np.testing.assert_array_equal(
            np.asarray(out_b["alpha"][v]), np.asarray(out_1["alpha"])
        )
        np.testing.assert_array_equal(
            np.asarray(out_b["depth"][v]), np.asarray(out_1["depth"])
        )
        np.testing.assert_array_equal(
            np.asarray(out_b["radii"][v]), np.asarray(out_1["radii"])
        )
        np.testing.assert_array_equal(
            np.asarray(out_b["visibility"][v]), np.asarray(out_1["visibility"])
        )


def test_batched_matches_loop_grads():
    means, scales, quats, opac, colors = _scene(n=400, seed=1)
    cams = _cameras(b=2)
    bg = jnp.zeros(3)

    def loss_batched(m, s, q, o, c):
        out = rasterize_batched(m, s, q, o, cams, bg, colors=c, config=CFG)
        return (
            jnp.sum(out["image"] * jnp.cos(out["image"]))
            + jnp.sum(out["alpha"] ** 2)
            + jnp.sum(out["depth"])
        )

    def loss_loop(m, s, q, o, c):
        tot = 0.0
        for cam in cams:
            out = rasterize(m, s, q, o, cam, bg, colors=c, config=CFG)
            tot = (
                tot
                + jnp.sum(out["image"] * jnp.cos(out["image"]))
                + jnp.sum(out["alpha"] ** 2)
                + jnp.sum(out["depth"])
            )
        return tot

    gb = jax.grad(loss_batched, argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, colors
    )
    gl = jax.grad(loss_loop, argnums=(0, 1, 2, 3, 4))(
        means, scales, quats, opac, colors
    )
    for a, b_ in zip(gb, gl):
        a, b_ = np.asarray(a), np.asarray(b_)
        # accumulation-order noise: the batched pipeline shifts chunk phases
        # in the blend and merges both views' pair-grad reductions; compare
        # against the gradient's own scale
        scale = max(1.0, float(np.abs(b_).max()))
        np.testing.assert_allclose(a, b_, rtol=0, atol=2e-4 * scale)


def test_batched_sh_and_extra_and_means2d_offset():
    means, scales, quats, opac, _ = _scene(n=300, seed=2)
    cams = _cameras(b=2, height=32, width=32)
    rng = np.random.default_rng(3)
    k = 4  # sh degree 1
    sh = jnp.asarray(rng.normal(size=(300, k, 3)).astype(np.float32) * 0.3)
    extra = jnp.asarray(rng.normal(size=(300, 2)).astype(np.float32))
    off = jnp.zeros((2, 300, 2))
    bg = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])  # per-view bg

    def f_b(offv):
        out = rasterize_batched(
            means, scales, quats, opac, cams, bg, sh_coeffs=sh, sh_degree=1,
            extra_features=extra, means2d_offset=offv, config=CFG,
        )
        return out

    out_b = f_b(off)
    for v, cam in enumerate(cams):
        out_1 = rasterize(
            means, scales, quats, opac, cam, bg[v], sh_coeffs=sh, sh_degree=1,
            extra_features=extra, means2d_offset=off[v], config=CFG,
        )
        np.testing.assert_array_equal(
            np.asarray(out_b["image"][v]), np.asarray(out_1["image"])
        )
        np.testing.assert_array_equal(
            np.asarray(out_b["extra"][v]), np.asarray(out_1["extra"])
        )

    # the means2d-offset gradient side-channel stays per (view, gaussian)
    g = jax.grad(lambda o: jnp.sum(f_b(o)["image"] ** 2))(off)
    assert g.shape == (2, 300, 2)
    assert float(jnp.max(jnp.abs(g))) > 0.0

    gl = []
    for v, cam in enumerate(cams):
        gv = jax.grad(
            lambda o: jnp.sum(
                rasterize(
                    means, scales, quats, opac, cam, bg[v], sh_coeffs=sh,
                    sh_degree=1, extra_features=extra, means2d_offset=o,
                    config=CFG,
                )["image"]
                ** 2
            )
        )(off[v])
        gl.append(gv)
    gls = np.asarray(jnp.stack(gl))
    scale = max(1.0, float(np.abs(gls).max()))
    np.testing.assert_allclose(np.asarray(g), gls, rtol=0, atol=2e-4 * scale)


def test_batched_b1_degenerate():
    means, scales, quats, opac, colors = _scene(n=200, seed=4)
    cams = _cameras(b=1)
    bg = jnp.zeros(3)
    out_b = rasterize_batched(
        means, scales, quats, opac, cams, bg, colors=colors, config=CFG
    )
    out_1 = rasterize(
        means, scales, quats, opac, cams[0], bg, colors=colors, config=CFG
    )
    np.testing.assert_allclose(
        np.asarray(out_b["image"][0]), np.asarray(out_1["image"]), atol=0
    )
    assert out_b["image"].shape[0] == 1


def test_batched_capacity_drop_reports():
    means, scales, quats, opac, colors = _scene(n=500, seed=5)
    cams = _cameras(b=2)
    cfg = RasterizeConfig(tile_size=16, max_pairs=512, impl="jax")
    out = rasterize_batched(
        means, scales, quats, opac, cams, jnp.zeros(3), colors=colors, config=cfg
    )
    assert int(out["n_dropped"]) > 0
    assert int(out["n_pairs"]) == 512
    assert np.all(np.isfinite(np.asarray(out["image"])))
