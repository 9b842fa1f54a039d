"""Pallas kernel parity vs the portable JAX blend (interpret mode on CPU;
RUN_ON_TPU=1 runs the same tests compiled on hardware)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import blend_jax
from threestudio_3dgs_tpu.ops.rasterizer.binning import bin_gaussians
from threestudio_3dgs_tpu.ops.rasterizer.blend_pallas import (
    blend_backward_pallas,
    blend_forward_pallas,
)
from threestudio_3dgs_tpu.ops.rasterizer.preprocess import project_gaussians

from test_rasterizer import lookat_c2w, make_scene

INTERPRET = not os.environ.get("RUN_ON_TPU")

# Interpret mode on CPU matches the XLA twin almost bitwise; COMPILED on
# hardware both sides re-associate differently (MXU monomial/moment matmuls
# vs XLA's fusion choices, which shift with the toolchain), so the compiled
# comparison needs headroom: measured max |diff| 2.7e-4 across the suite on
# v5e (round 3).  The authoritative accuracy gate is the oracle PSNR floor
# (test_quality_regression, 96 dB), not twin parity.
ATOL = 1e-4 if INTERPRET else 5e-4


def build_blend_inputs(n=300, seed=0, tile_size=16, height=64, width=64, opacity_hi=0.95):
    means, scales, quats, opacities, colors, cam = make_scene(
        n=n, seed=seed, height=height, width=width, opacity_hi=opacity_hi
    )
    proj = project_gaussians(means, scales, quats, cam, tile_size)
    gx = (width + tile_size - 1) // tile_size
    gy = (height + tile_size - 1) // tile_size
    b = bin_gaussians(proj, gx, gy, 2**14)
    chans = jnp.concatenate([colors, proj.depths[:, None]], axis=1)
    feats = jnp.concatenate(
        [proj.means2d, proj.conics, opacities[:, None], chans], axis=1
    )
    pair_feats = feats[b.pair_gauss]
    return pair_feats, b.tile_ranges, gx, gy, chans.shape[1]


@pytest.mark.parametrize("seed", [0, 5])
def test_forward_parity(seed):
    ts = 16
    pair_feats, ranges, gx, gy, c = build_blend_inputs(seed=seed, tile_size=ts)
    ref = blend_jax.blend_forward(pair_feats, ranges, gx, gy, ts, c)
    out = blend_forward_pallas(
        pair_feats, ranges, gx, gy, ts, c, interpret=INTERPRET
    )
    # the kernel evaluates the exponent as a monomial-basis MXU matmul --
    # a different f32 association than the twin's elementwise form
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=ATOL)


def test_forward_parity_early_termination():
    ts = 16
    pair_feats, ranges, gx, gy, c = build_blend_inputs(
        n=200, seed=5, tile_size=ts, opacity_hi=0.999
    )
    ref = blend_jax.blend_forward(pair_feats, ranges, gx, gy, ts, c)
    out = blend_forward_pallas(
        pair_feats, ranges, gx, gy, ts, c, interpret=INTERPRET
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=ATOL)


def test_backward_parity_alpha_clamp():
    """High opacities push alpha past ALPHA_MAX=0.99, exercising the clamped
    d_alpha/d_power masking branch end-to-end (advisor round-2 item)."""
    ts = 16
    pair_feats, ranges, gx, gy, c = build_blend_inputs(
        n=200, seed=5, tile_size=ts, opacity_hi=0.999
    )
    out = blend_jax.blend_forward(pair_feats, ranges, gx, gy, ts, c)
    rng = np.random.default_rng(7)
    g = jnp.asarray(rng.normal(size=out.shape).astype(np.float32))
    ref = blend_jax.blend_backward(pair_feats, ranges, out, g, gx, gy, ts, c)
    got = blend_backward_pallas(
        pair_feats, ranges, out, g, gx, gy, ts, c, interpret=INTERPRET
    )
    scale = max(float(jnp.max(jnp.abs(ref))), 1e-3)
    np.testing.assert_allclose(
        np.asarray(got) / scale, np.asarray(ref) / scale, atol=ATOL
    )


@pytest.mark.parametrize("seed", [0, 5])
def test_backward_parity(seed):
    ts = 16
    pair_feats, ranges, gx, gy, c = build_blend_inputs(seed=seed, tile_size=ts)
    out = blend_jax.blend_forward(pair_feats, ranges, gx, gy, ts, c)
    rng = np.random.default_rng(seed)
    g = jnp.asarray(rng.normal(size=out.shape).astype(np.float32))
    ref = blend_jax.blend_backward(pair_feats, ranges, out, g, gx, gy, ts, c)
    got = blend_backward_pallas(
        pair_feats, ranges, out, g, gx, gy, ts, c, interpret=INTERPRET
    )
    scale = max(float(jnp.max(jnp.abs(ref))), 1e-3)
    np.testing.assert_allclose(
        np.asarray(got) / scale, np.asarray(ref) / scale, atol=ATOL
    )
