"""Render-quality regression floor (VERDICT round-1 weak #6).

One FIXED seeded scene, rendered by the production pipeline and by the
numpy oracle; PSNR must stay above a stored floor.  Unit tolerances guard
individual kernels -- this guards the ACCUMULATED error of the whole
pipeline (bf16 matmul splits, early exits, pair-capacity accounting), so a
kernel optimization that quietly erodes accuracy fails here even when every
per-op tolerance still passes.

On CPU the XLA fallback path runs; under RUN_ON_TPU=1 the same scene runs
the Pallas path on hardware (tpu_validate_all.sh does this every hardware
validation sweep).  Floors were measured at round 2 (CPU f32: PSNR ~inf-ish
high; hardware bf16 splits land lower) and set with safety margin."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig, rasterize
from threestudio_3dgs_tpu.ops.rasterizer.oracle import oracle_render
from threestudio_3dgs_tpu.ops.rasterizer.preprocess import project_gaussians

SEED = 1234
N = 20_000
RES = 256
TILE = 32

# stored floors (dB), set ~10 dB under the round-2 measurements:
# CPU/XLA f32 measured 145.4 dB; TPU/Pallas (bf16-split MXU scans)
# measured 96.0 dB with alpha_max_err 2.8e-4; round 4 (24-bit packed sort
# payloads) measured 95.5 dB with alpha_max_err 2.4e-3.
PSNR_FLOOR_CPU = 130.0
PSNR_FLOOR_TPU = 85.0
# Alpha disagreements vs the exact-f32 oracle are dominated by DISCRETE
# gate flips, not smooth error: any implementation difference (f24-rounded
# opacity/conic, monomial-matmul association) can flip a pair sitting
# within epsilon of the alpha >= ALPHA_MIN = 1/255 inclusion gate, moving
# that pixel's alpha by up to ALPHA_MIN * transmittance <= 3.92e-3 -- the
# same flip class exists between the CUDA rasterizer and any re-
# implementation.  Bound: one full gate flip + the smooth-error floor.
ALPHA_MAX_ERR = 1.0 / 255.0 + 1e-3


def fixed_scene():
    rng = np.random.default_rng(SEED)
    means = rng.normal(size=(N, 3)).astype(np.float32) * 0.35
    scales = np.exp(rng.normal(size=(N, 3)).astype(np.float32) * 0.5 - 3.2)
    quats = rng.normal(size=(N, 4)).astype(np.float32)
    opacities = rng.uniform(0.05, 0.95, size=(N,)).astype(np.float32)
    colors = rng.uniform(size=(N, 3)).astype(np.float32)
    eye = np.array([0.0, -2.5, 0.3])
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
    cam = cam_mod.camera_from_c2w(jnp.asarray(c2w), 0.9, 0.9, RES, RES)
    return (
        jnp.asarray(means),
        jnp.asarray(scales),
        jnp.asarray(quats),
        jnp.asarray(opacities),
        jnp.asarray(colors),
        cam,
    )


def psnr(a, b, peak=1.0):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(peak * peak / mse)


class TestQualityRegression:
    def test_pipeline_psnr_vs_oracle(self):
        means, scales, quats, opacities, colors, cam = fixed_scene()
        cfg = RasterizeConfig(tile_size=TILE, max_pairs=1 << 19)
        out = rasterize(
            means, scales, quats, opacities, cam, jnp.zeros(3),
            colors=colors, config=cfg,
        )
        assert int(np.asarray(out["n_dropped"])) == 0

        proj = project_gaussians(means, scales, quats, cam, TILE)
        o_img, o_alpha, _ = oracle_render(
            np.asarray(proj.means2d),
            np.asarray(proj.depths),
            np.asarray(proj.conics),
            np.asarray(colors),
            np.asarray(opacities),
            np.asarray(proj.visible),
            np.asarray(proj.tiles_min),
            np.asarray(proj.tiles_max),
            RES,
            RES,
            TILE,
        )
        on_tpu = bool(os.environ.get("RUN_ON_TPU"))
        floor = PSNR_FLOOR_TPU if on_tpu else PSNR_FLOOR_CPU
        p = psnr(out["image"], o_img)
        a_err = float(np.abs(np.asarray(out["alpha"]) - o_alpha).max())
        print(
            f"[quality] impl={'pallas/tpu' if on_tpu else 'xla/cpu'} "
            f"PSNR={p:.2f} dB alpha_max_err={a_err:.2e}"
        )
        assert p >= floor, (
            f"pipeline PSNR vs oracle regressed: {p:.2f} dB < floor {floor}"
        )
        assert a_err < ALPHA_MAX_ERR
