"""Hardware packed-vs-unpacked gradient comparison (advisor round-3 #1).

The production TPU backward carries the pair-gradient reduction sort with
21-bit packed columns (ops/rasterizer/pack.py); its 2^-13 error bound is
relative to the per-segment sum of |terms|, not the net gradient, so
cancellation-heavy segments could exceed the stated 1e-3 relative budget.
This script measures the END-TO-END parameter gradients of a realistic
1M-Gaussian scene with PACK_GRAD_BITS=21 vs exact f32 columns (=0) and
reports the worst relative error against the exact-grad scale.

Run on hardware via scripts/tpu_validate_all.sh; passes if the max
scale-relative error stays inside the 1e-3 budget.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig, rasterize
from threestudio_3dgs_tpu.ops.rasterizer import binning as bin_mod

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
height = width = 512
rng = np.random.default_rng(0)
means = rng.normal(size=(n, 3)).astype(np.float32) * 0.35
scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.3 - 5.2)
quats = rng.normal(size=(n, 4)).astype(np.float32)
opacities = rng.uniform(0.2, 0.9, size=(n,)).astype(np.float32)
colors = rng.uniform(size=(n, 3)).astype(np.float32)

eye = np.array([0.0, -2.5, 0.5])
fwd = -eye / np.linalg.norm(eye)
right = np.cross(fwd, [0, 0, 1.0])
right /= np.linalg.norm(right)
up = np.cross(right, fwd)
c2w = np.eye(4, dtype=np.float32)
c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
cam = cam_mod.camera_from_c2w(jnp.asarray(c2w), 0.9, 0.9, height, width)
cfg = RasterizeConfig(tile_size=32, max_pairs=2**21)
args = tuple(map(jnp.asarray, (means, scales, quats, opacities, colors)))
bg = jnp.zeros(3)


def loss_fn(ms, sc, qt, op, co):
    out = rasterize(ms, sc, qt, op, cam, bg, colors=co, config=cfg)
    # a non-uniform cotangent exercises cancellation across pixels
    img = out["image"]
    w = jnp.sin(jnp.arange(img.shape[0]) * 0.37)[:, None, None]
    return jnp.sum(img * w) + jnp.sum(out["alpha"]) + 0.3 * jnp.sum(out["depth"])


def grads_with_bits(bits: int):
    bin_mod.PACK_GRAD_BITS = bits
    g = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))(*args)
    return jax.device_get(g)


g_exact = grads_with_bits(0)
g_packed = grads_with_bits(21)
bin_mod.PACK_GRAD_BITS = 21  # restore the default

budget = 1e-3
worst = 0.0
for name, ge, gp in zip(
    ("means", "scales", "quats", "opacities", "colors"), g_exact, g_packed
):
    scale = np.max(np.abs(ge)) + 1e-12
    err = np.max(np.abs(np.asarray(gp) - np.asarray(ge))) / scale
    worst = max(worst, float(err))
    print(f"{name:10s} max|packed-exact|/max|exact| = {err:.3e}")

status = "PASS" if worst <= budget else "FAIL"
print(f"{status}: worst scale-relative packed-grad error {worst:.3e} "
      f"(budget {budget})")
sys.exit(0 if worst <= budget else 1)
