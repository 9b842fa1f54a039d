"""Measure the per-quadrant pair-compaction premise (PERF.md 'Next
optimizations' #1): for the bench scene, how many of its tile's four 16x16
quadrants can each blend pair actually reach (alpha >= ALPHA_MIN)?

Element ratio of the quadrant-compacted blend vs the current whole-tile
kernel = mean(touches) * (256 / 1024) = mean(touches) / 4.  The round-3 note
claims ~0.4x (mean ~1.6); this probe measures it before the kernel is built.
"""

import numpy as np
import jax
import jax.numpy as jnp

from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig
from threestudio_3dgs_tpu.ops.rasterizer.api import _resolve_impl
from threestudio_3dgs_tpu.ops.rasterizer.binning import bin_gaussians_with_feats
from threestudio_3dgs_tpu.ops.rasterizer.preprocess import project_gaussians
from threestudio_3dgs_tpu.ops.rasterizer.blend_jax import ALPHA_MIN

n = 1_000_000
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
ts = cfg.tile_size
grid_x = grid_y = 512 // ts


@jax.jit
def build():
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats), cam,
        tile_size=ts,
    )
    depths = proj.depths
    chans = jnp.concatenate(
        [jnp.asarray(colors), depths[:, None]], axis=1
    )
    binning, pair_feats = bin_gaussians_with_feats(
        proj, grid_x, grid_y, cfg.max_pairs, ts, jnp.asarray(opacities), chans
    )
    return binning.tile_ranges, pair_feats, binning.n_pairs


tile_ranges, pair_feats, n_pairs = jax.device_get(build())
n_pairs = int(n_pairs)
print(f"pairs: {n_pairs}")
pf = np.asarray(pair_feats)

# per-pair tile id from the ranges
p = np.arange(pf.shape[0])
tile_of = np.searchsorted(tile_ranges, p, side="right") - 1
valid = (p < tile_ranges[-1])
mx, my = pf[:, 0], pf[:, 1]
ca, cb, cc, opa = pf[:, 2], pf[:, 3], pf[:, 4], pf[:, 5]
tx0 = (tile_of % grid_x) * ts
ty0 = (tile_of // grid_x) * ts


def reachable(x0, y0, half):
    x1 = x0 + (half - 1.0)
    y1 = y0 + (half - 1.0)
    dxe = np.clip(mx, x0, x1) - mx
    dye = np.clip(my, y0, y1) - my
    sa = np.maximum(ca, 1e-12)
    sc = np.maximum(cc, 1e-12)
    dy1 = np.clip(-cb * dxe / sc, y0 - my, y1 - my)
    q1 = ca * dxe * dxe + 2.0 * cb * dxe * dy1 + cc * dy1 * dy1
    dx2 = np.clip(-cb * dye / sa, x0 - mx, x1 - mx)
    q2 = ca * dx2 * dx2 + 2.0 * cb * dx2 * dye + cc * dye * dye
    qmin = np.minimum(q1, q2)
    return opa * np.exp(-0.5 * qmin) >= ALPHA_MIN


half = ts // 2
touches = np.zeros(pf.shape[0], np.int32)
for qy in (0, 1):
    for qx in (0, 1):
        touches += reachable(tx0 + qx * half, ty0 + qy * half, half).astype(
            np.int32
        )

t = touches[valid]
print(f"mean quadrant touches/pair: {t.mean():.3f}")
print(f"touch histogram (0..4): {np.bincount(t, minlength=5) / len(t)}")
print(f"element ratio vs whole-tile blend: {t.mean() / 4:.3f}")
# same question at 8x8 sub-quadrants (16 per tile) for reference
touches8 = np.zeros(pf.shape[0], np.int32)
for qy in range(4):
    for qx in range(4):
        touches8 += reachable(tx0 + qx * 8, ty0 + qy * 8, 8).astype(np.int32)
t8 = touches8[valid]
print(f"8x8: mean {t8.mean():.3f}, element ratio {t8.mean() / 16:.3f}")
