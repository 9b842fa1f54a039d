"""Find where the quadrant kernels diverge from the whole-tile kernels at
scale (compiled, real TPU): medium scene, per-tile error localization."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig
from threestudio_3dgs_tpu.ops.rasterizer.binning import bin_gaussians_with_feats
from threestudio_3dgs_tpu.ops.rasterizer.blend_pallas import (
    blend_backward_pallas,
    blend_forward_pallas,
)
from threestudio_3dgs_tpu.ops.rasterizer.blend_quadrant_pallas import (
    blend_backward_quadrant_pallas,
    blend_forward_quadrant_pallas,
)
from threestudio_3dgs_tpu.ops.rasterizer.preprocess import project_gaussians

n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
height = width = 256
rng = np.random.default_rng(0)
means = rng.normal(size=(n, 3)).astype(np.float32) * 0.35
scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.3 - 5.2)
quats = rng.normal(size=(n, 4)).astype(np.float32)
opacities = rng.uniform(0.2, 0.9, size=(n,)).astype(np.float32)
colors = rng.uniform(size=(n, 3)).astype(np.float32)

eye = np.array([0.0, -2.5, 0.5])
fwd_v = -eye / np.linalg.norm(eye)
right = np.cross(fwd_v, [0, 0, 1.0])
right /= np.linalg.norm(right)
up = np.cross(right, fwd_v)
c2w = np.eye(4, dtype=np.float32)
c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd_v, eye
cam = cam_mod.camera_from_c2w(jnp.asarray(c2w), 0.9, 0.9, height, width)
cfg = RasterizeConfig(tile_size=32, max_pairs=2**19)
ts = cfg.tile_size
grid_x = grid_y = height // ts
C = 4


@jax.jit
def build():
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats), cam,
        tile_size=ts,
    )
    chans = jnp.concatenate([jnp.asarray(colors), proj.depths[:, None]], axis=1)
    binning, pair_feats = bin_gaussians_with_feats(
        proj, grid_x, grid_y, cfg.max_pairs, ts, jnp.asarray(opacities), chans
    )
    return binning.tile_ranges, pair_feats


ranges, pair_feats = build()
jax.block_until_ready(pair_feats)
r_host = np.asarray(ranges)
blocks_per_tile = np.ceil(r_host[1:] / 128).astype(int) - (r_host[:-1] // 128)
print(f"pairs={int(r_host[-1])}, blocks/tile min/mean/max = "
      f"{blocks_per_tile.min()}/{blocks_per_tile.mean():.1f}/{blocks_per_tile.max()}")

from threestudio_3dgs_tpu.ops.rasterizer import blend_jax

f_j = jax.jit(lambda pf: blend_jax.blend_forward(pf, ranges, grid_x, grid_y, ts, C))
f_w = jax.jit(lambda pf: blend_forward_pallas(pf, ranges, grid_x, grid_y, ts, C))
f_q = jax.jit(
    lambda pf: blend_forward_quadrant_pallas(pf, ranges, grid_x, grid_y, ts, C)
)
out_j = np.asarray(f_j(pair_feats))
out_w = np.asarray(f_w(pair_feats))
out_q = np.asarray(f_q(pair_feats))
print(f"fwd whole vs jax: {np.max(np.abs(out_w - out_j)):.3e}")
print(f"fwd quad  vs jax: {np.max(np.abs(out_q - out_j)):.3e}")
err_tile = np.max(np.abs(out_w - out_q), axis=(1, 2))
print(f"fwd max err (quad vs whole) = {err_tile.max():.3e} at tile {err_tile.argmax()}")
bad = np.argsort(err_tile)[::-1][:8]
for t in bad:
    print(f"  tile {t}: err {err_tile[t]:.3e}, blocks {blocks_per_tile[t]}")
print("err vs blocks-per-tile correlation:")
for lo, hi in ((0, 2), (2, 4), (4, 8), (8, 1 << 30)):
    m = (blocks_per_tile >= lo) & (blocks_per_tile < hi)
    if m.any():
        print(f"  blocks in [{lo},{hi}): n={m.sum()}, max err {err_tile[m].max():.3e}")

g = jnp.asarray(
    np.random.default_rng(7)
    .normal(size=(grid_x * grid_y, ts * ts, C + 1))
    .astype(np.float32)
)
out = jnp.asarray(out_w)
b_w = jax.jit(
    lambda pf: blend_backward_pallas(pf, ranges, out, g, grid_x, grid_y, ts, C)
)
b_q = jax.jit(
    lambda pf: blend_backward_quadrant_pallas(
        pf, ranges, out, g, grid_x, grid_y, ts, C
    )
)
b_j = jax.jit(
    lambda pf: blend_jax.blend_backward(pf, ranges, out, g, grid_x, grid_y, ts, C)
)
d_j = np.asarray(b_j(pair_feats))
d_w = np.asarray(b_w(pair_feats))
d_q = np.asarray(b_q(pair_feats))
scale_g = np.max(np.abs(d_j)) + 1e-12
print(f"bwd whole vs jax: {np.max(np.abs(d_w - d_j)) / scale_g:.3e}")
print(f"bwd quad  vs jax: {np.max(np.abs(d_q - d_j)) / scale_g:.3e}")
err_pair = np.max(np.abs(d_w - d_q), axis=1) / scale_g
print(f"bwd max rel err (quad vs whole) = {err_pair.max():.3e} at pair {err_pair.argmax()}")
p_bad = int(err_pair.argmax())
t_bad = int(np.searchsorted(r_host, p_bad, side="right") - 1)
print(f"  worst pair in tile {t_bad} (blocks {blocks_per_tile[t_bad]})")
