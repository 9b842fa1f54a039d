"""Per-stage timing of the 1M-Gaussian 512^2 fwd+bwd step on the real chip.

Measures AFTER full scene-state build (cold-process micro-timings lie on the
axon tunnel -- see PERF.md).  Each stage is timed as an incremental jit:
the full step is decomposed so stage cost = t(prefix_k) - t(prefix_{k-1}).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig, rasterize
from threestudio_3dgs_tpu.ops.rasterizer import binning as bin_mod
from threestudio_3dgs_tpu.ops.rasterizer import blend_jax
from threestudio_3dgs_tpu.ops.rasterizer.api import _blend, _resolve_impl
from threestudio_3dgs_tpu.ops.rasterizer.preprocess import project_gaussians

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

args = tuple(map(jnp.asarray, (means, scales, quats, opacities, colors)))
bg = jnp.zeros(3)


def timeit(f, *a, iters=10, warm=2):
    for _ in range(warm):
        r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1000


# full step reference
def loss_fn(ms, sc, qt, op, co):
    out = rasterize(ms, sc, qt, op, cam, bg, colors=co, config=cfg)
    return jnp.sum(out["image"]) + jnp.sum(out["alpha"]) + jnp.sum(out["depth"])


full = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
print(f"full fwd+bwd: {timeit(full, *args):8.2f} ms")

# forward only
fwd_only = jax.jit(loss_fn)
print(f"fwd only:     {timeit(fwd_only, *args):8.2f} ms")


# stage: projection fwd
@jax.jit
def stage_proj(ms, sc, qt):
    p = project_gaussians(ms, sc, qt, cam, tile_size=ts)
    return jax.tree_util.tree_map(jnp.sum, p.means2d)


print(f"project fwd:  {timeit(stage_proj, *args[:3]):8.2f} ms")


# stage: projection + binning
@jax.jit
def stage_bin(ms, sc, qt, op):
    p = project_gaussians(ms, sc, qt, cam, tile_size=ts)
    b = bin_mod.bin_gaussians(
        jax.tree_util.tree_map(jax.lax.stop_gradient, p),
        grid_x, grid_y, cfg.max_pairs, tile_size=ts, opacities=op,
    )
    return b.pair_gauss.sum() + b.pair_gm.sum() + b.tile_ranges.sum()


print(f"proj+bin:     {timeit(stage_bin, *args[:4]):8.2f} ms")


# stage: + pair gather forward
@jax.jit
def stage_gather(ms, sc, qt, op, co):
    p = project_gaussians(ms, sc, qt, cam, tile_size=ts)
    b = bin_mod.bin_gaussians(
        jax.tree_util.tree_map(jax.lax.stop_gradient, p),
        grid_x, grid_y, cfg.max_pairs, tile_size=ts, opacities=op,
    )
    feats = jnp.concatenate(
        [p.means2d, p.conics, op[:, None], co, p.depths[:, None]], axis=1
    )
    pf = bin_mod.pair_gather(feats, b)
    return pf.sum()


print(f"+gather fwd:  {timeit(stage_gather, *args):8.2f} ms")


# stage: + blend forward
@jax.jit
def stage_blend(ms, sc, qt, op, co):
    p = project_gaussians(ms, sc, qt, cam, tile_size=ts)
    b = bin_mod.bin_gaussians(
        jax.tree_util.tree_map(jax.lax.stop_gradient, p),
        grid_x, grid_y, cfg.max_pairs, tile_size=ts, opacities=op,
    )
    feats = jnp.concatenate(
        [p.means2d, p.conics, op[:, None], co, p.depths[:, None]], axis=1
    )
    pf = bin_mod.pair_gather(feats, b)
    out = _blend(pf, b.tile_ranges, grid_x, grid_y, ts, 4, _resolve_impl("auto"))
    return out.sum()


print(f"+blend fwd:   {timeit(stage_blend, *args):8.2f} ms")

# gradient of gather-only pipeline (binning recomputed; to isolate bwd costs
# compare against the fwd-only variants above)
grad_gather = jax.jit(jax.grad(lambda *a: stage_gather(*a), argnums=(0, 1, 2, 3, 4)))
print(f"gather chain fwd+bwd: {timeit(grad_gather, *args):8.2f} ms")

grad_blend = jax.jit(jax.grad(lambda *a: stage_blend(*a), argnums=(0, 1, 2, 3, 4)))
print(f"blend chain fwd+bwd:  {timeit(grad_blend, *args):8.2f} ms")
