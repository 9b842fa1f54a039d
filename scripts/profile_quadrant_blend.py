"""A/B the per-quadrant compacted blend kernels vs the whole-tile kernels on
the real chip: bench scene (1M Gaussians @512^2), isolated blend fwd and
fwd+bwd chains, plus numeric parity of the gradients."""

import time

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

n = 1_000_000
height = width = 512
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
cfg = RasterizeConfig(tile_size=32, max_pairs=2**21)
ts = cfg.tile_size
grid_x = grid_y = 512 // ts
C = 4  # rgb + depth


@jax.jit
def build():
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats), cam,
        tile_size=ts,
    )
    chans = jnp.concatenate(
        [jnp.asarray(colors), proj.depths[:, None]], axis=1
    )
    binning, pair_feats = bin_gaussians_with_feats(
        proj, grid_x, grid_y, cfg.max_pairs, ts, jnp.asarray(opacities), chans
    )
    return binning.tile_ranges, pair_feats


ranges, pair_feats = build()
jax.block_until_ready(pair_feats)
g = jnp.asarray(
    np.random.default_rng(7)
    .normal(size=(grid_x * grid_y, ts * ts, C + 1))
    .astype(np.float32)
)


def timeit(f, *a, iters=10, warm=2):
    for _ in range(warm):
        r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1000


# serial chains (input feeds from previous output's first element) defeat the
# tunnel's identical-dispatch elision -- PERF.md measurement pitfalls
def chain(fn, reps=8):
    def run(pf):
        def body(i, carry):
            pf, acc = carry
            o = fn(pf)
            # genuine data dependency (no 0.0*x: XLA folds it and hoists the
            # loop-invariant body); 1e-20 perturbation is far below any
            # threshold in the kernels
            return pf + 1e-20 * jnp.sum(o), acc + jnp.sum(o)

        return jax.lax.fori_loop(0, reps, body, (pf, jnp.float32(0)))[1]

    return jax.jit(run), reps


for name, f_fwd in (
    ("fwd whole-tile", lambda pf: blend_forward_pallas(pf, ranges, grid_x, grid_y, ts, C)),
    ("fwd quadrant  ", lambda pf: blend_forward_quadrant_pallas(pf, ranges, grid_x, grid_y, ts, C)),
):
    run, reps = chain(f_fwd)
    t = timeit(run, pair_feats) / reps
    print(f"{name}: {t:7.2f} ms")

out = blend_forward_pallas(pair_feats, ranges, grid_x, grid_y, ts, C)
out_q = blend_forward_quadrant_pallas(pair_feats, ranges, grid_x, grid_y, ts, C)
jax.block_until_ready((out, out_q))
err_f = float(jnp.max(jnp.abs(out - out_q)))
print(f"fwd max|quad - whole| = {err_f:.3e}")

for name, f_bwd in (
    ("bwd whole-tile", lambda pf: blend_backward_pallas(pf, ranges, out, g, grid_x, grid_y, ts, C)),
    ("bwd quadrant  ", lambda pf: blend_backward_quadrant_pallas(pf, ranges, out, g, grid_x, grid_y, ts, C)),
):
    run, reps = chain(f_bwd)
    t = timeit(run, pair_feats) / reps
    print(f"{name}: {t:7.2f} ms")

d_ref = blend_backward_pallas(pair_feats, ranges, out, g, grid_x, grid_y, ts, C)
d_q = blend_backward_quadrant_pallas(
    pair_feats, ranges, out, g, grid_x, grid_y, ts, C
)
jax.block_until_ready((d_ref, d_q))
scale = float(jnp.max(jnp.abs(d_ref)))
err = float(jnp.max(jnp.abs(d_ref - d_q))) / scale
print(f"bwd max scale-relative |quad - whole| = {err:.3e}")
