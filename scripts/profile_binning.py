"""Sub-stage timing inside bin_gaussians + the pair-gather backward, on the
real chip with realistic 1M-Gaussian 512^2 state."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import binning as bin_mod
from threestudio_3dgs_tpu.ops.rasterizer.preprocess import project_gaussians

n = 1_000_000
rng = np.random.default_rng(0)
means = rng.normal(size=(n, 3)).astype(np.float32) * 0.35
scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.3 - 5.2)
quats = rng.normal(size=(n, 4)).astype(np.float32)
opacities = rng.uniform(0.2, 0.9, size=(n,)).astype(np.float32)

eye = np.array([0.0, -2.5, 0.5])
fwd = -eye / np.linalg.norm(eye)
right = np.cross(fwd, [0, 0, 1.0]); right /= np.linalg.norm(right)
up = np.cross(right, fwd)
c2w = np.eye(4, dtype=np.float32)
c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
cam = cam_mod.camera_from_c2w(jnp.asarray(c2w), 0.9, 0.9, 512, 512)
ts, grid_x, grid_y, max_pairs = 32, 16, 16, 2**21

args = tuple(map(jnp.asarray, (means, scales, quats, opacities)))


def timeit(f, *a, iters=10, warm=2):
    for _ in range(warm):
        r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1000


# shared prefix: projection (subtract from later numbers)
@jax.jit
def s_proj(ms, sc, qt):
    p = project_gaussians(ms, sc, qt, cam, tile_size=ts)
    return p.means2d.sum() + p.conics.sum() + p.depths.sum() + p.tiles_min.sum()


t_proj = timeit(s_proj, *args[:3])
print(f"proj:                 {t_proj:7.2f} ms")


def proj_of(ms, sc, qt):
    p = project_gaussians(ms, sc, qt, cam, tile_size=ts)
    return jax.tree_util.tree_map(jax.lax.stop_gradient, p)


# depth payload sort only
@jax.jit
def s_depthsort(ms, sc, qt, op):
    proj = proj_of(ms, sc, qt)
    sort_depth = jnp.where(proj.visible, proj.depths, jnp.inf)
    iota_n = jnp.arange(n, dtype=jnp.int32)
    rect_w = (proj.tiles_max[:, 0] - proj.tiles_min[:, 0]).astype(jnp.int32)
    rect_h = (proj.tiles_max[:, 1] - proj.tiles_min[:, 1]).astype(jnp.int32)
    counts_all = jnp.where(proj.visible, rect_w * rect_h, 0).astype(jnp.int32)
    cols = [proj.tiles_min[:, 0], proj.tiles_min[:, 1], rect_w, counts_all,
            proj.means2d[:, 0], proj.means2d[:, 1], proj.conics[:, 0],
            proj.conics[:, 1], proj.conics[:, 2], op]
    sorted_cols = jax.lax.sort(
        (sort_depth, iota_n) + tuple(c.astype(jnp.float32) for c in cols),
        num_keys=1)
    return sum(c.sum() for c in sorted_cols[1:])


print(f"depth payload sort:   {timeit(s_depthsort, *args) - t_proj:7.2f} ms")


# full binning
@jax.jit
def s_bin(ms, sc, qt, op):
    proj = proj_of(ms, sc, qt)
    b = bin_mod.bin_gaussians(proj, grid_x, grid_y, max_pairs, tile_size=ts,
                              opacities=op)
    return (b.pair_gauss.sum(), b.pair_gm.sum(), b.tile_ranges.sum(),
            b.slot.sum(), b.offsets.sum())


t_bin = timeit(s_bin, *args)
print(f"full binning:         {t_bin - t_proj:7.2f} ms")

# binning minus the tile sort: monkeypatch? instead time expand alone by
# reconstructing binning internals without the final sort
@jax.jit
def s_expand(ms, sc, qt, op):
    proj = proj_of(ms, sc, qt)
    sort_depth = jnp.where(proj.visible, proj.depths, jnp.inf)
    iota_n = jnp.arange(n, dtype=jnp.int32)
    rect_w = (proj.tiles_max[:, 0] - proj.tiles_min[:, 0]).astype(jnp.int32)
    rect_h = (proj.tiles_max[:, 1] - proj.tiles_min[:, 1]).astype(jnp.int32)
    counts_all = jnp.where(proj.visible, rect_w * rect_h, 0).astype(jnp.int32)
    cols = [proj.tiles_min[:, 0], proj.tiles_min[:, 1], rect_w, counts_all,
            proj.means2d[:, 0], proj.means2d[:, 1], proj.conics[:, 0],
            proj.conics[:, 1], proj.conics[:, 2],
            jax.lax.stop_gradient(op)]
    sorted_cols = jax.lax.sort(
        (sort_depth, iota_n) + tuple(c.astype(jnp.float32) for c in cols),
        num_keys=1)
    depth_order = sorted_cols[1]
    fields_d = jnp.stack(sorted_cols[2:], axis=1)
    counts = fields_d[:, 3].astype(jnp.int32)
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
    from threestudio_3dgs_tpu.ops.rasterizer.expand_pallas import expand_bin_pallas
    slot, g, tile_id = expand_bin_pallas(
        offsets, depth_order, fields_d[:, 0], fields_d[:, 1], fields_d[:, 2],
        grid_x, max_pairs, tile_size=ts, num_tiles=grid_x * grid_y,
        cull_fields_d=fields_d[:, 4:10])
    return slot.sum() + g.sum() + tile_id.sum()


print(f"(depth sort+cumsum+expand): {timeit(s_expand, *args) - t_proj:7.2f} ms")


# pair-gather backward pieces, from a realistic binning
proj_c = jax.jit(proj_of)(*args[:3])
b_const = jax.jit(
    lambda p, op: bin_mod.bin_gaussians(p, grid_x, grid_y, max_pairs,
                                        tile_size=ts, opacities=op)
)(proj_c, args[3])
b_const = jax.tree_util.tree_map(jnp.asarray, b_const)
d_pairs = jnp.asarray(rng.normal(size=(max_pairs, 10)).astype(np.float32))

bwd = jax.jit(lambda d: bin_mod._gather_bwd_impl(b_const, d))
print(f"pair-gather bwd total: {timeit(bwd, d_pairs):7.2f} ms")


@jax.jit
def s_sort_only(d):
    sorted_cols = jax.lax.sort(
        (b_const.pair_gm,) + tuple(d[:, j] for j in range(d.shape[1])),
        num_keys=1)
    return sum(c.sum() for c in sorted_cols[1:])


print(f"  bwd permute sort:    {timeit(s_sort_only, d_pairs):7.2f} ms")


@jax.jit
def s_segsum(d):
    from threestudio_3dgs_tpu.ops.rasterizer.segsum_pallas import (
        segsum_monotone_pallas,
    )
    return segsum_monotone_pallas(d, b_const.slot, b_const.n_pairs, n).sum()


print(f"  bwd segsum:          {timeit(s_segsum, d_pairs):7.2f} ms")


@jax.jit
def s_undo(dn):
    return dn[b_const.inv_depth_order].sum()


dn = jnp.asarray(rng.normal(size=(n, 10)).astype(np.float32))
print(f"  bwd undo gather:     {timeit(s_undo, dn):7.2f} ms")
