"""Stage-level timing of the full fwd+bwd rasterization step at bench config."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig, rasterize
from threestudio_3dgs_tpu.ops.rasterizer.preprocess import project_gaussians
from threestudio_3dgs_tpu.ops.rasterizer import binning as bin_mod
from threestudio_3dgs_tpu.ops.rasterizer.binning import bin_gaussians, pair_gather
from threestudio_3dgs_tpu.ops.rasterizer.blend_pallas import (
    blend_forward_pallas, blend_backward_pallas)
from threestudio_3dgs_tpu.ops.rasterizer import blend_jax

n = 1_000_000; height = width = 512
rng = np.random.default_rng(0)
means = jnp.asarray(rng.normal(size=(n,3)).astype(np.float32)*0.35)
scales = jnp.asarray(np.exp(rng.normal(size=(n,3)).astype(np.float32)*0.3-5.2))
quats = jnp.asarray(rng.normal(size=(n,4)).astype(np.float32))
opac = jnp.asarray(rng.uniform(0.2,0.9,size=(n,)).astype(np.float32))
colors = jnp.asarray(rng.uniform(size=(n,3)).astype(np.float32))
eye = np.array([0.,-2.5,.5]); fwd=-eye/np.linalg.norm(eye)
right=np.cross(fwd,[0,0,1.]); right/=np.linalg.norm(right); up=np.cross(right,fwd)
c2w=np.eye(4,dtype=np.float32); c2w[:3,0],c2w[:3,1],c2w[:3,2],c2w[:3,3]=right,up,-fwd,eye
cam = cam_mod.camera_from_c2w(jnp.asarray(c2w),0.9,0.9,height,width)
cfg = RasterizeConfig(tile_size=32, max_pairs=2**21)
ts = cfg.tile_size
gx = (width+ts-1)//ts; gy = (height+ts-1)//ts

def timeit(name, fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1000:8.2f} ms")
    return out

# full step (value+grad)
bg = jnp.zeros(3)
def loss_fn(ms, sc, qt, op, co):
    out = rasterize(ms, sc, qt, op, cam, bg, colors=co, config=cfg)
    return jnp.sum(out["image"]) + jnp.sum(out["alpha"]) + jnp.sum(out["depth"])
timeit("FULL fwd+bwd", jax.jit(jax.grad(loss_fn, argnums=(0,1,2,3,4))), means, scales, quats, opac, colors, iters=10)

# fwd only
def fwd_only(ms, sc, qt, op, co):
    return rasterize(ms, sc, qt, op, cam, bg, colors=co, config=cfg)["image"]
timeit("FULL fwd only", jax.jit(fwd_only), means, scales, quats, opac, colors)

proj = timeit("project fwd", jax.jit(lambda m,s,q: project_gaussians(m,s,q,cam,ts)), means, scales, quats)
# project fwd+bwd
def proj_loss(m,s,q):
    p = project_gaussians(m,s,q,cam,ts)
    return jnp.sum(p.means2d) + jnp.sum(p.conics) + jnp.sum(p.depths)
timeit("project fwd+bwd", jax.jit(jax.grad(proj_loss, argnums=(0,1,2))), means, scales, quats)

binning = timeit("binning", jax.jit(lambda p: bin_gaussians(p, gx, gy, cfg.max_pairs)), proj)

chans = jnp.concatenate([colors, proj.depths[:,None]], axis=1)
feats = jnp.concatenate([proj.means2d, proj.conics, opac[:,None], chans], axis=1)
nch = chans.shape[1]
pair_feats = timeit("pair gather fwd", jax.jit(lambda f,b: pair_gather(f,b)), feats, binning)
def gather_loss(f, b):
    return jnp.sum(pair_gather(f, b) ** 2)
timeit("pair gather fwd+bwd (incl segsum)", jax.jit(jax.grad(gather_loss)), feats, binning)

out_tiled = timeit("blend fwd (pallas)", jax.jit(lambda pf, tr: blend_forward_pallas(pf, tr, gx, gy, ts, nch)), pair_feats, binning.tile_ranges)
g_out = jnp.ones_like(out_tiled)
timeit("blend bwd (pallas)", jax.jit(lambda pf, tr, o, g: blend_backward_pallas(pf, tr, o, g, gx, gy, ts, nch)), pair_feats, binning.tile_ranges, out_tiled, g_out)
timeit("tiles_to_image", jax.jit(lambda o: blend_jax.tiles_to_image(o, gx, gy, ts, height, width)), out_tiled)

# --- sub-profile of pair_gather backward ---
from threestudio_3dgs_tpu.ops.rasterizer.segsum_pallas import segsum_monotone_pallas
d_pairs = jnp.asarray(np.random.default_rng(1).normal(size=(cfg.max_pairs, feats.shape[1])).astype(np.float32))
def sortperm(d, b):
    cols = jax.lax.sort((b.pair_gm,) + tuple(d[:, j] for j in range(d.shape[1])), num_keys=1)
    return jnp.stack(cols[1:], axis=1)
d_gm = timeit("  bwd: sort-permute to gm order", jax.jit(sortperm), d_pairs, binning)
def mask_fn(d, b):
    valid = (jnp.arange(d.shape[0], dtype=jnp.int32) < b.n_pairs)[:, None]
    return jnp.where(valid, d, 0.0)
d_gm_m = timeit("  bwd: tail mask", jax.jit(mask_fn), d_gm, binning)
d_sorted = timeit("  bwd: segsum pallas", jax.jit(lambda d,b: segsum_monotone_pallas(d, b.slot, b.n_pairs, feats.shape[0])), d_gm_m, binning)
timeit("  bwd: inv_depth row gather (N,10)", jax.jit(lambda d,b: d[b.inv_depth_order]), d_sorted, binning)

# --- sub-profile binning: vals construction for the fused kernel ---
def vals_prep(p, order):
    rw = (p.tiles_max[:,0]-p.tiles_min[:,0]).astype(jnp.int32)
    return (p.tiles_min[order,0], p.tiles_min[order,1], rw[order])
timeit("  bin: 3 scalar 1M gathers (kernel prep)", jax.jit(vals_prep), proj, binning.depth_order)
def vals_prep_row(p, order):
    rw = (p.tiles_max[:,0]-p.tiles_min[:,0]).astype(jnp.int32)
    packed = jnp.stack([p.tiles_min[:,0], p.tiles_min[:,1], rw], axis=1)
    return packed[order]
timeit("  bin: 1 row (1M,3) gather (kernel prep)", jax.jit(vals_prep_row), proj, binning.depth_order)
