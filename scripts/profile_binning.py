"""Stage-level timing of bin_gaussians at the bench config (1M gaussians, 512^2)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig
from threestudio_3dgs_tpu.ops.rasterizer.preprocess import project_gaussians
from threestudio_3dgs_tpu.ops.rasterizer import binning as bin_mod

n = 1_000_000
height = width = 512
rng = np.random.default_rng(0)
means = rng.normal(size=(n, 3)).astype(np.float32) * 0.35
scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.3 - 5.2)
quats = rng.normal(size=(n, 4)).astype(np.float32)
opac = rng.uniform(0.2, 0.9, size=(n,)).astype(np.float32)

eye = np.array([0.0, -2.5, 0.5])
fwd = -eye / np.linalg.norm(eye)
right = np.cross(fwd, [0, 0, 1.0]); right /= np.linalg.norm(right)
up = np.cross(right, fwd)
c2w = np.eye(4, dtype=np.float32)
c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
cam = cam_mod.camera_from_c2w(jnp.asarray(c2w), 0.9, 0.9, height, width)
cfg = RasterizeConfig(tile_size=32, max_pairs=2**21)
grid_x = (width + cfg.tile_size - 1) // cfg.tile_size
grid_y = (height + cfg.tile_size - 1) // cfg.tile_size
max_pairs = cfg.max_pairs
num_tiles = grid_x * grid_y
pair_bits = max(int(max_pairs - 1).bit_length(), 1)

proj = jax.jit(lambda m, s, q: project_gaussians(m, s, q, cam, cfg.tile_size))(
    jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats))
jax.block_until_ready(proj)

def timeit(name, fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:42s} {dt:8.2f} ms")
    return out

# full binning
timeit("bin_gaussians (total)", jax.jit(lambda p: bin_mod.bin_gaussians(p, grid_x, grid_y, max_pairs)), proj)

# stage 1: depth argsort
def s1(p):
    sd = jnp.where(p.visible, p.depths, jnp.inf)
    order = jnp.argsort(sd).astype(jnp.int32)
    iota_n = jnp.arange(n, dtype=jnp.int32)
    inv = jnp.zeros(n, jnp.int32).at[order].set(iota_n, unique_indices=True)
    return order, inv
depth_order, inv_depth = timeit("depth argsort + inv scatter", jax.jit(s1), proj)

def s2(p, order):
    rw = (p.tiles_max[:, 0] - p.tiles_min[:, 0]).astype(jnp.int32)
    rh = (p.tiles_max[:, 1] - p.tiles_min[:, 1]).astype(jnp.int32)
    ca = jnp.where(p.visible, rw * rh, 0).astype(jnp.int32)
    counts = ca[order]
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
    return counts, offsets
counts, offsets = timeit("counts+offsets (gather+cumsum)", jax.jit(s2), proj, depth_order)

from threestudio_3dgs_tpu.ops.rasterizer.expand_pallas import expand_slots_pallas
slot = timeit("expand (pallas)", jax.jit(lambda o: expand_slots_pallas(o, max_pairs)), offsets)

def s4(p, order, offs, slot_):
    g = order[slot_]
    r = jnp.arange(max_pairs, dtype=jnp.int32) - offs[slot_]
    rw = (p.tiles_max[:, 0] - p.tiles_min[:, 0]).astype(jnp.int32)
    w = jnp.maximum(rw[g], 1)
    q = jnp.floor(r.astype(jnp.float32) / w.astype(jnp.float32)).astype(jnp.int32)
    rem = r - q * w
    q = jnp.where(rem < 0, q - 1, jnp.where(rem >= w, q + 1, q))
    rem = r - q * w
    tx = p.tiles_min[g, 0] + rem
    ty = p.tiles_min[g, 1] + q
    tile_id = ty * grid_x + tx
    return g, tile_id
g, tile_id = timeit("per-pair tile id (gathers + divmod)", jax.jit(s4), proj, depth_order, offsets, slot)

total = offsets[-1] + counts[-1]
n_pairs = jnp.minimum(total, max_pairs)
def s5(tid, npair):
    p = jnp.arange(max_pairs, dtype=jnp.int32)
    valid = p < npair
    key = jnp.where(valid, tid, num_tiles) << pair_bits | p
    return jax.lax.sort(key)
sorted_key = timeit("pack + lax.sort (P keys)", jax.jit(s5), tile_id, n_pairs)

def s6(sk):
    p = jnp.arange(max_pairs, dtype=jnp.int32)
    pair_gm = sk & ((1 << pair_bits) - 1)
    inv_perm = jnp.zeros(max_pairs, jnp.int32).at[pair_gm].set(p, mode="drop", unique_indices=True)
    return pair_gm, inv_perm
pair_gm, inv_perm = timeit("unpack + inv_perm scatter", jax.jit(s6), sorted_key)

def s7(sk):
    boundaries = jnp.arange(num_tiles + 1, dtype=jnp.int32) << pair_bits
    return jnp.searchsorted(sk, boundaries, side="left").astype(jnp.int32)
timeit("tile_ranges searchsorted", jax.jit(s7), sorted_key)

def s8(gm, g_):
    return g_[gm]
timeit("pair_gauss gather", jax.jit(s8), pair_gm, g)
print("n_pairs:", int(n_pairs), "total:", int(total))
