import numpy as np, jax, jax.numpy as jnp
from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig
from threestudio_3dgs_tpu.ops.rasterizer.preprocess import project_gaussians
from threestudio_3dgs_tpu.ops.rasterizer import binning as bin_mod
from threestudio_3dgs_tpu.ops.rasterizer.expand_pallas import expand_bin_pallas

n = 200_000; height = width = 512
rng = np.random.default_rng(1)
means = rng.normal(size=(n,3)).astype(np.float32)*0.35
scales = np.exp(rng.normal(size=(n,3)).astype(np.float32)*0.3-5.0)
quats = rng.normal(size=(n,4)).astype(np.float32)
eye = np.array([0.,-2.5,.5]); fwd=-eye/np.linalg.norm(eye)
right=np.cross(fwd,[0,0,1.]); right/=np.linalg.norm(right); up=np.cross(right,fwd)
c2w=np.eye(4,dtype=np.float32); c2w[:3,0],c2w[:3,1],c2w[:3,2],c2w[:3,3]=right,up,-fwd,eye
cam = cam_mod.camera_from_c2w(jnp.asarray(c2w),0.9,0.9,height,width)
cfg = RasterizeConfig(tile_size=32, max_pairs=2**20)
grid_x=(width+31)//32; grid_y=(height+31)//32
proj = jax.jit(lambda m,s,q: project_gaussians(m,s,q,cam,cfg.tile_size))(
    jnp.asarray(means),jnp.asarray(scales),jnp.asarray(quats))

max_pairs = cfg.max_pairs
sort_depth = jnp.where(proj.visible, proj.depths, jnp.inf)
depth_order = jnp.argsort(sort_depth).astype(jnp.int32)
rect_w = (proj.tiles_max[:,0]-proj.tiles_min[:,0]).astype(jnp.int32)
rect_h = (proj.tiles_max[:,1]-proj.tiles_min[:,1]).astype(jnp.int32)
counts_all = jnp.where(proj.visible, rect_w*rect_h, 0).astype(jnp.int32)
counts = counts_all[depth_order]
offsets = jnp.concatenate([jnp.zeros(1,jnp.int32), jnp.cumsum(counts)[:-1]])
total = int(offsets[-1]+counts[-1]); print("total pairs:", total)
assert total <= max_pairs

# fused kernel
slot_k, g_k, tile_k = jax.jit(lambda o,d,tm,rw: expand_bin_pallas(o,d,tm,rw,grid_x,max_pairs))(
    offsets, depth_order, proj.tiles_min, rect_w)

# XLA reference path
iota_n = jnp.arange(n,dtype=jnp.int32)
marks = jnp.zeros(max_pairs,jnp.int32).at[offsets].max(iota_n, mode="drop")
slot_r = jax.lax.cummax(marks)
g_r = depth_order[slot_r]
r = jnp.arange(max_pairs,dtype=jnp.int32)-offsets[slot_r]
w = jnp.maximum(rect_w[g_r],1)
q = jnp.floor(r.astype(jnp.float32)/w.astype(jnp.float32)).astype(jnp.int32)
rem = r-q*w
q = jnp.where(rem<0,q-1,jnp.where(rem>=w,q+1,q)); rem=r-q*w
tx = proj.tiles_min[g_r,0]+rem; ty=proj.tiles_min[g_r,1]+q
tile_r = ty*grid_x+tx

v = total
print("slot match:", bool((slot_k[:v]==slot_r[:v]).all()))
print("g match:   ", bool((g_k[:v]==g_r[:v]).all()))
print("tile match:", bool((tile_k[:v]==tile_r[:v]).all()))
for name,a,b in [("slot",slot_k,slot_r),("g",g_k,g_r),("tile",tile_k,tile_r)]:
    bad = np.nonzero(np.asarray(a[:v]!=b[:v]))[0]
    if len(bad): print(name,"first bad:",bad[:5], np.asarray(a)[bad[:5]], np.asarray(b)[bad[:5]])
