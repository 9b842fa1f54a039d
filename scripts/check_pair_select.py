"""TPU parity probe: fused pair-feature path (expand-kernel emission +
tile-sort payloads + pair_select VJP) vs the pair_gather path on the SAME
Pallas stack (only the pair-feature source differs).  The fused table is
produced by a 3-term bf16 one-hot select that is exact for these fields, so
the whole fwd+bwd is expected BIT-IDENTICAL (measured 0.0 on v5e)."""

import jax
import jax.numpy as jnp
import numpy as np

from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig, rasterize
from threestudio_3dgs_tpu.ops.rasterizer import binning as bin_mod
from threestudio_3dgs_tpu.ops.rasterizer import api as api_mod

n = 200_000
height = width = 512
rng = np.random.default_rng(0)
means = rng.normal(size=(n, 3)).astype(np.float32) * 0.35
scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.3 - 5.0)
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
cfg = RasterizeConfig(tile_size=32, max_pairs=2**20)
args = tuple(map(jnp.asarray, (means, scales, quats, opacities, colors)))
bg = jnp.zeros(3)


def loss_fn(means, scales, quats, opac, cols):
    out = rasterize(means, scales, quats, opac, cam, bg, colors=cols,
                    with_depth=True, config=cfg)
    img = out["image"]
    w = jnp.cos(jnp.arange(img.size, dtype=jnp.float32)).reshape(img.shape)
    return jnp.sum(img * w) + 0.3 * jnp.sum(out["depth"]) + 0.1 * jnp.sum(out["alpha"]), img


grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True))
(l1, img1), g1 = jax.block_until_ready(grad_fn(*args))

# force the gather path while keeping everything else identical
orig = bin_mod.bin_gaussians_with_feats
api_mod.bin_gaussians_with_feats = lambda *a: (orig(*a)[0], None)
grad_fn2 = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True))
(l2, img2), g2 = jax.block_until_ready(grad_fn2(*args))
api_mod.bin_gaussians_with_feats = orig

print("loss fused ", float(l1), " gather ", float(l2))
img_diff = float(jnp.max(jnp.abs(img1 - img2)))
print("image max abs diff", img_diff)
rels = []
for name, a, b in zip(["means", "scales", "quats", "opac", "cols"], g1, g2):
    rel = float(jnp.linalg.norm(a - b)) / (float(jnp.linalg.norm(b)) + 1e-12)
    rels.append(rel)
    print(f"grad {name}: rel {rel:.2e}")
assert img_diff < 1e-6, img_diff
assert max(rels) < 1e-5, rels
print("PARITY OK")
