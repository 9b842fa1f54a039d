"""One COMPILED program: full SDS train gradient with the real-shape UNet+VAE
in the graph (round-4 verdict item 6).

render fwd (B views @512^2) -> VAE encode (differentiable) -> SDS with
2xUNet CFG (stop-gradient'd, as in production SDS) -> VAE-grad backward ->
render backward, as ONE jit.  Random weights -- no egress for checkpoints;
compute cost is weight-value independent (same convs/matmuls).

Replaces the sum-of-parts projection in scripts/bench_diffusion.py; the
reference spends most of its step in this guidance chain
(reference guidance/temporal_zero123_guidance.py:298-373).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from threestudio_3dgs_tpu.diffusion.unet import SD21_UNET, UNet2DCondition
from threestudio_3dgs_tpu.diffusion.vae import SD_VAE, VAEEncoder, sample_latents
from threestudio_3dgs_tpu.guidance.sds import SDSConfig, ddpm_alphas_cumprod, sds_loss
from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig, rasterize

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=100_000)
ap.add_argument("--res", type=int, default=512)
ap.add_argument("--b", type=int, default=1)
ap.add_argument("--iters", type=int, default=6)
args = ap.parse_args()

n, res, B = args.n, args.res, args.b
rng = np.random.default_rng(0)
means = rng.normal(size=(n, 3)).astype(np.float32) * 0.35
scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.3 - 5.2)
quats = rng.normal(size=(n, 4)).astype(np.float32)
opacities = rng.uniform(0.2, 0.9, size=(n,)).astype(np.float32)
colors = rng.uniform(size=(n, 3)).astype(np.float32)

cams = []
for v in range(B):
    ang = 2 * np.pi * v / max(B, 1)
    eye = np.array([2.5 * np.sin(ang), -2.5 * np.cos(ang), 0.5])
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0, 0, 1.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
    cams.append(
        cam_mod.camera_from_c2w(jnp.asarray(c2w), 0.9, 0.9, res, res)
    )
cfg = RasterizeConfig(tile_size=32, max_pairs=2**21)
sds_cfg = SDSConfig()
alphas = ddpm_alphas_cumprod(sds_cfg.num_train_timesteps)

unet = UNet2DCondition(SD21_UNET)
vae = VAEEncoder(SD_VAE)
key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
lat_hw = res // 8
unet_params = jax.jit(unet.init)(
    k1,
    jnp.zeros((2, lat_hw, lat_hw, 4)),
    jnp.zeros((2,), jnp.int32),
    jnp.zeros((2, 77, SD21_UNET.cross_attention_dim)),
)
vae_params = jax.jit(vae.init)(k2, jnp.zeros((1, res, res, 3)))
ctx_cond = jax.random.normal(k3, (B, 77, SD21_UNET.cross_attention_dim)) * 0.02
ctx_uncond = jnp.zeros_like(ctx_cond)
sched = {"min_step": jnp.int32(20), "max_step": jnp.int32(980)}
bg = jnp.zeros(3)
p_means = jnp.asarray(means)
p_scales = jnp.asarray(scales)
p_quats = jnp.asarray(quats)
p_opac = jnp.asarray(opacities)
p_colors = jnp.asarray(colors)


# params are jit ARGUMENTS, not closure constants: closing over the 3.6 GB
# UNet/VAE pytrees bakes them into the lowered module as captured constants
# (JAX warns; lowering alone took > 9 min through the tunnel)
def step_loss(up, vp, ms, sc, qt, op, co, k):
    def denoise(noisy, t, _k):
        latents2 = jnp.concatenate([noisy, noisy], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        ctx = jnp.concatenate([ctx_uncond, ctx_cond], axis=0)
        eps = unet.apply(up, latents2, t2, ctx)
        return eps[:B], eps[B:]

    imgs = []
    for cam in cams:
        out = rasterize(
            ms, jnp.exp(sc), qt, jax.nn.sigmoid(op), cam, bg, colors=co,
            config=cfg, with_depth=False,
        )
        imgs.append(out["image"])
    img = jnp.stack(imgs)  # (B, H, W, 3)
    moments = vae.apply(vp, img * 2.0 - 1.0)
    k_lat, k_sds = jax.random.split(k)
    latents = sample_latents(moments, k_lat, 0.18215)
    loss, aux = sds_loss(latents, denoise, k_sds, sched, sds_cfg, alphas)
    return loss


_grad = jax.jit(jax.grad(step_loss, argnums=(2, 3, 4, 5, 6)))


def grad_fn(ms, sc, qt, op, co, k):
    return _grad(unet_params, vae_params, ms, sc, qt, op, co, k)

raw_sc = jnp.log(p_scales)
raw_op = jnp.log(p_opac / (1.0 - p_opac))


def render_only_loss(ms, sc, qt, op, co, k):
    total = 0.0
    for cam in cams:
        out = rasterize(
            ms, jnp.exp(sc), qt, jax.nn.sigmoid(op), cam, bg, colors=co,
            config=cfg, with_depth=False,
        )
        total = total + jnp.sum(out["image"] ** 2)
    return total


render_grad = jax.jit(jax.grad(render_only_loss, argnums=(0, 1, 2, 3, 4)))


def timed(fn, label):
    k = jax.random.PRNGKey(1)
    t_c0 = time.perf_counter()
    g = fn(p_means, raw_sc, p_quats, raw_op, p_colors, k)
    np.asarray(jax.tree_util.tree_leaves(g)[0][:1])  # host fetch: true sync
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    ms_in = p_means
    for i in range(args.iters):
        k = jax.random.fold_in(k, i)  # fresh key -> fresh timestep draw
        g = fn(ms_in, raw_sc, p_quats, raw_op, p_colors, k)
        # CHAIN the dispatches: iteration i+1's means input carries a zero-
        # valued contribution from iteration i's gradient, so the tunnel
        # cannot overlap dispatch with compute (same methodology as
        # bench_diffusion.py / profile_batched_vmap.py; round-4 advisor
        # finding -- unchained fresh-key dispatches can hide host dispatch
        # latency behind pipelining)
        g0 = jax.tree_util.tree_leaves(g)[0]
        ms_in = p_means + 0.0 * g0[:1, :1]
    # terminate with a HOST FETCH, not block_until_ready: the tunnel does
    # not synchronize single dispatches under block_until_ready (PERF.md
    # round-4 sort-bench pitfall)
    np.asarray(jax.tree_util.tree_leaves(g)[0][:1])
    ms = (time.perf_counter() - t0) / args.iters * 1000
    print(f"{label}: {ms:8.2f} ms/step  (first call incl. compile {compile_s:.0f}s)",
          flush=True)
    return ms


full = timed(grad_fn, f"full SDS step  (render+VAE+2xUNet, B={B} @{res}^2, N={n})")
ronly = timed(render_grad, f"render-only    (B={B} @{res}^2, N={n})         ")
print(f"guidance share: {full - ronly:.1f} ms = {(full - ronly) / full * 100:.0f}% of the step")
