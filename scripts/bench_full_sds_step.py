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
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from threestudio_3dgs_tpu.diffusion.convert import cast_params_half
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
ap.add_argument("--bf16", action="store_true",
                help="bf16 compute dtype + bf16 conv/dense params for UNet+VAE")
ap.add_argument("--flash", action="store_true",
                help="Pallas flash attention in the UNet self-attention")
ap.add_argument("--stages", action="store_true",
                help="also time VAE-encode-only and UNet-only programs")
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

dt = jnp.bfloat16 if args.bf16 else jnp.float32
unet_cfg = dataclasses.replace(
    SD21_UNET, dtype=dt, use_flash_attention=args.flash
)
vae_cfg = dataclasses.replace(SD_VAE, dtype=dt)
unet = UNet2DCondition(unet_cfg)
vae = VAEEncoder(vae_cfg)
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
if args.bf16:
    # conv/dense params stored bf16 (halves weight HBM reads); norms stay f32
    unet_params = cast_params_half(unet_params)
    vae_params = cast_params_half(vae_params)
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
    """fn(unet_params, vae_params, means, key) -> grad pytree.

    Serial chain INSIDE one executable (lax.scan): each iteration's means
    input carries a zero-valued contribution from the previous gradient, so
    iterations cannot overlap -- and there are no eager ops between
    dispatches (eager chaining costs a tunnel round trip per op and measures
    the link, not the chip; round-4 advisor finding + PERF.md pitfalls).
    Params are jit ARGUMENTS of the scan runner too: closures would bake GBs
    of constants into the lowered module."""

    def run(up, vp, k0, n_iters):
        def body(carry, i):
            ms_in, k = carry
            k2 = jax.random.fold_in(k, i)  # fresh key -> fresh timestep draw
            g = fn(up, vp, ms_in, k2)
            g0 = jax.tree_util.tree_leaves(g)[0]
            return (p_means + 0.0 * g0.reshape(-1)[0], k2), ()

        (ms_fin, _), _ = jax.lax.scan(body, (p_means, k0), jnp.arange(n_iters))
        return ms_fin

    runj = jax.jit(run, static_argnums=3)
    k = jax.random.PRNGKey(1)
    t_c0 = time.perf_counter()
    # terminate with a HOST FETCH, not block_until_ready: the tunnel does
    # not synchronize single dispatches under block_until_ready (PERF.md
    # round-4 sort-bench pitfall)
    np.asarray(runj(unet_params, vae_params, k, args.iters).ravel()[:1])
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    np.asarray(runj(unet_params, vae_params, k, args.iters).ravel()[:1])
    ms = (time.perf_counter() - t0) / args.iters * 1000
    print(f"{label}: {ms:8.2f} ms/step  (first call incl. compile {compile_s:.0f}s)",
          flush=True)
    return ms


def full_fn(up, vp, ms, k):
    return _grad(up, vp, ms, raw_sc, p_quats, raw_op, p_colors, k)


def render_fn(up, vp, ms, k):
    del up, vp, k
    return render_grad(ms, raw_sc, p_quats, raw_op, p_colors,
                       jax.random.PRNGKey(0))


tag = ("bf16" if args.bf16 else "f32") + ("+flash" if args.flash else "")
full = timed(full_fn, f"full SDS step [{tag}] (render+VAE+2xUNet, B={B} @{res}^2, N={n})")
ronly = timed(render_fn, f"render-only    (B={B} @{res}^2, N={n})         ")
print(f"guidance share: {full - ronly:.1f} ms = {(full - ronly) / full * 100:.0f}% of the step")

if args.stages:
    # isolated stage programs: same scan-chained methodology, params as args
    def timed_chain(fn, params, x0, label):
        def run(p, x, n_iters):
            def body(xc, _):
                y = fn(p, xc)
                y0 = jax.tree_util.tree_leaves(y)[0]
                return x + 0.0 * y0.reshape(-1)[0].astype(x.dtype), ()

            x_fin, _ = jax.lax.scan(body, x, None, length=n_iters)
            return x_fin

        runj = jax.jit(run, static_argnums=2)
        np.asarray(runj(params, x0, args.iters).ravel()[:1])  # compile+sync
        t0 = time.perf_counter()
        np.asarray(runj(params, x0, args.iters).ravel()[:1])
        ms = (time.perf_counter() - t0) / args.iters * 1000
        print(f"  {label}: {ms:8.2f} ms", flush=True)
        return ms

    lat2 = jax.random.normal(k3, (2 * B, lat_hw, lat_hw, 4))
    ts2 = jnp.full((2 * B,), 500, jnp.int32)
    ctx2 = jnp.concatenate([ctx_uncond, ctx_cond], axis=0)
    img0 = jax.random.uniform(k3, (B, res, res, 3))

    print("stage table:")
    timed_chain(lambda p, x: unet.apply(p, x, ts2, ctx2), unet_params, lat2,
                f"UNet fwd (CFG batch 2B={2*B})")
    timed_chain(lambda p, im: vae.apply(p, im), vae_params, img0,
                "VAE encode fwd               ")
    timed_chain(
        lambda p, im: jax.grad(lambda i: jnp.sum(vae.apply(p, i) ** 2))(im),
        vae_params, img0, "VAE encode fwd+bwd           ")
