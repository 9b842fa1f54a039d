"""Device-trace the guidance-chain programs (UNet CFG fwd, VAE encode
fwd+bwd) in isolation and print per-op tables -- round-5 item 1: the bf16
conversion barely moved the 310 ms guidance share, so the bottleneck is NOT
matmul throughput; this names it.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_guidance.py \
    [--res 512] [--b 1] [--f32] [--no-flash] [--what unet|vae|both]
"""

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from threestudio_3dgs_tpu.diffusion.convert import cast_params_half
from threestudio_3dgs_tpu.diffusion.unet import SD21_UNET, UNet2DCondition
from threestudio_3dgs_tpu.diffusion.vae import SD_VAE, VAEEncoder

from xplane_util import parse_device_totals, print_table

ap = argparse.ArgumentParser()
ap.add_argument("--res", type=int, default=512)
ap.add_argument("--b", type=int, default=1)
ap.add_argument("--f32", action="store_true")
ap.add_argument("--no-flash", action="store_true")
ap.add_argument("--what", default="both", choices=["unet", "vae", "both"])
args = ap.parse_args()

B, res = args.b, args.res
dt = jnp.float32 if args.f32 else jnp.bfloat16
unet_cfg = dataclasses.replace(
    SD21_UNET, dtype=dt, use_flash_attention=not args.no_flash
)
vae_cfg = dataclasses.replace(SD_VAE, dtype=dt)
unet = UNet2DCondition(unet_cfg)
vae = VAEEncoder(vae_cfg)
key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
lat_hw = res // 8
lat2 = jax.random.normal(k3, (2 * B, lat_hw, lat_hw, 4))
ts2 = jnp.full((2 * B,), 500, jnp.int32)
ctx2 = jax.random.normal(k3, (2 * B, 77, SD21_UNET.cross_attention_dim)) * 0.02
img0 = jax.random.uniform(k3, (B, res, res, 3))

unet_params = jax.jit(unet.init)(k1, lat2, ts2, ctx2)
vae_params = jax.jit(vae.init)(k2, img0)
if not args.f32:
    unet_params = cast_params_half(unet_params)
    vae_params = cast_params_half(vae_params)

unet_fwd = jax.jit(lambda p, x: unet.apply(p, x, ts2, ctx2))
vae_grad = jax.jit(
    lambda p, im: jax.grad(lambda i: jnp.sum(vae.apply(p, i) ** 2))(im)
)


def drive(label, fn, params, x0, iters=6):
    # serial chain INSIDE one executable (lax.scan): eager chaining ops
    # between dispatches each cost a tunnel round trip and measure the link
    def run(p, x0_, n):
        def body(x, _):
            y = fn(p, x)
            y0 = jax.tree_util.tree_leaves(y)[0]
            return x0_ + 0.0 * y0.reshape(-1)[0].astype(x0_.dtype), ()

        x_fin, _ = jax.lax.scan(body, x0_, None, length=n)
        return x_fin

    runj = jax.jit(run, static_argnums=2)
    np.asarray(runj(params, x0, iters).ravel()[:1])  # compile+sync
    t0 = time.perf_counter()
    np.asarray(runj(params, x0, iters).ravel()[:1])
    print(
        f"{label}: {(time.perf_counter() - t0) / iters * 1000:.2f} ms "
        f"(scan-chained x{iters})"
    )
    y = fn(params, x0)

    # device time from the trace is authoritative regardless of dispatch
    # pipelining -- no chaining needed inside the capture
    logdir = f"/tmp/trace_guidance_{label}"
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        y = fn(params, x0)
    np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[:1]
    jax.profiler.stop_trace()
    print_table(parse_device_totals(logdir, 3), top=30)


if args.what in ("unet", "both"):
    drive("unet_fwd", unet_fwd, unet_params, lat2)
if args.what in ("vae", "both"):
    drive("vae_grad", vae_grad, vae_params, img0)
