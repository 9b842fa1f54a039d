"""TPU benchmark of the diffusion guidance stack (round-2 verdict item 6).

Times the Flax UNet forward at SD 2.1 scale (4x64x64 latents, 1024-d text
context, the shapes the SDS step runs per denoise call -- reference
guidance/temporal_zero123_guidance.py:298-373 spends most of its step here)
and the VAE encode of a 512^2 render, in bf16 and f32, with random weights
(no egress: checkpoints cannot be downloaded; compute cost is weight-value
independent).

Prints measured ms, model FLOPs, and %SoL vs the v5e MXU peak, then a
projected full real-SDS step (render fwd+bwd + VAE encode fwd+bwd + 2x UNet
(CFG) fwd + VAE-grad bwd) for PERF.md.  SUPERSEDED round 4: the whole chain
is now timed as ONE compiled program on hardware by
scripts/bench_full_sds_step.py (364 ms/step, PERF.md "Round-4 full SDS
step"); this script remains for per-component attribution.

Benchmark methodology per PERF.md pitfalls: chained serial calls (each
input depends on the previous output) inside one jit, so the tunnel cannot
pipeline/elide repeats.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from threestudio_3dgs_tpu.diffusion.unet import (
    SD21_UNET,
    UNet2DCondition,
)
from threestudio_3dgs_tpu.diffusion.vae import SD_VAE, VAEEncoder

MXU_PEAK_BF16 = 197e12  # v5e
MXU_PEAK_F32 = MXU_PEAK_BF16 / 8


def chain_time(fn, x, iters=8):
    """Serial chain: each call consumes the previous result.

    Python-level chaining of ONE jitted apply (not a fori_loop of the body:
    the rolled SD2.1 graph reproducibly broke the tunnel's remote_compile
    with a broken pipe ~20 min in).  Data dependency between calls defeats
    the tunnel's identical-dispatch elision; dispatches still pipeline, one
    final sync."""
    step = jax.jit(fn)
    r = step(x)  # compile + warm
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = step(r)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1000


def unet_flops(b, h, w, cfg):
    """Rough dense-FLOP model of the SD2.1 UNet fwd (conv + attn matmuls).

    Derived per level: resnets 2 convs of 3x3 at C channels, attention
    qkv/proj at C^2, cross-attn KV at C*1024; good to ~15% -- enough for a
    SoL denominator."""
    total = 0.0
    ch = cfg.block_out_channels
    hh, ww = h, w
    in_c = ch[0]
    # conv_in
    total += 2 * b * hh * ww * 9 * cfg.in_channels * ch[0]
    for lvl, c in enumerate(ch):
        tokens = hh * ww
        for _ in range(cfg.layers_per_block):
            total += 2 * b * tokens * 9 * in_c * c  # conv1
            total += 2 * b * tokens * 9 * c * c  # conv2
            in_c = c
            if lvl < len(ch) - 1:  # cross-attn transformer at this level
                total += 2 * b * tokens * c * c * 4  # qkvo
                total += 2 * b * tokens * tokens * c * 2  # self-attn scores+mix
                total += 2 * b * 77 * c * cfg.cross_attention_dim * 2  # kv
                total += 2 * b * tokens * 77 * c * 2  # cross scores+mix
                total += 2 * b * tokens * c * c * 8  # ff (4x)
        if lvl < len(ch) - 1:
            total += 2 * b * (hh // 2) * (ww // 2) * 9 * c * c  # downsample
            hh, ww = hh // 2, ww // 2
    # mid block ~ 2 resnets + 1 transformer at ch[-1]
    c = ch[-1]
    tokens = hh * ww
    total += 2 * (2 * b * tokens * 9 * c * c * 2)
    total += 2 * b * tokens * c * c * 12 + 2 * b * tokens * tokens * c * 2
    total *= 2.1  # up path ~= down path + skips (empirical factor)
    return total


def main():
    import sys

    print(f"devices: {jax.devices()}")
    b = 2  # CFG pair (uncond + cond) for ONE camera view
    h = w = 64

    # f32 doubles the (30+ min through the tunnel) compile for a number that
    # only restates the 8x MXU rate ratio; bench bf16 (the production dtype)
    # unless --f32 is passed
    dtypes = [(jnp.bfloat16, MXU_PEAK_BF16)]
    if "--f32" in sys.argv:
        dtypes.append((jnp.float32, MXU_PEAK_F32))

    for dtype, peak in dtypes:
        cfg = SD21_UNET.__class__(**{**SD21_UNET.__dict__, "dtype": dtype})
        unet = UNet2DCondition(cfg)
        key = jax.random.PRNGKey(0)
        x = jnp.zeros((b, h, w, 4), dtype)
        t = jnp.full((b,), 500, jnp.int32)
        ctx = jnp.zeros((b, 77, 1024), dtype)
        params = jax.jit(unet.init)(key, x, t, ctx)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))

        def step(x):
            out = unet.apply(params, x, t, ctx)
            return (x + out.astype(x.dtype) * 1e-3).astype(x.dtype)

        ms = chain_time(step, x, iters=4)
        fl = unet_flops(b, h, w, cfg)
        sol = fl / (ms / 1e3) / peak * 100
        print(
            f"UNet SD2.1 fwd b={b} {h}x{w} {dtype.__name__}: {ms:8.2f} ms  "
            f"({n_params/1e6:.0f}M params, ~{fl/1e9:.0f} GFLOP, {sol:.0f}% SoL)"
        )

    # VAE encode 512^2 -> 64^2 latents (the render enters the guidance here)
    for dtype, peak in dtypes:
        vcfg = SD_VAE.__class__(**{**SD_VAE.__dict__, "dtype": dtype})
        enc = VAEEncoder(vcfg)
        key = jax.random.PRNGKey(1)
        img = jnp.zeros((1, 512, 512, 3), dtype)
        params = jax.jit(enc.init)(key, img)

        def vstep(x):
            mom = enc.apply(params, x)
            # map the 64^2 moments back to an image-shaped perturbation
            per = jnp.tile(
                mom[:, :, :, :3].repeat(8, 1).repeat(8, 2) * 1e-3,
                (1, 1, 1, 1),
            )
            return (x + per.astype(x.dtype)).astype(x.dtype)

        ms = chain_time(vstep, img, iters=4)
        # encoder flops: ~conv stack 128..512 at 512^2 down to 64^2
        fl = 2 * 512 * 512 * 9 * (3 * 128 + 128 * 128 * 2) + 2 * 256 * 256 * 9 * (
            128 * 256 + 256 * 256
        ) + 2 * 128 * 128 * 9 * (256 * 512 + 512 * 512) + 2 * 64 * 64 * 9 * (
            512 * 512 * 3
        )
        sol = fl / (ms / 1e3) / peak * 100
        print(
            f"VAE encode 512^2 {dtype.__name__}:        {ms:8.2f} ms  "
            f"(~{fl/1e9:.0f} GFLOP, {sol:.0f}% SoL)"
        )


if __name__ == "__main__":
    main()
