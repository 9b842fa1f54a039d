#!/usr/bin/env python
"""Benchmark: forward+backward rasterization throughput on real hardware.

Prints ONE JSON line:
  {"metric": "pixels_per_sec_per_chip_fwd_bwd_1M_512", "value": N,
   "unit": "pixels/s", "vs_baseline": R}

The primary metric follows BASELINE.json: pixels/s/chip for a full
forward+backward render of a 1M-Gaussian scene at 512x512.  The reference
publishes no numbers (BASELINE.md); vs_baseline is measured against
3DGS-paper-class CUDA throughput on a datacenter GPU — the reference stack
renders 512^2 at roughly 100 FPS fwd+bwd at ~1M Gaussians on an A100
(~26 Mpix/s); ratio >= 1.0 means at least that fast per TPU chip.
"""

import json
import sys
import time

import numpy as np

BASELINE_PIX_PER_SEC = 26_000_000.0  # ~100 fps fwd+bwd @ 512^2 (CUDA 3DGS class)


def _backend_watchdog(seconds: float = 240.0):
    """Fail fast (clean JSON error on stdout) if backend init hangs — the
    axon tunnel, when down, blocks jax.devices() indefinitely."""
    import os
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(seconds):
            print(json.dumps({
                "metric": "pixels_per_sec_per_chip_fwd_bwd_1M_512",
                "value": 0,
                "unit": "pixels/s",
                "vs_baseline": 0,
                "error": f"backend init exceeded {seconds:.0f}s (tunnel down?)",
            }), flush=True)
            os._exit(2)

    threading.Thread(target=watch, daemon=True).start()
    return done


def main():
    _init_done = _backend_watchdog()
    import jax
    import jax.numpy as jnp

    jax.devices()  # force backend init under the watchdog
    _init_done.set()

    from threestudio_3dgs_tpu.ops import camera as cam_mod
    from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig, rasterize

    n = 1_000_000
    height = width = 512
    rng = np.random.default_rng(0)

    # a dense object-like scene: gaussians in a ball, small scales
    means = rng.normal(size=(n, 3)).astype(np.float32) * 0.35
    scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.3 - 5.2)
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
    # pair capacity right-sized to the scene -- the CUDA reference allocates
    # its pair buffers exactly per frame; a static capacity is the TPU
    # equivalent.  Measured demand 1.491M pairs after exact pre-expansion
    # culling; ~5% headroom keeps n_dropped == 0 (asserted below).
    # A/B knobs (defaults = the production configuration)
    import os

    ts = int(os.environ.get("BENCH_TILE_SIZE", "32"))
    mp = int(os.environ.get("BENCH_MAX_PAIRS", str(1536 * 1024)))
    cfg = RasterizeConfig(tile_size=ts, max_pairs=mp)

    means_j = jnp.asarray(means)
    scales_j = jnp.asarray(scales)
    quats_j = jnp.asarray(quats)
    opac_j = jnp.asarray(opacities)
    colors_j = jnp.asarray(colors)
    bg = jnp.zeros(3)

    def loss_fn(ms, sc, qt, op, co):
        out = rasterize(ms, sc, qt, op, cam, bg, colors=co, config=cfg)
        loss = jnp.sum(out["image"]) + jnp.sum(out["alpha"]) + jnp.sum(out["depth"])
        return loss, out["n_dropped"]

    step = jax.jit(
        jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True)
    )

    # warmup / compile
    grads, dropped = step(means_j, scales_j, quats_j, opac_j, colors_j)
    jax.block_until_ready(grads)
    # the right-sized capacity must not drop pairs (silent quality loss
    # would invalidate the number); checked inside the SAME program so it
    # costs no extra compile through the tunnel
    dropped = int(np.asarray(dropped))
    assert dropped == 0, f"bench capacity drops {dropped} pairs"

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        grads, _ = step(means_j, scales_j, quats_j, opac_j, colors_j)
    jax.block_until_ready(grads)
    dt = (time.perf_counter() - t0) / iters

    pix_per_sec = height * width / dt

    result = {
        "metric": "pixels_per_sec_per_chip_fwd_bwd_1M_512",
        "value": round(pix_per_sec, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pix_per_sec / BASELINE_PIX_PER_SEC, 4),
    }
    print(json.dumps(result))
    print(f"# step time: {dt*1000:.2f} ms ({1/dt:.1f} fps fwd+bwd)", file=sys.stderr)


if __name__ == "__main__":
    main()
