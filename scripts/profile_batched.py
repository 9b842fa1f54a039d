#!/usr/bin/env python
"""Measure the single-pass batched multi-view render against the unrolled
per-view loop at TRAINING scale on the real chip.

Usage (needs the axon tunnel):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_batched.py \
      [--n 100000] [--b 4] [--res 256] [--iters 20]

Prints fwd+bwd step times for both paths.  Expectation (PERF.md item 5):
the batched path amortizes per-view dispatch + runs full-size sorts, the
win growing as per-view work shrinks.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--max-pairs", type=int, default=512 * 1024,
                    help="per-view pair capacity")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from threestudio_3dgs_tpu.ops import camera as cam_mod
    from threestudio_3dgs_tpu.ops.rasterizer import (
        RasterizeConfig,
        rasterize,
        rasterize_batched,
    )

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    rng = np.random.default_rng(0)
    n, b, res = args.n, args.b, args.res
    means = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.35)
    scales = jnp.asarray(
        np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.3 - 4.6)
    )
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.2, 0.9, size=(n,)).astype(np.float32))
    colors = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))

    cams = []
    for v in range(b):
        ang = 2 * np.pi * v / b
        eye = np.array([2.5 * np.sin(ang), -2.5 * np.cos(ang), 0.5])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0, 0, 1.0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
        cams.append(cam_mod.camera_from_c2w(jnp.asarray(c2w), 0.9, 0.9, res, res))

    cfg = RasterizeConfig(tile_size=32, max_pairs=args.max_pairs)
    cfg_b = RasterizeConfig(tile_size=32, max_pairs=args.max_pairs * b)
    bg = jnp.zeros(3)

    def loss_loop(m, s, q, o, c):
        t = 0.0
        for cam in cams:
            out = rasterize(m, s, q, o, cam, bg, colors=c, config=cfg)
            t = t + jnp.sum(out["image"] ** 2) + jnp.sum(out["alpha"])
        return t

    def loss_batched(m, s, q, o, c):
        out = rasterize_batched(m, s, q, o, cams, bg, colors=c, config=cfg_b)
        return jnp.sum(out["image"] ** 2) + jnp.sum(out["alpha"])

    for name, fn in [("loop", loss_loop), ("batched", loss_batched)]:
        # SERIAL CHAIN: feed each iteration's mean-gradient back into the
        # means so no two dispatches are identical -- the axon tunnel elides
        # repeated identical calls and reports absurd throughputs otherwise
        # (PERF.md measurement pitfalls; caught live in round 3: a naive
        # repeat "measured" the batched path at 4400 Mpix/s)
        def chained(m, s, q, o, c):
            g = jax.grad(fn, argnums=(0,))
            def body(i, mm):
                (gm,) = g(mm, s, q, o, c)
                return mm + 1e-6 * gm
            return jax.lax.fori_loop(0, args.iters, body, m)

        step = jax.jit(chained)
        t0 = time.time()
        out = step(means, scales, quats, opac, colors)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        t0 = time.time()
        out = step(means, scales, quats, opac, colors)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / args.iters
        pix = b * res * res
        print(
            f"{name:8s} compile {compile_s:6.1f}s  step {dt * 1e3:8.2f} ms "
            f"({pix / dt / 1e6:6.2f} Mpix/s fwd+bwd, grad wrt means, "
            f"serial chain x{args.iters})"
        )


if __name__ == "__main__":
    main()
