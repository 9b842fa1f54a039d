#!/usr/bin/env python
"""Round-4 verdict item 9: per-view SEGMENTED pair pools inside one dispatch,
via jax.vmap of the single-view rasterizer over the camera batch -- B
independent per-view sorts (batched lax.sort, cheaper than one global sort
over B*cap shared-pool rows) and one batched Pallas dispatch per kernel,
measured against (a) the per-view loop and (b) the tall-grid shared-pool
batched path, all as serial gradient chains at the verdict's stated scale
(B=4 @ 512^2, 100k gaussians).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_batched_vmap.py \
    [--n 100000] [--res 512] [--b 4] [--cap 262144] [--iters 8] [--cpu]
"""

import argparse
import time

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=100_000)
ap.add_argument("--res", type=int, default=512)
ap.add_argument("--b", type=int, default=4)
ap.add_argument("--cap", type=int, default=256 * 1024)
ap.add_argument("--iters", type=int, default=8)
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig, rasterize
from threestudio_3dgs_tpu.ops.rasterizer.api import rasterize_batched

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
    cams.append(cam_mod.camera_from_c2w(jnp.asarray(c2w), 0.9, 0.9, res, res))

cfg = RasterizeConfig(
    tile_size=32, max_pairs=args.cap,
    impl="jax" if args.cpu else "pallas",
)
bg = jnp.zeros(3)
p = tuple(map(jnp.asarray, (means, scales, quats, opacities, colors)))

# one stacked Camera pytree for vmap (all leaves batchable)
cam_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)


def one_view_loss(cam, ms, sc, qt, op, co):
    out = rasterize(ms, sc, qt, op, cam, bg, colors=co, config=cfg,
                    with_depth=False)
    return jnp.sum(out["image"] ** 2)


def loop_loss(ms, sc, qt, op, co):
    return sum(one_view_loss(cam, ms, sc, qt, op, co) for cam in cams)


def vmap_loss(ms, sc, qt, op, co):
    losses = jax.vmap(one_view_loss, in_axes=(0, None, None, None, None, None))(
        cam_stack, ms, sc, qt, op, co
    )
    return jnp.sum(losses)


# FAIRNESS (round-5 correction): rasterize_batched's max_pairs is the
# GLOBAL pool shared by all views (api.py docstring), while the loop/vmap
# variants get args.cap PER VIEW.  The tall variant must therefore run at a
# B*cap pool -- the first round-5 measurement passed the same config to all
# three and handed tall a 4x-smaller capacity (it dropped pairs wholesale
# and "won" partly by rendering less work).  Note the packed tile key bounds
# the pool: pair_bits(B*cap) + tile_bits(B*tiles) <= 31, so B=4 @512^2 is
# only feasible up to 256k/view.
cfg_pool = RasterizeConfig(
    tile_size=32, max_pairs=args.cap * B,
    impl="jax" if args.cpu else "pallas",
)


def tall_loss(ms, sc, qt, op, co):
    outs = rasterize_batched(ms, sc, qt, op, cams, bg, colors=co,
                             config=cfg_pool, with_depth=False)
    return jnp.sum(outs["image"] ** 2)


def report_drops():
    """Validity check: a variant that drops pairs is rendering less work."""
    out1 = rasterize(*p[:4], cams[0], bg, colors=p[4], config=cfg,
                     with_depth=False)
    outB = rasterize_batched(*p[:4], cams, bg, colors=p[4], config=cfg_pool,
                             with_depth=False)
    import numpy as _np

    print(
        f"drops: per-view {int(_np.asarray(out1['n_dropped']))} "
        f"(demand {int(_np.asarray(out1['n_pairs'] + out1['n_dropped']))}/{args.cap})  "
        f"tall-pool {int(_np.asarray(outB['n_dropped']))} "
        f"(demand {int(_np.asarray(outB['n_pairs'] + outB['n_dropped']))}/{args.cap * B})",
        flush=True,
    )


def chain(loss):
    g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

    def body(params, _):
        gr = g(*params)
        # serial dependence: next iteration's input folds in this gradient
        new = tuple(p - 1e-12 * gg for p, gg in zip(params, gr))
        return new, gr[0][0, 0]

    def run(params, iters):
        out, traces = jax.lax.scan(body, params, None, length=iters)
        return out[0], traces

    return jax.jit(run, static_argnums=1)


def timed(label, fn):
    # Warm up with the SAME static iters value as the timed call: iters is a
    # jit static arg, so a different warm-up value would leave the timed call
    # to retrace+recompile the whole gradient scan inside the timed region
    # (round-4 advisor finding), inflating ms/step by compile_time/iters.
    t0 = time.perf_counter()
    out, _ = fn(p, args.iters)
    np.asarray(out[:1])  # host fetch: true sync through the tunnel
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out, _ = fn(p, args.iters)
    np.asarray(out[:1])
    ms = (time.perf_counter() - t0) / args.iters * 1000
    print(f"{label}: {ms:9.2f} ms/step  (compile {compile_s:.0f}s)", flush=True)
    return ms


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}  B={B} res={res} n={n} cap={args.cap}")
    report_drops()
    results = {}
    results["loop"] = timed("per-view loop         ", chain(loop_loss))
    try:
        results["vmap"] = timed("vmap segmented pools  ", chain(vmap_loss))
    except Exception as e:
        print(f"vmap segmented pools: FAILED ({type(e).__name__}: {e})")
    try:
        results["tall"] = timed("tall-grid shared pool ", chain(tall_loss))
    except Exception as e:
        print(f"tall-grid shared pool: FAILED ({type(e).__name__}: {e})")
    print(results)
