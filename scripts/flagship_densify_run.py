#!/usr/bin/env python
"""Flagship-scale hardware training demo (round-4 verdict item 5): 512^2,
batch 4 cameras, fake-SDS guidance, densify from 4k to >= 100k Gaussians,
>= 500 steps, driven through the SAME system.train_step the Trainer uses
(adaptive pair capacity ON so retrace stalls are real and recorded).

Batches are device-staged in a reusable pool before timing (per-step host ->
device transfers through the axon tunnel cost 10s-100s of ms and measure the
link, not the chip -- PERF.md pitfalls).  Records the ms/step curve across
capacity buckets, densify growth, retrace count, and ships a final render to
docs/demo/flagship_512.png.

Matches the reference flagship schedule
(/root/reference/configs/gaussian_splatting.yaml:8-10,85-89: 512^2 B=4,
densify interval 100 to 500k; we cap at 131k for the demo's step budget).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/flagship_densify_run.py
"""

import argparse
import json
import os
import time

# Resolve output paths against the repo root, not the cwd: the open() at the
# end must not fail (discarding the measured curve) when the script is run
# from elsewhere (round-4 advisor finding).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEMO = os.path.join(_REPO, "docs", "demo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--init", type=int, default=4096)
    ap.add_argument("--cap", type=int, default=131072)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--pool", type=int, default=24)
    ap.add_argument("--guidance", default="fake",
                    choices=["fake", "analytic", "analytic-mse"],
                    help="fake = solid-color SDS target; analytic = "
                         "multi-view-consistent ray-traced snowman targets "
                         "(structured geometry, round-5 verdict item 4)")
    ap.add_argument("--tag", default="flagship_512",
                    help="output basename under docs/demo/")
    ap.add_argument("--max-pairs", type=int, default=4 * 1024 * 1024,
                    help="adaptive pair-capacity CEILING per view")
    ap.add_argument("--densify-interval", type=int, default=50)
    ap.add_argument("--densify-threshold", type=float, default=0.0002)
    ap.add_argument("--densify-until", type=int, default=0,
                    help="stop densify/prune here (0 = steps-50); later "
                         "steps refine in place")
    args = ap.parse_args()

    os.makedirs(_DEMO, exist_ok=True)  # early writability check, before the run

    import jax
    import jax.numpy as jnp
    import numpy as np

    from threestudio_3dgs_tpu.data.uncond import (
        RandomCameraDataModuleConfig,
        RandomCameraSampler,
    )
    from threestudio_3dgs_tpu.systems.base import to_device_batch
    from threestudio_3dgs_tpu.utils.registry import find

    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    system = find("gaussian-splatting-system")(
        {
            "geometry_type": "gaussian-splatting",
            "geometry": {
                "init_num_pts": args.init,
                "max_num": args.cap,
                "capacity": args.cap,
                "densify_from_iter": 50,
                "densification_interval": args.densify_interval,
                "densify_until_iter": args.densify_until or args.steps - 50,
                "prune_from_iter": 50,
                "prune_interval": args.densify_interval,
                "prune_until_iter": args.densify_until or args.steps - 50,
                "densify_grad_threshold": args.densify_threshold,
                "min_opac_prune": 0.005,
            },
            "renderer_type": "diff-gaussian-rasterizer-advanced",
            "renderer": {
                # max_pairs is the adaptive controller's CEILING (growth
                # clamps here): at 512k gaussians @512^2 the per-view pair
                # demand runs to millions -- a 256k ceiling silently drops
                # pairs every step and looks like bad convergence (the
                # round-5 v1-v3 flagship artifacts)
                "tile_size": 32,
                "max_pairs": args.max_pairs,
                "adaptive_max_pairs": True,
                "impl": "pallas" if jax.default_backend() != "cpu" else "jax",
            },
            "guidance_type": (
                "analytic-scene-sds-guidance"
                if args.guidance.startswith("analytic")
                else "fake-sds-guidance"
            ),
            "guidance": (
                # mse = straight multi-view image-target fitting (clean
                # geometry); sds routes the same targets through the
                # annealed SDS plumbing (reference flagship schedule).
                # bg_color MUST match the TRAINING background the renderer
                # composites over -- WHITE by the reference's quirk
                # (invert_bg_prob 1.0 never inverts in training, eval always
                # inverts to black; diff_gaussian_rasterizer.py:59-64).  A
                # black-bg target over a white training bg teaches the model
                # to build dark curtain gaussians everywhere (the round-5
                # v1-v5 fog).
                {"mode": "mse", "bg_color": [1.0, 1.0, 1.0]}
                if args.guidance == "analytic-mse"
                else {"max_step_percent": [0, 0.98, 0.5, args.steps // 2],
                      "bg_color": [1.0, 1.0, 1.0]}
                if args.guidance == "analytic"
                else {"target_color": [0.85, 0.3, 0.1]}
            ),
            "loss": (
                # reconstruction mode: the SDS-era regularizers actively
                # fight a precise MSE fit (under Adam a constant-direction
                # position/opacity reg gradient is normalized to a FULL
                # lr-sized step, dragging converged gaussians off their
                # surfaces every iteration)
                {
                    "lambda_sds": 1.0,
                    "lambda_position": 0.0,
                    "lambda_opacity": 0.0,
                    "lambda_scales": 0.0005,
                    "lambda_tv_loss": 0.0,
                }
                if args.guidance == "analytic-mse"
                else {
                    "lambda_sds": 1.0,
                    "lambda_position": 1.0,
                    "lambda_opacity": 0.0005,
                    "lambda_scales": 0.0005,
                    "lambda_tv_loss": 1.0,
                }
            ),
        }
    )
    state = system.init_state(0)
    sampler = RandomCameraSampler(
        RandomCameraDataModuleConfig(
            batch_size=args.b, height=args.res, width=args.res
        )
    )

    # device-staged batch pool, cycled
    staged = []
    for _ in range(args.pool):
        raw = sampler.sample()
        db = to_device_batch(raw)
        db["height"], db["width"] = raw["height"], raw["width"]
        staged.append(db)
    jax.block_until_ready(
        [v for d in staged for v in d.values() if hasattr(v, "block_until_ready")]
    )

    key = jax.random.PRNGKey(0)
    curve = []  # (step, wall_ms, n_alive, pair_capacity, retraces)
    window_t0 = time.perf_counter()
    window_n = 0
    WINDOW = 25
    t_run0 = time.perf_counter()
    nan_trips = 0
    # Device-side OR-accumulated non-finiteness flag: every step's loss is
    # checked on device (no host sync), fetched once per window alongside the
    # existing sync -- NaN detection covers all steps, not 1 in 25
    # (round-4 advisor finding).
    any_nonfinite = jnp.zeros((), jnp.bool_)
    for step in range(1, args.steps + 1):
        key, k = jax.random.split(key)
        state, logs = system.train_step(state, staged[step % args.pool], step, k)
        any_nonfinite = jnp.logical_or(
            any_nonfinite, ~jnp.isfinite(logs["train/loss_total"])
        )
        # sync once per WINDOW, not per step: per-iter host syncs add
        # 100-600 ms of tunnel latency each and would measure the link
        # (PERF.md pitfalls); the curve is window-granular anyway
        window_n += 1
        if step % WINDOW == 0:
            jax.block_until_ready(state.gauss.params.xyz)
            loss = float(np.asarray(logs["train/loss_total"]))
            if bool(np.asarray(any_nonfinite)):
                nan_trips += 1
                any_nonfinite = jnp.zeros((), jnp.bool_)
            alive = int(state.gauss.n_alive)
            cap = system._pair_capacity()
            w_ms = (time.perf_counter() - window_t0) / window_n * 1000
            curve.append(
                dict(step=step, ms=round(w_ms, 1), alive=alive,
                     pair_cap=cap, retraces=system._retrace_count,
                     loss=round(loss, 2))
            )
            print(
                f"step {step:4d}  {w_ms:7.1f} ms/step  alive={alive:6d}  "
                f"pair_cap={cap}  retraces={system._retrace_count}  "
                f"loss={loss:.2f}",
                flush=True,
            )
            window_t0 = time.perf_counter()
            window_n = 0
    total_s = time.perf_counter() - t_run0
    alive = int(state.gauss.n_alive)
    print(
        f"DONE: {args.steps} steps in {total_s:.0f}s, "
        f"{args.init} -> {alive} gaussians, "
        f"{system._retrace_count} capacity retraces, "
        f"nan_trips={nan_trips} (windows of {WINDOW} steps with any non-finite loss)"
    )
    with open(os.path.join(_DEMO, f"{args.tag}_curve.json"), "w") as f:
        json.dump(
            dict(res=args.res, b=args.b, steps=args.steps, final_alive=alive,
                 retraces=system._retrace_count, total_s=round(total_s, 1),
                 curve=curve),
            f, indent=1,
        )

    # final renders -> docs/demo/: fixed 4-view azimuth circle at the eval
    # elevation (not a random camera), assembled as a 2x2 grid
    from threestudio_3dgs_tpu.data.uncond import fixed_circle_views

    eval_cfg = RandomCameraDataModuleConfig(
        batch_size=args.b, height=args.res, width=args.res,
        eval_height=args.res, eval_width=args.res,
        n_val_views=4, eval_camera_distance=1.5, eval_elevation_deg=15.0,
    )
    views = fixed_circle_views(eval_cfg, "val")
    outs = system.render_views(state, views)
    imgs = [np.clip(np.asarray(o["comp_rgb"][0]), 0, 1) for o in outs]
    grid = np.concatenate(
        [np.concatenate(imgs[:2], axis=1), np.concatenate(imgs[2:], axis=1)],
        axis=0,
    )
    img8 = (grid * 255).astype(np.uint8)
    # plus one render from a training-distribution camera (diagnoses
    # geometry-vs-eval-path discrepancies)
    raw = sampler.sample()
    raw["index"] = 0
    tout = system.render_views(state, [raw])[0]
    timg = (np.clip(np.asarray(tout["comp_rgb"][0]), 0, 1) * 255).astype(np.uint8)

    # turntable GIF (24 views around the azimuth circle at eval res 256)
    gif_cfg = RandomCameraDataModuleConfig(
        batch_size=args.b, height=args.res, width=args.res,
        eval_height=256, eval_width=256, n_val_views=24,
        eval_camera_distance=1.5, eval_elevation_deg=15.0,
    )
    gviews = fixed_circle_views(gif_cfg, "val")
    gouts = system.render_views(state, gviews)
    gframes = [
        (np.clip(np.asarray(o["comp_rgb"][0]), 0, 1) * 255).astype(np.uint8)
        for o in gouts
    ]

    # final PLY (the trained point cloud is the run's durable artifact)
    try:
        system.geometry.save_ply(
            state.gauss, os.path.join(_DEMO, f"{args.tag}.ply")
        )
        print(f"ply -> {os.path.join(_DEMO, args.tag + '.ply')}")
    except Exception as e:  # PLY export is best-effort in the demo script
        print(f"(ply export skipped: {type(e).__name__}: {e})")
    try:
        from PIL import Image

        Image.fromarray(img8).save(os.path.join(_DEMO, f"{args.tag}.png"))
        Image.fromarray(timg).save(os.path.join(_DEMO, f"{args.tag}_train_cam.png"))
        Image.fromarray(gframes[0]).save(
            os.path.join(_DEMO, f"{args.tag}.gif"),
            save_all=True,
            append_images=[Image.fromarray(f) for f in gframes[1:]],
            duration=120,
            loop=0,
        )
        print(f"render -> {os.path.join(_DEMO, args.tag + '.png')} (+_train_cam, .gif)")
    except ImportError:
        np.save(os.path.join(_DEMO, f"{args.tag}.npy"), img8)
        print(f"render -> {os.path.join(_DEMO, args.tag + '.npy')} (no PIL)")


if __name__ == "__main__":
    main()
