#!/usr/bin/env python
"""Full production train-step time at flagship config scale (round-2 verdict
item 5b): render fwd+bwd + fake-SDS guidance + regularizers + Adam + densify
stats, at 512^2, batch 4 cameras, ~100k live Gaussians, via the SAME
system.train_step the Trainer drives (including batched rasterization and,
when devices > 1 or --mesh 1, the shard_map dp path).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_trainstep.py \
    [--res 512] [--b 4] [--n 100000] [--steps 20] [--mesh 0]
"""

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--max-pairs", type=int, default=1024 * 1024)
    ap.add_argument("--mesh", type=int, default=0,
                    help=">0: run the dp path on a mesh of this many devices")
    args = ap.parse_args()

    import jax
    import numpy as np

    from threestudio_3dgs_tpu.data.uncond import (
        RandomCameraDataModuleConfig,
        RandomCameraSampler,
    )
    from threestudio_3dgs_tpu.utils.registry import find

    print(f"backend={jax.default_backend()} devices={jax.devices()}")

    system = find("gaussian-splatting-system")(
        {
            "geometry_type": "gaussian-splatting",
            "geometry": {
                "init_num_pts": args.n,
                "max_num": args.n,
                "capacity": args.n,
                "densify_from_iter": 100000000,  # step math only; structural
                "prune_from_iter": 100000000,    # updates timed separately
            },
            "renderer_type": "diff-gaussian-rasterizer-advanced",
            "renderer": {
                "tile_size": 32,
                "max_pairs": args.max_pairs,
                "impl": "pallas" if jax.default_backend() != "cpu" else "jax",
            },
            "guidance_type": "fake-sds-guidance",
            "guidance": {"target_color": [0.8, 0.2, 0.2]},
            "loss": {
                "lambda_sds": 1.0,
                "lambda_position": 1.0,
                "lambda_opacity": 0.0001,
                "lambda_scales": 0.0001,
                "lambda_tv_loss": 1.0,
            },
        }
    )
    if args.mesh:
        from threestudio_3dgs_tpu.parallel.mesh import make_mesh

        system.set_mesh(make_mesh(args.mesh))
        print(f"dp mesh: {args.mesh} device(s)")

    state = system.init_state(0)
    sampler = RandomCameraSampler(
        RandomCameraDataModuleConfig(
            batch_size=args.b, height=args.res, width=args.res
        )
    )
    batch = sampler.sample()
    key = jax.random.PRNGKey(0)

    # warm (compile)
    t0 = time.perf_counter()
    state, logs = system.train_step(state, batch, 0, key)
    jax.block_until_ready(state.gauss.params.xyz)
    print(f"compile+first step: {time.perf_counter() - t0:.1f} s")
    # second warm step: on a mesh the first call consumed the UNSHARDED
    # init state and its output now carries mesh shardings -- without this
    # the recompile for the sharded-input signature lands inside the timed
    # loop (same trap bench_scaling had)
    state, logs = system.train_step(state, batch, 0, key)
    jax.block_until_ready(state.gauss.params.xyz)

    # pre-stage the camera batches on device BEFORE timing: per-step host ->
    # device transfers through the axon tunnel cost 10s-100s of ms each and
    # measure the link, not the chip (PERF.md pitfalls)
    from threestudio_3dgs_tpu.systems.base import to_device_batch

    staged = []
    for _ in range(args.steps):
        raw = sampler.sample()
        db = to_device_batch(raw)
        # train_step reads height/width host-side (static shape info, dropped
        # by to_device_batch); keep them in the staged dict
        db["height"], db["width"] = raw["height"], raw["width"]
        staged.append(db)
    jax.block_until_ready([v for d in staged for v in d.values()
                           if hasattr(v, "block_until_ready")])

    # async-pipelined steps, one final sync
    t0 = time.perf_counter()
    for s in range(1, args.steps + 1):
        state, logs = system.train_step(state, staged[s - 1], s, key)
    jax.block_until_ready(state.gauss.params.xyz)
    dt = (time.perf_counter() - t0) / args.steps
    loss = float(np.asarray(logs["train/loss_total"]))
    print(
        f"train step: {dt * 1000:.1f} ms  ({args.b} cams @ {args.res}^2, "
        f"{args.n} gaussians, loss={loss:.3f})"
    )
    # per-view throughput for the PERF.md table
    pix = args.b * args.res * args.res
    print(f"  = {pix / dt / 1e6:.2f} Mpix/s (fwd+bwd+opt, whole step)")

    # densify/prune structural op cost (runs at intervals in production)
    import jax.numpy as jnp

    from threestudio_3dgs_tpu.models import gaussian_field as gf

    dkey = jax.random.PRNGKey(1)
    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        st2 = gf.densify_op(
            state.gauss, dkey, jnp.float32(0.01), jnp.float32(0.02)
        )
        st2 = gf.prune_op(st2, jnp.float32(0.005))
        jax.block_until_ready(st2.params.xyz)
        print(
            f"densify+prune ({label}): "
            f"{(time.perf_counter() - t0) * 1000:.1f} ms"
        )


if __name__ == "__main__":
    main()
