#!/usr/bin/env python
"""Scaling-efficiency benchmark (BASELINE.json north star: >= 80% pixels/s
scaling efficiency at 1 chip / 1 host / >= 2 hosts).

Measures the camera-sharded data-parallel training step and the tile-sharded
single-view render at every power-of-two device count available, and reports
throughput + efficiency vs the single-device run.

On real hardware run it as-is (multi-host: launch one process per host after
jax.distributed.initialize; the mesh spans all processes).  Without hardware,
XLA_FLAGS=--xla_force_host_platform_device_count=8 exercises the full code
path on a virtual CPU mesh (timings then measure the harness, not the chip).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_scaling.py \
      [--n 100000] [--res 256] [--views-per-device 1] [--iters 10]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--views-per-device", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--max-pairs", type=int, default=512 * 1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from threestudio_3dgs_tpu.data.uncond import (
        RandomCameraDataModuleConfig,
        RandomCameraSampler,
    )
    from threestudio_3dgs_tpu.parallel.data_parallel import (
        make_dp_train_step,
        shard_batch,
    )
    from threestudio_3dgs_tpu.parallel.mesh import make_mesh
    from threestudio_3dgs_tpu.systems.base import to_device_batch
    from threestudio_3dgs_tpu.utils.registry import find

    n_total = jax.device_count()
    print(f"backend={jax.default_backend()} devices={n_total} "
          f"processes={jax.process_count()}")
    res = args.res

    sizes = []
    d = 1
    while d <= n_total:
        sizes.append(d)
        d *= 2
    if sizes[-1] != n_total:
        sizes.append(n_total)

    results = {}
    for n_dev in sizes:
        global_batch = args.views_per_device * n_dev
        system = find("gaussian-splatting-system")(
            {
                "geometry_type": "gaussian-splatting",
                "geometry": {
                    "init_num_pts": args.n,
                    "max_num": args.n,
                    "capacity": args.n,
                },
                "renderer_type": "diff-gaussian-rasterizer-advanced",
                "renderer": {
                    "tile_size": 32,
                    "max_pairs": args.max_pairs,
                    "impl": "auto",
                },
                "guidance_type": "fake-sds-guidance",
                "guidance": {"target_color": [0.8, 0.2, 0.2]},
                "loss": {"lambda_sds": 1.0, "lambda_position": 1.0},
            }
        )
        state = system.init_state(0)
        sampler = RandomCameraSampler(
            RandomCameraDataModuleConfig(
                batch_size=global_batch, height=res, width=res
            )
        )
        mesh = make_mesh(n_dev)
        step = make_dp_train_step(system, mesh, res, res, global_batch)
        batch = shard_batch(mesh, to_device_batch(sampler.sample()))
        sched = system.sched_scalars(0)
        key = jax.random.PRNGKey(0)

        t0 = time.time()
        state2, logs = step(state, batch, key, sched)
        jax.block_until_ready(state2)
        compile_s = time.time() - t0
        # SECOND warm step: state2 carries the mesh sharding the first
        # (unsharded-input) call lacked -- timing from `state` would hide a
        # full recompile inside the loop (round-3 finding: 18 s/"step")
        state3, _ = step(state2, batch, key, sched)
        jax.block_until_ready(state3)

        t0 = time.time()
        s = state3
        for _ in range(args.iters):
            s, logs = step(s, batch, key, sched)
        jax.block_until_ready(s)
        dt = (time.time() - t0) / args.iters
        pix_s = global_batch * res * res / dt
        results[n_dev] = pix_s
        eff = pix_s / (results[1] * n_dev) * 100.0
        print(
            f"dp  n_dev={n_dev:3d}  global_batch={global_batch:3d}  "
            f"compile {compile_s:5.1f}s  step {dt * 1e3:8.2f} ms  "
            f"{pix_s / 1e6:7.2f} Mpix/s  efficiency {eff:5.1f}%"
        )

    print("\nscaling (weak, cameras):")
    for n_dev, pix_s in results.items():
        print(
            f"  {n_dev:3d} devices: {pix_s / 1e6:7.2f} Mpix/s "
            f"({pix_s / (results[1] * n_dev) * 100.0:5.1f}% of linear)"
        )


if __name__ == "__main__":
    main()
