#!/usr/bin/env python
"""Scheduling evidence for the chunked grad-psum overlap claim (round-5
verdict item 9, round-4 weak #4).

Compiles the PRODUCTION dp train step (systems/base.py -> parallel/
data_parallel.py) on the virtual 8-device mesh, dumps the optimized HLO to
docs/artifacts/dp_step_hlo_8dev.txt, and analyzes the instruction schedule
of the entry computation:

  * how many independent all-reduces the chunked per-leaf pmean emits,
  * whether they are interleaved with compute (issued before the backward's
    last compute instruction) or clustered at the end,
  * async start/done separation, when the backend emits async collectives.

The numbers in PERF.md's communication-budget table are labeled per this
artifact: what the virtual-mesh HLO evidences vs what remains modeled
(TPU's latency-hiding scheduler; no multi-chip hardware reachable here).

Usage: python scripts/dump_dp_hlo.py  [--devices 8]
"""

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ap = argparse.ArgumentParser()
ap.add_argument("--devices", type=int, default=8)
ap.add_argument("--out", default=os.path.join(REPO, "docs", "artifacts"))
args = ap.parse_args()

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={args.devices}"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from threestudio_3dgs_tpu.data.uncond import (  # noqa: E402
    RandomCameraDataModuleConfig,
    RandomCameraSampler,
)
from threestudio_3dgs_tpu.parallel.mesh import make_mesh  # noqa: E402
from threestudio_3dgs_tpu.utils.registry import find  # noqa: E402

n_dev = args.devices
system = find("gaussian-splatting-system")(
    {
        "geometry_type": "gaussian-splatting",
        "geometry": {"init_num_pts": 512, "max_num": 2048, "capacity": 2048},
        "renderer_type": "diff-gaussian-rasterizer-advanced",
        "renderer": {"tile_size": 16, "max_pairs": 32768, "impl": "jax"},
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
state = system.init_state(0)
mesh = make_mesh(n_dev)
system.set_mesh(mesh)
sampler = RandomCameraSampler(
    RandomCameraDataModuleConfig(batch_size=n_dev, height=32, width=32)
)
batch = sampler.sample()

# one executed step populates the production jit cache with the dp step fn
key = jax.random.PRNGKey(0)
_, logs = system.train_step(state, batch, 0, key)
assert np.isfinite(float(np.asarray(logs["train/loss_total"])))

# grab the production-cached jitted dp step and AOT lower/compile the same
# signature to dump its optimized HLO
(entry_key, step_fn), = [
    (k, v) for k, v in system._train_jit.items() if k[0] == "dp"
]
from threestudio_3dgs_tpu.parallel.data_parallel import shard_batch  # noqa: E402
from threestudio_3dgs_tpu.systems.base import to_device_batch  # noqa: E402

db = to_device_batch(batch)  # height/width are closure statics of the step
db = shard_batch(mesh, db, "data", batch_size=n_dev)
sched = system.sched_scalars(0)
lowered = step_fn.lower(state, db, jax.random.PRNGKey(1), sched)
exe = lowered.compile()
hlo = exe.as_text()

os.makedirs(args.out, exist_ok=True)
out_path = os.path.join(args.out, f"dp_step_hlo_{n_dev}dev.txt")
with open(out_path, "w") as f:
    f.write(hlo)
print(f"optimized HLO -> {out_path}  ({len(hlo.splitlines())} lines)")

# ---- schedule analysis on the entry computation ----
lines = hlo.splitlines()
# entry computation: after "ENTRY %main" until closing brace at col 0
try:
    e0 = next(i for i, l in enumerate(lines) if l.startswith("ENTRY "))
except StopIteration:
    e0 = 0
entry = []
for l in lines[e0 + 1 :]:
    if l.startswith("}"):
        break
    entry.append(l.strip())

ar_idx = [i for i, l in enumerate(entry) if re.match(r"%?\S+ = .*all-reduce", l)]
ar_start = [i for i, l in enumerate(entry) if "all-reduce-start" in l]
ar_done = [i for i, l in enumerate(entry) if "all-reduce-done" in l]
compute_kinds = ("fusion", "convolution", "custom-call", "sort", "dot", "reduce(")
comp_idx = [
    i for i, l in enumerate(entry) if any(k in l for k in compute_kinds)
]
n = len(entry)
print(f"entry computation: {n} scheduled instructions")
print(f"all-reduce ops: {len(ar_idx)} (async starts: {len(ar_start)}, dones: {len(ar_done)})")
if ar_idx and comp_idx:
    last_comp = max(comp_idx)
    before = [i for i in ar_idx if i < last_comp]
    print(
        f"all-reduces issued BEFORE the last compute instruction: "
        f"{len(before)}/{len(ar_idx)} (last compute at {last_comp}/{n})"
    )
    firsts = sorted(ar_idx)[:5]
    print(f"first all-reduce positions: {firsts} "
          f"({[f'{i * 100 // n}%' for i in firsts]} through the schedule)")
    # compute instructions AFTER each of the first all-reduces = work
    # available to overlap the collective
    for i in firsts[:3]:
        after = len([c for c in comp_idx if c > i])
        print(f"  all-reduce @{i}: {after} compute instructions scheduled after it")
if ar_start:
    for s in ar_start[:5]:
        # matching done
        name = entry[s].split(" = ")[0]
        d = next((i for i in ar_done if name.split(".")[0] in entry[i]), None)
        if d is not None:
            gap = len([c for c in comp_idx if s < c < d])
            print(f"  async pair {name}: {gap} compute instructions between start and done")
