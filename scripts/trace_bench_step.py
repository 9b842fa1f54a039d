"""Capture a device trace of the bench step and print a per-op time table
(parsed from the xplane proto) -- ground-truth stage attribution, replacing
the incremental-jit subtraction method that mis-attributed blend bwd in
round 3 (claimed ~31 ms; isolated measurement says ~16)."""

import glob
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from threestudio_3dgs_tpu.ops import camera as cam_mod
from threestudio_3dgs_tpu.ops.rasterizer import RasterizeConfig, rasterize

n = 1_000_000
height = width = 512
rng = np.random.default_rng(0)
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
cfg = RasterizeConfig(tile_size=32, max_pairs=1536 * 1024)
args = tuple(
    map(jnp.asarray, (means, scales, quats, opacities, colors))
)
bg = jnp.zeros(3)


def loss_fn(ms, sc, qt, op, co):
    out = rasterize(ms, sc, qt, op, cam, bg, colors=co, config=cfg)
    return jnp.sum(out["image"]) + jnp.sum(out["alpha"]) + jnp.sum(out["depth"])


step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
g = step(*args)
jax.block_until_ready(g)
t0 = time.perf_counter()
for _ in range(5):
    g = step(*args)
jax.block_until_ready(g)
print(f"step: {(time.perf_counter() - t0) / 5 * 1000:.2f} ms")

logdir = "/tmp/bench_trace"
jax.profiler.start_trace(logdir)
for _ in range(3):
    g = step(*args)
jax.block_until_ready(g)
jax.profiler.stop_trace()

# parse the xplane proto for op durations
try:
    from tensorflow.core.profiler.protobuf import xplane_pb2  # noqa: E402
except ModuleNotFoundError:  # tf moved it under tsl
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

paths = sorted(
    glob.glob(logdir + "/**/*.xplane.pb", recursive=True),
    key=lambda p: -len(p),
)
print("trace files:", paths)
if not paths:
    sys.exit("no trace captured")

space = xplane_pb2.XSpace()
with open(paths[0], "rb") as f:
    space.ParseFromString(f.read())

for plane in space.planes:
    if "TPU" not in plane.name and "Device" not in plane.name:
        continue
    ev_meta = plane.event_metadata
    totals = {}
    for line in plane.lines:
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name
            totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e9
    print(f"== plane: {plane.name} (top ops, ms over 3 steps) ==")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {ms / 3:9.3f} ms  {name[:110]}")

    # Small-op tail bucketed by HLO op kind (round-5 verdict item 2: the
    # ~840 sub-0.45 ms ops summing to ~8.4 ms had no owner).  Kind = the
    # HLO name up to the first digit/dot ("fusion", "copy", "transpose",
    # "concatenate", ...).
    import re

    buckets = {}
    for name, tot in totals.items():
        per_step = tot / 3
        if per_step >= 0.45:
            continue
        kind = re.split(r"[.\d]", name, 1)[0] or name
        b = buckets.setdefault(kind, [0.0, 0, []])
        b[0] += per_step
        b[1] += 1
        if len(b[2]) < 4:
            b[2].append(name)
    print("== small-op tail (< 0.45 ms each) by HLO kind, per step ==")
    for kind, (ms, cnt, ex) in sorted(
        buckets.items(), key=lambda kv: -kv[1][0]
    )[:20]:
        print(f"  {ms:7.3f} ms  x{cnt:4d}  {kind:24s} e.g. {ex}")
    print(f"  total tail: {sum(b[0] for b in buckets.values()):.2f} ms")
