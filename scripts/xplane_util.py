"""Shared xplane-proto parsing for the trace scripts: per-op device-time
tables plus a bucketed small-op summary."""

import glob
import re


def parse_device_totals(logdir, n_steps):
    """Returns {op_name: ms_per_step} from the newest xplane capture."""
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(logdir + "/**/*.xplane.pb", recursive=True),
        key=lambda p: -len(p),
    )
    if not paths:
        raise RuntimeError("no trace captured under " + logdir)
    space = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        space.ParseFromString(f.read())
    out = {}
    for plane in space.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        totals = {}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e9
        out[plane.name] = {k: v / n_steps for k, v in totals.items()}
    return out


def print_table(totals, top=40, small_cutoff=0.45):
    for plane, ops in totals.items():
        print(f"== plane: {plane} (top ops, ms/step) ==")
        for name, ms in sorted(ops.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {ms:9.3f} ms  {name[:110]}")
        buckets = {}
        for name, ms in ops.items():
            if ms >= small_cutoff:
                continue
            kind = re.split(r"[.\d]", name, 1)[0] or name
            b = buckets.setdefault(kind, [0.0, 0, []])
            b[0] += ms
            b[1] += 1
            if len(b[2]) < 4:
                b[2].append(name)
        print(f"== small-op tail (< {small_cutoff} ms each) by HLO kind ==")
        for kind, (ms, cnt, ex) in sorted(
            buckets.items(), key=lambda kv: -kv[1][0]
        )[:20]:
            print(f"  {ms:7.3f} ms  x{cnt:4d}  {kind:24s} e.g. {ex[:2]}")
        print(f"  total tail: {sum(b[0] for b in buckets.values()):.2f} ms")
        print(f"  total device: {sum(ops.values()):.2f} ms")
