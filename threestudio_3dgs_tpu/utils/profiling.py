"""Tracing / profiling harness (SURVEY.md section 5: the reference has none;
the TPU build provides jax.profiler traces + a block_until_ready timing
harness as first-class tools)."""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Callable, Dict, List, Optional

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    os.makedirs(logdir, exist_ok=True)
    try:
        jax.profiler.start_trace(logdir)
        yield
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass


def time_fn(
    fn: Callable,
    *args,
    iters: int = 8,
    warmup: int = 1,
    vary: Optional[Callable[[int], tuple]] = None,
) -> Dict[str, float]:
    """Wall-time a jitted function with pipelined async dispatch and a single
    trailing block_until_ready -- the only reliable pattern over the axon
    tunnel (per-iteration host syncs add 100-600 ms of latency, and
    identical-input runs have produced bogus numbers; see PERF.md)."""
    fn_j = jax.jit(fn) if not hasattr(fn, "lower") else fn
    t0 = time.perf_counter()
    out = fn_j(*(vary(0) if vary else args))
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        jax.block_until_ready(fn_j(*(vary(0) if vary else args)))
    t0 = time.perf_counter()
    outs = [fn_j(*(vary(i + 1) if vary else args)) for i in range(iters)]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / iters * 1000.0
    return {"ms": ms, "compile_s": compile_s}


class StepTimer:
    """Per-step wall timing + jsonl dump for training loops."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.rows: List[Dict[str, Any]] = []
        self._t = time.perf_counter()

    def lap(self, step: int, **extra):
        now = time.perf_counter()
        row = {"step": step, "ms": (now - self._t) * 1000.0, **extra}
        self._t = now
        self.rows.append(row)
        return row

    def dump(self):
        if self.path:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "w") as f:
                for row in self.rows:
                    f.write(json.dumps(row) + "\n")
