"""Profiling / timing utilities.

Replaces the reference's ad-hoc time.time() deltas and result-set
comparison counters (SURVEY.md §5.1) with: a true-sync timer (host fetch —
required on async/tunneled backends where block_until_ready is unreliable),
a jax.profiler trace context, and the NeighborSet.count overflow telemetry
already built into the search ops.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import numpy as np
import jax


def sync(tree):
    """Force completion by fetching to host (block_until_ready can be a
    no-op on experimental backends)."""
    return jax.tree_util.tree_map(np.asarray, tree)


def time_fn(fn: Callable, *args, warmup: int = 1, reps: int = 5,
            **kwargs) -> Dict[str, float]:
    """Wall-time a device function with compile warmup and true sync."""
    for _ in range(warmup):
        sync(fn(*args, **kwargs))
    t0 = time.perf_counter()
    outs = [fn(*args, **kwargs) for _ in range(reps)]
    sync(outs)
    dt = (time.perf_counter() - t0) / reps
    return {"mean_s": dt, "per_sec": 1.0 / dt if dt > 0 else float("inf")}


# v5e per-chip peak FLOP/s by matmul dtype (MXU); other generations can be
# passed explicitly to mfu()
PEAK_FLOPS = {"float32": 98.5e12, "bfloat16": 197e12, "int8": 394e12}


def flops_of(jitted_fn: Callable, *args, **kwargs) -> float:
    """XLA's own FLOP estimate for a jitted function at these avals
    (`lower().compile().cost_analysis()['flops']`)."""
    compiled = jax.jit(jitted_fn).lower(*args, **kwargs).compile()
    return float(compiled.cost_analysis()["flops"])


def mfu(flops: float, seconds: float, dtype: str = "float32",
        peak: float | None = None) -> float:
    """Model FLOPs Utilization in [0,1]: achieved FLOP/s over peak.

    The roofline denominator for matmul-dominated programs; for VPU-bound
    programs (most classical point-cloud ops) report elem-ops/s against the
    VPU peak instead — see README 'Measured performance'."""
    if peak is None:
        peak = PEAK_FLOPS[dtype]
    return flops / max(seconds, 1e-12) / peak


def measure_mfu(jitted_fn: Callable, *args, dtype: str = "float32",
                warmup: int = 1, reps: int = 5, **kwargs) -> Dict[str, float]:
    """time_fn + flops_of + mfu in one call."""
    t = time_fn(jitted_fn, *args, warmup=warmup, reps=reps, **kwargs)
    fl = flops_of(jitted_fn, *args, **kwargs)
    t["flops"] = fl
    t["mfu"] = mfu(fl, t["mean_s"], dtype=dtype)
    return t


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """jax.profiler trace context — view with TensorBoard's profile plugin
    or xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating section timer (host-side orchestration profiling)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            lines.append(f"{name}: {self.totals[name]*1e3:.1f} ms "
                         f"({self.counts[name]} calls)")
        return "\n".join(lines)
