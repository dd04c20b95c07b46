"""Timing / profiling helpers — the reference's MEASURE_TIME harness
(`test/benchmark.c:5-31`) adapted to JAX semantics (async dispatch needs
`block_until_ready`; first call includes compilation).

    with profiling.trace("/tmp/tb"):          # XLA profiler trace
        stats = profiling.measure(fn, args)   # mean/std/min like print_bench
"""

from __future__ import annotations

import contextlib
import math
import time

import jax


def _block(out):
    for leaf in jax.tree_util.tree_leaves(out):
        jax.block_until_ready(leaf)
    return out


def measure(fn, *args, reps: int = 10, warmup: int = 1, **kwargs) -> dict:
    """Run `fn(*args)` `reps` times (after `warmup` undisplayed calls) and
    return {"mean_s", "std_s", "min_s", "reps"} — the reference prints
    mean +- stddev (`print_bench`, `benchmark.c:15-22`)."""
    for _ in range(warmup):
        _block(fn(*args, **kwargs))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _block(fn(*args, **kwargs))
        ts.append(time.perf_counter() - t0)
    mean = sum(ts) / len(ts)
    var = sum((t - mean) ** 2 for t in ts) / len(ts)
    return {"mean_s": mean, "std_s": math.sqrt(var), "min_s": min(ts),
            "reps": reps}


@contextlib.contextmanager
def trace(logdir: str):
    """XLA profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
