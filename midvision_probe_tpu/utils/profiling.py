"""Profiling/tracing harness (SURVEY §5: the reference has none — tqdm bars
only). jax.profiler traces + a block_until_ready step timer."""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mvp_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, warmup: int = 2, iters: int = 10,
            **kwargs) -> dict:
    """Wall-time a jitted function with proper device sync.

    Returns {mean_ms, p50_ms, min_ms, iters}."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "mean_ms": 1e3 * sum(times) / len(times),
        "p50_ms": 1e3 * times[len(times) // 2],
        "min_ms": 1e3 * times[0],
        "iters": iters,
    }


def device_memory_stats() -> dict:
    """Per-device HBM usage where the backend exposes it."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            }
        except Exception:
            out[str(d)] = None
    return out
