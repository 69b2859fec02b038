"""Profiling helpers.

The reference's only instruments are time.time deltas and NFE wrappers
(SURVEY.md §5.1); here NFE lives in solver stats, and these helpers add
device-accurate timing and XLA/xplane trace capture.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def device_timer(label: str = "", sync_tree=None, echo: bool = True):
    """Wall-clock a block with device synchronization at both edges."""
    if sync_tree is not None:
        jax.block_until_ready(sync_tree)
    start = time.perf_counter()
    result = {}
    yield result
    if sync_tree is not None:
        jax.block_until_ready(sync_tree)
    result["seconds"] = time.perf_counter() - start
    if echo and label:
        print(f"[timer] {label}: {result['seconds']:.4f}s")


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an xplane trace viewable in TensorBoard/XProf
    (jax.profiler.trace wrapper)."""
    with jax.profiler.trace(log_dir):
        yield


def time_compiled(fn: Callable, *args, iters: int = 10):
    """(compile_seconds, steady_seconds_per_call) for a jitted callable."""
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return compile_s, (time.perf_counter() - t0) / iters
