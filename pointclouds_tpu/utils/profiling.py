"""Profiling and honest-timing helpers.

The reference times pipeline steps with `std::time::Instant` /
`time.perf_counter` (SURVEY.md section 5.1). On this platform two extra
hazards exist: `jax.block_until_ready` is a no-op on the tunneled axon
remote device, and every dispatch carries ~28 ms of fixed RPC latency. The
helpers here provide an honest sync (host transfer), measure the dispatch
floor so device time can be reported separately, and wrap `jax.profiler`
traces.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x) -> None:
    """Block until ``x`` is computed, by transferring one scalar to host
    (works on remote platforms where block_until_ready returns early)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def measure_dispatch_floor(reps: int = 10) -> float:
    """Median wall ms of a trivial dispatch: the fixed per-call RPC cost."""
    f = jax.jit(lambda a: a + 1)
    x = jnp.ones((8,), jnp.float32)
    sync(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(ts, 50))


def time_fn(fn, *args, reps: int = 5, warmup: int = 1):
    """(min_ms, p50_ms) over reps, compilation excluded."""
    for _ in range(warmup):
        sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts), float(np.percentile(ts, 50))


@contextlib.contextmanager
def trace(dirname: str = "/tmp/pointclouds_tpu_trace"):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    jax.profiler.start_trace(dirname)
    try:
        yield dirname
    finally:
        jax.profiler.stop_trace()
