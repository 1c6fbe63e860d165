#!/usr/bin/env python3
"""Break down euclidean_cluster's device time at the bench_ops workload
(100K uniform points in a 10^3 box, r=0.5 -> ~52 in-radius neighbors per
point, effectively one giant component).

Times, streaming-amortized: the sort front-end alone, the multisweep
kernel at several sweep budgets, and the full engine path.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/micro_cluster_bench.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.spatial.sweep import (
    SWEEP_TABLE_SIZE,
    _sorted_structure,
    sweep_cluster_labels,
)
from pointclouds_tpu.utils.profiling import measure_dispatch_floor

REPS = 30


def stream(fn, sync, label, floor):
    sync(fn())
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn()
    sync(out)
    ms = (time.perf_counter() - t0) * 1e3 / REPS
    print(f"{label:44s} {ms:8.2f} ms  (device ~{max(ms - 0, 0):.2f})",
          flush=True)
    return ms


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    data = (rng.random((100_000, 3)) * 10.0).astype(np.float32)
    arrs = make_cloud_arrays(data)
    xyz = jax.device_put(np.asarray(arrs.xyz))
    valid = jax.device_put(np.asarray(arrs.valid))
    radius = 0.5

    floor = measure_dispatch_floor()
    print(f"dispatch floor: {floor:.2f} ms", flush=True)

    r = jnp.float32(radius)
    hi_abs = 10.0
    cell = radius * 1.00002 + hi_abs * 6e-7 + 1e-7

    @jax.jit
    def front(xyz, valid):
        s = _sorted_structure(xyz, valid, jnp.float32(cell), 7,
                              SWEEP_TABLE_SIZE)
        return s["planar"], s["starts_skip"]

    stream(lambda: front(xyz, valid),
           lambda o: np.asarray(o[0][0, 0, :1]), "front-end sort", floor)

    for sweeps in (2, 4, 8, 12):
        f = jax.jit(partial(
            sweep_cluster_labels, radius=r, sweeps=sweeps, rep_labels=True,
        ))

        def sync(o):
            np.asarray(o[0][:1])
            return o

        lab, exact = f(xyz, valid)
        print(f"  sweeps={sweeps}: exact={bool(exact)} "
              f"ncomp={len(np.unique(np.asarray(lab)[:100_000]))}",
              flush=True)
        stream(lambda: f(xyz, valid), sync, f"sweep_cluster sweeps={sweeps}",
               floor)


if __name__ == "__main__":
    main()
