#!/usr/bin/env python3
"""AOT + 4x-unrolled prefix profile of the fused voxel stage: device time
per stage = (wall/rep)/4 deltas, host dispatch amortized.

Usage: PYTHONPATH=... python scripts/profile_voxel_r5b.py [use_kernel]
"""
import sys, time
from functools import partial
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.pipelines.scenes import velodyne_scene

sys.path.insert(0, "scripts")
from profile_voxel_r5 import prefix, STAGES


def main():
    use_kernel = bool(int(sys.argv[1])) if len(sys.argv) > 1 else True
    data = velodyne_scene(seed=0, n_points=122_000)
    arrs = make_cloud_arrays(data)
    print(f"points {len(data)} use_kernel={use_kernel} (AOT, 4x unroll)", flush=True)

    prev = 0.0
    for stop in range(1, len(STAGES) + 1):
        @partial(jax.jit, static_argnames=())
        def quad(xyz, valid, v, stop=stop):
            acc = jnp.float32(0.0)
            for i in range(4):
                acc += prefix(xyz, valid, v, jnp.float32(i * 1e-6),
                              stop=stop, use_kernel=use_kernel)
            return acc
        compiled = quad.lower(arrs.xyz, arrs.valid, np.float32(0.15)).compile()
        np.asarray(compiled(arrs.xyz, arrs.valid, np.float32(0.15)))
        reps = 30
        t0 = time.perf_counter()
        for r in range(reps):
            out = compiled(arrs.xyz, arrs.valid, np.float32(0.15))
        np.asarray(out)
        cur = (time.perf_counter() - t0) / reps / 4 * 1000
        print(f"prefix {stop} ({STAGES[stop-1]:14s}): {cur:7.3f} ms/frame  (+{cur-prev:6.3f})", flush=True)
        prev = cur


if __name__ == "__main__":
    main()
