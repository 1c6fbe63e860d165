#!/usr/bin/env python3
"""Split sweep_select's cost at the KITTI SOR operating point: window
loop vs phase-2 extraction (phase-2 cost scales with k; the window loop
does not). Times sweep_select at k in {1, 5, 11, 21} on the pipeline's
real sorted structure (93K voxel centroids, cell = 3 voxels, per_seg 2).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/micro_sorsel.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.ops.filters import voxel_downsample_masked
from pointclouds_tpu.pipelines.scenes import velodyne_scene
from pointclouds_tpu.spatial.sweep import SWEEP_TABLE_SIZE, _sorted_structure
from pointclouds_tpu.spatial.pallas_kernels import sweep_select

REPS = 40


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    data = velodyne_scene(seed=0, n_points=122_000)
    arrs = make_cloud_arrays(data)

    voxel = 0.15
    cell = voxel * 3.0

    @jax.jit
    def prep(xyz, valid):
        cents, dsv = voxel_downsample_masked(xyz, valid, jnp.float32(voxel))
        s = _sorted_structure(cents, dsv, jnp.float32(cell), 4,
                              SWEEP_TABLE_SIZE)
        return s["planar"], s["starts_skip"]

    planar, starts = (jax.device_put(np.asarray(a))
                      for a in prep(arrs.xyz, arrs.valid))
    print(f"planar rows: {planar.shape[0]}", flush=True)

    for k in (1, 5, 11, 21):
        f = jax.jit(lambda p, s, k=k: sweep_select(p, s, k=k, wr=4,
                                                   per_seg=2))
        np.asarray(f(planar, starts)[0][:1])
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = f(planar, starts)
        np.asarray(out[0][:1])
        ms = (time.perf_counter() - t0) * 1e3 / REPS
        print(f"sweep_select k={k:2d}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
