#!/usr/bin/env python3
"""Multisweep cluster kernel: per-sweep cost slope + convergence sweep
count on the real aerial obstacle cloud."""

import sys
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import compaction_order, make_cloud_arrays
from pointclouds_tpu.ops.filters import voxel_downsample_masked
from pointclouds_tpu.ops.segmentation import ransac_plane_masked
from pointclouds_tpu.pipelines.scenes import aerial_scene
from pointclouds_tpu.spatial.sweep import _sorted_structure
from pointclouds_tpu.spatial.pallas_kernels import cluster_multisweep
from pointclouds_tpu.utils.profiling import measure_dispatch_floor, time_fn


def main():
    data = aerial_scene(seed=42, scale=1.0)
    arrs = make_cloud_arrays(data)

    @jax.jit
    def prep(xyz, valid):
        centroids, ds_valid = voxel_downsample_masked(
            xyz, valid, jnp.float32(0.5)
        )
        pn, d, inlier = ransac_plane_masked(
            centroids, ds_valid, jnp.float32(0.3), 0, 300
        )
        mask = jnp.logical_and(ds_valid, jnp.logical_not(inlier))
        order = compaction_order(mask)
        src = order[:262_144].astype(jnp.int32)
        return jnp.take(centroids, src, axis=0), jnp.take(mask, src)

    obs_xyz, obs_valid = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a)), prep(arrs.xyz, arrs.valid)
    )
    cell = np.float32(2.0 * 1.00002 + 500 * 6e-7 + 1e-7)

    @jax.jit
    def struct(pts, v):
        s = _sorted_structure(pts, v, cell, 12, 1 << 21)
        return s["planar"], s["starts_skip"]

    planar, starts = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a)), struct(obs_xyz, obs_valid)
    )
    floor = measure_dispatch_floor()
    print(f"floor {floor:.1f} ms", flush=True)

    ref = None
    for sweeps in (2, 3, 4, 6, 8, 12):
        f = jax.jit(partial(cluster_multisweep, sweeps=sweeps))
        lab, ch = f(planar, starts, np.float32(4.0))
        labh = np.asarray(lab)
        chs = float(np.asarray(ch).sum())
        if sweeps == 12:
            ref = labh
        mn, p50 = time_fn(f, planar, starts, np.float32(4.0),
                          reps=5, warmup=1)
        print(
            f"sweeps={sweeps:2d}: min {mn - floor:7.2f} ms  "
            f"last-sweep changes {chs:8.0f}",
            flush=True,
        )
    lab2, _ = jax.jit(partial(cluster_multisweep, sweeps=8))(
        planar, starts, np.float32(4.0)
    )
    print("sweeps=8 equals sweeps=12:", (np.asarray(lab2) == ref).all(),
          flush=True)


if __name__ == "__main__":
    main()
