#!/usr/bin/env python3
"""Cluster while-loop per-iteration cost: time sweep_cluster_labels with
forced max_iters on the real aerial obstacle cloud; the slope is the true
in-loop iteration cost (standalone piece timings undercount it).
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import compaction_order, make_cloud_arrays
from pointclouds_tpu.ops.filters import voxel_downsample_masked
from pointclouds_tpu.ops.segmentation import ransac_plane_masked
from pointclouds_tpu.pipelines.scenes import aerial_scene
from pointclouds_tpu.spatial.sweep import sweep_cluster_labels
from pointclouds_tpu.utils.profiling import measure_dispatch_floor, time_fn


def main():
    data = aerial_scene(seed=42, scale=1.0)
    arrs = make_cloud_arrays(data)

    @jax.jit
    def prep(xyz, valid):
        centroids, ds_valid = voxel_downsample_masked(
            xyz, valid, jnp.float32(0.5)
        )
        pnormal, d, inlier = ransac_plane_masked(
            centroids, ds_valid, jnp.float32(0.3), 0, 300
        )
        obstacle_mask = jnp.logical_and(ds_valid, jnp.logical_not(inlier))
        order = compaction_order(obstacle_mask)
        obs_src = order[:262_144].astype(jnp.int32)
        obs_valid = jnp.take(obstacle_mask, obs_src)
        obs_xyz = jnp.take(centroids, obs_src, axis=0)
        return obs_xyz, obs_valid

    obs_xyz, obs_valid = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a)), prep(arrs.xyz, arrs.valid)
    )
    floor = measure_dispatch_floor()
    print(f"dispatch floor {floor:.1f} ms", flush=True)

    prev = None
    for mi in (1, 2, 4, 8):
        f = jax.jit(
            partial(
                sweep_cluster_labels, wr=12, use_kernel=True, max_iters=mi
            )
        )
        mn, p50 = time_fn(f, obs_xyz, obs_valid, np.float32(2.0),
                          reps=5, warmup=2)
        d = "" if prev is None else f"  (delta {mn - prev:+.2f})"
        print(f"max_iters={mi}: min {mn - floor:7.2f} ms{d}", flush=True)
        prev = mn


if __name__ == "__main__":
    main()
