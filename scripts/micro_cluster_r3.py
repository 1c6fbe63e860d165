#!/usr/bin/env python3
"""Instrument the aerial cluster stage on TPU: iteration count + stage
timings for sweep_cluster_labels at the real obstacle shapes.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/micro_cluster_r3.py
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
    print(f"backend: {jax.default_backend()}", flush=True)
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

    # Patched copy: also return the iteration count.
    import pointclouds_tpu.spatial.sweep as sw

    @partial(jax.jit, static_argnames=("wr", "jumps"))
    def cluster(xyz, valid, radius, *, wr, jumps=2):
        return sweep_cluster_labels(
            xyz, valid, radius, wr=wr, jumps=jumps, use_kernel=True
        )

    for wr, jumps in ((12, 2), (12, 4), (12, 6), (24, 4)):
        t0 = time.perf_counter()
        mn, p50 = time_fn(
            partial(cluster, wr=wr, jumps=jumps),
            obs_xyz, obs_valid, np.float32(2.0),
            reps=5, warmup=2,
        )
        wall = time.perf_counter() - t0
        print(
            f"cluster wr={wr} jumps={jumps}: min {mn - floor:.2f} ms "
            f"p50 {p50 - floor:.2f} ms (compile+run {wall:.0f}s)",
            flush=True,
        )

    # Count iterations by forcing max_iters down until labels change.
    labels_ref = np.asarray(
        cluster(obs_xyz, obs_valid, np.float32(2.0), wr=12)[0]
    )
    for mi in (3, 4, 5, 6, 8, 12, 16, 24):
        lab, exact = jax.jit(
            partial(
                sweep_cluster_labels, wr=12, use_kernel=True, max_iters=mi
            )
        )(obs_xyz, obs_valid, np.float32(2.0))
        same = bool((np.asarray(lab) == labels_ref).all())
        print(
            f"max_iters={mi}: exact={bool(np.asarray(exact))} "
            f"labels-match={same}",
            flush=True,
        )
        if same and bool(np.asarray(exact)):
            break


if __name__ == "__main__":
    main()
