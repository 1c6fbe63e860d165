#!/usr/bin/env python3
"""Prefix-profile the fused KITTI pipeline on TPU.

Replicates pipelines/kitti.py stage by stage behind a static ``stop`` arg and
times each prefix with the streaming-amortized method (frames back-to-back,
one sync); stage cost = prefix(i) - prefix(i-1). This is the reliable way to
attribute device time on the axon harness, where per-dispatch RPC (~30 ms)
and the no-op block_until_ready make per-op timers lie.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_kitti.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import compaction_order, make_cloud_arrays
from pointclouds_tpu.ops.filters import sor_keep_mask, voxel_downsample_masked
from pointclouds_tpu.ops.segmentation import ransac_plane_masked
from pointclouds_tpu.pipelines.scenes import velodyne_scene
from pointclouds_tpu.spatial.cellgrid import (
    build_cellgrid,
    cell_graph_adjacency,
    cell_graph_labels,
    cell_knn_subset,
    cell_sor_mean_dists,
    point_sor_mean_dists,
)
from pointclouds_tpu.spatial.sweep import sweep_cluster_labels, sweep_sor_two_pass

STAGES = [
    "voxel_downsample",
    "sor_sweep",
    "sor_pass2",
    "ransac",
    "compact",
    "cluster_sweep",
]


@partial(jax.jit, static_argnames=("stop", "sor_k", "ransac_iters",
                                   "obstacle_cap", "sor_backend"))
def prefix(xyz, valid, voxel_size, sor_std, ransac_thresh, seed, cluster_r,
           *, stop: int, sor_k=20, ransac_iters=500, obstacle_cap=16384,
           sor_backend="xla"):
    acc = jnp.float32(0.0)

    centroids, ds_valid = voxel_downsample_masked(xyz, valid, voxel_size)
    acc += jnp.sum(centroids) + jnp.sum(ds_valid)
    if stop == 1:
        return acc

    sor_cell = voxel_size * 4.0
    # Stage 2 measures pass-1 only (two-pass re-run with tiny fix_cap to
    # approximate pass1 alone is not expressible; report pass1 via
    # sweep_sor_two_pass with the rescue included at stage 3's delta).
    from pointclouds_tpu.spatial.sweep import _sweep_pass1
    p = _sweep_pass1(centroids, ds_valid, sor_cell, k=sor_k,
                     use_kernel=(sor_backend != "sweep_xla"))
    acc += jnp.sum(jnp.where(jnp.isfinite(p["mean"]), p["mean"], 0.0))
    if stop == 2:
        return acc

    mean_dists, point_ok, cert = sweep_sor_two_pass(
        centroids, ds_valid, sor_cell, k=sor_k, fix_cap=8192,
        use_kernel=(sor_backend != "sweep_xla"))
    cleaned_valid = sor_keep_mask(mean_dists, ds_valid, sor_std)
    acc += jnp.sum(cleaned_valid)
    if stop == 3:
        return acc

    normal, d, inlier_mask = ransac_plane_masked(centroids, cleaned_valid,
                                                 ransac_thresh, seed, ransac_iters)
    acc += jnp.sum(normal) + d + jnp.sum(inlier_mask)
    if stop == 4:
        return acc

    obstacle_mask = jnp.logical_and(cleaned_valid, jnp.logical_not(inlier_mask))
    order = compaction_order(obstacle_mask)
    obs_src = order[:obstacle_cap].astype(jnp.int32)
    obs_valid = jnp.take(obstacle_mask, obs_src)
    obs_xyz = jnp.take(centroids, obs_src, axis=0)
    acc += jnp.sum(obs_xyz)
    if stop == 5:
        return acc

    labels, cexact = sweep_cluster_labels(
        obs_xyz, obs_valid, cluster_r,
        use_kernel=(sor_backend != "sweep_xla"))
    acc += jnp.sum(labels)
    return acc


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    data = velodyne_scene(seed=0, n_points=122_000)
    arrs = make_cloud_arrays(data)
    args = (arrs.xyz, arrs.valid, np.float32(0.15), np.float32(2.0),
            np.float32(0.15), 1, np.float32(0.8))

    # Dispatch floor
    tiny = jax.jit(lambda x: x + 1.0)
    tiny(jnp.zeros(8)); np.asarray(tiny(jnp.zeros(8)))
    t0 = time.perf_counter()
    for _ in range(20):
        o = tiny(jnp.zeros(8))
    np.asarray(o)
    floor = (time.perf_counter() - t0) / 20 * 1e3

    times = {}
    nstages = len(STAGES)
    for stop in range(1, nstages + 1):
        f = partial(prefix, stop=stop, sor_backend=backend)
        np.asarray(f(*args))  # compile + run
        t0 = time.perf_counter()
        for r in range(reps):
            out = f(arrs.xyz, arrs.valid, np.float32(0.15), np.float32(2.0),
                    np.float32(0.15), r, np.float32(0.8))
        np.asarray(out)
        times[stop] = (time.perf_counter() - t0) / reps * 1e3
        print(f"prefix {stop} ({STAGES[stop-1]:22s}): "
              f"{times[stop]:8.2f} ms  (+{times[stop] - times.get(stop-1, 0.0):7.2f})",
              flush=True)
    print(f"dispatch floor ~{floor:.1f} ms (already amortized out by streaming)")


if __name__ == "__main__":
    main()
