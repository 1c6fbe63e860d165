#!/usr/bin/env python3
"""Round-5 AOT + 4x-unrolled prefix profile of the full fused KITTI
pipeline at bench.py's EXACT operating point (obstacle_cap 8192,
tournament RANSAC 4096, ds_cap 98304). Per-frame device deltas.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_kitti_r5.py
"""
import sys, time
from functools import partial
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.ops.filters import sor_keep_mask, voxel_downsample_sweep_fused
from pointclouds_tpu.ops.segmentation import ransac_plane_masked
from pointclouds_tpu.pipelines.scenes import velodyne_scene
from pointclouds_tpu.spatial.sweep import (
    structure_from_sorted, sweep_cluster_labels, sweep_sor_two_pass,
)

STAGES = ["voxel_fused", "structure", "sor_two_pass", "sor_keep+canon",
          "ransac", "compact_obstacles", "cluster_sweep"]
DS_CAP = 98_304
OBSTACLE_CAP = 8192
FACTOR = 3


def prefix(xyz, valid, voxel_size, sor_std, ransac_thresh, seed, cluster_r,
           *, stop: int):
    acc = jnp.float32(0.0)
    fe = voxel_downsample_sweep_fused(
        xyz, valid, voxel_size, factor=FACTOR, ds_cap=DS_CAP, use_kernel=True
    )
    centroids, ds_valid, canon = fe["centroids"], fe["out_valid"], fe["canon"]
    acc += jnp.sum(centroids[::512]) + jnp.sum(ds_valid[::512])
    if stop == 1:
        return acc
    prebuilt = structure_from_sorted(
        centroids, ds_valid, fe["slin"], fe["extent"], fe["hi_cells"],
        fe["table_overflow"], wr=4,
    )
    acc += jnp.sum(prebuilt["planar"][::64]) + jnp.sum(
        prebuilt["starts_skip"][::16]).astype(jnp.float32)
    if stop == 2:
        return acc
    sor_cell = voxel_size * 3.0
    mean_dists, point_ok, sor_certified = sweep_sor_two_pass(
        centroids, ds_valid, sor_cell, k=20,
        rescue_cells=4.0, per_seg=2, use_kernel=True, prebuilt=prebuilt,
        row_cap=12,
    )
    acc += jnp.sum(jnp.where(jnp.isfinite(mean_dists), mean_dists, 0.0)[::256]
                   ) + jnp.sum(point_ok[::256])
    if stop == 3:
        return acc
    cleaned_valid = sor_keep_mask(mean_dists, ds_valid, sor_std)
    ckey = jnp.where(cleaned_valid, canon, jnp.int32(2**31 - 1))
    _, position_rows = jax.lax.sort(
        (ckey, jnp.arange(ckey.shape[0], dtype=jnp.int32)),
        num_keys=1, is_stable=True,
    )
    acc += jnp.sum(cleaned_valid[::256]) + jnp.sum(
        position_rows[::256]).astype(jnp.float32)
    if stop == 4:
        return acc
    normal, d, inlier_mask = ransac_plane_masked(
        centroids, cleaned_valid, ransac_thresh, seed, 500,
        score_subsample=4096, use_kernel=True, position_rows=position_rows,
    )
    acc += jnp.sum(normal) + d + jnp.sum(inlier_mask[::256])
    if stop == 5:
        return acc
    obstacle_mask = jnp.logical_and(cleaned_valid, jnp.logical_not(inlier_mask))
    okey = jnp.where(obstacle_mask, canon, jnp.int32(2**31 - 1))
    _, order = jax.lax.sort(
        (okey, jnp.arange(okey.shape[0], dtype=jnp.int32)),
        num_keys=1, is_stable=True,
    )
    obs_src = order[:OBSTACLE_CAP].astype(jnp.int32)
    obs_valid = jnp.take(obstacle_mask, obs_src)
    obs_xyz = jnp.take(centroids, obs_src, axis=0)
    acc += jnp.sum(obs_xyz[::64]) + jnp.sum(obs_valid[::64])
    if stop == 6:
        return acc
    labels, cluster_exact = sweep_cluster_labels(
        obs_xyz, obs_valid, cluster_r, wr=12, use_kernel=True, row_cap=32
    )
    acc += jnp.sum(labels[::64]).astype(jnp.float32) + cluster_exact
    return acc


def main():
    data = velodyne_scene(seed=0, n_points=122_000)
    arrs = make_cloud_arrays(data)
    print(f"points: {len(data)} (AOT, 4x unroll, obstacle_cap {OBSTACLE_CAP})",
          flush=True)
    prev = 0.0
    for stop in range(1, len(STAGES) + 1):
        @jax.jit
        def quad(xyz, valid, stop=stop):
            acc = jnp.float32(0.0)
            for i in range(4):
                acc += prefix(
                    xyz + jnp.float32(i * 1e-6), valid, jnp.float32(0.15),
                    jnp.float32(2.0), jnp.float32(0.15), jnp.int32(i),
                    jnp.float32(0.8), stop=stop,
                )
            return acc
        compiled = quad.lower(arrs.xyz, arrs.valid).compile()
        np.asarray(compiled(arrs.xyz, arrs.valid))
        reps = 25
        t0 = time.perf_counter()
        for r in range(reps):
            out = compiled(arrs.xyz, arrs.valid)
        np.asarray(out)
        cur = (time.perf_counter() - t0) / reps / 4 * 1000
        print(f"prefix {stop} ({STAGES[stop-1]:18s}): {cur:7.3f} ms/frame  "
              f"(+{cur-prev:6.3f})", flush=True)
        prev = cur


if __name__ == "__main__":
    main()
