#!/usr/bin/env python3
"""AOT + 2x-unrolled prefix profile of the fused aerial pipeline at the
bench operating point (241K pts, ds_cap 229376, factor-6 frontend).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_aerial_r5.py
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.ops.filters import voxel_downsample_sweep_fused
from pointclouds_tpu.ops.normals import normals_from_moment_rows
from pointclouds_tpu.ops.segmentation import ransac_plane_masked
from pointclouds_tpu.core.cloud import compaction_order
from pointclouds_tpu.pipelines.scenes import aerial_scene
from pointclouds_tpu.spatial.sweep import (
    structure_from_sorted, sweep_cluster_labels, sweep_knn_moments_rows,
)

STAGES = ["voxel_fused", "structure", "moments", "normals", "ransac",
          "compact", "cluster"]
DS_CAP = 229_376
OBST_CAP = 196_608
FACTOR = 6


def prefix(xyz, valid, seed, *, stop: int):
    acc = jnp.float32(0.0)
    voxel = jnp.float32(0.5)
    fe = voxel_downsample_sweep_fused(
        xyz, valid, voxel, factor=FACTOR, ds_cap=DS_CAP, use_kernel=True)
    centroids, ds_valid = fe["centroids"], fe["out_valid"]
    acc += jnp.sum(centroids[::512]) + jnp.sum(ds_valid[::512])
    if stop == 1:
        return acc
    prebuilt = structure_from_sorted(
        centroids, ds_valid, fe["slin"], fe["extent"], fe["hi_cells"],
        fe["table_overflow"], wr=4)
    acc += jnp.sum(prebuilt["planar"][::64]) + jnp.sum(
        prebuilt["starts_skip"][::16]).astype(jnp.float32)
    if stop == 2:
        return acc
    m1r, m2r, cnt, nok = sweep_knn_moments_rows(
        centroids, ds_valid, voxel * FACTOR, k=15, use_kernel=True,
        prebuilt=prebuilt)
    acc += jnp.sum(m1r[:, ::256]) + jnp.sum(cnt[::256])
    if stop == 3:
        return acc
    vp = jnp.asarray([0.0, 0.0, 10000.0], jnp.float32)
    normals = normals_from_moment_rows(m1r, m2r, cnt, centroids, vp)
    acc += jnp.sum(normals[::256])
    if stop == 4:
        return acc
    pnormal, d, inlier = ransac_plane_masked(
        centroids, ds_valid, jnp.float32(0.3), seed, 300,
        assume_compact=True, score_subsample=4096, use_kernel=True)
    acc += jnp.sum(pnormal) + d + jnp.sum(inlier[::256])
    if stop == 5:
        return acc
    obstacle_mask = jnp.logical_and(ds_valid, jnp.logical_not(inlier))
    order = compaction_order(obstacle_mask)
    obs_src = order[:OBST_CAP].astype(jnp.int32)
    obs_valid = jnp.take(obstacle_mask, obs_src)
    obs_xyz = jnp.take(centroids, obs_src, axis=0)
    acc += jnp.sum(obs_xyz[::128]) + jnp.sum(obs_valid[::128])
    if stop == 6:
        return acc
    labels, cluster_exact = sweep_cluster_labels(
        obs_xyz, obs_valid, jnp.float32(2.0), wr=12, use_kernel=True,
        rep_labels=False, row_cap=None, sweeps=12)
    acc += jnp.sum(labels[::128]).astype(jnp.float32) + cluster_exact
    return acc


def main():
    data = aerial_scene(seed=42, scale=1.0)
    arrs = make_cloud_arrays(data)
    print(f"points: {len(data)} (AOT, 2x unroll)", flush=True)
    prev = 0.0
    for stop in range(1, len(STAGES) + 1):
        @jax.jit
        def dbl(xyz, valid, stop=stop):
            acc = jnp.float32(0.0)
            for i in range(2):
                acc += prefix(xyz + jnp.float32(i * 1e-6), valid,
                              jnp.int32(i), stop=stop)
            return acc
        compiled = dbl.lower(arrs.xyz, arrs.valid).compile()
        np.asarray(compiled(arrs.xyz, arrs.valid))
        reps = 12
        t0 = time.perf_counter()
        for r in range(reps):
            out = compiled(arrs.xyz, arrs.valid)
        np.asarray(out)
        cur = (time.perf_counter() - t0) / reps / 2 * 1000
        print(f"prefix {stop} ({STAGES[stop-1]:12s}): {cur:7.3f} ms/frame  "
              f"(+{cur-prev:6.3f})", flush=True)
        prev = cur


if __name__ == "__main__":
    main()
