#!/usr/bin/env python3
"""Prefix-profile the fused aerial pipeline on TPU.

Same method as scripts/profile_kitti.py: replicate pipelines/aerial.py stage
by stage behind a static ``stop`` arg, time each prefix streaming-amortized
(frames back-to-back, one sync); stage cost = prefix(i) - prefix(i-1).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_aerial.py \
        [backend] [reps] [cluster_wr]
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
from pointclouds_tpu.ops.normals import cardano_smallest_eigvec_comps
from pointclouds_tpu.ops.segmentation import ransac_plane_masked
from pointclouds_tpu.pipelines.scenes import aerial_scene

# bench.py's aerial operating point (ds_cap): ~208K centroids + headroom.
AERIAL_DS_CAP = 229_376
from pointclouds_tpu.spatial.sweep import (
    sweep_cluster_labels,
    sweep_knn_moments_rows,
)

STAGES = [
    "voxel_downsample",
    "knn_moments",
    "cardano_normals",
    "ransac",
    "compact",
    "cluster_sweep",
]


@partial(jax.jit, static_argnames=("stop", "normals_k", "ransac_iters",
                                   "obstacle_cap", "cluster_wr", "backend"))
def prefix(xyz, valid, voxel_size, normals_cell, ransac_thresh, seed,
           cluster_r, viewpoint, *, stop: int, normals_k=15,
           ransac_iters=300, obstacle_cap=196_608, cluster_wr=12,
           backend="sweep"):
    use_kernel = backend == "sweep"
    acc = jnp.float32(0.0)

    centroids_full, ds_valid_full = voxel_downsample_masked(
        xyz, valid, voxel_size
    )
    centroids = centroids_full[:AERIAL_DS_CAP]
    ds_valid = ds_valid_full[:AERIAL_DS_CAP]
    # Truncation guard: the pipeline reports ds overflow via its flags; the
    # profiler must not silently diverge from it (fails loudly instead).
    acc += jnp.where(
        jnp.any(ds_valid_full[AERIAL_DS_CAP:]), jnp.nan, 0.0
    )
    acc += jnp.sum(centroids) + jnp.sum(ds_valid)
    if stop == 1:
        return acc

    m1r, m2r, cnt, nok = sweep_knn_moments_rows(
        centroids, ds_valid, normals_cell, k=normals_k,
        use_kernel=use_kernel,
    )
    acc += jnp.sum(m1r) + jnp.sum(m2r) + jnp.sum(cnt) + jnp.sum(nok)
    if stop == 2:
        return acc

    denom = jnp.maximum(cnt, 1.0)
    mx, my, mz = m1r[0] / denom, m1r[1] / denom, m1r[2] / denom
    vx, vy, vz = cardano_smallest_eigvec_comps(
        m2r[0] - cnt * mx * mx,
        m2r[3] - cnt * mx * my,
        m2r[4] - cnt * mx * mz,
        m2r[1] - cnt * my * my,
        m2r[5] - cnt * my * mz,
        m2r[2] - cnt * mz * mz,
    )
    acc += jnp.sum(vx) + jnp.sum(vy) + jnp.sum(vz)
    if stop == 3:
        return acc

    pnormal, d, inlier_mask = ransac_plane_masked(
        centroids, ds_valid, ransac_thresh, seed, ransac_iters,
        assume_compact=True, score_subsample=4096, use_kernel=use_kernel,
    )
    acc += jnp.sum(pnormal) + d + jnp.sum(inlier_mask)
    if stop == 4:
        return acc

    obstacle_mask = jnp.logical_and(ds_valid, jnp.logical_not(inlier_mask))
    order = compaction_order(obstacle_mask)
    obs_src = order[:obstacle_cap].astype(jnp.int32)
    obs_valid = jnp.take(obstacle_mask, obs_src)
    obs_xyz = jnp.take(centroids, obs_src, axis=0)
    acc += jnp.sum(obs_xyz)
    if stop == 5:
        return acc

    labels, cexact = sweep_cluster_labels(
        obs_xyz, obs_valid, cluster_r, wr=cluster_wr, use_kernel=use_kernel
    )
    acc += jnp.sum(labels) + jnp.sum(cexact)
    return acc


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cluster_wr = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    data = aerial_scene(seed=42, scale=1.0)
    arrs = make_cloud_arrays(data)
    vp = jnp.asarray([0.0, 0.0, 10000.0], jnp.float32)
    args = (arrs.xyz, arrs.valid, np.float32(0.5), np.float32(3.0),
            np.float32(0.3), 1, np.float32(2.0), vp)

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
        f = partial(prefix, stop=stop, backend=backend,
                    cluster_wr=cluster_wr)
        np.asarray(f(*args))  # compile + run
        t0 = time.perf_counter()
        for r in range(reps):
            out = f(arrs.xyz, arrs.valid, np.float32(0.5), np.float32(3.0),
                    np.float32(0.3), r, np.float32(2.0), vp)
        np.asarray(out)
        times[stop] = (time.perf_counter() - t0) / reps * 1e3
        print(f"prefix {stop} ({STAGES[stop-1]:22s}): "
              f"{times[stop]:8.2f} ms  (+{times[stop] - times.get(stop-1, 0.0):7.2f})",
              flush=True)
    print(f"dispatch floor ~{floor:.1f} ms (already amortized out by streaming)")


if __name__ == "__main__":
    main()
