#!/usr/bin/env python3
"""Prefix-profile sweep_sor_two_pass internals at the KITTI operating point.

Stages: sorted-structure build -> pass-1 select kernel -> pass-1 epilogue
(means/certs) -> rescue structure (AABB prune) -> rescue kernel. Streaming
method (frames back-to-back, one sync), stage cost = prefix delta.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_sor_r4.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.ops.filters import voxel_downsample_masked
from pointclouds_tpu.pipelines.scenes import velodyne_scene
from pointclouds_tpu.spatial import sweep as sw

DS_CAP = 98_304
K = 20
PER_SEG = 2
WR = 4
FIX_CAP = 8192

STAGES = [
    "structure_build",
    "pass1_kernel",
    "pass1_epilogue",
    "rescue_structure",
    "rescue_kernel",
]


@partial(jax.jit, static_argnames=("stop",))
def prefix(centroids, ds_valid, cell, jitter, *, stop: int):
    acc = jnp.float32(0.0)
    xyz = centroids + jitter  # make each frame distinct
    s = sw._sorted_structure(xyz, ds_valid, cell, WR, sw.SWEEP_TABLE_SIZE)
    acc += (
        jnp.sum(s["planar"]) + jnp.sum(s["starts_skip"]).astype(jnp.float32)
        + jnp.sum(s["order"]).astype(jnp.float32)
    )
    if stop == 1:
        return acc

    from pointclouds_tpu.spatial.pallas_kernels import sweep_select

    total, count_f, kth, seg_ok = sweep_select(
        s["planar"], s["starts_skip"], k=K + 1, wr=WR, per_seg=PER_SEG
    )
    acc += jnp.sum(total) + jnp.sum(count_f) + jnp.sum(kth) + jnp.sum(seg_ok)
    if stop == 2:
        return acc

    p = sw._sweep_pass1(
        xyz, ds_valid, cell, k=K, wr=WR, per_seg=PER_SEG, use_kernel=True
    )
    acc += (
        jnp.sum(jnp.where(jnp.isfinite(p["mean"]), p["mean"], 0.0))
        + jnp.sum(p["point_ok"])
    )
    if stop == 3:
        return acc

    flagged = jnp.logical_and(p["use"], jnp.logical_not(p["point_ok"]))
    radius = 4.0 * cell
    planar_g, q_planar, active, qvalid, qsel = sw._rescue_structure(
        p["planar"], p["order"], flagged, FIX_CAP, xyz.shape[0], radius
    )
    acc += (
        jnp.sum(q_planar) + jnp.sum(active).astype(jnp.float32)
        + jnp.sum(qvalid)
    )
    if stop == 4:
        return acc

    mean, point_ok, certified = sw.sweep_sor_two_pass(
        xyz, ds_valid, cell, k=K, fix_cap=FIX_CAP, rescue_cells=4.0,
        per_seg=PER_SEG, use_kernel=True,
    )
    acc += (
        jnp.sum(jnp.where(jnp.isfinite(mean), mean, 0.0))
        + jnp.sum(point_ok) + certified
    )
    return acc


def main():
    data = velodyne_scene(seed=0, n_points=122_000)
    arrs = make_cloud_arrays(data)
    centroids_full, ds_valid_full = jax.jit(voxel_downsample_masked)(
        arrs.xyz, arrs.valid, np.float32(0.15)
    )
    centroids = np.asarray(centroids_full[:DS_CAP])
    ds_valid = np.asarray(ds_valid_full[:DS_CAP])
    print(f"centroids: {int(ds_valid.sum())} / cap {DS_CAP}", flush=True)
    centroids = jnp.asarray(centroids)
    ds_valid = jnp.asarray(ds_valid)
    cell = np.float32(0.15 * 3.0)

    frames = 20
    prev = 0.0
    for stop in range(1, len(STAGES) + 1):
        out = prefix(centroids, ds_valid, cell, np.float32(0.0), stop=stop)
        np.asarray(out)
        t0 = time.perf_counter()
        for f in range(frames):
            out = prefix(
                centroids, ds_valid, cell, np.float32(f * 1e-6), stop=stop
            )
        np.asarray(out)
        cur = (time.perf_counter() - t0) * 1e3 / frames
        print(
            f"prefix {stop} ({STAGES[stop - 1]:18s}): {cur:8.2f} ms  "
            f"(+{cur - prev:7.2f})",
            flush=True,
        )
        prev = cur


if __name__ == "__main__":
    main()
