#!/usr/bin/env python3
"""Prefix-profile sweep_sor_two_pass internals at the KITTI operating point.

Round-4 form: sorted-structure build -> pass-1 row-list kernel (cap=12) ->
full two-pass with the IN-PLACE rescue. Streaming method (frames
back-to-back, one sync), stage cost = prefix delta.

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
ROW_CAP = 12

STAGES = [
    "structure_build",
    "pass1_rows_kernel",
    "pass1_epilogue",
    "two_pass_full",
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

    from pointclouds_tpu.spatial.pallas_kernels import sweep_select_rows

    rowlist, fits = sw._window_row_lists(
        s["starts_skip"], ROW_CAP, s["planar"].shape[0]
    )
    total, count_f, kth, seg_ok = sweep_select_rows(
        sw._planar_padded(s["planar"]), rowlist, k=K + 1, cap=ROW_CAP,
        per_seg=PER_SEG,
    )
    acc += jnp.sum(total) + jnp.sum(count_f) + jnp.sum(kth) + jnp.sum(seg_ok)
    if stop == 2:
        return acc

    p = sw._sweep_pass1(
        xyz, ds_valid, cell, k=K, wr=WR, per_seg=PER_SEG, use_kernel=True,
        row_cap=ROW_CAP,
    )
    acc += (
        jnp.sum(jnp.where(jnp.isfinite(p["mean_s"]), p["mean_s"], 0.0))
        + jnp.sum(p["point_ok_s"])
    )
    if stop == 3:
        return acc

    mean, point_ok, certified = sw.sweep_sor_two_pass(
        xyz, ds_valid, cell, k=K, rescue_cells=4.0,
        per_seg=PER_SEG, use_kernel=True, row_cap=ROW_CAP,
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
