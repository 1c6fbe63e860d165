#!/usr/bin/env python3
"""Time ONLY the sweep_select kernel at the KITTI SOR operating point.

Builds the sorted structure once on host, then streams `frames` kernel
calls back-to-back with one sync. Reports per-call ms (dispatch floor
subtracted via a null-jit baseline).

Usage: PYTHONPATH=. python scripts/micro_sorsel_r4.py
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


@partial(jax.jit, static_argnames=())
def run_select(planar, starts_skip, jitter):
    from pointclouds_tpu.spatial.pallas_kernels import sweep_select

    p = planar.at[:, 0, :].add(jitter)
    total, count_f, kth, seg_ok = sweep_select(
        p, starts_skip, k=K + 1, wr=WR, per_seg=PER_SEG
    )
    return jnp.sum(total) + jnp.sum(count_f) + jnp.sum(kth) + jnp.sum(seg_ok)


CAP = 12


@partial(jax.jit, static_argnames=())
def run_select_rows(pts_padded, rowlist, jitter):
    from pointclouds_tpu.spatial.pallas_kernels import sweep_select_rows

    p = pts_padded.at[:, 0, :].add(jitter)
    total, count_f, kth, seg_ok = sweep_select_rows(
        p, rowlist, k=K + 1, cap=CAP, per_seg=PER_SEG
    )
    return jnp.sum(total) + jnp.sum(count_f) + jnp.sum(kth) + jnp.sum(seg_ok)


def main():
    data = velodyne_scene(seed=0, n_points=122_000)
    arrs = make_cloud_arrays(data)
    centroids_full, ds_valid_full = jax.jit(voxel_downsample_masked)(
        arrs.xyz, arrs.valid, np.float32(0.15)
    )
    centroids = jnp.asarray(np.asarray(centroids_full[:DS_CAP]))
    ds_valid = jnp.asarray(np.asarray(ds_valid_full[:DS_CAP]))
    cell = np.float32(0.15 * 3.0)
    s = jax.jit(
        lambda x, v: sw._sorted_structure(x, v, cell, WR, sw.SWEEP_TABLE_SIZE)
    )(centroids, ds_valid)
    planar = jnp.asarray(np.asarray(s["planar"]))
    starts = jnp.asarray(np.asarray(s["starts_skip"]))

    frames = 30
    out = run_select(planar, starts, np.float32(0.0))
    np.asarray(out)
    t0 = time.perf_counter()
    for f in range(frames):
        out = run_select(planar, starts, np.float32(f * 1e-7))
    np.asarray(out)
    per = (time.perf_counter() - t0) * 1e3 / frames
    print(f"sweep_select:      {per:.3f} ms/call (streaming)", flush=True)

    nmax = planar.shape[0]
    rl, fits = jax.jit(
        partial(sw._window_row_lists, cap=CAP, nmax=nmax)
    )(starts)
    print(f"rowlist fits: {int(np.asarray(fits).sum())}/{rl.shape[0]}")
    pts_padded = jnp.asarray(np.asarray(jax.jit(sw._planar_padded)(planar)))
    rl = jnp.asarray(np.asarray(rl))

    a = np.asarray(run_select(planar, starts, np.float32(0.0)))
    out = run_select_rows(pts_padded, rl, np.float32(0.0))
    b = np.asarray(out)
    print(f"agreement (sum-proxy): {a:.3f} vs {b:.3f}")
    t0 = time.perf_counter()
    for f in range(frames):
        out = run_select_rows(pts_padded, rl, np.float32(f * 1e-7))
    np.asarray(out)
    per = (time.perf_counter() - t0) * 1e3 / frames
    print(f"sweep_select_rows: {per:.3f} ms/call (streaming)", flush=True)


if __name__ == "__main__":
    main()
