#!/usr/bin/env python3
"""Prefix-profile voxel_downsample_masked internals at KITTI scale (131K).

Stages: key pack -> payload sort -> segmented scan -> compaction sort +
epilogue (= the full op). Streaming method, stage cost = prefix delta.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_voxel_r4.py
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
from pointclouds_tpu.spatial.grid import INVALID_KEY, cell_coords, pack_cell_key

STAGES = ["keys", "sort1", "segscan", "full_voxel"]


@partial(jax.jit, static_argnames=("stop",))
def prefix(xyz, valid, voxel_size, jitter, *, stop: int):
    acc = jnp.float32(0.0)
    xyz = xyz + jitter
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    finite = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z)
    use = jnp.logical_and(valid, finite)
    coords = cell_coords(xyz, voxel_size)
    key = jnp.where(use, pack_cell_key(coords), INVALID_KEY)
    acc += jnp.sum(key).astype(jnp.float32)
    if stop == 1:
        return acc

    skey, sx, sy, sz = jax.lax.sort(
        (key, x, y, z), num_keys=1, is_stable=True
    )
    acc += jnp.sum(sx) + jnp.sum(skey).astype(jnp.float32)
    if stop == 2:
        return acc

    suse = skey != INVALID_KEY
    sx = jnp.where(suse, sx, 0.0)
    sy = jnp.where(suse, sy, 0.0)
    sz = jnp.where(suse, sz, 0.0)
    scnt = suse.astype(jnp.float32)
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])

    def seg_op(a, b):
        return (
            jnp.logical_or(a[0], b[0]),
            b[1] + jnp.where(b[0], 0.0, a[1]),
            b[2] + jnp.where(b[0], 0.0, a[2]),
            b[3] + jnp.where(b[0], 0.0, a[3]),
            b[4] + jnp.where(b[0], 0.0, a[4]),
        )

    _, cx, cy, cz, ccnt = jax.lax.associative_scan(
        seg_op, (first, sx, sy, sz, scnt), axis=0
    )
    acc += jnp.sum(cx) + jnp.sum(ccnt)
    if stop == 3:
        return acc

    centroids, out_valid = voxel_downsample_masked(xyz, valid, voxel_size)
    acc += jnp.sum(centroids) + jnp.sum(out_valid)
    return acc


def main():
    data = velodyne_scene(seed=0, n_points=122_000)
    arrs = make_cloud_arrays(data)
    xyz, valid = arrs.xyz, arrs.valid
    print(f"capacity {xyz.shape[0]}", flush=True)

    frames = 30
    prev = 0.0
    for stop in range(1, len(STAGES) + 1):
        out = prefix(xyz, valid, np.float32(0.15), np.float32(0.0), stop=stop)
        np.asarray(out)
        t0 = time.perf_counter()
        for f in range(frames):
            out = prefix(
                xyz, valid, np.float32(0.15), np.float32(f * 1e-6), stop=stop
            )
        np.asarray(out)
        cur = (time.perf_counter() - t0) * 1e3 / frames
        print(
            f"prefix {stop} ({STAGES[stop - 1]:12s}): {cur:8.2f} ms  "
            f"(+{cur - prev:7.2f})",
            flush=True,
        )
        prev = cur


if __name__ == "__main__":
    main()
