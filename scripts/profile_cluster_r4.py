#!/usr/bin/env python3
"""Break down euclidean_cluster on the reference's own aerial workload
(161K non-ground pts, r=2.0): device stages via streaming prefixes, then
the host tail (fetch + epilogue) from the API call.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_cluster_r4.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import pointclouds_tpu as pc
from pointclouds_tpu.pipelines.scenes import aerial_scene
from pointclouds_tpu.spatial import sweep as sw
from pointclouds_tpu.spatial import engine

STAGES = ["structure", "multisweep", "epilogue+rank"]


@partial(jax.jit, static_argnames=("stop", "wr"))
def prefix(xyz, valid, radius, jitter, *, stop: int, wr: int):
    acc = jnp.float32(0.0)
    xyz = xyz + jitter
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    use_pre = jnp.logical_and(valid, finite)
    hi_abs = jnp.max(jnp.where(use_pre[:, None], jnp.abs(xyz), 0.0))
    cell_size = sw.cluster_cell_size(radius, hi_abs)
    s = sw._sorted_structure(xyz, valid, cell_size, wr, sw.SWEEP_TABLE_SIZE)
    acc += jnp.sum(s["planar"]) + jnp.sum(s["starts_skip"]).astype(
        jnp.float32
    )
    if stop == 1:
        return acc

    from pointclouds_tpu.spatial.pallas_kernels import cluster_multisweep

    r2 = jnp.float32(radius) * jnp.float32(radius)
    rowlist, fits = sw._window_row_lists(
        s["starts_skip"], 16, s["planar"].shape[0]
    )
    labf, chf = cluster_multisweep(
        s["planar"], rowlist, r2, cap=16, sweeps=12
    )
    acc += jnp.sum(labf) + jnp.sum(chf)
    if stop == 2:
        return acc

    packed = engine._cluster_labels_packed_u16(
        xyz, valid, radius, wr=min(s["nrows"], 64), use_kernel=True,
        rows=None,
    )
    acc += jnp.sum(packed.astype(jnp.float32))
    return acc


def main():
    ds = pc.voxel_downsample(
        pc.PointCloud.from_numpy(aerial_scene(seed=7)), 0.5
    )
    ground = pc.ransac_plane_seeded(ds, 0.3, 300, 11)
    non_ground = ds.select_inverse(ground.inliers)
    print(f"workload: {non_ground.len()} pts", flush=True)
    xyz, valid = non_ground._arrs.xyz, non_ground._arrs.valid
    nrows = xyz.shape[0] // 128
    wr = min(nrows, 64)

    frames = 10
    prev = 0.0
    for stop in range(1, len(STAGES) + 1):
        out = prefix(xyz, valid, np.float32(2.0), np.float32(0.0),
                     stop=stop, wr=wr)
        np.asarray(out)
        t0 = time.perf_counter()
        for f in range(frames):
            out = prefix(xyz, valid, np.float32(2.0),
                         np.float32(f * 1e-6), stop=stop, wr=wr)
        np.asarray(out)
        cur = (time.perf_counter() - t0) * 1e3 / frames
        print(
            f"prefix {stop} ({STAGES[stop - 1]:14s}): {cur:8.2f} ms  "
            f"(+{cur - prev:7.2f})",
            flush=True,
        )
        prev = cur

    # Full API wall (includes the one fetch + host epilogue).
    out = pc.euclidean_cluster(non_ground, 2.0, 20, 100_000)
    t0 = time.perf_counter()
    for _ in range(5):
        out = pc.euclidean_cluster(non_ground, 2.0, 20, 100_000)
    wall = (time.perf_counter() - t0) * 1e3 / 5
    print(f"API euclidean_cluster wall: {wall:.2f} ms "
          f"({len(out)} clusters)", flush=True)


if __name__ == "__main__":
    main()
