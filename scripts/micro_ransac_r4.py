#!/usr/bin/env python3
"""Prefix-profile ransac_plane_masked internals at the KITTI pipeline
operating point (98304-row cleaned cloud, 500 iters, tournament 4096).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/micro_ransac_r4.py
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
from pointclouds_tpu.ops import segmentation as seg
from pointclouds_tpu.pipelines.scenes import velodyne_scene

DS_CAP = 98_304
ITERS = 500
SUB = 4096
STAGES = ["samples+planes", "sub_score", "topk+rescore", "final_inliers"]


@partial(jax.jit, static_argnames=("stop",))
def prefix(xyz, valid, thresh, seed, *, stop: int):
    acc = jnp.float32(0.0)
    n = xyz.shape[0]
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    cnt = jnp.sum(valid.astype(jnp.int32))
    key = jax.random.PRNGKey(seed)
    samples = seg._sample_three_distinct(key, ITERS, cnt)
    idx = samples  # assume_compact
    p = jnp.take(xyz, idx, axis=0)
    v1 = p[:, 1] - p[:, 0]
    v2 = p[:, 2] - p[:, 0]
    nrm = jnp.cross(v1, v2)
    length = jnp.linalg.norm(nrm, axis=1)
    degenerate = length < 1e-10
    safe_len = jnp.where(degenerate, 1.0, length)
    normal = nrm / safe_len[:, None]
    d = -jnp.sum(normal * p[:, 0], axis=1)
    acc += jnp.sum(normal) + jnp.sum(d)
    if stop == 1:
        return acc

    use_pt = jnp.logical_and(valid, finite)
    ar = jnp.arange(SUB, dtype=jnp.int32)
    pos = ar * (cnt // SUB) + (ar * (cnt % SUB)) // SUB
    distinct = jnp.concatenate([jnp.ones((1,), bool), pos[1:] != pos[:-1]])
    sub_xyz = jnp.take(xyz, pos, axis=0)
    sub_use = jnp.logical_and(jnp.take(use_pt, pos), distinct)
    sdist = jnp.abs(
        jax.lax.dot(sub_xyz, normal.T, precision=jax.lax.Precision.HIGHEST)
        + d[None, :]
    )
    sub_counts = jnp.sum(
        jnp.logical_and(sub_use[:, None], sdist <= thresh).astype(jnp.int32),
        axis=0,
    )
    sub_counts = jnp.where(degenerate, -1, sub_counts)
    acc += jnp.sum(sub_counts).astype(jnp.float32)
    if stop == 2:
        return acc

    ii = jnp.arange(ITERS, dtype=jnp.int32)
    _, top_idx = jax.lax.top_k(
        sub_counts * ITERS + (ITERS - 1 - ii), 8
    )
    nc = jnp.take(normal, top_idx, axis=0)
    dc = jnp.take(d, top_idx)
    dist = jnp.abs(
        jax.lax.dot(xyz, nc.T, precision=jax.lax.Precision.HIGHEST)
        + dc[None, :]
    )
    ok = jnp.logical_and(use_pt[:, None], dist <= thresh)
    full_counts = jnp.sum(ok.astype(jnp.int32), axis=0)
    full_counts = jnp.where(jnp.take(degenerate, top_idx), -1, full_counts)
    mx = jnp.max(full_counts)
    best = jnp.min(jnp.where(full_counts == mx, top_idx, ITERS))
    acc += best.astype(jnp.float32) + jnp.sum(full_counts).astype(jnp.float32)
    if stop == 3:
        return acc

    enough = cnt >= 3
    ok_model = jnp.logical_and(mx > 0, enough)
    best_normal = jnp.where(
        ok_model, jnp.take(normal, best, axis=0), jnp.array([0.0, 0.0, 1.0])
    )
    best_d = jnp.where(ok_model, jnp.take(d, best), 0.0)
    dist = jnp.abs(
        jax.lax.dot(xyz, best_normal[:, None],
                    precision=jax.lax.Precision.HIGHEST)[:, 0]
        + best_d
    )
    inlier_mask = jnp.logical_and(valid, dist <= thresh)
    acc += jnp.sum(inlier_mask)
    return acc


def main():
    data = velodyne_scene(seed=0, n_points=122_000)
    arrs = make_cloud_arrays(data)
    c_full, v_full = jax.jit(voxel_downsample_masked)(
        arrs.xyz, arrs.valid, np.float32(0.15)
    )
    xyz = jnp.asarray(np.asarray(c_full[:DS_CAP]))
    valid = jnp.asarray(np.asarray(v_full[:DS_CAP]))

    frames = 30
    prev = 0.0
    for stop in range(1, len(STAGES) + 1):
        out = prefix(xyz, valid, np.float32(0.15), 0, stop=stop)
        np.asarray(out)
        t0 = time.perf_counter()
        for f in range(frames):
            out = prefix(xyz, valid, np.float32(0.15), f, stop=stop)
        np.asarray(out)
        cur = (time.perf_counter() - t0) * 1e3 / frames
        print(
            f"prefix {stop} ({STAGES[stop - 1]:14s}): {cur:8.2f} ms  "
            f"(+{cur - prev:7.2f})",
            flush=True,
        )
        prev = cur


if __name__ == "__main__":
    main()
