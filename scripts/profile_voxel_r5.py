#!/usr/bin/env python3
"""Round-5 prefix profile INSIDE voxel_downsample_sweep_fused at the
KITTI bench shape: keys -> sort1 -> segscan -> sort2-epilogue, plus the
downstream structure build. Streaming deltas.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_voxel_r5.py [use_kernel]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.ops import filters as F
from pointclouds_tpu.pipelines.scenes import velodyne_scene
from pointclouds_tpu.spatial.grid import cell_coords
from pointclouds_tpu.spatial.sweep import structure_from_sorted

STAGES = ["keys", "sort1", "segscan", "sort2_epilogue", "structure"]
DS_CAP = 98_304
FACTOR = 3
TABLE = 1 << 21


@partial(jax.jit, static_argnames=("stop", "use_kernel"))
def prefix(xyz, valid, voxel_size, jitter, *, stop: int, use_kernel: bool):
    acc = jnp.float32(0.0)
    xyz = xyz + jitter
    n = xyz.shape[0]
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    finite = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z)
    use = jnp.logical_and(valid, finite)
    c = cell_coords(xyz, voxel_size)
    big32 = jnp.int32(2**30)
    mn_v = jnp.minimum(jnp.min(jnp.where(use[:, None], c, big32), axis=0), big32 - 1)
    rel = jnp.clip(c - mn_v[None, :], 0, None)
    mx_rel = jnp.max(jnp.where(use[:, None], rel, 0), axis=0)
    ext_v = mx_rel + 1
    ext64 = ext_v.astype(jnp.int64)
    esc = mx_rel // FACTOR + 1
    esc64 = esc.astype(jnp.int64)
    table_overflow = jnp.logical_or(
        (esc64[0] * esc64[1] * esc64[2]) > TABLE,
        (ext64[0] * ext64[1] * ext64[2]) > 2**31 - 2,
    )
    invalid32 = jnp.int32(2**31 - 1)
    ckey64 = (rel[:, 0].astype(jnp.int64) * ext64[1] + rel[:, 1]) * ext64[2] + rel[:, 2]
    ckey = jnp.where(use, jnp.clip(ckey64, 0, 2**31 - 2).astype(jnp.int32), invalid32)
    acc += jnp.sum(ckey).astype(jnp.float32)
    if stop == 1:
        return acc

    skey, sx, sy, sz = jax.lax.sort((ckey, x, y, z), num_keys=1, is_stable=True)
    acc += jnp.sum(sx[::4096]) + jnp.sum(skey[::4096]).astype(jnp.float32)
    if stop == 2:
        return acc

    suse = skey != invalid32
    sxm = jnp.where(suse, sx, 0.0)
    sym = jnp.where(suse, sy, 0.0)
    szm = jnp.where(suse, sz, 0.0)
    scnt = suse.astype(jnp.float32)
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    cx, cy, cz, ccnt = F._segment_sums(first, sxm, sym, szm, scnt, use_kernel)
    acc += jnp.sum(cx[::4096]) + jnp.sum(ccnt[::4096])
    if stop == 3:
        return acc

    is_end = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    live = jnp.logical_and(is_end, suse)
    r0 = skey // (ext_v[1] * ext_v[2])
    r1 = (skey // ext_v[2]) % jnp.maximum(ext_v[1], 1)
    r2 = skey % jnp.maximum(ext_v[2], 1)
    lin_sc = ((r0 // FACTOR) * esc[1] + r1 // FACTOR) * esc[2] + r2 // FACTOR
    lin_sc = jnp.clip(lin_sc, 0, TABLE - 1)
    sorkey = jnp.where(live, lin_sc, jnp.int32(TABLE))
    denom_all = jnp.maximum(ccnt, 1.0)
    ekey, ex, ey, ez, ecanon = jax.lax.sort(
        (sorkey, cx / denom_all, cy / denom_all, cz / denom_all,
         jnp.where(live, skey, invalid32)),
        num_keys=1, is_stable=True,
    )
    slin = ekey[:DS_CAP]
    out_valid = slin != jnp.int32(TABLE)
    centroids = jnp.stack([
        jnp.where(out_valid, ex[:DS_CAP], 0.0),
        jnp.where(out_valid, ey[:DS_CAP], 0.0),
        jnp.where(out_valid, ez[:DS_CAP], 0.0),
    ], axis=1)
    acc += jnp.sum(centroids[::4096]) + jnp.sum(out_valid[::512])
    if stop == 4:
        return acc

    hi_v = jnp.max(jnp.maximum(jnp.abs(mn_v), jnp.abs(mn_v + ext_v)).astype(jnp.float32))
    hi_cells = (hi_v + float(FACTOR)) / float(FACTOR)
    prebuilt = structure_from_sorted(
        centroids, out_valid, slin, esc, hi_cells, table_overflow, wr=4,
    )
    acc += jnp.sum(prebuilt["planar"][::64]) + jnp.sum(prebuilt["starts_skip"][::8]).astype(jnp.float32)
    return acc


def main():
    use_kernel = bool(int(sys.argv[1])) if len(sys.argv) > 1 else True
    data = velodyne_scene(seed=0, n_points=122_000)
    arrs = make_cloud_arrays(data)
    print(f"points {len(data)} use_kernel={use_kernel}", flush=True)
    prev = 0.0
    for stop in range(1, len(STAGES) + 1):
        args = (arrs.xyz, arrs.valid, np.float32(0.15), np.float32(0.0))
        fn = lambda j: prefix(arrs.xyz, arrs.valid, np.float32(0.15),
                              jnp.float32(j * 1e-6), stop=stop,
                              use_kernel=use_kernel)
        np.asarray(fn(0))
        reps = 30
        t0 = time.perf_counter()
        for r in range(reps):
            out = fn(0)
        np.asarray(out)
        cur = (time.perf_counter() - t0) / reps * 1000
        print(f"prefix {stop} ({STAGES[stop-1]:14s}): {cur:7.2f} ms  (+{cur-prev:6.2f})",
              flush=True)
        prev = cur


if __name__ == "__main__":
    main()
