#!/usr/bin/env python3
"""Round-5 voxel front-end A/B: sort channel packing, stability cost,
scan channel count, and the unique-hierarchical-key epilogue sort.

Variants at KITTI scale (131072 rows, ~93K live voxels):
  sort1_4ch      : (i32 key, x, y, z) stable        — current sort 1
  sort1_3ch      : (i32 key, u64 xy-bitcast, z) stable
  sort1_unstable : (i32 key, x, y, z) not stable
  scan5          : current 5-channel segmented scan
  scan4          : count channel dropped (4-channel)
  sort2_5ch      : (i32 sorkey, cx, cy, cz, canon) stable — current sort 2
  sort2_4ch_uniq : (i32 hkey, cx, cy, cz) NOT stable (hkey unique per live
                   row: sor-cell id * 27 + in-cell voxel offset)
  sort2_3ch_uniq : (i32 hkey, u64 xy, z) not stable

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/micro_voxel_r5.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.pipelines.scenes import velodyne_scene
from pointclouds_tpu.spatial.grid import cell_coords
from pointclouds_tpu.utils.profiling import measure_dispatch_floor


def _keys(xyz, valid, voxel):
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    finite = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z)
    use = jnp.logical_and(valid, finite)
    c = cell_coords(xyz, voxel)
    big32 = jnp.int32(2**30)
    mn = jnp.minimum(jnp.min(jnp.where(use[:, None], c, big32), axis=0),
                     big32 - 1)
    rel = jnp.clip(c - mn[None, :], 0, None)
    ext = jnp.max(jnp.where(use[:, None], rel, 0), axis=0) + 1
    ext64 = ext.astype(jnp.int64)
    k64 = (rel[:, 0].astype(jnp.int64) * ext64[1] + rel[:, 1]) * ext64[2] + rel[:, 2]
    key = jnp.where(use, jnp.clip(k64, 0, 2**31 - 2).astype(jnp.int32),
                    jnp.int32(2**31 - 1))
    return key, x, y, z


@jax.jit
def sort1_4ch(key, x, y, z):
    r = jax.lax.sort((key, x, y, z), num_keys=1, is_stable=True)
    return r[0][::4096].astype(jnp.float32).sum() + r[1][::4096].sum()


@jax.jit
def sort1_3ch(key, x, y, z):
    xy = jax.lax.bitcast_convert_type(
        jnp.stack([x, y], axis=1), jnp.uint64
    ).reshape(-1)
    k, xyp, zp = jax.lax.sort((key, xy, z), num_keys=1, is_stable=True)
    xs = jax.lax.bitcast_convert_type(xyp, jnp.float32)
    return k[::4096].astype(jnp.float32).sum() + xs[::4096, 0].sum() + zp[::4096].sum()


@jax.jit
def sort1_unstable(key, x, y, z):
    r = jax.lax.sort((key, x, y, z), num_keys=1, is_stable=False)
    return r[0][::4096].astype(jnp.float32).sum() + r[1][::4096].sum()


def _sorted_inputs(key, x, y, z):
    return jax.lax.sort((key, x, y, z), num_keys=1, is_stable=True)


@jax.jit
def scan5(skey, sx, sy, sz):
    suse = skey != jnp.int32(2**31 - 1)
    sx = jnp.where(suse, sx, 0.0)
    sy = jnp.where(suse, sy, 0.0)
    sz = jnp.where(suse, sz, 0.0)
    scnt = suse.astype(jnp.float32)
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])

    def op(a, b):
        return (
            jnp.logical_or(a[0], b[0]),
            b[1] + jnp.where(b[0], 0.0, a[1]),
            b[2] + jnp.where(b[0], 0.0, a[2]),
            b[3] + jnp.where(b[0], 0.0, a[3]),
            b[4] + jnp.where(b[0], 0.0, a[4]),
        )

    _, cx, cy, cz, cc = jax.lax.associative_scan(
        op, (first, sx, sy, sz, scnt), axis=0
    )
    return cx[::4096].sum() + cc[::4096].sum()


@jax.jit
def scan4(skey, sx, sy, sz):
    suse = skey != jnp.int32(2**31 - 1)
    sx = jnp.where(suse, sx, 0.0)
    sy = jnp.where(suse, sy, 0.0)
    sz = jnp.where(suse, sz, 0.0)
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])

    def op(a, b):
        return (
            jnp.logical_or(a[0], b[0]),
            b[1] + jnp.where(b[0], 0.0, a[1]),
            b[2] + jnp.where(b[0], 0.0, a[2]),
            b[3] + jnp.where(b[0], 0.0, a[3]),
        )

    _, cx, cy, cz = jax.lax.associative_scan(op, (first, sx, sy, sz), axis=0)
    return cx[::4096].sum() + cz[::4096].sum()


@jax.jit
def sort2_5ch(sorkey, cx, cy, cz, canon):
    r = jax.lax.sort((sorkey, cx, cy, cz, canon), num_keys=1, is_stable=True)
    return r[1][::4096].sum() + r[4][::4096].astype(jnp.float32).sum()


@jax.jit
def sort2_4ch_uniq(hkey, cx, cy, cz):
    r = jax.lax.sort((hkey, cx, cy, cz), num_keys=1, is_stable=False)
    return r[1][::4096].sum() + r[0][::4096].astype(jnp.float32).sum()


@jax.jit
def sort2_3ch_uniq(hkey, cx, cy, cz):
    xy = jax.lax.bitcast_convert_type(
        jnp.stack([cx, cy], axis=1), jnp.uint64
    ).reshape(-1)
    k, xyp, zp = jax.lax.sort((hkey, xy, cz), num_keys=1, is_stable=False)
    xs = jax.lax.bitcast_convert_type(xyp, jnp.float32)
    return xs[::4096, 0].sum() + k[::4096].astype(jnp.float32).sum()


def time_it(fn, args, reps=30):
    out = fn(*args)
    np.asarray(out)  # sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    data = velodyne_scene(seed=0, n_points=122_000)
    arrs = make_cloud_arrays(data)
    key, x, y, z = jax.jit(_keys)(arrs.xyz, arrs.valid, np.float32(0.15))
    skey, sx, sy, sz = jax.jit(_sorted_inputs)(key, x, y, z)
    # Fake epilogue inputs at the right shapes/value classes
    sorkey = (skey // 27).astype(jnp.int32)
    hkey = skey  # unique-per-live stand-in with realistic distribution
    floor = measure_dispatch_floor()
    print(f"dispatch floor ~{floor:.1f} ms")
    for name, fn, args in [
        ("sort1_4ch", sort1_4ch, (key, x, y, z)),
        ("sort1_3ch", sort1_3ch, (key, x, y, z)),
        ("sort1_unstable", sort1_unstable, (key, x, y, z)),
        ("scan5", scan5, (skey, sx, sy, sz)),
        ("scan4", scan4, (skey, sx, sy, sz)),
        ("sort2_5ch", sort2_5ch, (sorkey, sx, sy, sz, skey)),
        ("sort2_4ch_uniq", sort2_4ch_uniq, (hkey, sx, sy, sz)),
        ("sort2_3ch_uniq", sort2_3ch_uniq, (hkey, sx, sy, sz)),
    ]:
        wall = time_it(fn, args)
        print(f"{name:16s}: streaming {wall:7.2f} ms/rep", flush=True)


if __name__ == "__main__":
    main()
