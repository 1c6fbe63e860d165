#!/usr/bin/env python3
"""Voxel-downsample epilogue variants on TPU.

Variants of the ends-compaction + totals-gather tail:
  A current voxel_downsample_masked
  B ends via one u32 sortpair (lax.sort) instead of cumsum+scatter
  C totals via 4x flat 1-D gathers instead of the [4, N] axis-1 take
  D B + C
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import compaction_order, make_cloud_arrays
from pointclouds_tpu.pipelines.scenes import aerial_scene
from pointclouds_tpu.spatial.grid import INVALID_KEY, cell_coords, pack_cell_key
from pointclouds_tpu.utils.profiling import measure_dispatch_floor, time_fn


def voxel_variant(xyz, valid, voxel_size, *, ends_mode: str, take_mode: str):
    n = xyz.shape[0]
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    use = jnp.logical_and(valid, finite)
    coords = cell_coords(xyz, voxel_size)
    key = jnp.where(use, pack_cell_key(coords), INVALID_KEY)
    order = jnp.argsort(key, stable=True)
    skey = key[order]
    suse = use[order]
    sxyz = jnp.take(xyz, order, axis=0)
    sx = jnp.where(suse, sxyz[:, 0], 0.0)
    sy = jnp.where(suse, sxyz[:, 1], 0.0)
    sz = jnp.where(suse, sxyz[:, 2], 0.0)
    scnt = suse.astype(jnp.float32)
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    is_end = jnp.concatenate([first[1:], jnp.ones((1,), bool)])

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

    if ends_mode == "scatter":
        ends = compaction_order(is_end).astype(jnp.int32)
    else:  # sortpair: key = 0 where end else 1, stable -> ends first
        kq = jnp.where(is_end, jnp.uint32(0), jnp.uint32(1))
        _, ends = jax.lax.sort(
            (kq, jnp.arange(n, dtype=jnp.int32)), num_keys=1
        )

    if take_mode == "axis1":
        seg_totals = jnp.take(jnp.stack([cx, cy, cz, ccnt]), ends, axis=1)
        counts = seg_totals[3]
        tx, ty, tz = seg_totals[0], seg_totals[1], seg_totals[2]
    else:  # flat 1-D gathers
        tx = jnp.take(cx, ends)
        ty = jnp.take(cy, ends)
        tz = jnp.take(cz, ends)
        counts = jnp.take(ccnt, ends)

    nseg = jnp.sum(first.astype(jnp.int32))
    in_range = jnp.arange(n, dtype=jnp.int32) < nseg
    counts = jnp.where(in_range, counts, 0.0)
    inv = 1.0 / jnp.maximum(counts, 1.0)
    centroids = jnp.stack([tx * inv, ty * inv, tz * inv], axis=1)
    out_valid = counts > 0.0
    return centroids, out_valid


def main():
    data = aerial_scene(seed=42, scale=1.0)
    arrs = make_cloud_arrays(data)
    xyz = jax.device_put(np.asarray(arrs.xyz))
    valid = jax.device_put(np.asarray(arrs.valid))
    vs = np.float32(0.5)
    floor = measure_dispatch_floor()
    print(f"n={xyz.shape[0]} floor {floor:.1f} ms", flush=True)

    from pointclouds_tpu.ops.filters import voxel_downsample_masked

    ref_c, ref_v = jax.jit(
        lambda x, v: voxel_downsample_masked(x, v, vs)
    )(xyz, valid)
    ref_c, ref_v = np.asarray(ref_c), np.asarray(ref_v)

    cases = [
        ("A current", None),
        ("B sortpair ends", dict(ends_mode="sortpair", take_mode="axis1")),
        ("C flat takes", dict(ends_mode="scatter", take_mode="flat")),
        ("D sortpair+flat", dict(ends_mode="sortpair", take_mode="flat")),
    ]
    for name, kw in cases:
        if kw is None:
            fn = jax.jit(lambda x, v: voxel_downsample_masked(x, v, vs))
        else:
            fn = jax.jit(
                lambda x, v, kw=kw: voxel_variant(x, v, vs, **kw)
            )
        c, vv = fn(xyz, valid)
        c, vv = np.asarray(c), np.asarray(vv)
        match = bool((vv == ref_v).all()) and bool(
            np.allclose(c[ref_v], ref_c[ref_v], atol=1e-5)
        )
        mn, p50 = time_fn(fn, xyz, valid, reps=7, warmup=2)
        print(
            f"{name:18s}: min {mn - floor:7.2f} ms  match={match}",
            flush=True,
        )


if __name__ == "__main__":
    main()
