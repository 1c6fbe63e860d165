#!/usr/bin/env python3
"""Voxel-downsample internals on TPU: argsort, gathers, segmented scan in
row vs planar orientation, boundary compaction."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import compaction_order, make_cloud_arrays
from pointclouds_tpu.pipelines.scenes import aerial_scene
from pointclouds_tpu.spatial.grid import INVALID_KEY, cell_coords, pack_cell_key
from pointclouds_tpu.utils.profiling import measure_dispatch_floor, time_fn


def main():
    data = aerial_scene(seed=42, scale=1.0)
    arrs = make_cloud_arrays(data)
    xyz, valid = jax.device_put(np.asarray(arrs.xyz)), jax.device_put(
        np.asarray(arrs.valid)
    )
    n = xyz.shape[0]
    vs = np.float32(0.5)
    floor = measure_dispatch_floor()
    print(f"n={n} dispatch floor {floor:.1f} ms", flush=True)

    def report(name, fn, *args):
        mn, p50 = time_fn(jax.jit(fn), *args, reps=5, warmup=2)
        print(f"{name:32s} min {mn - floor:7.2f} ms p50 {p50 - floor:7.2f} ms",
              flush=True)

    def keys(xyz, valid):
        finite = jnp.all(jnp.isfinite(xyz), axis=-1)
        use = jnp.logical_and(valid, finite)
        coords = cell_coords(xyz, vs)
        return jnp.where(use, pack_cell_key(coords), INVALID_KEY), use

    report("keys only", lambda x, v: keys(x, v)[0], xyz, valid)

    def sort_only(xyz, valid):
        key, use = keys(xyz, valid)
        return jnp.argsort(key, stable=True)

    report("keys + argsort", sort_only, xyz, valid)

    def gather3(xyz, valid):
        key, use = keys(xyz, valid)
        order = jnp.argsort(key, stable=True)
        suse = use[order]
        return jnp.stack([
            jnp.where(suse, jnp.take(xyz[:, 0], order), 0.0),
            jnp.where(suse, jnp.take(xyz[:, 1], order), 0.0),
            jnp.where(suse, jnp.take(xyz[:, 2], order), 0.0),
            suse.astype(jnp.float32),
        ])

    report("+ 3x 1D gathers -> [4,N]", gather3, xyz, valid)

    def gather_rows(xyz, valid):
        key, use = keys(xyz, valid)
        order = jnp.argsort(key, stable=True)
        suse = use[order]
        sxyz = jnp.take(xyz, order, axis=0)
        return jnp.concatenate(
            [jnp.where(suse[:, None], sxyz, 0.0),
             suse.astype(jnp.float32)[:, None]], axis=1)

    report("+ [N,3] gather -> [N,4]", gather_rows, xyz, valid)

    def scan_planar(xyz, valid):
        svals = gather3(xyz, valid)
        key, use = keys(xyz, valid)
        order = jnp.argsort(key, stable=True)
        skey = key[order]
        first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])

        def seg_op(a, b):
            af, av = a
            bf, bv = b
            return jnp.logical_or(af, bf), bv + jnp.where(bf, 0.0, av)

        _, seg = jax.lax.associative_scan(seg_op, (first[None, :], svals),
                                          axis=1)
        return seg

    report("planar [4,N] scan (axis 1)", scan_planar, xyz, valid)

    def scan_rows(xyz, valid):
        vals = gather_rows(xyz, valid)
        key, use = keys(xyz, valid)
        order = jnp.argsort(key, stable=True)
        skey = key[order]
        first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])

        def seg_op(a, b):
            af, av = a
            bf, bv = b
            return jnp.logical_or(af, bf), bv + jnp.where(bf[:, None], 0.0, av)

        _, seg = jax.lax.associative_scan(seg_op, (first, vals), axis=0)
        return seg

    report("row [N,4] scan (axis 0)", scan_rows, xyz, valid)

    def scan_1d(xyz, valid):
        svals = gather3(xyz, valid)
        key, use = keys(xyz, valid)
        order = jnp.argsort(key, stable=True)
        skey = key[order]
        first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])

        def seg_op(a, b):
            return (
                jnp.logical_or(a[0], b[0]),
                b[1] + jnp.where(b[0], 0.0, a[1]),
                b[2] + jnp.where(b[0], 0.0, a[2]),
                b[3] + jnp.where(b[0], 0.0, a[3]),
                b[4] + jnp.where(b[0], 0.0, a[4]),
            )

        out = jax.lax.associative_scan(
            seg_op, (first, svals[0], svals[1], svals[2], svals[3]), axis=0
        )
        return out[1]

    report("5x 1D scans (tuple, axis 0)", scan_1d, xyz, valid)

    def compact_ends(xyz, valid):
        key, use = keys(xyz, valid)
        order = jnp.argsort(key, stable=True)
        skey = key[order]
        first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
        is_end = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
        return compaction_order(is_end)

    report("+ compaction_order(is_end)", compact_ends, xyz, valid)

    from pointclouds_tpu.ops.filters import voxel_downsample_masked

    report("full voxel_downsample_masked",
           lambda x, v: voxel_downsample_masked(x, v, vs), xyz, valid)


if __name__ == "__main__":
    main()
