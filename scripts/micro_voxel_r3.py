#!/usr/bin/env python3
"""Voxel-1M phase split with module-level jits: key pack, argsort, key
sort, key+payload lax.sort, gather, segmented scan, full fused op."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import pointclouds_tpu as pc
from pointclouds_tpu.ops import filters as _filters
from pointclouds_tpu.ops import fusedops as _fused
from pointclouds_tpu.spatial.grid import cell_coords, pack_cell_key, INVALID_KEY


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def t(label, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label:52s} {min(ts):9.2f} ms", flush=True)
    return out


@jax.jit
def keys_of(xyz, valid):
    use = jnp.logical_and(valid, jnp.all(jnp.isfinite(xyz), axis=-1))
    return jnp.where(use, pack_cell_key(cell_coords(xyz, jnp.float32(0.5))),
                     INVALID_KEY)


@jax.jit
def argsort_keys(k):
    return jnp.argsort(k, stable=True)


@jax.jit
def sort_keys(k):
    return jnp.sort(k)


@jax.jit
def sort_keys_payload(k, xyz):
    return jax.lax.sort(
        (k, xyz[:, 0], xyz[:, 1], xyz[:, 2]), num_keys=1, is_stable=True
    )


@jax.jit
def sort_unstable_payload(k, xyz):
    return jax.lax.sort(
        (k, xyz[:, 0], xyz[:, 1], xyz[:, 2]), num_keys=1, is_stable=False
    )


@jax.jit
def gather_rows(xyz, order):
    return jnp.take(xyz, order, axis=0)


@jax.jit
def segscan(first, sx):
    def seg_op(a, b):
        return (jnp.logical_or(a[0], b[0]),
                b[1] + jnp.where(b[0], 0.0, a[1]))

    return jax.lax.associative_scan(seg_op, (first, sx), axis=0)


def main():
    f = jax.jit(lambda a: a + 1)
    x = jnp.ones((8,), jnp.float32)
    sync(f(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        sync(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"floor: {np.percentile(ts, 50):.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    big = (rng.random((1_000_000, 3)) * 10).astype(np.float32)
    cb = pc.PointCloud.from_numpy(big)
    xyz, valid = cb._arrs.xyz, cb._arrs.valid
    print(f"capacity={xyz.shape[0]} key dtype...", flush=True)

    kk = t("pack keys", keys_of, xyz, valid)
    print(f"  key dtype: {kk.dtype}", flush=True)
    t("argsort keys (stable)", argsort_keys, kk)
    t("sort keys only", sort_keys, kk)
    t("lax.sort key + xyz payload (stable)", sort_keys_payload, kk, xyz)
    t("lax.sort key + xyz payload (unstable)", sort_unstable_payload, kk,
      xyz)
    order = argsort_keys(kk)
    t("gather [N,3] by order", gather_rows, xyz, order)
    sk = sort_keys(kk)
    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    t("segmented scan (1 channel)", segscan, first, xyz[:, 0])
    t("voxel_downsample_masked (XLA total)",
      jax.jit(_filters.voxel_downsample_masked), xyz, valid,
      jnp.float32(0.5))
    t("voxel_fused (api program)", _fused.voxel_fused, xyz, valid,
      jnp.float32(0.5))


if __name__ == "__main__":
    main()
