#!/usr/bin/env python3
"""(1) Prefix-bisect voxel_downsample_masked at 1M to find the composed
cost; (2) re-time SOR 10K api (anomalous 74 ms in bench_ops_r3d); (3)
split knn_fused 100K into sweep vs rescue-kernel."""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import pointclouds_tpu as pc
from pointclouds_tpu.core.cloud import compaction_order
from pointclouds_tpu.ops import fusedops as _fused
from pointclouds_tpu.spatial import engine
from pointclouds_tpu.spatial.grid import cell_coords, pack_cell_key, INVALID_KEY
from pointclouds_tpu.ops.registration import _to_planar
from pointclouds_tpu.spatial.pallas_kernels import brute_knn_idx


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def t(label, fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label:52s} {min(ts):9.2f} ms", flush=True)
    return out


@partial(jax.jit, static_argnames=("stop",))
def voxel_prefix(xyz, valid, voxel_size, *, stop: int):
    n = xyz.shape[0]
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    use = jnp.logical_and(valid, finite)
    coords = cell_coords(xyz, voxel_size)
    key = jnp.where(use, pack_cell_key(coords), INVALID_KEY)
    if stop == 1:
        return jnp.sum(key)
    order = jnp.argsort(key, stable=True)
    if stop == 2:
        return jnp.sum(order)
    skey = key[order]
    suse = use[order]
    sxyz = jnp.take(xyz, order, axis=0)
    if stop == 3:
        return jnp.sum(sxyz) + jnp.sum(skey)
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
    if stop == 4:
        return jnp.sum(cx) + jnp.sum(ccnt)
    ends = compaction_order(is_end).astype(jnp.int32)
    if stop == 5:
        return jnp.sum(ends) + jnp.sum(cx)
    seg_totals = jnp.take(jnp.stack([cx, cy, cz, ccnt]), ends, axis=1)
    if stop == 6:
        return jnp.sum(seg_totals)
    counts = seg_totals[3]
    nseg = jnp.sum(first.astype(jnp.int32))
    in_range = jnp.arange(n, dtype=jnp.int32) < nseg
    counts = jnp.where(in_range, counts, 0.0)
    centroids = jnp.transpose(seg_totals[:3] / jnp.maximum(counts, 1.0)[None, :])
    return jnp.sum(centroids) + jnp.sum(counts > 0.0)


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
    bxyz, bvalid = cb._arrs.xyz, cb._arrs.valid
    print("== voxel 1M prefix ==", flush=True)
    prev = 0.0
    for stop in range(1, 8):
        out = voxel_prefix(bxyz, bvalid, jnp.float32(0.5), stop=stop)
        sync(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = voxel_prefix(bxyz, bvalid, jnp.float32(0.5), stop=stop)
            sync(out)
            ts.append((time.perf_counter() - t0) * 1e3)
        cur = min(ts)
        print(f"  stop={stop}: {cur:8.2f} ms (+{cur - prev:7.2f})",
              flush=True)
        prev = cur

    print("== SOR 10K recheck ==", flush=True)
    c10k = pc.PointCloud.from_numpy(
        (rng.random((10_000, 3)) * 10).astype(np.float32)
    )
    t("api SOR 10K", pc.statistical_outlier_removal, c10k, 10, 2.0, reps=5)

    print("== knn_fused 100K split ==", flush=True)
    c100k = pc.PointCloud.from_numpy(
        (rng.random((100_000, 3)) * 10).astype(np.float32)
    )
    xyz, valid = c100k._arrs.xyz, c100k._arrs.valid
    n = xyz.shape[0]
    t("knn_fused total", _fused.knn_fused, xyz, valid, k=10,
      wr=engine._sweep_wr(n), cap=_fused.fused_rescue_cap(n),
      use_kernel=True)
    # rescue kernel alone at the fused shape
    sub = jnp.asarray((rng.random((4096, 3)) * 10).astype(np.float32))
    subv = jnp.ones((4096,), bool)
    t("brute_knn_idx [4096 x 131072] k=10",
      lambda: brute_knn_idx(_to_planar(sub, subv),
                            _to_planar(xyz, valid), k=10))
    t("api knn (engine.knn same-cloud)",
      lambda: engine.knn(xyz, valid, xyz, valid, 10))


if __name__ == "__main__":
    main()
