#!/usr/bin/env python3
"""A/B-after measurement: fused per-op rows affected by _flagged_rows
(nonzero -> payload-sort compaction). Compare wall numbers against the
STATUS.md round-3 table (normals-100K 54.6, SOR-100K 49.7, ror-100K 46.6,
knn-100K 100.8, cluster-100K 62.0 ms wall)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import pointclouds_tpu as pc


def sync(x):
    if hasattr(x, "len"):
        x.len()
        return
    if isinstance(x, (list, tuple)) and x and not hasattr(x[0], "ndim"):
        return
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def measure_floor():
    f = jax.jit(lambda a: a + 1)
    x = jnp.ones((8,), jnp.float32)
    sync(f(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        sync(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(ts, 50))


def timeit(name, fn, *args, reps=7, floor=0.0):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    med = float(np.percentile(ts, 50))
    print(f"{name:36s} wall {med:8.1f} ms   device {max(0.0, med - floor):8.1f} ms", flush=True)


def main():
    rng = np.random.default_rng(42)
    pts100k = rng.uniform(0, 50, (100_000, 3)).astype(np.float32)
    c100k = pc.PointCloud.from_numpy(pts100k)

    floor = measure_floor()
    print(f"dispatch floor: {floor:.1f} ms", flush=True)

    timeit("estimate_normals k=10 100K", pc.estimate_normals, c100k, 10, floor=floor)
    timeit("SOR k=10 100K", pc.statistical_outlier_removal, c100k, 10, 1.0, floor=floor)
    timeit("radius_outlier r=0.5 100K", pc.radius_outlier_removal, c100k, 0.5, 5, floor=floor)
    timeit("knn k=10 all-100K", pc.knn, c100k, pts100k, 10, floor=floor)
    timeit("euclidean_cluster 100K", pc.euclidean_cluster, c100k, 0.5, 10, 200_000, floor=floor)


if __name__ == "__main__":
    main()
