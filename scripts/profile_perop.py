#!/usr/bin/env python3
"""Break down the per-op cliff rows: where do euclidean_cluster, ICP,
RANSAC, and voxel-1M actually spend time (device dispatches vs host
epilogue vs transfers)?"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import pointclouds_tpu as pc
from pointclouds_tpu.spatial import engine
from pointclouds_tpu.ops import segmentation as _segmentation


def t(label, fn, reps=3):
    out = fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label:48s} {min(ts):8.2f} ms")
    return out


def cloud(n, seed=0, box=10.0):
    rng = np.random.default_rng(seed)
    return pc.PointCloud.from_numpy(
        (rng.random((n, 3)) * box).astype(np.float32)
    )


def main():
    rng = np.random.default_rng(3)
    seg = np.vstack([
        (rng.random((80_000, 3)) * [20, 20, 0.05]).astype(np.float32),
        (rng.random((20_000, 3)) * 20).astype(np.float32),
    ])
    cseg = pc.PointCloud.from_numpy(seg)
    xyz, valid = cseg._arrs.xyz, cseg._arrs.valid

    # ── euclidean_cluster breakdown ──
    print("== euclidean_cluster 100K r=0.5 ==")
    res = t("engine.cluster_labels (total, host fn)",
              lambda: engine.cluster_labels(xyz, valid, 0.5))
    from pointclouds_tpu.spatial.sweep import sweep_cluster_labels
    n = xyz.shape[0]
    nrows = max(-(-n // 128), 1)
    wr = min(nrows, 64)

    def raw():
        lab, exact = sweep_cluster_labels(
            xyz, valid, np.float32(0.5), wr=wr, use_kernel=True
        )
        return np.asarray(lab), bool(exact)

    lab, exact = t("sweep_cluster_labels wr=big (one jit)", raw)
    print(f"   exact={exact}")
    # cluster_labels returns (sorted_labels, order); rebuild original-order
    # labels for the epilogue timing below.
    sorted_labels_, order_ = res
    labels_np = np.empty_like(sorted_labels_)
    labels_np[order_] = sorted_labels_
    labels_np = labels_np[: cseg.len()]
    def epilogue():
        order = np.argsort(labels_np, kind="stable")
        sorted_labels = labels_np[order]
        boundaries = np.nonzero(
            np.concatenate([[True], sorted_labels[1:] != sorted_labels[:-1]])
        )[0]
        ends = np.concatenate([boundaries[1:], [len(sorted_labels)]])
        clusters = []
        for s, e in zip(boundaries, ends):
            size = e - s
            if 10 <= size <= 10**9:
                members = np.sort(order[s:e])
                clusters.append([int(i) for i in members])
        clusters.sort(key=lambda c: (-len(c), c))
        return clusters

    t("host epilogue (argsort + list build)", epilogue)

    # ── RANSAC breakdown ──
    print("== ransac_plane 100K x500 ==")
    t("api.ransac_plane_seeded", lambda: pc.ransac_plane_seeded(cseg, 0.05, 500, 7))

    def ransac_raw():
        normal, d, inlier_mask = _segmentation.ransac_plane_masked(
            xyz, valid, jnp.float32(0.05), 7, 500
        )
        return np.asarray(inlier_mask)

    m = t("ransac_plane_masked + mask transfer", ransac_raw)

    def inlier_list():
        mask_np = m[: cseg.len()]
        return [int(i) for i in np.nonzero(mask_np)[0]]

    t("host inlier list build", inlier_list)

    # ── ICP breakdown ──
    print("== icp 10K x50 ==")
    src = cloud(10_000, seed=1)
    tgt = pc.PointCloud.from_numpy(src.to_numpy() + np.float32(0.05))
    r = t("api.icp_point_to_point", lambda: pc.icp_point_to_point(src, tgt, max_iterations=50))
    print(f"   iters={r.num_iterations} converged={r.converged}")

    from pointclouds_tpu.ops import registration as _registration

    def icp_raw():
        out = _registration.icp_point_to_point_masked(
            src._arrs.xyz, src._arrs.valid, tgt._arrs.xyz, tgt._arrs.valid,
            50, jnp.float32(1e-5), jnp.float32(np.inf),
        )
        return np.asarray(out[0])

    t("icp_point_to_point_masked (device only)", icp_raw)

    # ── voxel 1M breakdown ──
    print("== voxel 1M ==")
    c1m = cloud(1_000_000)
    t("api.voxel_downsample 1M", lambda: pc.voxel_downsample(c1m, 0.5))

    from pointclouds_tpu.ops import filters as _filters
    import inspect
    names = [x for x, _ in inspect.getmembers(_filters, inspect.isfunction)]
    print("   filters fns:", names)


if __name__ == "__main__":
    main()
