#!/usr/bin/env python3
"""Aerial LiDAR processing demo: terrain/building/vegetation segmentation.

Reproduces the reference demo's workload and report format
(ref: examples/python/aerial_lidar.py:143-239): voxel 0.5 -> normals k=15 ->
RANSAC ground 0.3/300 -> remove ground -> cluster 2.0/20/100k, with per-step
timing and a throughput line.

Usage:
    python examples/aerial_lidar.py            # full 241K-pt scene
    python examples/aerial_lidar.py --quick    # 0.1x scale
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import pointclouds_tpu as pc
from pointclouds_tpu.pipelines.scenes import aerial_scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    scale = 0.1 if args.quick else 1.0
    data = aerial_scene(seed=42, scale=scale)
    cloud = pc.PointCloud.from_numpy(data)
    print(f"Aerial scene: {cloud.len()} points over 500x500 m")

    total0 = time.perf_counter()

    t0 = time.perf_counter()
    ds = pc.voxel_downsample(cloud, 0.5)
    t_voxel = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    with_normals = pc.estimate_normals(ds, 15)
    t_normals = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    plane = pc.ransac_plane(with_normals, 0.3, 300)
    t_ransac = (time.perf_counter() - t0) * 1e3

    t0 = time.perf_counter()
    objects = with_normals.select_inverse(plane.inliers)
    clusters = pc.euclidean_cluster(objects, 2.0, 20, 100_000)
    t_cluster = (time.perf_counter() - t0) * 1e3

    total_ms = (time.perf_counter() - total0) * 1e3

    print("=" * 60)
    print("Aerial LiDAR Pipeline (pointclouds_tpu)")
    print("=" * 60)
    print(f"Raw points:             {cloud.len()}")
    print(f"Voxel downsample (0.5): {ds.len()}  [{t_voxel:.1f} ms]")
    print(f"Normals (k=15):         {with_normals.len()}  [{t_normals:.1f} ms]")
    print(f"Ground inliers:         {len(plane.inliers)}  [{t_ransac:.1f} ms]")
    print(f"Object points:          {objects.len()}")
    print(f"Clusters (r=2.0):       {len(clusters)}  [{t_cluster:.1f} ms]")
    for i, c in enumerate(clusters[:10]):
        print(f"  cluster {i}: {len(c)} points")
    print("-" * 60)
    print(f"Total: {total_ms:.1f} ms -> "
          f"{cloud.len() / (total_ms / 1e3) / 1e6:.2f} M pts/sec")


if __name__ == "__main__":
    main()
