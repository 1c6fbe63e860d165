#!/usr/bin/env python3
"""Probe which KITTI grid flag trips on the bench workload (one TPU run)."""
import sys

sys.path.insert(0, ".")

import numpy as np

from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.pipelines.kitti import kitti_obstacle_pipeline
from pointclouds_tpu.pipelines.scenes import velodyne_scene

data = velodyne_scene(seed=0, n_points=122_000)
arrs = make_cloud_arrays(data)
out = kitti_obstacle_pipeline(
    arrs.xyz, arrs.valid, np.float32(0.15), np.float32(2.0),
    np.float32(0.15), 0, np.float32(0.8),
    sor_k=20, ransac_iters=500, sor_backend="sweep",
    ds_cap=98_304, ransac_subsample=4096,
)
flags = np.asarray(out.grid_flags)
print("grid_flags [sor_ovf, sor_table, cluster_inexact, cluster_table, ds_ovf]:",
      flags.tolist())
print("sor_certified:", bool(np.asarray(out.sor_certified)))
print("n_obstacles:", int(np.asarray(out.obstacle_valid).sum()),
      "overflow:", bool(np.asarray(out.obstacle_overflow)))
