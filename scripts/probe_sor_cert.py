#!/usr/bin/env python3
"""Probe SOR certification on the bench KITTI workload (TPU).

Counts rows still uncertified after the two-pass rescue at the bench
operating point, and sweeps rescue_cells to see what radius certifies
everything (the bench's sor_certified=false is a handful of isolated
noise points whose k=20th neighbor lies beyond rescue_cells*cell).
"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.ops.filters import voxel_downsample_masked
from pointclouds_tpu.pipelines.scenes import velodyne_scene
from pointclouds_tpu.spatial.sweep import sweep_sor_two_pass

data = velodyne_scene(seed=0, n_points=122_000)
arrs = make_cloud_arrays(data)
cf, vf = voxel_downsample_masked(arrs.xyz, arrs.valid, np.float32(0.15))
centroids = cf[:98_304]
ds_valid = vf[:98_304]
print("ds points:", int(np.asarray(ds_valid).sum()))

for rc in (4.0, 8.0, 16.0):
    mean, ok, cert = sweep_sor_two_pass(
        centroids, ds_valid, np.float32(0.45), k=20, fix_cap=8192,
        rescue_cells=rc, per_seg=2, use_kernel=True,
    )
    okn = np.asarray(ok)
    usen = np.asarray(ds_valid)
    bad = int((usen & ~okn).sum())
    print(f"rescue_cells={rc}: uncertified={bad} certified={bool(np.asarray(cert))}")
