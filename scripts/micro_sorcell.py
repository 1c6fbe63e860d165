#!/usr/bin/env python3
"""A/B the KITTI SOR operating point (cell factor x per_seg) on the
streaming metric. Smaller cells cut per-window candidate counts but
flag more rows for the exact rescue; the rescue is group-pruned so its
cost scales with the flagged count."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import pointclouds_tpu  # noqa: F401  (config side effects)
from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.pipelines.kitti import kitti_obstacle_pipeline
from pointclouds_tpu.pipelines.scenes import velodyne_scene


def main():
    data = velodyne_scene(seed=0, n_points=122_000)
    arrs = make_cloud_arrays(data)

    def run(seed, factor, per_seg):
        return kitti_obstacle_pipeline(
            arrs.xyz, arrs.valid, np.float32(0.15), np.float32(2.0),
            np.float32(0.15), seed, np.float32(0.8),
            sor_k=20, ransac_iters=500, sor_backend="sweep",
            ds_cap=98_304, ransac_subsample=4096,
            sor_cell_factor=factor, sor_per_seg=per_seg,
        )

    for factor in (3.0, 3.5, 4.0, 5.0):
        for per_seg in (2, 3):
            try:
                out = run(0, factor, per_seg)
                np.asarray(out.labels)
            except Exception as e:
                print(f"factor={factor} per_seg={per_seg}: FAIL {type(e).__name__}",
                      flush=True)
                continue
            cert = bool(np.asarray(out.sor_certified))
            cleaned = int(np.asarray(out.cleaned_valid).sum())
            t0 = time.perf_counter()
            for f in range(40):
                out = run(f, factor, per_seg)
            np.asarray(out.labels)
            ms = (time.perf_counter() - t0) * 1e3 / 40
            print(
                f"factor={factor} per_seg={per_seg}: {ms:7.2f} ms/frame "
                f"certified={cert} cleaned={cleaned}",
                flush=True,
            )


if __name__ == "__main__":
    main()
