#!/usr/bin/env python3
"""A/B the round-3c levers on real TPU (bench.py streaming methodology):

  KITTI : ransac_subsample in (None, 4096)
  aerial: (normals_rescue, ransac_subsample) in the 2x2 grid

Run when the axon tunnel is up; each variant streams FRAMES frames
back-to-back with one host sync. Decides whether the pipelines/bench.py
defaults should flip the new flags on.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: F401
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.pipelines.aerial import aerial_pipeline
from pointclouds_tpu.pipelines.kitti import kitti_obstacle_pipeline
from pointclouds_tpu.pipelines.scenes import aerial_scene, velodyne_scene

FRAMES = 60


def stream(run, sync, label):
    try:
        sync(run(0))
        sync(run(1))
    except Exception as e:
        print(f"{label:48s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        return
    t0 = time.perf_counter()
    for f in range(FRAMES):
        out = run(f)
    sync(out)
    ms = (time.perf_counter() - t0) * 1e3 / FRAMES
    print(f"{label:48s} {ms:8.2f} ms/frame streaming")


def main():
    data = velodyne_scene(seed=0, n_points=122_000)
    arrs = make_cloud_arrays(data)

    def ksync(out):
        np.asarray(out.labels)
        return out

    for backend in ("sweep",):
        for ss in (None, 4096):
            def krun(seed, _ss=ss, _b=backend):
                return kitti_obstacle_pipeline(
                    arrs.xyz, arrs.valid, np.float32(0.15),
                    np.float32(2.0), np.float32(0.15), seed,
                    np.float32(0.8), sor_k=20, ransac_iters=500,
                    sor_backend=_b, ds_cap=98_304, ransac_subsample=_ss,
                )
            stream(krun, ksync, f"kitti backend={backend} ransac_ss={ss}")

    adata = aerial_scene(seed=42, scale=1.0)
    aarrs = make_cloud_arrays(adata)
    vp = jnp.asarray([0.0, 0.0, 10000.0], jnp.float32)

    def async_(out):
        np.asarray(out.labels)
        return out

    for rescue in (False, True):
        for ss in (None, 4096):
            def arun(seed, _r=rescue, _ss=ss):
                return aerial_pipeline(
                    aarrs.xyz, aarrs.valid, np.float32(0.5),
                    np.float32(3.0), np.float32(0.3), seed,
                    np.float32(2.0), vp, backend="sweep",
                    ds_cap=229_376, obstacle_cap=196_608,
                    normals_rescue=_r, ransac_subsample=_ss,
                )
            stream(
                arun, async_,
                f"aerial rescue={rescue} ransac_ss={ss}",
            )


if __name__ == "__main__":
    main()
