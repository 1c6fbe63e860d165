#!/usr/bin/env python3
"""Moments kernel phase split on TPU: vary k and per_seg to separate the
extraction loop (O(k * per_seg*128 * 128)) from the window walks."""

import sys
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.ops.filters import voxel_downsample_masked
from pointclouds_tpu.pipelines.scenes import aerial_scene
from pointclouds_tpu.spatial.sweep import _sorted_structure
from pointclouds_tpu.spatial.pallas_kernels import sweep_moments
from pointclouds_tpu.utils.profiling import measure_dispatch_floor, time_fn


def main():
    data = aerial_scene(seed=42, scale=1.0)
    arrs = make_cloud_arrays(data)

    @jax.jit
    def prep(xyz, valid):
        return voxel_downsample_masked(xyz, valid, jnp.float32(0.5))

    cents, ds_valid = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a)), prep(arrs.xyz, arrs.valid)
    )
    cell = np.float32(3.0)

    @jax.jit
    def struct(pts, v):
        s = _sorted_structure(pts, v, cell, 4, 1 << 21)
        return s["planar"], s["starts_skip"]

    planar, starts = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a)), struct(cents, ds_valid)
    )
    floor = measure_dispatch_floor()
    print(f"nrows={planar.shape[0]} floor {floor:.1f} ms", flush=True)

    for k, per_seg in ((15, 3), (15, 2), (15, 1), (7, 3), (1, 3), (1, 1)):
        f = jax.jit(partial(sweep_moments, k=k, per_seg=per_seg))
        try:
            out = f(planar, starts)
            np.asarray(out)
        except Exception as e:
            print(f"k={k} per_seg={per_seg}: FAIL {type(e).__name__}",
                  flush=True)
            continue
        mn, p50 = time_fn(f, planar, starts, reps=5, warmup=1)
        okf = float(np.asarray(out[12]).sum())
        print(
            f"k={k:2d} per_seg={per_seg}: min {mn - floor:7.2f} ms "
            f"ok-rows {okf:9.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
