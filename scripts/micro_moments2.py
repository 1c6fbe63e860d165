#!/usr/bin/env python3
"""Decompose the IN-PIPELINE moments stage: voxel -> structure -> kernel
-> unsort epilogue, prefix method with static stop (so each prefix is the
same fused program the aerial pipeline runs)."""

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
from pointclouds_tpu.utils.profiling import measure_dispatch_floor, time_fn

STAGES = [
    "voxel",
    "moments structure",
    "moments kernel",
    "unsort epilogue",
]


@partial(jax.jit, static_argnames=("stop",))
def prefix(xyz, valid, *, stop: int):
    centroids, ds_valid = voxel_downsample_masked(
        xyz, valid, jnp.float32(0.5)
    )
    if stop == 1:
        return jnp.sum(centroids) + jnp.sum(ds_valid)

    cell = jnp.float32(3.0)
    s = _sorted_structure(centroids, ds_valid, cell, 4, 1 << 21)
    if stop == 2:
        return (
            jnp.sum(s["planar"]) + jnp.sum(s["starts_skip"])
            + jnp.sum(s["inv"]) + jnp.sum(s["block_ok"])
        )

    from pointclouds_tpu.spatial.pallas_kernels import sweep_moments

    out = sweep_moments(s["planar"], s["starts_skip"], k=15, wr=4, per_seg=3)
    if stop == 3:
        return jnp.sum(out) + jnp.sum(s["inv"])

    ok_sorted = jnp.logical_and(
        out[12] > 0.5, jnp.repeat(s["block_ok"], 128)
    )
    ok_sorted = jnp.logical_and(ok_sorted, out[9] == out[10])
    packed = jnp.concatenate(
        [out[0:9], out[10:12], ok_sorted[None].astype(jnp.float32)], axis=0
    )
    res = jnp.take(packed, s["inv"], axis=1)
    return jnp.sum(res)


def main():
    data = aerial_scene(seed=42, scale=1.0)
    arrs = make_cloud_arrays(data)
    xyz = jax.device_put(np.asarray(arrs.xyz))
    valid = jax.device_put(np.asarray(arrs.valid))
    floor = measure_dispatch_floor()
    print(f"floor {floor:.1f} ms", flush=True)

    prev = 0.0
    for i, name in enumerate(STAGES, start=1):
        mn, p50 = time_fn(
            partial(prefix, stop=i), xyz, valid, reps=7, warmup=2
        )
        cur = mn - floor
        print(
            f"prefix {i} ({name:18s}): {cur:7.2f} ms  (+{cur - prev:7.2f})",
            flush=True,
        )
        prev = cur


if __name__ == "__main__":
    main()
