#!/usr/bin/env python3
"""Decompose sort/structure-build costs on TPU: argsort at voxel scale
(~964K keys), at cluster scale (262K), and the full _sorted_structure
build, vs the kernel-only multisweep cost."""

import sys
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.pipelines.scenes import aerial_scene
from pointclouds_tpu.spatial.sweep import _sorted_structure
from pointclouds_tpu.utils.profiling import measure_dispatch_floor, time_fn


def main():
    data = aerial_scene(seed=42, scale=1.0)
    arrs = make_cloud_arrays(data)
    n = arrs.xyz.shape[0]
    print(f"n raw = {n}", flush=True)
    floor = measure_dispatch_floor()
    print(f"floor {floor:.1f} ms", flush=True)

    rng = np.random.default_rng(0)
    keys_1m = jax.device_put(
        rng.integers(0, 1 << 22, size=n).astype(np.uint32)
    )
    keys_262k = jax.device_put(
        rng.integers(0, 1 << 21, size=262_144).astype(np.uint32)
    )

    for name, fn, args in [
        ("sort_u32_964k", jax.jit(jnp.sort), (keys_1m,)),
        ("argsort_u32_964k", jax.jit(jnp.argsort), (keys_1m,)),
        ("argsort_u32_262k", jax.jit(jnp.argsort), (keys_262k,)),
        (
            "sortpair_964k",
            jax.jit(
                lambda k: jax.lax.sort(
                    (k, jnp.arange(k.shape[0], dtype=jnp.int32)),
                    num_keys=1,
                )
            ),
            (keys_1m,),
        ),
    ]:
        mn, p50 = time_fn(fn, *args, reps=7, warmup=2)
        print(f"{name:22s}: min {mn - floor:7.2f} ms", flush=True)

    cell = np.float32(2.0 * 1.00002 + 500 * 6e-7 + 1e-7)
    sub_xyz = jax.device_put(np.asarray(arrs.xyz)[:262_144])
    sub_valid = jax.device_put(np.asarray(arrs.valid)[:262_144])

    @jax.jit
    def build(pts, v):
        s = _sorted_structure(pts, v, cell, 12, 1 << 21)
        return s["planar"], s["starts_skip"]

    mn, p50 = time_fn(build, sub_xyz, sub_valid, reps=7, warmup=2)
    print(f"{'sorted_structure_262k':22s}: min {mn - floor:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
