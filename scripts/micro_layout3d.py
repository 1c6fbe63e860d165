#!/usr/bin/env python3
"""Is the in-pipeline moments-kernel slowdown a planar-layout tax?

A) kernel on device_put 3-D planar            (baseline, ~8 ms)
B) kernel on planar reshaped from 2-D inside jit
C) kernel on planar produced by jnp.stack inside jit (pipeline shape)
D) full struct+kernel fused                    (pipeline reality)
"""

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

    @jax.jit
    def struct(pts, v):
        s = _sorted_structure(pts, v, jnp.float32(3.0), 4, 1 << 21)
        return s["planar"], s["starts_skip"]

    planar, starts = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a)), struct(cents, ds_valid)
    )
    nr = planar.shape[0]
    flat = jax.device_put(np.asarray(planar).reshape(nr * 4, 128))
    comps = jax.tree.map(
        lambda a: jax.device_put(np.ascontiguousarray(a)),
        tuple(np.asarray(planar)[:, c, :] for c in range(4)),
    )
    floor = measure_dispatch_floor()
    print(f"nr={nr} floor {floor:.1f} ms", flush=True)

    kern = partial(sweep_moments, k=15, wr=4, per_seg=3)

    fa = jax.jit(lambda p, s: jnp.sum(kern(p, s)))
    fb = jax.jit(lambda f, s: jnp.sum(kern(f.reshape(nr, 4, 128), s)))
    fc = jax.jit(
        lambda c0, c1, c2, c3, s: jnp.sum(
            kern(jnp.stack([c0, c1, c2, c3], axis=1), s)
        )
    )
    fd = jax.jit(
        lambda pts, v, s_: jnp.sum(
            kern(
                _sorted_structure(pts, v, jnp.float32(3.0), 4, 1 << 21)[
                    "planar"
                ],
                s_,
            )
        )
    )

    for name, fn, args in [
        ("A devput 3D", fa, (planar, starts)),
        ("B reshape2D", fb, (flat, starts)),
        ("C stack-in-jit", fc, (*comps, starts)),
        ("D struct+kernel", fd, (cents, ds_valid, starts)),
    ]:
        mn, p50 = time_fn(fn, *args, reps=5, warmup=2)
        print(f"{name:16s}: min {mn - floor:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
