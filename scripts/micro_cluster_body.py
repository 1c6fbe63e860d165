#!/usr/bin/env python3
"""One cluster-loop body application, standalone and piecewise, at aerial
obstacle shapes — to find where the ~13 ms/iteration actually goes."""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import compaction_order, make_cloud_arrays
from pointclouds_tpu.ops.filters import voxel_downsample_masked
from pointclouds_tpu.ops.segmentation import ransac_plane_masked
from pointclouds_tpu.pipelines.scenes import aerial_scene
from pointclouds_tpu.spatial.sweep import _sorted_structure
from pointclouds_tpu.spatial.pallas_kernels import cluster_propagate
from pointclouds_tpu.utils.profiling import measure_dispatch_floor, time_fn


def main():
    print('gen scene', flush=True)
    data = aerial_scene(seed=42, scale=1.0)
    arrs = make_cloud_arrays(data)

    @jax.jit
    def prep(xyz, valid):
        centroids, ds_valid = voxel_downsample_masked(
            xyz, valid, jnp.float32(0.5)
        )
        pn, d, inlier = ransac_plane_masked(
            centroids, ds_valid, jnp.float32(0.3), 0, 300
        )
        mask = jnp.logical_and(ds_valid, jnp.logical_not(inlier))
        order = compaction_order(mask)
        src = order[:262_144].astype(jnp.int32)
        return jnp.take(centroids, src, axis=0), jnp.take(mask, src)

    print('prep compile...', flush=True)
    obs_xyz, obs_valid = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a)), prep(arrs.xyz, arrs.valid)
    )
    cell = np.float32(2.0 * 1.00002 + 500 * 6e-7 + 1e-7)

    @jax.jit
    def struct(pts, v):
        s = _sorted_structure(pts, v, cell, 12, 1 << 21)
        return s["planar"], s["starts_skip"]

    print('struct compile...', flush=True)
    planar, starts = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a)), struct(obs_xyz, obs_valid)
    )
    nrows = planar.shape[0]
    nall = nrows * 128
    nb = starts.shape[0]
    r2 = np.float32(4.0)
    print('base8...', flush=True)
    base8 = jax.device_put(np.asarray(jnp.concatenate(
        [planar,
         jnp.zeros((nrows, 1, 128), jnp.float32),
         jnp.full((nrows, 1, 128), r2, jnp.float32),
         jnp.zeros((nrows, 2, 128), jnp.float32)], axis=1)))
    lab0 = jax.device_put(np.arange(nall, dtype=np.int32))

    floor = measure_dispatch_floor()
    print(f"nb={nb} floor {floor:.1f} ms", flush=True)

    def report(name, fn, *args):
        mn, p50 = time_fn(jax.jit(fn), *args, reps=6, warmup=2)
        print(f"{name:36s} min {mn - floor:7.2f} p50 {p50 - floor:7.2f} ms",
              flush=True)

    def body_full(lab, base8, starts):
        planar8 = base8.at[:, 4, :].set(
            lab.astype(jnp.float32).reshape(nrows, 128)
        )
        newq, changed = cluster_propagate(planar8, starts, wr=12)
        m = newq[: nb * 128].astype(jnp.int32)
        if nall > nb * 128:
            m = jnp.concatenate([m, lab[nb * 128:]])
        new = jnp.minimum(lab, m)
        new = new.at[jnp.clip(lab, 0, nall - 1)].min(m)
        for _ in range(2):
            new = jnp.minimum(new, jnp.take(new, jnp.clip(new, 0, nall - 1)))
        return new, jnp.sum(changed)

    def make_body(kernel=True, hook=True, jumps=2, minop=True):
        def body(lab, base8, starts):
            planar8 = base8.at[:, 4, :].set(
                lab.astype(jnp.float32).reshape(nrows, 128)
            )
            if kernel:
                newq, changed = cluster_propagate(planar8, starts, wr=12)
                m = newq[: nb * 128].astype(jnp.int32)
            else:
                m = planar8[:, 4, :].reshape(-1)[: nb * 128].astype(jnp.int32)
                changed = jnp.zeros((nb * 128,), jnp.float32)
            if nall > nb * 128:
                m = jnp.concatenate([m, lab[nb * 128:]])
            new = jnp.minimum(lab, m) if minop else m
            if hook:
                new = new.at[jnp.clip(lab, 0, nall - 1)].min(m)
            for _ in range(jumps):
                new = jnp.minimum(
                    new, jnp.take(new, jnp.clip(new, 0, nall - 1))
                )
            return new, jnp.sum(changed)

        return body

    def scan4(body):
        def fn(lab, base8, starts):
            def b(lab, _):
                lab, ch = body(lab, base8, starts)
                return lab, ch

            lab, chs = jax.lax.scan(b, lab, None, length=4)
            return lab, chs

        return fn

    variants = [
        ("full (kernel+hook+2j)", make_body()),
        ("no kernel", make_body(kernel=False)),
        ("no hook", make_body(hook=False)),
        ("no jumps", make_body(jumps=0)),
        ("kernel only (no hook/jumps)", make_body(hook=False, jumps=0)),
        ("1 jump", make_body(jumps=1)),
    ]
    for name, body in variants:
        report(f"scan4 {name}", scan4(body), lab0, base8, starts)


if __name__ == "__main__":
    main()
