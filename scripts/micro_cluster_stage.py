#!/usr/bin/env python3
"""Decompose the aerial cluster stage on TPU: sorted-structure build
(keyed sub-steps), multisweep kernel, epilogue — prefix method with a
static stop so XLA dead-code-eliminates everything after the prefix.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/micro_cluster_stage.py
"""

import sys
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import compaction_order, make_cloud_arrays
from pointclouds_tpu.ops.filters import voxel_downsample_masked
from pointclouds_tpu.ops.segmentation import ransac_plane_masked
from pointclouds_tpu.pipelines.scenes import aerial_scene
from pointclouds_tpu.spatial.sweep import (
    SWEEP_TABLE_SIZE,
    _cluster_epilogue,
    _sorted_structure,
    _window_starts,
)
from pointclouds_tpu.utils.profiling import measure_dispatch_floor, time_fn

STAGES = [
    "keys+argsort",
    "gather/pack planar",
    "window starts",
    "inv perm",
    "multisweep kernel",
    "epilogue",
]


@partial(jax.jit, static_argnames=("stop", "wr"))
def prefix(xyz, valid, radius, *, stop: int, wr: int = 12):
    n = xyz.shape[0]
    table_size = SWEEP_TABLE_SIZE
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    use = jnp.logical_and(valid, finite)
    hi_abs = jnp.max(jnp.where(use[:, None], jnp.abs(xyz), 0.0))
    cell_size = radius * 1.00002 + hi_abs * 6e-7 + 1e-7

    c = jnp.floor(xyz / cell_size)
    c = jnp.clip(c, -1e9, 1e9).astype(jnp.int32)
    big32 = jnp.int32(2**30)
    mn = jnp.min(jnp.where(use[:, None], c, big32), axis=0)
    mn = jnp.minimum(mn, big32 - 1)
    rel = jnp.clip(c - mn[None, :], 0, None)
    mx = jnp.max(jnp.where(use[:, None], rel, 0), axis=0)
    extent = mx + 1
    ext64 = extent.astype(jnp.int64)
    lin64 = (
        rel[:, 0].astype(jnp.int64) * ext64[1] + rel[:, 1].astype(jnp.int64)
    ) * ext64[2] + rel[:, 2].astype(jnp.int64)
    lin = jnp.where(
        use, jnp.clip(lin64, 0, table_size - 1), table_size
    ).astype(jnp.int32)
    order = jnp.argsort(lin, stable=True)
    slin = jnp.take(lin, order)
    if stop == 1:
        return jnp.sum(slin) + jnp.sum(order)

    sxyz = jnp.take(xyz, order, axis=0)
    suse = slin < table_size
    sxyz = jnp.where(suse[:, None], sxyz, 0.0)
    pad = (-n) % 128
    npad = n + pad
    slin_p, sxyz_p, suse_p = slin, sxyz, suse
    nrows = max(npad // 128, wr)
    nb = npad // 128
    planar = jnp.stack(
        [
            sxyz_p[:, 0].reshape(nrows, 128),
            sxyz_p[:, 1].reshape(nrows, 128),
            sxyz_p[:, 2].reshape(nrows, 128),
            suse_p.astype(jnp.float32).reshape(nrows, 128),
        ],
        axis=1,
    )
    if stop == 2:
        return jnp.sum(planar)

    starts_skip, block_ok = _window_starts(
        slin_p, suse_p, extent, nrows, nb, wr, table_size
    )
    if stop == 3:
        return jnp.sum(starts_skip) + jnp.sum(block_ok)

    inv = (
        jnp.zeros((n,), jnp.int32)
        .at[order]
        .set(jnp.arange(n, dtype=jnp.int32))
    )
    if stop == 4:
        return jnp.sum(inv) + jnp.sum(starts_skip)

    from pointclouds_tpu.spatial.pallas_kernels import cluster_multisweep

    r2 = radius * radius
    labf, chf = cluster_multisweep(planar, starts_skip, r2, sweeps=12)
    if stop == 5:
        return jnp.sum(labf) + jnp.sum(chf) + jnp.sum(inv)

    lab = labf.astype(jnp.int32)
    exact = jnp.sum(chf) < 0.5
    s = dict(order=order, inv=inv)
    nall = nrows * 128
    labels, exact = _cluster_epilogue(
        lab, s, use, suse_p.reshape(-1), n, nall, exact
    )
    return jnp.sum(labels) + jnp.sum(exact)


def main():
    data = aerial_scene(seed=42, scale=1.0)
    arrs = make_cloud_arrays(data)

    @jax.jit
    def prep(xyz, valid):
        centroids, ds_valid = voxel_downsample_masked(
            xyz, valid, jnp.float32(0.5)
        )
        pnormal, d, inlier = ransac_plane_masked(
            centroids, ds_valid, jnp.float32(0.3), 0, 300
        )
        obstacle_mask = jnp.logical_and(ds_valid, jnp.logical_not(inlier))
        order = compaction_order(obstacle_mask)
        obs_src = order[:262_144].astype(jnp.int32)
        obs_valid = jnp.take(obstacle_mask, obs_src)
        obs_xyz = jnp.take(centroids, obs_src, axis=0)
        return obs_xyz, obs_valid

    obs_xyz, obs_valid = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a)), prep(arrs.xyz, arrs.valid)
    )
    floor = measure_dispatch_floor()
    print(f"n={obs_xyz.shape[0]} floor {floor:.1f} ms", flush=True)

    prev = 0.0
    for i, name in enumerate(STAGES, start=1):
        mn, p50 = time_fn(
            partial(prefix, stop=i),
            obs_xyz, obs_valid, np.float32(2.0),
            reps=7, warmup=2,
        )
        cur = mn - floor
        print(
            f"prefix {i} ({name:18s}): {cur:7.2f} ms  (+{cur - prev:7.2f})",
            flush=True,
        )
        prev = cur


if __name__ == "__main__":
    main()
