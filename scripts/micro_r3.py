#!/usr/bin/env python3
"""Intra-stage micro-profile of the aerial hot stages on TPU.

Times the individual pieces of the moments and cluster sweeps at the real
aerial-pipeline shapes, so optimization effort lands on the true cost:
sort, window compute, kernel pass, scatter hook, pointer jumps.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/micro_r3.py
"""

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
from pointclouds_tpu.spatial.sweep import _sorted_structure, sweep_knn_moments
from pointclouds_tpu.utils.profiling import measure_dispatch_floor, time_fn


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    data = aerial_scene(seed=42, scale=1.0)
    arrs = make_cloud_arrays(data)
    xyz, valid = arrs.xyz, arrs.valid

    # ── Stage inputs (computed once, on device) ──
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
        return centroids, ds_valid, obs_xyz, obs_valid

    centroids, ds_valid, obs_xyz, obs_valid = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a)), prep(xyz, valid)
    )
    nds = int(np.asarray(ds_valid).sum())
    nobs = int(np.asarray(obs_valid).sum())
    print(f"ds_valid {nds}  obstacles {nobs}", flush=True)

    floor = measure_dispatch_floor()
    print(f"dispatch floor {floor:.1f} ms", flush=True)

    def report(name, fn, *args):
        t0 = time.perf_counter()
        mn, p50 = time_fn(fn, *args, reps=5, warmup=2)
        wall = time.perf_counter() - t0
        print(
            f"{name:34s} min {mn - floor:8.2f} ms  p50 {p50 - floor:8.2f} ms"
            f"   (compile+run {wall:.0f}s)",
            flush=True,
        )

    # ── Moments-stage pieces (cell = 3.0, k = 15) ──
    cell_m = np.float32(3.0)

    @jax.jit
    def sort_only(pts, v):
        finite = jnp.all(jnp.isfinite(pts), axis=-1)
        use = jnp.logical_and(v, finite)
        c = jnp.clip(jnp.floor(pts / cell_m), -1e9, 1e9).astype(jnp.int32)
        lin = c[:, 0] * 2048 + c[:, 1] * 64 + c[:, 2]
        order = jnp.argsort(jnp.where(use, lin, 2**30), stable=True)
        return jnp.take(pts, order, axis=0)

    report("moments: argsort 241K + take", sort_only, centroids, ds_valid)

    @jax.jit
    def struct_only(pts, v):
        s = _sorted_structure(pts, v, cell_m, 6, 1 << 21)
        return s["planar"], s["starts_skip"]

    report("moments: _sorted_structure", struct_only, centroids, ds_valid)

    planar_m, starts_m = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a)),
        struct_only(centroids, ds_valid),
    )
    print(
        f"moments planar {planar_m.shape} starts {starts_m.shape}", flush=True
    )

    from pointclouds_tpu.spatial.pallas_kernels import sweep_moments

    kern_m = jax.jit(
        partial(sweep_moments, k=15, wr=6, per_seg=3)
    )
    report("moments: kernel alone", kern_m, planar_m, starts_m)

    full_m = jax.jit(
        partial(sweep_knn_moments, k=15, use_kernel=True)
    )
    report("moments: sweep_knn_moments", full_m, centroids, ds_valid, cell_m)

    # ── Cluster-stage pieces (r = 2.0, wr = 12) ──
    r = np.float32(2.0)
    cell_c = np.float32(2.0 * 1.00002 + 500 * 6e-7 + 1e-7)

    @jax.jit
    def struct_c(pts, v):
        s = _sorted_structure(pts, v, cell_c, 12, 1 << 21)
        return s["planar"], s["starts_skip"]

    report("cluster: _sorted_structure", struct_c, obs_xyz, obs_valid)

    planar_c, starts_c = jax.tree.map(
        lambda a: jax.device_put(np.asarray(a)),
        struct_c(obs_xyz, obs_valid),
    )
    nrows = planar_c.shape[0]
    nall = nrows * 128
    print(f"cluster planar {planar_c.shape} nall {nall}", flush=True)

    base8 = jnp.concatenate(
        [
            planar_c,
            jnp.zeros((nrows, 1, 128), jnp.float32),
            jnp.full((nrows, 1, 128), r * r, jnp.float32),
            jnp.zeros((nrows, 2, 128), jnp.float32),
        ],
        axis=1,
    )
    base8 = jax.device_put(np.asarray(base8))
    lab0 = jax.device_put(np.arange(nall, dtype=np.int32))
    lab0f = jax.device_put(np.arange(nall, dtype=np.float32))

    from pointclouds_tpu.spatial.pallas_kernels import cluster_propagate

    @jax.jit
    def rebuild(base, lab_f):
        return base.at[:, 4, :].set(lab_f.reshape(-1, 128))

    report("cluster: planar rebuild (set)", rebuild, base8, lab0f)

    kern_c = jax.jit(partial(cluster_propagate, wr=12))
    planar8 = jax.device_put(np.asarray(rebuild(base8, lab0f)))
    report("cluster: one kernel hop", kern_c, planar8, starts_c)

    @jax.jit
    def scatter_min(lab, m):
        return lab.at[jnp.clip(lab, 0, nall - 1)].min(m)

    report("cluster: scatter-min hook", scatter_min, lab0, lab0)

    @jax.jit
    def jump(lab):
        return jnp.minimum(lab, jnp.take(lab, jnp.clip(lab, 0, nall - 1)))

    report("cluster: one pointer jump", jump, lab0)

    @jax.jit
    def jump4(lab):
        for _ in range(4):
            lab = jnp.minimum(lab, jnp.take(lab, jnp.clip(lab, 0, nall - 1)))
        return lab

    report("cluster: four pointer jumps", jump4, lab0)


if __name__ == "__main__":
    main()
