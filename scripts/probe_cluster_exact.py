#!/usr/bin/env python3
"""Step 1 (TPU): run the bench KITTI pipeline, dump obstacle points to /tmp.
Step 2 (CPU, --analyze): load them, compute the sweep structure's block_ok
and the XLA-mirror propagation's convergence to attribute cluster_exact=False.
"""
import sys

sys.path.insert(0, ".")

import numpy as np

if "--analyze" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pointclouds_tpu.spatial import sweep as sw

    d = np.load("/tmp/obs_cloud.npz")
    xyz = jnp.asarray(d["xyz"])
    valid = jnp.asarray(d["valid"])
    radius = 0.8
    n = xyz.shape[0]
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    use_pre = jnp.logical_and(valid, finite)
    hi_abs = jnp.max(jnp.where(use_pre[:, None], jnp.abs(xyz), 0.0))
    cell_size = sw.cluster_cell_size(radius, float(hi_abs))
    for wr in (7, 9, 12, 16, 20):
        s = sw._sorted_structure(xyz, valid, cell_size, wr, sw.SWEEP_TABLE_SIZE)
        bo = np.asarray(s["block_ok"][: s["nb"]])
        print(f"wr={wr}: blocks={s['nb']} block_ok={int(bo.sum())} "
              f"bad={int((~bo).sum())} table_ovf={bool(np.asarray(s['table_overflow']))}")
    # Convergence through the XLA while-loop path (hop+hook+jump):
    lab, exact = sw.sweep_cluster_labels(
        xyz, valid, np.float32(radius), wr=16, use_kernel=False
    )
    print("xla path exact:", bool(np.asarray(exact)),
          "n_components:", len(np.unique(np.asarray(lab)[np.asarray(valid)])))
    sys.exit(0)

from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.pipelines.kitti import kitti_obstacle_pipeline
from pointclouds_tpu.pipelines.scenes import velodyne_scene

data = velodyne_scene(seed=0, n_points=122_000)
arrs = make_cloud_arrays(data)
out = kitti_obstacle_pipeline(
    arrs.xyz, arrs.valid, np.float32(0.15), np.float32(2.0),
    np.float32(0.15), 0, np.float32(0.8),
    sor_k=20, ransac_iters=500, sor_backend="sweep",
    ds_cap=98_304, ransac_subsample=4096,
)
obs_xyz = np.asarray(out.centroids)[np.asarray(out.obstacle_src)]
obs_valid = np.asarray(out.obstacle_valid)
np.savez("/tmp/obs_cloud.npz", xyz=obs_xyz, valid=obs_valid)
print("saved", obs_xyz.shape, int(obs_valid.sum()))
