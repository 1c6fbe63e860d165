#!/usr/bin/env python3
"""CPU analysis: how much candidate-row work would a larger query block
(256/512 queries per kernel grid cell) save in the sweep kernels?

For qb=128 the work is sum over blocks of 128 * total window rows.
For qb=256/512, adjacent blocks merge: each superblock's window (per
shift) spans from the min needed first-row to the max needed last-row of
its member blocks, re-deduped across shifts. Work = queries * rows.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointclouds_tpu.core.cloud import compaction_order, make_cloud_arrays
from pointclouds_tpu.ops.filters import voxel_downsample_masked
from pointclouds_tpu.ops.segmentation import ransac_plane_masked
from pointclouds_tpu.pipelines.scenes import aerial_scene, velodyne_scene
from pointclouds_tpu.spatial.sweep import _shift_offsets


def windows(xyz, valid, cell, table_size=1 << 21):
    """Replicate _sorted_structure's span computation, return per-block
    per-shift [first_row, last_row) plus nb."""
    xyz = np.asarray(xyz)
    valid = np.asarray(valid)
    finite = np.isfinite(xyz).all(axis=1)
    use = valid & finite
    c = np.floor(xyz / cell)
    c = np.clip(c, -1e9, 1e9).astype(np.int64)
    mn = np.min(np.where(use[:, None], c, 2**30), axis=0)
    rel = np.clip(c - mn[None, :], 0, None)
    mx = np.max(np.where(use[:, None], rel, 0), axis=0)
    extent = mx + 1
    lin = (rel[:, 0] * extent[1] + rel[:, 1]) * extent[2] + rel[:, 2]
    lin = np.where(use, np.clip(lin, 0, table_size - 1), table_size)
    order = np.argsort(lin, kind="stable")
    slin = lin[order]
    n = len(slin)
    npad = -(-n // 128) * 128
    slin_p = np.concatenate([slin, np.full(npad - n, table_size, np.int64)])
    nb = npad // 128
    sh = np.asarray(
        _shift_offsets(jnp.asarray(extent.astype(np.int32)))
    ).astype(np.int64)
    # prefix[v] = first sorted row with key >= v
    first_occ = np.full(table_size + 2, 2**30, np.int64)
    firsts = np.concatenate([[True], slin_p[1:] != slin_p[:-1]])
    first_occ[np.minimum(slin_p[firsts], table_size + 1)] = np.nonzero(
        firsts
    )[0]
    first_occ[-1] = min(first_occ[-1], len(slin_p))
    prefix = np.minimum.accumulate(first_occ[::-1])[::-1]
    n_use_rows = int(use.sum())
    lo = slin_p[: nb * 128].reshape(nb, 128)[:, 0]
    hi = slin_p[: nb * 128].reshape(nb, 128)[:, -1]
    a = np.clip(lo[:, None] + sh[None, :] - 1, 0, table_size)
    zhi = np.clip(hi[:, None] + sh[None, :] + 1, 0, table_size)
    fr = prefix[a]
    lr = np.minimum(prefix[zhi + 1], n_use_rows)
    return fr, lr, nb


def work(fr, lr, nb, qb_blocks):
    """Total (query x candidate-row) pairs with qb_blocks 128-rows of
    queries per superblock, windows quantized to 128-lane rows and
    deduped across shifts by sorted-coverage (cummax)."""
    nsb = -(-nb // qb_blocks)
    total = 0
    for s in range(nsb):
        m0, m1 = s * qb_blocks, min((s + 1) * qb_blocks, nb)
        f = fr[m0:m1].min(axis=0)
        l = lr[m0:m1].max(axis=0)
        start = np.clip(f // 128, 0, None)
        end = np.where(f >= l, start, -(-l // 128))
        # dedup across ascending shifts
        cover = 0
        rows = 0
        for j in range(len(start)):
            s0 = max(start[j], cover)
            rows += max(end[j] - s0, 0)
            cover = max(cover, end[j])
        total += (m1 - m0) * 128 * rows * 128
    return total


def main():
    # aerial: cluster (obstacles, cell ~2.0) and moments (centroids, 3.0)
    data = aerial_scene(seed=42, scale=1.0)
    arrs = make_cloud_arrays(data)
    cents, ds_valid = jax.jit(
        lambda x, v: voxel_downsample_masked(x, v, jnp.float32(0.5))
    )(arrs.xyz, arrs.valid)
    cents, ds_valid = np.asarray(cents), np.asarray(ds_valid)
    pn, d, inl = jax.jit(
        lambda x, v: ransac_plane_masked(
            x, v, jnp.float32(0.3), 0, 300, assume_compact=True
        )
    )(cents[:229376], ds_valid[:229376])
    mask = np.asarray(ds_valid[:229376]) & ~np.asarray(inl)
    order = np.asarray(compaction_order(jnp.asarray(mask)))
    obs = cents[:229376][order[:196608]]
    obsv = mask[order[:196608]]

    cases = [
        ("aerial moments cell=3.0", cents[:229376], ds_valid[:229376], 3.0),
        ("aerial cluster cell~2.0", obs, obsv, 2.0 * 1.00002 + 500 * 6e-7),
    ]
    kdata = velodyne_scene(seed=0, n_points=122_000)
    karrs = make_cloud_arrays(kdata)
    kc, kv = jax.jit(
        lambda x, v: voxel_downsample_masked(x, v, jnp.float32(0.15))
    )(karrs.xyz, karrs.valid)
    cases.append(
        ("kitti sor cell=0.6", np.asarray(kc)[:98304],
         np.asarray(kv)[:98304], 0.6)
    )

    for name, xyz, valid, cell in cases:
        fr, lr, nb = windows(xyz, valid, np.float32(cell))
        w1 = work(fr, lr, nb, 1)
        w2 = work(fr, lr, nb, 2)
        w4 = work(fr, lr, nb, 4)
        print(
            f"{name:28s} nb={nb:5d}  pairs qb128 {w1/1e9:6.2f}G  "
            f"qb256 {w2/1e9:6.2f}G ({w2/w1:.2f}x)  "
            f"qb512 {w4/1e9:6.2f}G ({w4/w1:.2f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
