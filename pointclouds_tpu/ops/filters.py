"""Filters: voxel downsample, passthrough, statistical/radius outlier removal.

TPU-native lowering of the reference filter crate:
- voxel downsample: hash-grid centroid accumulation with sorted-key output
  (ref: crates/filters/src/voxel_downsample.rs:12-65) becomes encode-cell-key
  -> sort -> segment-sum, which is all fused XLA.
- passthrough: range mask (ref: crates/filters/src/passthrough.rs:3-23).
- statistical outlier removal: per-point mean distance to k nearest
  neighbours, global mean + population stddev threshold
  (ref: crates/filters/src/statistical_outlier.rs:4-69), on top of the
  batched neighbor engine.
- radius outlier removal: neighbor count within radius, self included
  (ref: crates/filters/src/radius_outlier.rs:4-18).

All functions are jittable, operate on padded masked arrays, and return
keep-masks or masked clouds of fixed shape.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..spatial.grid import cell_coords, pack_cell_key, INVALID_KEY


@partial(jax.jit, static_argnames=())
def voxel_downsample_masked(xyz, valid, voxel_size):
    """Masked voxel-grid centroid downsample.

    Returns (centroids f32[N,3], out_valid bool[N]). Output voxels occupy the
    leading rows in ascending cell-key order — the same deterministic
    (ix, iy, iz) tuple ordering the reference produces by sorting hash-map
    keys (ref: crates/filters/src/voxel_downsample.rs:49-62). Non-finite
    points are skipped (ref :28-30).
    """
    n = xyz.shape[0]
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    finite = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z)
    use = jnp.logical_and(valid, finite)

    coords = cell_coords(xyz, voxel_size)
    key = jnp.where(use, pack_cell_key(coords), INVALID_KEY)

    # Payload-carrying stable sort: x/y/z ride the sort as independent 1-D
    # channels. The previous argsort + [N, 3] row gather streamed the
    # row-tiled layout (minor axis padded 3 -> 128) and cost 4.4x the
    # device time at 1M points (scripts/micro_sortpayload.py).
    skey, sx, sy, sz = jax.lax.sort(
        (key, x, y, z), num_keys=1, is_stable=True
    )
    suse = skey != INVALID_KEY
    sx = jnp.where(suse, sx, 0.0)
    sy = jnp.where(suse, sy, 0.0)
    sz = jnp.where(suse, sz, 0.0)
    scnt = suse.astype(jnp.float32)

    # Segment boundaries: a new segment starts where the sorted key changes.
    first = jnp.concatenate(
        [jnp.ones((1,), bool), skey[1:] != skey[:-1]]
    )

    # Per-segment sums via a SEGMENTED prefix scan + one gather at segment
    # ends, as a TUPLE of 1-D scans (measured: the 1-D tuple scan is ~1 ms
    # at 262K on TPU where the [N, 4] row scan costs ~10 ms — 2-D scan
    # orientations pay tile-relayout per step). The obvious
    # jax.ops.segment_sum is a million-element scatter-add (~90 ms at 1M
    # points on TPU). A plain cumsum+diff loses precision (the f32 prefix
    # reaches ~1e7 where one ulp is meters, and f64 scans are emulated and
    # slow); the segmented scan RESETS at every voxel boundary, so
    # prefixes stay at per-voxel magnitude and the result is the same f32
    # accumulation the reference performs.
    is_end = jnp.concatenate([first[1:], jnp.ones((1,), bool)])

    def seg_op(a, b):
        return (
            jnp.logical_or(a[0], b[0]),
            b[1] + jnp.where(b[0], 0.0, a[1]),
            b[2] + jnp.where(b[0], 0.0, a[2]),
            b[3] + jnp.where(b[0], 0.0, a[3]),
            b[4] + jnp.where(b[0], 0.0, a[4]),
        )

    _, cx, cy, cz, ccnt = jax.lax.associative_scan(
        seg_op, (first, sx, sy, sz, scnt), axis=0
    )

    # Compact segment totals to the leading rows with ONE payload-carrying
    # stable sort keyed by ~is_end (False sorts first, stability keeps the
    # ends in ascending-key order). The previous compaction_order +
    # [4, N]-source gather paid a second full sort AND a tiny-slice gather
    # (16 B per index — the catastrophic TPU gather layout): ~12 ms of the
    # 1M voxel op; the payload sort is ~3 ms.
    dead = jnp.logical_not(is_end)
    _, ex, ey, ez, ecnt = jax.lax.sort(
        (dead, cx, cy, cz, ccnt), num_keys=1, is_stable=True
    )
    nseg = jnp.sum(first.astype(jnp.int32))
    in_range = jnp.arange(n, dtype=jnp.int32) < nseg
    counts = jnp.where(in_range, ecnt, 0.0)

    denom = jnp.maximum(counts, 1.0)
    centroids = jnp.stack([ex / denom, ey / denom, ez / denom], axis=1)
    out_valid = counts > 0.0
    return centroids, out_valid


def passthrough_mask(xyz, valid, axis_index: int, lo, hi):
    """Keep-mask for min <= v <= max and finite on one axis.

    (ref: crates/filters/src/passthrough.rs:3-23)
    """
    v = xyz[:, axis_index]
    keep = jnp.isfinite(v) & (v >= lo) & (v <= hi)
    return jnp.logical_and(valid, keep)


def sor_keep_mask(mean_dists, valid, std_mul):
    """Statistical-outlier keep mask from per-point mean neighbor distances.

    Global mean and *population* stddev are computed over finite mean
    distances only; points kept iff mean_dist <= mean + std_mul * std
    (ref: crates/filters/src/statistical_outlier.rs:43-66). Non-finite
    mean distances (isolated / non-finite points) always fail the <=.
    """
    finite = jnp.logical_and(valid, jnp.isfinite(mean_dists))
    n = jnp.maximum(jnp.sum(finite.astype(jnp.float32)), 1.0)
    mean = jnp.sum(jnp.where(finite, mean_dists, 0.0)) / n
    var = jnp.sum(jnp.where(finite, (mean_dists - mean) ** 2, 0.0)) / n
    threshold = mean + std_mul * jnp.sqrt(var)
    keep = jnp.logical_and(valid, mean_dists <= threshold)
    # If no finite mean distances exist the reference returns an empty cloud
    # (ref :52-54); mean over zero samples would be 0 here, but the <= above
    # already fails for every point since all mean_dists are +inf.
    return keep


def sor_mean_dists_from_knn(neighbor_dists, neighbor_valid, query_finite):
    """Mean distance to up-to-k nearest non-self neighbours.

    ``neighbor_dists``/``neighbor_valid`` are [N, k+1] from a KNN query that
    includes the query point itself as its nearest result (distance 0). The
    first (self) column is skipped; if only one result exists, it is used
    as-is; zero results or a non-finite query give +inf
    (ref: crates/filters/src/statistical_outlier.rs:19-39).
    """
    counts = jnp.sum(neighbor_valid.astype(jnp.int32), axis=1)
    # Skip the self column unless it is the only result.
    skip_first = counts > 1
    use = jnp.where(skip_first[:, None], neighbor_valid.at[:, 0].set(False), neighbor_valid)
    denom = jnp.maximum(jnp.sum(use.astype(jnp.float32), axis=1), 1.0)
    mean = jnp.sum(jnp.where(use, neighbor_dists, 0.0), axis=1) / denom
    empty = counts == 0
    mean = jnp.where(jnp.logical_and(query_finite, jnp.logical_not(empty)), mean, jnp.inf)
    return mean
