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


def _kernel_auto(use_kernel):
    """None -> kernel on TPU, XLA mirror elsewhere. The kernel and its
    mirror are BITWISE-identical (pallas_kernels.segmented_scan_sums), so
    mixing them across platforms only shifts which backend computes."""
    if use_kernel is None:
        return jax.default_backend() == "tpu"
    return bool(use_kernel)


def _segment_sums(first, sx, sy, sz, scnt, use_kernel: bool):
    """Per-segment inclusive sums of (x, y, z, count); only segment-END
    values are consumed downstream. One Pallas pass replaces the 5-channel
    associative_scan (~1.9 ms standalone at 131K rows — ~2 log2 N combine
    passes with cross-lane relayouts)."""
    from ..spatial.pallas_kernels import (
        segmented_scan_sums,
        segmented_scan_sums_xla,
    )

    ff = first.astype(jnp.float32)
    if use_kernel:
        return segmented_scan_sums(ff, sx, sy, sz, scnt)
    return segmented_scan_sums_xla(ff, sx, sy, sz, scnt)


@partial(jax.jit, static_argnames=("use_kernel",))
def voxel_downsample_masked(xyz, valid, voxel_size, *,
                            use_kernel: bool | None = None):
    """Masked voxel-grid centroid downsample.

    Returns (centroids f32[N,3], out_valid bool[N]). Output voxels occupy the
    leading rows in ascending cell-key order — the same deterministic
    (ix, iy, iz) tuple ordering the reference produces by sorting hash-map
    keys (ref: crates/filters/src/voxel_downsample.rs:49-62). Non-finite
    points are skipped (ref :28-30).
    """
    use_kernel = _kernel_auto(use_kernel)
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

    # Per-segment sums via the one-pass segmented-scan kernel (XLA mirror
    # off-TPU — bitwise identical). The obvious jax.ops.segment_sum is a
    # million-element scatter-add (~90 ms at 1M points on TPU). A plain
    # cumsum+diff loses precision (the f32 prefix reaches ~1e7 where one
    # ulp is meters, and f64 scans are emulated and slow); the segmented
    # scan RESETS at every voxel boundary, so prefixes stay at per-voxel
    # magnitude and the result is a per-voxel-magnitude f32 accumulation
    # like the reference's.
    is_end = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    cx, cy, cz, ccnt = _segment_sums(first, sx, sy, sz, scnt, use_kernel)

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


@partial(jax.jit, static_argnames=("factor", "table_size", "use_kernel"))
def voxel_downsample_sweep_frontend(xyz, valid, voxel_size, *,
                                    factor: int = 3,
                                    table_size: int = 1 << 21,
                                    use_kernel: bool | None = None):
    """Voxel downsample whose output is ALREADY sorted for the SOR sweep.

    Same centroid VALUES as `voxel_downsample_masked` (identical per-voxel
    f32 accumulation order — members of a voxel are consecutive in both
    sorts), but rows come out in (sor-cell-major, voxel-minor) hierarchical
    key order, where the sor cell is ``factor`` voxels wide. The fused
    KITTI pipeline then builds the SOR sweep structure directly on these
    rows — no second 98K-row payload sort, no inverse permutation, no
    unsort gather (the round-3 profile charged ~3 ms/frame to exactly
    those; scripts/profile_sor_r4.py).

    Returns a dict:
      centroids f32[N, 3], out_valid bool[N]  (compacted, hierarchical order)
      slin      i32[N]   sor-cell linear id per row (ascending; table_size
                          sentinel on invalid rows)
      canon     i32[N]   canonical voxel rank (lex (ix,iy,iz) order — the
                          `voxel_downsample_masked` output order) for
                          order-sensitive consumers (RANSAC sampling parity)
      extent    i32[3]   sor-grid extent (for `_window_starts`)
      hi_cells  f32      |coord|/sor_cell bound (for the exactness margin)
      table_overflow bool, ds_overflow is the caller's slice check
    """
    use_kernel = _kernel_auto(use_kernel)
    n = xyz.shape[0]
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    finite = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z)
    use = jnp.logical_and(valid, finite)

    c = cell_coords(xyz, voxel_size)  # i32[N, 3], clamped packable range
    big32 = jnp.int32(2**30)
    mn_v = jnp.min(jnp.where(use[:, None], c, big32), axis=0)
    mn_v = jnp.minimum(mn_v, big32 - 1)
    rel = jnp.clip(c - mn_v[None, :], 0, None)  # voxel coords >= 0
    mx_rel = jnp.max(jnp.where(use[:, None], rel, 0), axis=0)
    ext_v = mx_rel + 1  # voxel-grid extent
    ext64 = ext_v.astype(jnp.int64)
    esc = mx_rel // factor + 1  # sor-grid extent
    esc64 = esc.astype(jnp.int64)
    # Both grids must stay addressable: the voxel rank key must fit i32
    # (it is factor^3 x the sor-cell count) and the sor grid must fit the
    # sweep's dense window table.
    table_overflow = jnp.logical_or(
        (esc64[0] * esc64[1] * esc64[2]) > table_size,
        (ext64[0] * ext64[1] * ext64[2]) > 2**31 - 2,
    )

    # Canonical voxel rank key: same lex (ix, iy, iz) order as
    # `pack_cell_key` (rel is a per-axis shift), in one i32 lane instead of
    # the generic op's packed i64.
    invalid32 = jnp.int32(2**31 - 1)
    ckey64 = (rel[:, 0].astype(jnp.int64) * ext64[1] + rel[:, 1]) * ext64[
        2
    ] + rel[:, 2]
    ckey = jnp.where(
        use, jnp.clip(ckey64, 0, 2**31 - 2).astype(jnp.int32), invalid32
    )

    # Sort 1 (CANONICAL order — identical valid-row positions to
    # `voxel_downsample_masked`'s sort, so the segmented scan's f32
    # combine tree regroups nothing: centroid values stay bitwise equal).
    skey, sx, sy, sz = jax.lax.sort(
        (ckey, x, y, z), num_keys=1, is_stable=True
    )
    suse = skey != invalid32
    sx = jnp.where(suse, sx, 0.0)
    sy = jnp.where(suse, sy, 0.0)
    sz = jnp.where(suse, sz, 0.0)
    scnt = suse.astype(jnp.float32)
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    is_end = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    cx, cy, cz, ccnt = _segment_sums(first, sx, sy, sz, scnt, use_kernel)

    # Sort 2: compaction — segment ends to the front in canonical order
    # (stable on ~is_end), the rank key riding along.
    dead = jnp.logical_not(is_end)
    _, ex_, ey_, ez_, ecnt, ekey = jax.lax.sort(
        (dead, cx, cy, cz, ccnt, skey), num_keys=1, is_stable=True
    )
    nseg = jnp.sum(first.astype(jnp.int32))
    in_range = jnp.arange(n, dtype=jnp.int32) < nseg
    counts = jnp.where(in_range, ecnt, 0.0)
    out_valid = counts > 0.0
    denom = jnp.maximum(counts, 1.0)
    cxm = ex_ / denom
    cym = ey_ / denom
    czm = ez_ / denom
    canon0 = jnp.where(out_valid, ekey, invalid32)

    # |coord| / sor_cell bound for the certificate margin (conservative).
    hi_v = jnp.max(
        jnp.maximum(jnp.abs(mn_v), jnp.abs(mn_v + ext_v)).astype(jnp.float32)
    )
    hi_cells = (hi_v + float(factor)) / float(factor)

    return dict(
        centroids_canon=jnp.stack([cxm, cym, czm], axis=1),
        out_valid=out_valid,
        canon=canon0,
        cxm=cxm,
        cym=cym,
        czm=czm,
        ext_v=ext_v,
        extent=esc,
        hi_cells=hi_cells,
        table_overflow=table_overflow,
    )


def voxel_scan_sor_epilogue(skey, sx, sy, sz, ext_v, esc, *, factor: int,
                            ds_cap: int, table_size: int,
                            use_kernel: bool | None = None):
    """Shared back half of `voxel_downsample_sweep_fused`: given rows
    ALREADY stably sorted by canonical voxel key (``skey`` ascending,
    invalid rows = 2^31-1 sentinel last, coords zeroed on invalid), run
    the segmented per-voxel mean scan and the single sor-order compaction
    sort. ``ext_v``/``esc`` are the voxel / sor grid extents the keys
    were linearized with (value-level — the tiled points-axis pipeline
    passes GLOBAL extents so per-tile keys stay mutually consistent).

    Returns dict(centroids f32[ds_cap, 3], out_valid bool[ds_cap],
    slin i32[ds_cap] ascending sor ids (table_size sentinel), canon
    i32[ds_cap], ds_overflow bool)."""
    use_kernel = _kernel_auto(use_kernel)
    invalid32 = jnp.int32(2**31 - 1)
    suse = skey != invalid32
    sx = jnp.where(suse, sx, 0.0)
    sy = jnp.where(suse, sy, 0.0)
    sz = jnp.where(suse, sz, 0.0)
    scnt = suse.astype(jnp.float32)
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    is_end = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    cx, cy, cz, ccnt = _segment_sums(first, sx, sy, sz, scnt, use_kernel)

    # Sort 2 (the ONLY post-scan sort): key = sor-cell linear id for
    # segment-end rows, table_size sentinel otherwise — one stable sort
    # compacts AND orders for the sweep (equal sor keys keep canonical
    # voxel order: the scan rows are already canonical).
    live = jnp.logical_and(is_end, suse)
    r0 = skey // (ext_v[1] * ext_v[2])
    r1 = (skey // ext_v[2]) % jnp.maximum(ext_v[1], 1)
    r2 = skey % jnp.maximum(ext_v[2], 1)
    lin_sc = ((r0 // factor) * esc[1] + r1 // factor) * esc[2] + r2 // factor
    lin_sc = jnp.clip(lin_sc, 0, table_size - 1)
    sorkey = jnp.where(live, lin_sc, jnp.int32(table_size))
    # Divide BEFORE the sort: the per-row mean is elementwise, so the
    # centroid values are bitwise identical either way, and the count
    # channel drops out of the n-row payload sort (6 -> 5 channels).
    denom_all = jnp.maximum(ccnt, 1.0)
    ekey, ex, ey, ez, ecanon = jax.lax.sort(
        (sorkey, cx / denom_all, cy / denom_all, cz / denom_all,
         jnp.where(live, skey, invalid32)),
        num_keys=1,
        is_stable=True,
    )
    nseg = jnp.sum(live.astype(jnp.int32))
    ds_overflow = nseg > ds_cap

    slin = ekey[:ds_cap]
    out_valid = slin != jnp.int32(table_size)
    centroids = jnp.stack(
        [
            jnp.where(out_valid, ex[:ds_cap], 0.0),
            jnp.where(out_valid, ey[:ds_cap], 0.0),
            jnp.where(out_valid, ez[:ds_cap], 0.0),
        ],
        axis=1,
    )
    return dict(
        centroids=centroids,
        out_valid=out_valid,
        slin=slin,
        canon=ecanon[:ds_cap],
        ds_overflow=ds_overflow,
    )


@partial(jax.jit, static_argnames=("factor", "ds_cap", "table_size",
                                   "use_kernel"))
def voxel_downsample_sweep_fused(xyz, valid, voxel_size, *, factor: int,
                                 ds_cap: int,
                                 table_size: int = 1 << 21,
                                 use_kernel: bool | None = None):
    """Voxel downsample emitting rows DIRECTLY in sor-cell-major sweep
    order, with ONE post-scan sort. Replaces the frontend + compaction +
    re-sort pair (`voxel_downsample_sweep_frontend` -> slice ->
    `sweep_sort_compacted`): the compaction key (segment ends first) and
    the sweep key (ascending sor cell) fold into a single stable sort —
    at the KITTI operating point that drops a full 98K-row 5-channel
    payload sort from the frame.

    Centroid VALUES are bitwise identical to `voxel_downsample_masked`
    (sort 1 and the segmented scan are unchanged). One semantic
    difference from the two-step path: when more voxels than ``ds_cap``
    exist, which ones are dropped differs (sweep-order tail, not
    canonical-order tail) — ds_overflow flags it either way and the
    pipelines assert it false.

    Returns a dict: centroids f32[ds_cap, 3], out_valid bool[ds_cap],
    slin i32[ds_cap] (ascending; table_size on invalid rows),
    canon i32[ds_cap], ds_overflow bool, extent i32[3], hi_cells f32,
    table_overflow bool.
    """
    n = xyz.shape[0]
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    finite = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z)
    use = jnp.logical_and(valid, finite)

    c = cell_coords(xyz, voxel_size)
    big32 = jnp.int32(2**30)
    mn_v = jnp.min(jnp.where(use[:, None], c, big32), axis=0)
    mn_v = jnp.minimum(mn_v, big32 - 1)
    rel = jnp.clip(c - mn_v[None, :], 0, None)
    mx_rel = jnp.max(jnp.where(use[:, None], rel, 0), axis=0)
    ext_v = mx_rel + 1
    ext64 = ext_v.astype(jnp.int64)
    esc = mx_rel // factor + 1
    esc64 = esc.astype(jnp.int64)
    table_overflow = jnp.logical_or(
        (esc64[0] * esc64[1] * esc64[2]) > table_size,
        (ext64[0] * ext64[1] * ext64[2]) > 2**31 - 2,
    )

    invalid32 = jnp.int32(2**31 - 1)
    ckey64 = (rel[:, 0].astype(jnp.int64) * ext64[1] + rel[:, 1]) * ext64[
        2
    ] + rel[:, 2]
    ckey = jnp.where(
        use, jnp.clip(ckey64, 0, 2**31 - 2).astype(jnp.int32), invalid32
    )

    # Sort 1 (CANONICAL order: identical per-voxel accumulation trees to
    # voxel_downsample_masked — centroids stay bitwise equal).
    skey, sx, sy, sz = jax.lax.sort(
        (ckey, x, y, z), num_keys=1, is_stable=True
    )
    ep = voxel_scan_sor_epilogue(
        skey, sx, sy, sz, ext_v, esc, factor=factor, ds_cap=ds_cap,
        table_size=table_size, use_kernel=use_kernel,
    )

    hi_v = jnp.max(
        jnp.maximum(jnp.abs(mn_v), jnp.abs(mn_v + ext_v)).astype(jnp.float32)
    )
    hi_cells = (hi_v + float(factor)) / float(factor)

    return dict(
        centroids=ep["centroids"],
        out_valid=ep["out_valid"],
        slin=ep["slin"],
        canon=ep["canon"],
        ds_overflow=ep["ds_overflow"],
        extent=esc,
        hi_cells=hi_cells,
        table_overflow=table_overflow,
        mn_v=mn_v,
    )


@partial(jax.jit, static_argnames=("factor", "table_size"))
def sweep_sort_compacted(cxm, cym, czm, canon, out_valid, ext_v, esc, *,
                         factor: int = 3, table_size: int = 1 << 21):
    """Sort 3 of the shared front end: the COMPACTED (and usually
    ds_cap-sliced) voxel rows into sor-cell-major sweep order. Returns
    (centroids f32[N,3], valid bool[N], slin i32[N], canon i32[N]) with
    slin ascending and invalid rows at the tail — `structure_from_sorted`
    input. The sor-cell id is decoded from the canonical rank key, so the
    grid is exactly the integer voxel grid coarsened by ``factor``."""
    invalid32 = jnp.int32(2**31 - 1)
    ck = jnp.where(out_valid, canon, 0)
    r0 = ck // (ext_v[1] * ext_v[2])
    r1 = (ck // ext_v[2]) % ext_v[1]
    r2 = ck % ext_v[2]
    lin_sc = ((r0 // factor) * esc[1] + r1 // factor) * esc[2] + r2 // factor
    lin_sc = jnp.clip(lin_sc, 0, table_size - 1)
    sorkey = jnp.where(out_valid, lin_sc, jnp.int32(table_size))
    skey, sx, sy, sz, scanon = jax.lax.sort(
        (sorkey, cxm, cym, czm, jnp.where(out_valid, canon, invalid32)),
        num_keys=1,
        is_stable=True,
    )
    svalid = skey != jnp.int32(table_size)
    return (
        jnp.stack(
            [
                jnp.where(svalid, sx, 0.0),
                jnp.where(svalid, sy, 0.0),
                jnp.where(svalid, sz, 0.0),
            ],
            axis=1,
        ),
        svalid,
        skey,
        scanon,
    )


def passthrough_mask(xyz, valid, axis_index: int, lo, hi):
    """Keep-mask for min <= v <= max and finite on one axis.

    (ref: crates/filters/src/passthrough.rs:3-23)
    """
    v = xyz[:, axis_index]
    keep = jnp.isfinite(v) & (v >= lo) & (v <= hi)
    return jnp.logical_and(valid, keep)


def sor_keep_mask_thr(mean_dists, valid, std_mul):
    """`sor_keep_mask` + the f64 threshold itself (for the keep-DECISION
    certificate: a flagged row whose mean LOWER bound exceeds thr is
    provably removed; one whose UPPER bound passes <= thr is provably
    kept — pipelines/kitti.py)."""
    finite = jnp.logical_and(valid, jnp.isfinite(mean_dists))
    # f64 accumulation: the threshold becomes insensitive (to ~1e-16
    # relative) to the reduction ORDER, so sharded/tiled executions that
    # psum per-shard partial sums (parallel/tiles.py) reproduce this
    # threshold bit-for-all-practical-purposes — keep decisions match the
    # unsharded run except for mean_dists within ~1e-16 of the threshold.
    md64 = mean_dists.astype(jnp.float64)
    n = jnp.maximum(jnp.sum(finite.astype(jnp.float64)), 1.0)
    mean = jnp.sum(jnp.where(finite, md64, 0.0)) / n
    var = jnp.sum(jnp.where(finite, (md64 - mean) ** 2, 0.0)) / n
    threshold = mean + std_mul * jnp.sqrt(var)
    keep = jnp.logical_and(valid, md64 <= threshold)
    # If no finite mean distances exist the reference returns an empty cloud
    # (ref :52-54); mean over zero samples would be 0 here, but the <= above
    # already fails for every point since all mean_dists are +inf.
    return keep, threshold


def sor_keep_mask(mean_dists, valid, std_mul):
    """Statistical-outlier keep mask from per-point mean neighbor distances.

    Global mean and *population* stddev are computed over finite mean
    distances only; points kept iff mean_dist <= mean + std_mul * std
    (ref: crates/filters/src/statistical_outlier.rs:43-66). Non-finite
    mean distances (isolated / non-finite points) always fail the <=.
    """
    return sor_keep_mask_thr(mean_dists, valid, std_mul)[0]


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
