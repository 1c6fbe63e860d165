"""Host-level neighbor engine: picks a backend and certifies exactness.

The cell-grid backend is exact only when its per-query certificates hold
(kth distance safely within one cell width, no block-cap truncation, cell
extents within the dense table). This thin host layer runs the jitted
queries, checks the returned flags (one scalar sync), and retries — growing
the per-cell cap on truncation and the cell on insufficiency — falling back
to tiled brute force (small clouds) or the exact int64 searchsorted engine
(gigantic extents) when the flags won't clear. Every compiled variant is
cached by (padded shape, k, M); the cell size is a dynamic argument, so
cell-only retries cost no recompilation.

This mirrors how the reference guarantees exact KD-tree semantics
(ref: crates/spatial/src/kdtree.rs:64-135) while keeping the fast path fully
batched on the TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .cellgrid import (
    build_cellgrid,
    cell_graph_adjacency,
    cell_graph_labels,
    point_knn,
    point_radius_count,
    slab_knn,
)
from .grid import build_grid
from .knn import (
    bruteforce_knn,
    bruteforce_radius_count,
    grid_knn,
    grid_radius_count,
    grid_radius_neighbors,
    radius_within_mask,
)

# Below this many points the tiled brute-force matmul path is cheaper than
# building a grid (and is unconditionally exact).
BRUTE_THRESHOLD = 2048
M_LADDER = (16, 32, 64, 128)
MAX_TRIES = 4
# The cell grid packs row ids into an f32 channel (exact only below 2^24);
# larger clouds route to the int64 searchsorted engine.
CELLGRID_MAX_N = 1 << 24


def _extent(xyz, valid):
    x = np.asarray(xyz)
    v = np.asarray(valid) & np.all(np.isfinite(x), axis=-1)
    if not v.any():
        return None
    pts = x[v]
    return (
        pts.min(axis=0),
        pts.max(axis=0),
        float(np.abs(pts).max()),
        int(v.sum()),
    )


def estimate_cell_size(xyz, valid, k: int) -> float:
    """Initial KNN cell size ~ the expected kth-neighbor distance.

    Blends 3D and 2D (nearly-planar LiDAR) density estimates: for uniform 3D
    density the kth-NN distance is spacing*(3k/4pi)^(1/3); for a plane it is
    spacing2d*sqrt(k/pi). A 1.25x margin avoids one retry in the common
    case; undershoot costs one cell-growth retry, overshoot one cap retry.
    """
    ext = _extent(xyz, valid)
    if ext is None:
        return 1.0
    mn, mx, _, n = ext
    span = np.maximum(mx - mn, 1e-12)
    vol = float(span[0] * span[1] * span[2])
    area = float(np.sort(span)[-2:].prod())  # two largest extents
    s3 = (vol / n) ** (1.0 / 3.0)
    s2 = (area / n) ** 0.5
    kf = max(k, 1)
    r3 = s3 * (3.0 * kf / (4.0 * np.pi)) ** (1.0 / 3.0)
    r2 = s2 * (kf / np.pi) ** 0.5
    return float(max(r3, r2, 1e-9) * 1.25)


def _fp_safe_radius_cell(radius: float, max_abs_coord: float) -> float:
    """Cell size slightly above ``radius`` so that f32 floor(p/cell)
    rounding can never push a true within-radius neighbor outside the
    27-cell neighborhood (the rounding error grows with |coordinate|/cell)."""
    return radius * (1.0 + 1e-5) + max_abs_coord * 6e-7


def _cell_cap(n: int) -> int:
    """Cells never outnumber points; round up to the chunking granularity."""
    return max(2048, -(-n // 2048) * 2048)


def knn(pxyz, pvalid, qxyz, qvalid, k: int):
    """Exact batched KNN: (dists f32[Q,k], idx i32[Q,k], nvalid bool[Q,k]).

    Self-matches are included (a query identical to a stored point returns
    it at distance 0), matching KD-tree behavior.
    """
    n = pxyz.shape[0]
    if k <= 0:
        raise ValueError("k must be >= 1 at the engine level")
    if n <= BRUTE_THRESHOLD or k >= n:
        return bruteforce_knn(pxyz, pvalid, qxyz, qvalid, k)
    if n >= CELLGRID_MAX_N:
        return _knn_int64(pxyz, pvalid, qxyz, qvalid, k)

    cell = estimate_cell_size(pxyz, pvalid, k)
    cap = _cell_cap(n)
    m_i = 0
    # Enough block slots that the 27-cell slab can hold k results at all.
    while 27 * M_LADDER[min(m_i, len(M_LADDER) - 1)] < k + 1:
        m_i += 1

    # Pass 1: main grid sized for the typical kth-neighbor radius; grow the
    # per-cell cap only (never the cell — occupancy rises cubically with
    # cell size, so a cell-growth retry ladder can never outrun it).
    grid = None
    for _ in range(MAX_TRIES):
        m = M_LADDER[min(m_i, len(M_LADDER) - 1)]
        g = build_cellgrid(pxyz, pvalid, cell, m_per_cell=m, cell_cap=cap)
        if bool(g.table_overflow):
            return bruteforce_knn(pxyz, pvalid, qxyz, qvalid, k)
        if not bool(g.overflow):
            grid = g
            break
        m_i += 1
    if grid is None:
        return bruteforce_knn(pxyz, pvalid, qxyz, qvalid, k)

    same_cloud = qxyz is pxyz and qvalid is pvalid
    if same_cloud:
        # Rebuild at a tight cell cap (slab size scales with the cap) and
        # take the two-stage slab path: per-cell slabs once, one large
        # slice per point.
        m = M_LADDER[min(m_i, len(M_LADDER) - 1)]
        tight = max(
            2048, 1 << int(np.ceil(np.log2(max(int(grid.num_cells), 1))))
        )
        if tight < cap:
            grid = build_cellgrid(
                pxyz, pvalid, cell, m_per_cell=m, cell_cap=tight
            )
        dists, idx, nvalid, point_ok = slab_knn(grid, qxyz, qvalid, k=k)
    else:
        dists, idx, nvalid, point_ok = point_knn(grid, qxyz, qvalid, k=k)
    flagged = np.asarray(jnp.logical_not(point_ok))
    n_flagged = int(flagged.sum())
    if n_flagged == 0:
        return dists, idx, nvalid

    # Pass 2: re-query only the uncertified minority (sparse/edge queries)
    # against a coarser grid. Coarse occupancy is bounded by growing M with
    # the cell volume; a coarse-grid block truncation would silently corrupt
    # results, so it forces the brute-force pass instead.
    rows = np.nonzero(flagged)[0]
    sub_cap = max(1024, 1 << int(np.ceil(np.log2(max(len(rows), 1)))))
    if sub_cap <= n:  # only worth it when the subset is a real subset
        rows_pad = np.zeros(sub_cap, np.int64)
        rows_pad[: len(rows)] = rows
        sub_valid = np.arange(sub_cap) < len(rows)
        sq = jnp.take(qxyz, jnp.asarray(rows_pad), axis=0)
        sv = jnp.logical_and(
            jnp.take(qvalid, jnp.asarray(rows_pad)), jnp.asarray(sub_valid)
        )
        coarse = build_cellgrid(
            pxyz, pvalid, cell * 2.5, m_per_cell=M_LADDER[-1], cell_cap=cap
        )
        if not bool(coarse.overflow) and not bool(coarse.table_overflow):
            d2_, i2_, v2_, ok2 = point_knn(coarse, sq, sv, k=k)
            dists = dists.at[jnp.asarray(rows_pad)].set(
                jnp.where(sv[:, None], d2_, jnp.take(dists, jnp.asarray(rows_pad), axis=0))
            )
            idx = idx.at[jnp.asarray(rows_pad)].set(
                jnp.where(sv[:, None], i2_, jnp.take(idx, jnp.asarray(rows_pad), axis=0))
            )
            nvalid = nvalid.at[jnp.asarray(rows_pad)].set(
                jnp.where(sv[:, None], v2_, jnp.take(nvalid, jnp.asarray(rows_pad), axis=0))
            )
            still = np.asarray(jnp.logical_and(sv, jnp.logical_not(ok2)))
            rows = rows_pad[np.nonzero(still)[0][: len(rows)]]
            rows = rows[: int(still.sum())]

    # Pass 3: brute force for whatever remains (rare: queries whose true
    # kth neighbor is beyond 2.5x the typical radius).
    if len(rows):
        sub_cap = max(1024, 1 << int(np.ceil(np.log2(len(rows)))))
        rows_pad = np.zeros(sub_cap, np.int64)
        rows_pad[: len(rows)] = rows
        sub_valid = np.arange(sub_cap) < len(rows)
        sq = jnp.take(qxyz, jnp.asarray(rows_pad), axis=0)
        sv = jnp.logical_and(
            jnp.take(qvalid, jnp.asarray(rows_pad)), jnp.asarray(sub_valid)
        )
        d3, i3, v3 = bruteforce_knn(pxyz, pvalid, sq, sv, k)
        dists = dists.at[jnp.asarray(rows_pad)].set(
            jnp.where(sv[:, None], d3, jnp.take(dists, jnp.asarray(rows_pad), axis=0))
        )
        idx = idx.at[jnp.asarray(rows_pad)].set(
            jnp.where(sv[:, None], i3, jnp.take(idx, jnp.asarray(rows_pad), axis=0))
        )
        nvalid = nvalid.at[jnp.asarray(rows_pad)].set(
            jnp.where(sv[:, None], v3, jnp.take(nvalid, jnp.asarray(rows_pad), axis=0))
        )
    return dists, idx, nvalid


def _knn_int64(pxyz, pvalid, qxyz, qvalid, k: int):
    """KNN via the int64 searchsorted grid (spatial/grid.py): the path for
    clouds too large for the cell grid's f32-packed row ids."""
    cell = estimate_cell_size(pxyz, pvalid, k)
    for _ in range(MAX_TRIES):
        for m in M_LADDER:
            grid = build_grid(pxyz, pvalid, cell)
            dists, idx, nvalid, overflow, insufficient = grid_knn(
                grid, qxyz, qvalid, k, m
            )
            flags = np.asarray(jnp.stack([overflow, insufficient]))
            if not flags.any():
                return dists, idx, nvalid
            if not flags[0]:  # no overflow, just too small a cell
                break
        cell *= 1.6
    return bruteforce_knn(pxyz, pvalid, qxyz, qvalid, k)


def radius_count(pxyz, pvalid, qxyz, qvalid, radius: float):
    """Exact count of points within ``radius`` (inclusive) of each query."""
    n = pxyz.shape[0]
    if radius <= 0 or not np.isfinite(radius):
        return jnp.zeros((qxyz.shape[0],), jnp.int32)
    if n <= BRUTE_THRESHOLD:
        return bruteforce_radius_count(pxyz, pvalid, qxyz, qvalid, radius)
    ext = _extent(pxyz, pvalid)
    max_abs = ext[2] if ext else 0.0
    cell = _fp_safe_radius_cell(radius, max_abs)
    if n >= CELLGRID_MAX_N:
        for attempt in range(MAX_TRIES):
            m = M_LADDER[min(attempt, len(M_LADDER) - 1)]
            grid = build_grid(pxyz, pvalid, cell)
            counts, overflow = grid_radius_count(grid, qxyz, qvalid, radius, m)
            if not bool(overflow):
                return counts
        return bruteforce_radius_count(pxyz, pvalid, qxyz, qvalid, radius)
    cap = _cell_cap(n)
    for attempt in range(MAX_TRIES):
        m = M_LADDER[min(attempt, len(M_LADDER) - 1)]
        grid = build_cellgrid(
            pxyz, pvalid, cell, m_per_cell=m, cell_cap=cap
        )
        if bool(grid.table_overflow):
            break
        if not bool(grid.overflow):
            return point_radius_count(grid, qxyz, qvalid, radius)
    return bruteforce_radius_count(pxyz, pvalid, qxyz, qvalid, radius)


def cluster_labels(xyz, valid, radius: float):
    """Connected-component labels under inclusive distance ``radius``
    (collapsed cell-graph propagation). Returns int32[N] labels in original
    point order (non-finite/invalid points keep their own row), or None if
    the grid backends can't certify exactness (caller falls back)."""
    n = xyz.shape[0]
    ext = _extent(xyz, valid)
    max_abs = ext[2] if ext else 0.0
    # cell = r/2 keeps the cell diagonal below r (same-cell points are all
    # mutually connected) with ring-2 adjacency; the fp-safety margin from
    # _fp_safe_radius_cell shrinks the cell instead of growing it here, so
    # apply the margin to the ring reach by slightly shrinking the cell.
    cell = radius * 0.5 * (1.0 - 1e-5) - max_abs * 3e-7
    if cell <= 0 or n >= CELLGRID_MAX_N:
        return None
    cap = _cell_cap(n)
    for attempt in range(MAX_TRIES):
        m = M_LADDER[min(attempt, len(M_LADDER) - 1)]
        grid = build_cellgrid(
            xyz, valid, cell, m_per_cell=m, cell_cap=cap, ring=2
        )
        if bool(grid.table_overflow):
            return None
        if bool(grid.overflow):
            continue
        adjacency = cell_graph_adjacency(grid, jnp.float32(radius))
        return cell_graph_labels(grid, adjacency)
    return None


def radius_indices(pxyz, pvalid, query, radius: float):
    """Original-order indices of valid points within ``radius`` (inclusive)
    of one query point, as a host int array (ascending — nonzero order).

    Single-query searches stream the whole cloud once on device
    (knn.radius_within_mask); only the [N] bool mask returns to host.
    """
    mask = np.asarray(
        radius_within_mask(
            pxyz, pvalid, jnp.asarray(query, jnp.float32), np.float32(radius)
        )
    )
    return np.nonzero(mask)[0]


def radius_neighbors(xyz, valid, radius: float):
    """Exact capped neighbor lists of each point within ``radius``
    (inclusive), for the label-propagation fallback. Returns
    (idx i32[N,C], within bool[N,C]), or None if no cap in the ladder can
    hold every true neighbor — truncated lists would silently break the
    exactness contract, so the caller must route to the uncapped
    brute-force path instead (ops/segmentation.bruteforce_cluster_labels).
    """
    ext = _extent(xyz, valid)
    max_abs = ext[2] if ext else 0.0
    cell = _fp_safe_radius_cell(radius, max_abs)
    grid = build_grid(xyz, valid, cell)
    for m in (*M_LADDER, M_LADDER[-1] * 2, M_LADDER[-1] * 4):
        idx, within, overflow = grid_radius_neighbors(
            grid, xyz, valid, radius, m
        )
        if not bool(overflow):
            return idx, within
    return None
