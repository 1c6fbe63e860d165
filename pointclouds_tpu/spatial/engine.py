"""Host-level neighbor engine: picks a backend and certifies exactness.

The grid-hash backend is exact only when its per-query certificates hold
(kth distance safely within one cell width, no candidate-cap overflow). This
thin host layer runs the jitted grid query, checks the returned flags (one
scalar sync), and retries — growing the candidate cap on overflow and the
cell on insufficiency — falling back to tiled brute force if the flags won't
clear. Every compiled variant is cached by (padded shape, k, M), and the
cell size is a dynamic argument, so cell-only retries cost no recompilation.

This mirrors how the reference guarantees exact KD-tree semantics
(ref: crates/spatial/src/kdtree.rs:64-135) while keeping the fast path fully
batched on the TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .grid import build_grid
from .knn import (
    bruteforce_knn,
    bruteforce_radius_count,
    grid_knn,
    grid_radius_count,
    grid_radius_neighbors,
)

# Below this many points the tiled brute-force matmul path is cheaper than
# building a grid (and is unconditionally exact).
BRUTE_THRESHOLD = 2048
M_LADDER = (16, 32, 64, 128)
MAX_TRIES = 4


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

    cell = estimate_cell_size(pxyz, pvalid, k)
    m_i = 0
    for _ in range(MAX_TRIES):
        m = M_LADDER[min(m_i, len(M_LADDER) - 1)]
        grid = build_grid(pxyz, pvalid, cell)
        dists, idx, nvalid, overflow, insufficient = grid_knn(
            grid, qxyz, qvalid, k, m
        )
        overflow = bool(overflow)
        insufficient = bool(insufficient)
        if not overflow and not insufficient:
            return dists, idx, nvalid
        if insufficient:
            cell *= 1.6
        if overflow:
            m_i += 1
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
    for attempt in range(MAX_TRIES):
        m = M_LADDER[min(attempt, len(M_LADDER) - 1)]
        grid = build_grid(pxyz, pvalid, cell)
        counts, overflow = grid_radius_count(grid, qxyz, qvalid, radius, m)
        if not bool(overflow):
            return counts
    return bruteforce_radius_count(pxyz, pvalid, qxyz, qvalid, radius)


def radius_neighbors(xyz, valid, radius: float):
    """Exact capped neighbor lists of each point within ``radius``
    (inclusive), for clustering. Returns (idx i32[N,C], within bool[N,C])."""
    ext = _extent(xyz, valid)
    max_abs = ext[2] if ext else 0.0
    cell = _fp_safe_radius_cell(radius, max_abs)
    for attempt in range(MAX_TRIES):
        m = M_LADDER[min(attempt, len(M_LADDER) - 1)]
        grid = build_grid(xyz, valid, cell)
        idx, within, overflow = grid_radius_neighbors(
            grid, xyz, valid, radius, m
        )
        if not bool(overflow):
            return idx, within
    # Last resort: biggest cap, accept (a single cell denser than 27*256
    # candidates at cell~r exceeds any practical LiDAR density).
    grid = build_grid(xyz, valid, cell)
    idx, within, _ = grid_radius_neighbors(
        grid, xyz, valid, radius, M_LADDER[-1] * 2
    )
    return idx, within
