#!/usr/bin/env python3
"""Payload-carrying sorts vs argsort+[N,3]-gather across the three hot
front-ends (voxel downsample, sweep _sorted_structure, compaction).

Hypothesis from the committed-layout probe: [N, 3] f32 arrays tile as
(4, 128) with the minor axis padded 3 -> 128, so every row gather on
them streams ~42x the useful bytes. A lax.sort that carries x/y/z as
independent 1-D payload channels never gathers and never touches the
padded layout. Also A/Bs u32 relative cell keys (extent-packed) vs the
absolute 63-bit i64 keys for the voxel sort.

Each variant asserts output equality vs the current implementation on
the same inputs before timing.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from pointclouds_tpu.core.cloud import compaction_order
from pointclouds_tpu.ops.filters import voxel_downsample_masked
from pointclouds_tpu.pipelines.scenes import kitti_scene
from pointclouds_tpu.spatial.grid import INVALID_KEY, cell_coords, pack_cell_key

MARKER32 = jnp.uint32(0xFFFFFFFF)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def t(label, fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label:58s} {min(ts):9.2f} ms", flush=True)
    return out


# ── voxel variants ──────────────────────────────────────────────────────────


def _segments_tail(skey, sx, sy, sz, suse, n, invalid_key):
    scnt = suse.astype(jnp.float32)
    sx = jnp.where(suse, sx, 0.0)
    sy = jnp.where(suse, sy, 0.0)
    sz = jnp.where(suse, sz, 0.0)
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    is_end = jnp.concatenate([first[1:], jnp.ones((1,), bool)])

    def seg_op(a, b):
        return (
            jnp.logical_or(a[0], b[0]),
            b[1] + jnp.where(b[0], 0.0, a[1]),
            b[2] + jnp.where(b[0], 0.0, a[2]),
            b[3] + jnp.where(b[0], 0.0, a[3]),
            b[4] + jnp.where(b[0], 0.0, a[4]),
        )

    _, cx, cy, cz, ccnt = lax.associative_scan(
        seg_op, (first, sx, sy, sz, scnt), axis=0
    )
    ends = compaction_order(is_end).astype(jnp.int32)
    seg_totals = jnp.take(jnp.stack([cx, cy, cz, ccnt]), ends, axis=1)
    counts = seg_totals[3]
    nseg = jnp.sum(jnp.logical_and(first, suse).astype(jnp.int32))
    in_range = jnp.arange(n, dtype=jnp.int32) < nseg
    counts = jnp.where(in_range, counts, 0.0)
    centroids = jnp.transpose(seg_totals[:3] / jnp.maximum(counts, 1.0)[None, :])
    return centroids, counts > 0.0


@jax.jit
def voxel_payload64(xyz, valid, voxel_size):
    """Current i64 absolute keys, but payload-carrying sort (no gather)."""
    n = xyz.shape[0]
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    finite = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z)
    use = jnp.logical_and(valid, finite)
    key = jnp.where(use, pack_cell_key(cell_coords(xyz, voxel_size)), INVALID_KEY)
    skey, sx, sy, sz = lax.sort((key, x, y, z), num_keys=1, is_stable=True)
    suse = skey != INVALID_KEY
    return _segments_tail(skey, sx, sy, sz, suse, n, INVALID_KEY)


@jax.jit
def voxel_payload32(xyz, valid, voxel_size):
    """u32 extent-relative keys + payload sort. Returns (c, v, exact)."""
    n = xyz.shape[0]
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    finite = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z)
    use = jnp.logical_and(valid, finite)
    c = cell_coords(xyz, voxel_size)
    big32 = jnp.int32(2**30)
    mn = jnp.min(jnp.where(use[:, None], c, big32), axis=0)
    mn = jnp.minimum(mn, big32 - 1)
    rel = jnp.clip(c - mn[None, :], 0, None)
    mx = jnp.max(jnp.where(use[:, None], rel, 0), axis=0)
    ext64 = (mx + 1).astype(jnp.int64)
    total = ext64[0] * ext64[1] * ext64[2]
    exact = total < jnp.int64(2**32 - 1)
    lin64 = (
        rel[:, 0].astype(jnp.int64) * ext64[1] + rel[:, 1].astype(jnp.int64)
    ) * ext64[2] + rel[:, 2].astype(jnp.int64)
    key = jnp.where(use, lin64.astype(jnp.uint32), MARKER32)
    skey, sx, sy, sz = lax.sort((key, x, y, z), num_keys=1, is_stable=True)
    suse = skey != MARKER32
    cent, ov = _segments_tail(skey, sx, sy, sz, suse, n, MARKER32)
    return cent, ov, exact


# ── _sorted_structure front-end variants ────────────────────────────────────


@jax.jit
def front_current(xyz, valid, cell_size):
    """Mirror of _sorted_structure's sort+pack (argsort + row gather)."""
    n = xyz.shape[0]
    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    use = jnp.logical_and(valid, finite)
    c = jnp.floor(xyz / cell_size)
    c = jnp.clip(c, -1e9, 1e9).astype(jnp.int32)
    big32 = jnp.int32(2**30)
    mn = jnp.min(jnp.where(use[:, None], c, big32), axis=0)
    mn = jnp.minimum(mn, big32 - 1)
    rel = jnp.clip(c - mn[None, :], 0, None)
    mx = jnp.max(jnp.where(use[:, None], rel, 0), axis=0)
    ext64 = (mx + 1).astype(jnp.int64)
    table_size = 2**22
    lin64 = (
        rel[:, 0].astype(jnp.int64) * ext64[1] + rel[:, 1].astype(jnp.int64)
    ) * ext64[2] + rel[:, 2].astype(jnp.int64)
    lin = jnp.where(use, jnp.clip(lin64, 0, table_size - 1), table_size).astype(
        jnp.int32
    )
    order = jnp.argsort(lin, stable=True)
    slin = jnp.take(lin, order)
    sxyz = jnp.take(xyz, order, axis=0)
    suse = slin < table_size
    sxyz = jnp.where(suse[:, None], sxyz, 0.0)
    nrows = max(-(-n // 128), 1)
    planar = jnp.stack(
        [
            sxyz[:, 0].reshape(nrows, 128),
            sxyz[:, 1].reshape(nrows, 128),
            sxyz[:, 2].reshape(nrows, 128),
            suse.astype(jnp.float32).reshape(nrows, 128),
        ],
        axis=1,
    )
    inv = (
        jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    )
    return planar, slin, order.astype(jnp.int32), inv


@jax.jit
def front_payload(xyz, valid, cell_size):
    """Payload-carrying sort + inv via second sort (no gather/scatter)."""
    n = xyz.shape[0]
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    finite = jnp.isfinite(x) & jnp.isfinite(y) & jnp.isfinite(z)
    use = jnp.logical_and(valid, finite)
    c = jnp.floor(xyz / cell_size)
    c = jnp.clip(c, -1e9, 1e9).astype(jnp.int32)
    big32 = jnp.int32(2**30)
    mn = jnp.min(jnp.where(use[:, None], c, big32), axis=0)
    mn = jnp.minimum(mn, big32 - 1)
    rel = jnp.clip(c - mn[None, :], 0, None)
    mx = jnp.max(jnp.where(use[:, None], rel, 0), axis=0)
    ext64 = (mx + 1).astype(jnp.int64)
    table_size = 2**22
    lin64 = (
        rel[:, 0].astype(jnp.int64) * ext64[1] + rel[:, 1].astype(jnp.int64)
    ) * ext64[2] + rel[:, 2].astype(jnp.int64)
    lin = jnp.where(use, jnp.clip(lin64, 0, table_size - 1), table_size).astype(
        jnp.int32
    )
    iota = jnp.arange(n, dtype=jnp.int32)
    slin, sx, sy, sz, order = lax.sort(
        (lin, x, y, z, iota), num_keys=1, is_stable=True
    )
    suse = slin < table_size
    zero = jnp.float32(0.0)
    nrows = max(-(-n // 128), 1)
    susef = suse.astype(jnp.float32)
    planar = jnp.stack(
        [
            jnp.where(suse, sx, zero).reshape(nrows, 128),
            jnp.where(suse, sy, zero).reshape(nrows, 128),
            jnp.where(suse, sz, zero).reshape(nrows, 128),
            susef.reshape(nrows, 128),
        ],
        axis=1,
    )
    # inverse permutation via one more sortpair (scatter-free)
    _, inv = lax.sort((order, iota), num_keys=1, is_stable=True)
    return planar, slin, order, inv


# ── compaction variants ─────────────────────────────────────────────────────


@jax.jit
def compact_current(xyz, valid, keep):
    v = jnp.logical_and(valid, keep)
    order = compaction_order(v)
    return jnp.take(xyz, order, axis=0), jnp.take(v, order), jnp.sum(
        v.astype(jnp.int32)
    )


@jax.jit
def compact_payload(xyz, valid, keep):
    v = jnp.logical_and(valid, keep)
    key = jnp.where(v, jnp.uint32(0), jnp.uint32(1))
    skey, sx, sy, sz = lax.sort(
        (key, xyz[:, 0], xyz[:, 1], xyz[:, 2]), num_keys=1, is_stable=True
    )
    return (
        jnp.stack([sx, sy, sz], axis=1),
        skey == 0,
        jnp.sum(v.astype(jnp.int32)),
    )


def check_voxel(xyz, valid, vs):
    c0, v0 = jax.jit(voxel_downsample_masked)(xyz, valid, vs)
    c1, v1 = voxel_payload64(xyz, valid, vs)
    c2, v2, ex = voxel_payload32(xyz, valid, vs)
    v0, v1, v2 = (np.asarray(a) for a in (v0, v1, v2))
    c0, c1, c2 = (np.asarray(a) for a in (c0, c1, c2))
    assert bool(np.asarray(ex)), "u32 keyspace overflow on test scene"
    np.testing.assert_array_equal(v0, v1)
    np.testing.assert_array_equal(v0, v2)
    np.testing.assert_allclose(c0[v0], c1[v1], rtol=0, atol=0)
    np.testing.assert_allclose(c0[v0], c2[v2], rtol=0, atol=0)
    print("voxel variants: outputs identical", flush=True)


def check_front(xyz, valid, cell):
    p0, l0, o0, i0 = front_current(xyz, valid, cell)
    p1, l1, o1, i1 = front_payload(xyz, valid, cell)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    print("front variants: outputs identical", flush=True)


def check_compact(xyz, valid, keep):
    a0 = compact_current(xyz, valid, keep)
    a1 = compact_payload(xyz, valid, keep)
    n = int(np.asarray(a0[2]))
    np.testing.assert_array_equal(np.asarray(a0[0])[:n], np.asarray(a1[0])[:n])
    np.testing.assert_array_equal(np.asarray(a0[1]), np.asarray(a1[1]))
    print("compact variants: outputs identical (valid prefix)", flush=True)


def main():
    rng = np.random.default_rng(0)

    print("== correctness (small, this backend) ==", flush=True)
    small = (rng.random((4096, 3)) * 20).astype(np.float32)
    small[7] = np.nan
    sv = np.ones(4096, bool)
    sv[100:140] = False
    check_voxel(jnp.asarray(small), jnp.asarray(sv), jnp.float32(0.5))
    check_front(jnp.asarray(small), jnp.asarray(sv), jnp.float32(0.6))
    check_compact(
        jnp.asarray(small), jnp.asarray(sv), jnp.asarray(small[:, 0] < 10.0)
    )

    print("== KITTI 131K shapes ==", flush=True)
    scene = kitti_scene(seed=42, scale=1.8)[:122_000]
    pad = 131072 - scene.shape[0]
    xyz = jnp.asarray(np.vstack([scene, np.zeros((pad, 3), np.float32)]))
    valid = jnp.asarray(np.arange(131072) < scene.shape[0])
    vs = jnp.float32(0.15)
    t("voxel current (argsort+gather, i64 abs)", jax.jit(voxel_downsample_masked), xyz, valid, vs)
    t("voxel payload-sort i64 abs", voxel_payload64, xyz, valid, vs)
    t("voxel payload-sort u32 rel", voxel_payload32, xyz, valid, vs)
    cell = jnp.float32(0.6)
    t("front current (argsort+gather+scatter-inv)", front_current, xyz, valid, cell)
    t("front payload-sort (+sort-inv)", front_payload, xyz, valid, cell)

    print("== 1M shapes ==", flush=True)
    big = (rng.random((1_000_000, 3)) * 100).astype(np.float32)
    pad = 2**20 - big.shape[0]
    xyzb = jnp.asarray(np.vstack([big, np.zeros((pad, 3), np.float32)]))
    validb = jnp.asarray(np.arange(2**20) < big.shape[0])
    vsb = jnp.float32(0.5)
    t("voxel current 1M", jax.jit(voxel_downsample_masked), xyzb, validb, vsb)
    t("voxel payload-sort i64 1M", voxel_payload64, xyzb, validb, vsb)
    t("voxel payload-sort u32 1M", voxel_payload32, xyzb, validb, vsb)
    keep = xyzb[:, 0] < 50.0
    t("compact current 1M (sortpair + [N,3] gather)", compact_current, xyzb, validb, keep)
    t("compact payload-sort 1M", compact_payload, xyzb, validb, keep)
    keep131 = xyz[:, 0] < 10.0
    t("compact current 131K", compact_current, xyz, valid, keep131)
    t("compact payload-sort 131K", compact_payload, xyz, valid, keep131)


if __name__ == "__main__":
    main()
