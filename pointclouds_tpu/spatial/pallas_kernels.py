"""Pallas TPU kernels for the neighbor-engine hot paths.

The XLA formulation of SOR's k-smallest selection is HBM-bound: each of the
k+1 min-extraction iterations re-streams the [cells, M, 27M] distance array
from HBM (~300 GB per frame at KITTI scale -> ~300 ms). This kernel keeps
one cell's candidate slab resident in VMEM and runs the entire selection
on-chip, so HBM traffic drops to one read of the gathered slabs.

Mosaic constraints shaped the layout: every in-kernel tensor is 2D, with
queries on the lane axis ([1, M] slices) and candidates on the sublane axis
([CAND, 1] slices), so the [CAND, M] work matrix needs no transposes,
gathers, or >2D iota; masks are f32 0/1 (2D bool broadcasts fail to
lower); the "argmin" is a two-reduction min + first-match-index.

CPU tests run the same kernel with interpret=True
(tests/test_cellgrid.py::test_pallas_sor_select_matches_xla_backend).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# Planar arrays at or below this size stay fully VMEM-resident inside the
# window kernels (no per-block window DMAs). 8 MB leaves ample headroom on
# a v5e's VMEM next to the kernels' own scratch.
RESIDENT_PLANAR_BYTES = 8 * 1024 * 1024


def planar_resident_fits(n_points: int) -> bool:
    """True iff a cloud of ``n_points`` packs into a [NR, 4, 128] f32
    planar array small enough to hold VMEM-resident for a whole kernel.
    THE residency gate — every resident-kernel caller must route through
    here so the budget can't drift between copies."""
    nr = max(-(-int(n_points) // 128), 1)
    return nr * 4 * 128 * 4 <= RESIDENT_PLANAR_BYTES

# Relative inclusion band for two-phase kernels that re-derive d2 against a
# kth threshold (see the KNN-moments section comment): ~7 ulp, comfortably
# above any FMA-contraction jitter in a 3-term squared distance, far below
# any physically distinct neighbor distance.
D2_BAND = 8e-7


def _segmented_select_kernel(k: int, w: int, tq: int, per_seg: int):
    """Per-query sum/count/kth of the k smallest + segment certificate.

    Input block: work [TQ, W] (squared distances, +inf where invalid),
    W a multiple of 128. Segment s = lane s of each of the W/128 lane-tiles
    (stride-128 interleave, matching cellgrid._segmented_smallest_k).

    Phase 1 (segment extraction) is PURE ELEMENTWISE: the per-segment min
    is the elementwise minimum across the W/128 tiles, and removal is a
    sequential first-hit scan over those tiles — no cross-lane reductions
    at all. Phase 2 extracts the k smallest of the per_seg*128 finalists
    in the [candidates-on-sublanes, queries-on-lanes] orientation (the
    fast one for Mosaic reductions).

    Exact iff the certificate passes (see cellgrid._segmented_smallest_k);
    rows failing it return ok=0 and must be rescued by the caller.
    """
    ntiles = w // 128

    def kernel(w_ref, out_ref):
        big = jnp.float32(jnp.inf)
        tiles = [w_ref[:, i * 128 : (i + 1) * 128] for i in range(ntiles)]

        # count_all per query: elementwise finite-count summed across
        # tiles, then transposed and tree-summed over sublanes.
        cnt = jnp.zeros((tq, 128), jnp.float32)
        for t in tiles:
            cnt = cnt + jnp.where(jnp.isfinite(t), jnp.float32(1.0), jnp.float32(0.0))
        cnt_t = jnp.transpose(cnt, (1, 0))  # [128, TQ]
        count_all = jnp.sum(cnt_t, axis=0, keepdims=True)  # [1, TQ]

        # Phase 1: per_seg rounds of segment-min extraction.
        finalists = []
        for _ in range(per_seg):
            m = tiles[0]
            for t in tiles[1:]:
                m = jnp.minimum(m, t)
            finalists.append(m)
            taken = jnp.zeros((tq, 128), jnp.float32)
            new_tiles = []
            for t in tiles:
                hit = jnp.where(
                    jnp.logical_and(t == m, taken < 0.5),
                    jnp.float32(1.0),
                    jnp.float32(0.0),
                )
                new_tiles.append(jnp.where(hit > 0.5, big, t))
                taken = jnp.maximum(taken, hit)
            tiles = new_tiles

        seg_last = finalists[-1]  # [TQ, 128] per-segment per_seg-th value

        # Phase 2: k smallest of the finalists, candidates on sublanes.
        f = jnp.concatenate(
            [jnp.transpose(x, (1, 0)) for x in finalists], axis=0
        )  # [per_seg*128, TQ]
        nf = per_seg * 128
        rows = jax.lax.broadcasted_iota(jnp.int32, (nf, tq), 0)

        def body(_, state):
            fw, total, count, kth = state
            mn = jnp.min(fw, axis=0, keepdims=True)  # [1, TQ]
            ok = jnp.isfinite(mn)
            am = jnp.min(
                jnp.where(fw == mn, rows, jnp.int32(nf)),
                axis=0,
                keepdims=True,
            )
            total = total + jnp.where(ok, jnp.sqrt(jnp.maximum(mn, 0.0)), 0.0)
            count = count + jnp.where(ok, jnp.float32(1.0), jnp.float32(0.0))
            kth = jnp.where(ok, mn, kth)
            fw = jnp.where(rows == am, big, fw)
            return fw, total, count, kth

        zf = jnp.zeros((1, tq), jnp.float32)
        _, total, count, kth = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(k), body, (f, zf, zf, zf)
        )

        # Certificate: every segment's last extracted value >= kth, and as
        # many extracted as the true top-k holds.
        sl_t = jnp.transpose(seg_last, (1, 0))  # [128, TQ]
        cert1 = jnp.min(
            jnp.where(sl_t >= kth, jnp.float32(1.0), jnp.float32(0.0)),
            axis=0,
            keepdims=True,
        )
        cert2 = jnp.where(
            count >= jnp.minimum(jnp.float32(k), count_all),
            jnp.float32(1.0),
            jnp.float32(0.0),
        )
        ok_row = cert1 * cert2  # [1, TQ]

        out_ref[0:1, :] = total
        out_ref[1:2, :] = count
        out_ref[2:3, :] = kth
        out_ref[3:4, :] = ok_row

    return kernel


@partial(jax.jit, static_argnames=("k", "per_seg", "tq", "interpret"))
def segmented_select(work, *, k: int, per_seg: int = 4, tq: int = 256,
                     interpret: bool = False):
    """k-smallest selection over work rows [Q, W] (inf-masked squared
    distances). Returns (total f32[Q], count f32[Q], kth f32[Q], ok bool[Q]).
    Q must be a multiple of tq; W a multiple of 128.
    """
    q, w = work.shape
    assert q % tq == 0 and w % 128 == 0, (q, w)
    kern = _segmented_select_kernel(k, w, tq, per_seg)
    z = np.int32(0)
    out = pl.pallas_call(
        kern,
        grid=(q // tq,),
        in_specs=[pl.BlockSpec((tq, w), lambda i: (i, z))],
        out_specs=pl.BlockSpec((4, tq), lambda i: (z, i)),
        out_shape=jax.ShapeDtypeStruct((4, q), jnp.float32),
        interpret=interpret,
    )(work)
    return out[0], out[1], out[2], out[3] > 0.5


def _sor_select_kernel(k: int, ncand: int, m: int):
    def kernel(q_ref, qm_ref, cand_ref, cv_ref, total_ref, count_ref, kth_ref):
        # One cell per grid step. This exact formulation compiles under
        # Mosaic. Integer sentinels and loop bounds must be EXPLICIT i32:
        # the package enables x64, so a bare Python int becomes a weak i64[]
        # whose i64->i32 convert_element_type self-recurses in Mosaic's
        # _convert_helper (RecursionError at lowering).
        qx = q_ref[0, 0:1, :]  # [1, M]
        qy = q_ref[0, 1:2, :]
        qz = q_ref[0, 2:3, :]
        cx = cand_ref[0, :, 0:1]  # [CAND, 1]
        cy = cand_ref[0, :, 1:2]
        cz = cand_ref[0, :, 2:3]

        d2 = (cx - qx) ** 2 + (cy - qy) ** 2 + (cz - qz) ** 2  # [CAND, M]
        big = jnp.float32(jnp.inf)
        pair = cv_ref[0] * qm_ref[0]  # [CAND, M] f32 0/1 masks
        work = jnp.where(pair > 0.5, d2, big)

        rows = jax.lax.broadcasted_iota(jnp.int32, (ncand, m), 0)

        def body(_, state):
            w, total, count, kth = state
            mn = jnp.min(w, axis=0, keepdims=True)  # [1, M]
            ok = jnp.isfinite(mn)
            # First row attaining the minimum (argmin via two reductions so
            # exact duplicate distances extract one per iteration).
            am = jnp.min(
                jnp.where(w == mn, rows, jnp.int32(ncand)),
                axis=0,
                keepdims=True,
            )  # [1, M]
            total = total + jnp.where(
                ok, jnp.sqrt(jnp.maximum(mn, 0.0)), 0.0
            )
            count = count + ok.astype(jnp.int32)
            kth = jnp.where(ok, mn, kth)
            w = jnp.where(rows == am, big, w)
            return w, total, count, kth

        # One shared zeros tracer for both f32 carries: a second distinct
        # scalar-broadcast init fails to legalize under Mosaic.
        zf = jnp.zeros((1, m), jnp.float32)
        _, total, count, kth = jax.lax.fori_loop(
            jnp.int32(0),
            jnp.int32(k + 1),
            body,
            (work, zf, jnp.zeros((1, m), jnp.int32), zf),
        )
        total_ref[0] = total
        count_ref[0] = count
        kth_ref[0] = kth

    return kernel


@partial(jax.jit, static_argnames=("k", "interpret"))
def sor_select(q, qm, cand, cv, *, k: int, interpret: bool = False):
    """Per-cell k+1-smallest distance selection, VMEM-resident.

    q f32[C, 3, M] planar cell query blocks, qm bool[C, M],
    cand f32[C, CAND, 3] gathered candidate slabs, cv bool[C, CAND].
    Returns (total f32[C, M] sum of the k+1 smallest distances,
    count i32[C, M], kth_d2 f32[C, M] last extracted squared distance).
    """
    c, _, m = q.shape
    ncand = cand.shape[1]
    kern = _sor_select_kernel(k, ncand, m)
    # Index-map zeros must be np.int32: bare Python 0 becomes i64 under the
    # package's x64 mode, and i64 scalars in the lowered index computation
    # make Mosaic fail with "failed to legalize operation 'func.return'"
    # (this was round 1's "intermittent" remote-compile failure — it was
    # deterministic i64 leakage all along).
    z = np.int32(0)
    im = lambda i: (i, z, z)  # noqa: E731
    total, count, kth = pl.pallas_call(
        kern,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, 3, m), im),
            pl.BlockSpec((1, 1, m), im),
            pl.BlockSpec((1, ncand, 3), im),
            pl.BlockSpec((1, ncand, 1), im),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, m), im),
            pl.BlockSpec((1, 1, m), im),
            pl.BlockSpec((1, 1, m), im),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((c, 1, m), jnp.int32),
            jax.ShapeDtypeStruct((c, 1, m), jnp.float32),
        ],
        interpret=interpret,
    )(
        q,
        qm[:, None, :].astype(jnp.float32),
        cand,
        cv[:, :, None].astype(jnp.float32),
    )
    return total[:, 0, :], count[:, 0, :], kth[:, 0, :]


# ── Sorted-window sweep kernel ───────────────────────────────────────────────
#
# The gather-free SOR formulation (spatial/sweep.py): points sorted by
# linearized cell id (z fastest), packed 128-points-per-row planar
# [x*128 | y*128 | z*128 | w*128]. For a block of 128 consecutive sorted
# queries, the union of all 27-cell neighborhoods collapses into NINE
# CONTIGUOUS row windows (one per (dx, dy) shift; the three z-neighbors
# merge into the window). The kernel manually DMAs the 9 windows into VMEM
# (double-buffered across blocks), computes all squared distances, and runs
# the segmented k-smallest selection entirely on-chip. No gathers, no HBM
# intermediates: HBM traffic is one streamed read of ~9x the point array.


def _insert_smallest(regs, w):
    """Insertion network: fold tile ``w`` into the per-(query, segment)
    running smallest values ``regs`` (ascending). 2 ops per level — the
    cheapest exact way to track the per-segment smallest values across a
    tile stream (vs per_seg full extraction rounds). Multiset-correct with
    duplicates by construction."""
    cur = w
    out = []
    for r in regs:
        lo = jnp.minimum(r, cur)
        cur = jnp.maximum(r, cur)
        out.append(lo)
    return out


def _phase2_from_finalists(finalists, count_all, tq: int, k: int):
    """Extract the k smallest of the per-segment finalists and certify.

    finalists: list (len per_seg) of [TQ, 128] f32 (ascending per segment);
    count_all: [1, TQ] finite-candidate count over the full width.
    Returns (total, count, kth, ok) as [1, TQ] rows. ok certifies that the
    finalists provably contain the true top-k: every segment's per_seg-th
    value >= the kth overall, and as many were extracted as the true top-k
    holds."""
    big = jnp.float32(jnp.inf)
    per_seg = len(finalists)
    seg_last = finalists[-1]

    f = jnp.concatenate(
        [jnp.transpose(x, (1, 0)) for x in finalists], axis=0
    )  # [per_seg*128, TQ]
    nf = per_seg * 128
    rows = jax.lax.broadcasted_iota(jnp.int32, (nf, tq), 0)

    def body(_, state):
        fw, total, count, kth = state
        mn = jnp.min(fw, axis=0, keepdims=True)
        ok = jnp.isfinite(mn)
        am = jnp.min(
            jnp.where(fw == mn, rows, jnp.int32(nf)), axis=0, keepdims=True
        )
        total = total + jnp.where(ok, jnp.sqrt(jnp.maximum(mn, 0.0)), 0.0)
        count = count + jnp.where(ok, jnp.float32(1.0), jnp.float32(0.0))
        kth = jnp.where(ok, mn, kth)
        fw = jnp.where(rows == am, big, fw)
        return fw, total, count, kth

    zf = jnp.zeros((1, tq), jnp.float32)
    state = (f, zf, zf, zf)
    for _ in range(k):  # static unroll: no scalar loop in the hot path
        state = body(0, state)
    _, total, count, kth = state

    sl_t = jnp.transpose(seg_last, (1, 0))
    cert1 = jnp.min(
        jnp.where(sl_t >= kth, jnp.float32(1.0), jnp.float32(0.0)),
        axis=0,
        keepdims=True,
    )
    cert2 = jnp.where(
        count >= jnp.minimum(jnp.float32(k), count_all),
        jnp.float32(1.0),
        jnp.float32(0.0),
    )
    return total, count, kth, cert1 * cert2


def _select_from_tiles(tiles, tq: int, k: int, per_seg: int):
    """Shared segmented-selection body: ``tiles`` is a list of [TQ, 128]
    f32 squared-distance tiles (inf-masked); segment s = lane s across the
    tiles. Returns (total, count, kth, ok) as [1, TQ] rows (see
    `_segmented_select_kernel` for the certificate semantics)."""
    big = jnp.float32(jnp.inf)

    cnt = jnp.zeros((tq, 128), jnp.float32)
    for t in tiles:
        cnt = cnt + jnp.where(jnp.isfinite(t), jnp.float32(1.0), jnp.float32(0.0))
    count_all = jnp.sum(jnp.transpose(cnt, (1, 0)), axis=0, keepdims=True)

    regs = [jnp.full((tq, 128), big) for _ in range(per_seg)]
    for t in tiles:
        regs = _insert_smallest(regs, t)

    return _phase2_from_finalists(regs, count_all, tq, k)


def _sweep_select_kernel(k: int, wr: int, per_seg: int, nshift: int,
                         resident: bool):
    from jax.experimental.pallas import tpu as pltpu

    nwin = nshift * wr  # scratch rows per buffer slot

    def kernel(starts_ref, q_ref, pts_ref, out_ref, *scratch):
        # starts_ref i32[3*nshift + 1, NB] (TRANSPOSED so SMEM's row
        # padding stays tiny): rows [0, S) window start rows, [S, 2S) dedup
        # skip counts (rows an earlier window already read — masking them
        # keeps candidates a SET), [2S, 3S) window lengths (a window covers
        # rows [start + skip, start + len)), row 3S = block-has-valid flag.
        # resident=True: the whole planar array is a VMEM input and windows
        # are walked in place with DYNAMIC per-shift loop bounds — work
        # scales with the actual candidate count, not nshift * wr; else
        # windows are DMA'd at full wr (double-buffered) and masked.
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        big = jnp.float32(jnp.inf)
        bv = starts_ref[3 * nshift, b]

        if not resident:
            win, sems = scratch

            def dma(blk, j, slot):
                # All index arithmetic pinned to i32: under the package's
                # x64 mode a bare Python int is a weak i64 and Mosaic's
                # memref slicing rejects i64 operands.
                st = starts_ref[j, blk]
                return pltpu.make_async_copy(
                    pts_ref.at[pl.ds(st, wr), :, :],
                    win.at[
                        pl.ds(slot * jnp.int32(nwin) + jnp.int32(j * wr), wr),
                        :,
                        :,
                    ],
                    sems.at[slot, jnp.int32(j)],
                )

            # DMA issue/wait are conditioned on the TARGET block's valid
            # flag (consistent per block, so no semaphore leaks): fully
            # invalid blocks move no window bytes at all.
            @pl.when(jnp.logical_and(b == jnp.int32(0), bv != 0))
            def _():
                for j in range(nshift):
                    dma(jnp.int32(0), j, jnp.int32(0)).start()

            nxt_b = jnp.minimum(b + jnp.int32(1), nb - jnp.int32(1))

            @pl.when(
                jnp.logical_and(
                    b + jnp.int32(1) < nb, starts_ref[3 * nshift, nxt_b] != 0
                )
            )
            def _():
                nxt = jax.lax.rem(b + jnp.int32(1), jnp.int32(2))
                for j in range(nshift):
                    dma(nxt_b, j, nxt).start()

        @pl.when(bv == 0)
        def _():
            z = jnp.zeros((1, 128), jnp.float32)
            out_ref[0:1, :] = z
            out_ref[1:2, :] = z
            out_ref[2:3, :] = z
            out_ref[3:4, :] = z + jnp.float32(1.0)

        @pl.when(bv != 0)
        def _():
            # Queries: channel rows [1,128] (lane offset 0) -> [128,1].
            qx = jnp.transpose(q_ref[0, 0:1, :], (1, 0))
            qy = jnp.transpose(q_ref[0, 1:2, :], (1, 0))
            qz = jnp.transpose(q_ref[0, 2:3, :], (1, 0))
            qm = jnp.transpose(q_ref[0, 3:4, :], (1, 0))

            if resident:
                # Unrolled dynamic-bound walk: the per-trip fori overhead
                # (scalar control flow + bounds arithmetic) dominates the
                # ~17 elementwise VPU ops of real work per candidate row,
                # so each trip processes `unroll` rows; tail rows past the
                # window length are masked via the pair flag (their reads
                # are clamped in-bounds and their candidates land as inf).
                unroll = 2
                nmax = jnp.int32(pts_ref.shape[0] - 1)
                regs0 = tuple(
                    jnp.full((128, 128), big) for _ in range(per_seg)
                )
                state = (regs0, jnp.zeros((128, 128), jnp.float32))
                for j in range(nshift):
                    st = starts_ref[j, b]
                    sk = starts_ref[nshift + j, b]
                    ln = starts_ref[2 * nshift + j, b]

                    def body(i, s, st=st, sk=sk, ln=ln):
                        regs, cnt = s
                        for u in range(unroll):
                            r = sk + i * jnp.int32(unroll) + jnp.int32(u)
                            rd = jnp.minimum(st + r, nmax)
                            row = pts_ref[pl.ds(rd, 1), :, :]
                            cx = row[0, 0:1, :]
                            cy = row[0, 1:2, :]
                            cz = row[0, 2:3, :]
                            cw = row[0, 3:4, :]
                            live = jnp.where(
                                r < ln, jnp.float32(1.0), jnp.float32(0.0)
                            )
                            d2 = (
                                (qx - cx) ** 2
                                + (qy - cy) ** 2
                                + (qz - cz) ** 2
                            )
                            pair = qm * (cw * live)  # exact 0/1 product
                            w = jnp.where(pair > 0.5, d2, big)
                            regs = tuple(_insert_smallest(list(regs), w))
                            cnt = cnt + pair
                        return (regs, cnt)

                    ntrips = jax.lax.div(
                        ln - sk + jnp.int32(unroll - 1), jnp.int32(unroll)
                    )
                    state = jax.lax.fori_loop(
                        jnp.int32(0), ntrips, body, state
                    )
                regs, cnt = state
                count_all = jnp.sum(
                    jnp.transpose(cnt, (1, 0)), axis=0, keepdims=True
                )
                total, count, kth, ok = _phase2_from_finalists(
                    list(regs), count_all, 128, k
                )
            else:
                slot = jax.lax.rem(b, jnp.int32(2))
                for j in range(nshift):
                    dma(b, j, slot).wait()
                base = slot * jnp.int32(nwin)
                tiles = []
                for j in range(nshift):
                    sk = starts_ref[nshift + j, b]
                    ln = starts_ref[2 * nshift + j, b]
                    for r in range(wr):
                        row = win[pl.ds(base + jnp.int32(j * wr + r), 1), :, :]
                        cx = row[0, 0:1, :]  # [1, 128], lane offset 0
                        cy = row[0, 1:2, :]
                        cz = row[0, 2:3, :]
                        cw = row[0, 3:4, :]
                        d2 = (qx - cx) ** 2 + (qy - cy) ** 2 + (qz - cz) ** 2
                        keep = jnp.where(
                            jnp.logical_and(
                                jnp.int32(r) >= sk, jnp.int32(r) < ln
                            ),
                            jnp.float32(1.0),
                            jnp.float32(0.0),
                        )
                        pair = qm * cw * keep  # [128,1]*[1,128]*scalar
                        tiles.append(jnp.where(pair > 0.5, d2, big))

                total, count, kth, ok = _select_from_tiles(
                    tiles, 128, k, per_seg
                )
            out_ref[0:1, :] = total
            out_ref[1:2, :] = count
            out_ref[2:3, :] = kth
            out_ref[3:4, :] = ok

    return kernel


@partial(jax.jit, static_argnames=("k", "wr", "per_seg", "interpret"))
def sweep_select(pts_planar, starts, *, k: int, wr: int = 4, per_seg: int = 4,
                 interpret: bool = False):
    """Fused window-gather + k-smallest selection over sorted planar points.

    pts_planar f32[NR, 4, 128]: row r = points [128r, 128r+128) as channel
    rows [x | y | z | w], w = 1.0 valid / 0.0 masked. (Channels on the
    sublane axis keep every in-kernel slice at lane offset 0 — Mosaic
    cannot broadcast lane-offset slices of dynamically-indexed rows.)
    starts i32[NB, 3S + 1]: per query-block window start rows (cols [0, S),
    each in [0, NR - wr]), dedup skip counts (cols [S, 2S)), window lengths
    (cols [2S, 3S); a window covers rows [start+skip, start+len)), and the
    block-has-valid flag (col 3S); query block b = planar row b (NB <= NR;
    trailing rows are candidates only).

    Returns (total f32[NB*128], count f32[NB*128], kth f32[NB*128],
    ok bool[NB*128]): sum of the k smallest valid distances per query, the
    count extracted, the kth squared distance, and the segment certificate
    (exact iff ok; window-length certification is the caller's).
    """
    from jax.experimental.pallas import tpu as pltpu

    nr, nch, width = pts_planar.shape
    nb = starts.shape[0]
    nshift = (starts.shape[1] - 1) // 3
    assert (nch, width) == (4, 128) and nb <= nr and nr >= wr, (
        pts_planar.shape,
        starts.shape,
    )
    starts = jnp.transpose(starts)  # [2S, NB]: SMEM pads rows, not columns
    # Clouds whose planar array fits comfortably in VMEM skip the window
    # DMAs entirely and read candidates in place (same trick as
    # cluster_propagate); larger clouds keep the double-buffered DMA path.
    resident = planar_resident_fits(nr * 128)
    kern = _sweep_select_kernel(k, wr, per_seg, nshift, resident)
    z = np.int32(0)
    pts_spec = (
        pl.BlockSpec((nr, 4, 128), lambda b, starts_ref: (z, z, z))
        if resident
        else pl.BlockSpec(memory_space=pl.ANY)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 4, 128), lambda b, starts_ref: (b, z, z)),
            pts_spec,
        ],
        out_specs=pl.BlockSpec((4, 128), lambda b, starts_ref: (z, b)),
        scratch_shapes=[]
        if resident
        else [
            pltpu.VMEM((2 * nshift * wr, 4, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nshift)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, nb * 128), jnp.float32),
        interpret=interpret,
    )(starts, pts_planar, pts_planar)
    return out[0], out[1], out[2], out[3] > 0.5


ROWS_STATIC_UNROLL_CAP = 16  # full static unroll at or below this cap


def _sweep_select_rows_kernel(k: int, cap: int, per_seg: int):
    static = cap <= ROWS_STATIC_UNROLL_CAP

    def kernel(rows_ref, q_ref, pts_ref, out_ref):
        # rows_ref i32[cap + 2, NB] (transposed): rows [0, cap) are the
        # block's candidate row ids into pts_ref (pad slots point at the
        # all-masked pad row), row cap = block-has-valid flag, row cap+1 =
        # true row count (<= cap). The flat row list replaces the 9
        # dynamic-bound window loops: small caps are STATICALLY UNROLLED
        # (no scalar loops at all); larger caps run ONE fori_loop with
        # 4-slot trips (over-read slots hit the pad row, w = 0).
        b = pl.program_id(0)
        big = jnp.float32(jnp.inf)
        bv = rows_ref[cap, b]

        @pl.when(bv == 0)
        def _():
            z = jnp.zeros((1, 128), jnp.float32)
            out_ref[0:1, :] = z
            out_ref[1:2, :] = z
            out_ref[2:3, :] = z
            out_ref[3:4, :] = z + jnp.float32(1.0)

        @pl.when(bv != 0)
        def _():
            qx = jnp.transpose(q_ref[0, 0:1, :], (1, 0))
            qy = jnp.transpose(q_ref[0, 1:2, :], (1, 0))
            qz = jnp.transpose(q_ref[0, 2:3, :], (1, 0))
            qm = jnp.transpose(q_ref[0, 3:4, :], (1, 0))

            def visit(t, state):
                regs, cnt = state
                rid = rows_ref[t, b]
                row = pts_ref[pl.ds(rid, 1), :, :]
                cx = row[0, 0:1, :]
                cy = row[0, 1:2, :]
                cz = row[0, 2:3, :]
                cw = row[0, 3:4, :]
                d2 = (qx - cx) ** 2 + (qy - cy) ** 2 + (qz - cz) ** 2
                pair = qm * cw  # exact 0/1 product
                w = jnp.where(pair > 0.5, d2, big)
                return list(_insert_smallest(regs, w)), cnt + pair

            regs = [jnp.full((128, 128), big) for _ in range(per_seg)]
            cnt = jnp.zeros((128, 128), jnp.float32)
            if static:
                state = (regs, cnt)
                for t in range(cap):
                    state = visit(jnp.int32(t), state)
                regs, cnt = state
            else:
                unroll = 4

                def trip(i, state):
                    for u in range(unroll):
                        state = visit(
                            i * jnp.int32(unroll) + jnp.int32(u), state
                        )
                    return state

                nrows_b = rows_ref[cap + 1, b]
                ntrips = jax.lax.div(
                    nrows_b + jnp.int32(unroll - 1), jnp.int32(unroll)
                )
                regs, cnt = jax.lax.fori_loop(
                    jnp.int32(0), ntrips, trip, (regs, cnt)
                )

            count_all = jnp.sum(
                jnp.transpose(cnt, (1, 0)), axis=0, keepdims=True
            )
            total, count, kth, ok = _phase2_from_finalists(
                regs, count_all, 128, k
            )
            out_ref[0:1, :] = total
            out_ref[1:2, :] = count
            out_ref[2:3, :] = kth
            out_ref[3:4, :] = ok

    return kernel


@partial(jax.jit, static_argnames=("k", "cap", "per_seg", "interpret"))
def sweep_select_rows(pts_padded, rowlist, *, k: int, cap: int,
                      per_seg: int = 4, interpret: bool = False):
    """`sweep_select` with a flat per-block candidate ROW LIST instead of
    the 9 (start, skip, len) windows.

    pts_padded f32[NR + 1, 4, 128]: planar cloud with an ALL-MASKED pad
    row appended at index NR (w = 0). rowlist i32[NB, cap + 2]: per query
    block, ``cap`` candidate row ids (pad slots = NR), the
    block-has-valid flag, and the true row count. Blocks whose true
    candidate rows exceed ``cap`` must be marked not-ok by the caller's
    certificate (their extra rows are simply absent here — results are
    upper bounds).

    Returns (total, count, kth, ok) over [NB*128] like `sweep_select`.
    """
    from jax.experimental.pallas import tpu as pltpu

    nr1, nch, width = pts_padded.shape
    nb = rowlist.shape[0]
    assert (nch, width) == (4, 128) and rowlist.shape[1] == cap + 2, (
        pts_padded.shape,
        rowlist.shape,
    )
    # Dynamic-loop caps must be unroll-aligned so the 4-slot trips never
    # read past the id columns.
    assert cap <= ROWS_STATIC_UNROLL_CAP or cap % 4 == 0, cap
    kern = _sweep_select_rows_kernel(k, cap, per_seg)
    z = np.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 4, 128), lambda b, rows_ref: (b, z, z)),
            pl.BlockSpec((nr1, 4, 128), lambda b, rows_ref: (z, z, z)),
        ],
        out_specs=pl.BlockSpec((4, 128), lambda b, rows_ref: (z, b)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, nb * 128), jnp.float32),
        interpret=interpret,
    )(jnp.transpose(rowlist), pts_padded, pts_padded)
    return out[0], out[1], out[2], out[3] > 0.5


# ── Rescue kernel: AABB-pruned brute force over the resident sorted cloud ──
#
# Pass-2 of the sweep SOR (spatial/sweep.py): queries flagged by pass 1
# (kth neighbor beyond one cell width / window overflow / segment cert) are
# re-resolved EXACTLY against the whole cloud. The sorted planar array
# (~2 MB at KITTI scale) is VMEM-resident for the entire kernel; per query
# block, only candidate row-GROUPS whose bounding box lies within the
# rescue radius of the block's bounding box are visited (the host computes
# the active-group lists — compute scales with the true neighborhood, not
# the cloud). Replaces the coarse block-grid rescue: no second grid build,
# no per-cell occupancy caps, no candidate truncation.


def _rescue_select_kernel(k: int, per_seg: int, gr: int, ng: int):
    def kernel(active_ref, q_ref, cand_ref, out_ref):
        # active_ref i32[QB, 1+NG]: col 0 = number of active groups, cols
        # 1.. = active group indices (ascending; garbage beyond count).
        b = pl.program_id(0)
        big = jnp.float32(jnp.inf)

        qm_row = q_ref[0, 3:4, :]
        bv = jnp.max(qm_row)

        # Flagged queries are front-compacted: whole trailing blocks are
        # padding — skip their group walk entirely (same gate as the
        # sibling rescue kernels).
        @pl.when(bv <= 0.5)
        def _():
            z = jnp.zeros((1, 128), jnp.float32)
            out_ref[0:1, :] = z
            out_ref[1:2, :] = z
            out_ref[2:3, :] = z
            out_ref[3:4, :] = z + jnp.float32(1.0)

        @pl.when(bv > 0.5)
        def _():
            _rescue_select_body(
                active_ref, q_ref, cand_ref, out_ref, b, k, per_seg, gr
            )

    return kernel


def _rescue_select_body(active_ref, q_ref, cand_ref, out_ref, b, k, per_seg,
                        gr):
    qx = jnp.transpose(q_ref[0, 0:1, :], (1, 0))  # [128, 1]
    qy = jnp.transpose(q_ref[0, 1:2, :], (1, 0))
    qz = jnp.transpose(q_ref[0, 2:3, :], (1, 0))
    qm = jnp.transpose(q_ref[0, 3:4, :], (1, 0))
    _rescue_walk_store(
        active_ref, cand_ref, out_ref, b, qx, qy, qz, qm, k, per_seg, gr
    )


def _rescue_walk_store(active_ref, cand_ref, out_ref, b, qx, qy, qz, qm,
                       k, per_seg, gr):
    """Shared rescue hot loop: walk the block's active candidate groups,
    insert-select, phase-2 extract, store the [4, 128] result row."""
    big = jnp.float32(jnp.inf)

    def group_step(t, state):
        regs, cnt = state
        g = active_ref[b, jnp.int32(1) + t]
        base = g * jnp.int32(gr)
        for r in range(gr):
            row = cand_ref[pl.ds(base + jnp.int32(r), 1), :, :]
            cx = row[0, 0:1, :]
            cy = row[0, 1:2, :]
            cz = row[0, 2:3, :]
            cw = row[0, 3:4, :]
            d2 = (qx - cx) ** 2 + (qy - cy) ** 2 + (qz - cz) ** 2
            pair = qm * cw  # exact 0/1 product
            w = jnp.where(pair > 0.5, d2, big)
            regs = _insert_smallest(regs, w)
            cnt = cnt + pair
        return regs, cnt

    regs0 = [jnp.full((128, 128), big) for _ in range(per_seg)]
    cnt0 = jnp.zeros((128, 128), jnp.float32)
    regs, cnt = jax.lax.fori_loop(
        jnp.int32(0),
        active_ref[b, 0].astype(jnp.int32),
        group_step,
        (regs0, cnt0),
    )

    count_all = jnp.sum(jnp.transpose(cnt, (1, 0)), axis=0, keepdims=True)
    total, count, kth, ok = _phase2_from_finalists(regs, count_all, 128, k)
    out_ref[0:1, :] = total
    out_ref[1:2, :] = count
    out_ref[2:3, :] = kth
    out_ref[3:4, :] = ok


@partial(jax.jit, static_argnames=("k", "per_seg", "gr", "interpret"))
def rescue_select(cand_planar, q_planar, active, *, k: int, per_seg: int = 3,
                  gr: int = 8, interpret: bool = False):
    """Exact k-smallest selection of each query against the pruned cloud.

    cand_planar f32[NR, 4, 128] (NR a multiple of gr): the sorted planar
    cloud, VMEM-resident for the whole kernel.
    q_planar f32[QB, 4, 128]: query blocks (w channel = validity).
    active i32[QB, 1+NG]: per block, the count and ascending indices of
    candidate row-groups to visit (NG = NR / gr). Soundness contract: a
    pruned group must contain no candidate within the caller's rescue
    radius of any query in the block — the caller certifies with
    kth <= radius^2 afterwards.

    Returns (total, count, kth, ok) over [QB*128] queries like
    `sweep_select` (ok = segment certificate only).
    """
    from jax.experimental.pallas import tpu as pltpu

    nr, nch, width = cand_planar.shape
    qb = q_planar.shape[0]
    ng = nr // gr
    assert (nch, width) == (4, 128) and nr % gr == 0, cand_planar.shape
    assert active.shape == (qb, 1 + ng), (active.shape, qb, ng)
    kern = _rescue_select_kernel(k, per_seg, gr, ng)
    z = np.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(qb,),
        in_specs=[
            pl.BlockSpec((1, 4, 128), lambda b, active_ref: (b, z, z)),
            # Whole cloud VMEM-resident for every grid step (explicit
            # identity index map: the auto-generated transform for an
            # unblocked VMEM spec emits i64 indices Mosaic rejects).
            pl.BlockSpec((nr, 4, 128), lambda b, active_ref: (z, z, z)),
        ],
        out_specs=pl.BlockSpec((4, 128), lambda b, active_ref: (z, b)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, qb * 128), jnp.float32),
        interpret=interpret,
    )(active, q_planar, cand_planar)
    return out[0], out[1], out[2], out[3] > 0.5


# ── Cluster label propagation kernel ─────────────────────────────────────────
#
# Euclidean clustering as iterated min-label propagation DIRECTLY on the
# cell-sorted points (spatial/sweep.sweep_cluster_labels): per 128-query
# block, read the 9 contiguous windows from the VMEM-RESIDENT planar
# array (cluster-scale clouds fit whole: 8 MB at 262K points — window
# DMAs would re-stream ~1 GB per hop) and take, for each query, the
# minimum label among candidates within the cluster radius. The host loop
# alternates kernel hops with root hooking + pointer jumping until no
# label changes — 3-5 iterations. Replaces the collapsed cell-graph
# (adjacency matrix + per-cell gathers): no cell grid, no [C, 125]
# adjacency, no per-iteration 1M-element gathers.


def _cluster_propagate_kernel(wr: int, nshift: int):
    def kernel(starts_ref, q_ref, pts_ref, out_ref):
        # q/pts rows: channels [x, y, z, w, label, r2, 0, 0].
        # starts_ref i32[3*nshift + 2, NB] (transposed): starts / skips /
        # lengths / block-valid / block-ACTIVE. Skips are unused
        # (duplicated candidates are harmless to min); per-shift loops run
        # start..start+len with DYNAMIC bounds, so work scales with the
        # actual candidate count. The active flag implements frontier
        # skipping: a block none of whose window rows saw a label change
        # last iteration would recompute exactly its previous result
        # (labels only decrease), so it passes labels through untouched —
        # after a few hops only frontier blocks pay for distance
        # recomputation.
        b = pl.program_id(0)
        bv = starts_ref[3 * nshift, b]
        act = starts_ref[3 * nshift + 1, b]
        run = jnp.logical_and(bv != 0, act != 0)

        @pl.when(jnp.logical_not(run))
        def _():
            # Invalid or inactive block: labels pass through unchanged.
            out_ref[0:1, :] = q_ref[0, 4:5, :]
            out_ref[1:2, :] = jnp.zeros((1, 128), jnp.float32)

        @pl.when(run)
        def _():
            qx = jnp.transpose(q_ref[0, 0:1, :], (1, 0))  # [128, 1]
            qy = jnp.transpose(q_ref[0, 1:2, :], (1, 0))
            qz = jnp.transpose(q_ref[0, 2:3, :], (1, 0))
            qm = jnp.transpose(q_ref[0, 3:4, :], (1, 0))
            qlab = jnp.transpose(q_ref[0, 4:5, :], (1, 0))
            r2 = q_ref[0, 5:6, :]  # [1, 128] (whole channel holds r2)

            biglab = jnp.float32(float(1 << 25))
            best0 = jnp.where(qm > 0.5, qlab, biglab)  # [128, 1]
            best = best0
            for j in range(nshift):
                st = starts_ref[j, b]
                ln = starts_ref[2 * nshift + j, b]

                def body(r, best, st=st):
                    row = pts_ref[pl.ds(st + r, 1), :, :]
                    cx = row[0, 0:1, :]
                    cy = row[0, 1:2, :]
                    cz = row[0, 2:3, :]
                    cw = row[0, 3:4, :]
                    clab = row[0, 4:5, :]
                    d2 = (qx - cx) ** 2 + (qy - cy) ** 2 + (qz - cz) ** 2
                    pair = qm * cw  # [128, 128] f32 0/1
                    within = jnp.where(
                        jnp.logical_and(pair > 0.5, d2 <= r2),
                        clab + 0.0 * d2,
                        biglab,
                    )
                    # (clab broadcasts [1,128] over queries; + 0*d2 keeps
                    # the where operands shape-aligned at [128,128].)
                    return jnp.minimum(
                        best, jnp.min(within, axis=1, keepdims=True)
                    )

                best = jax.lax.fori_loop(jnp.int32(0), ln, body, best)

            changed = jnp.where(
                jnp.logical_and(qm > 0.5, best < qlab),
                jnp.float32(1.0),
                jnp.float32(0.0),
            )  # [128, 1]
            out_ref[0:1, :] = jnp.transpose(best, (1, 0))
            out_ref[1:2, :] = jnp.transpose(changed, (1, 0))

    return kernel


@partial(jax.jit, static_argnames=("wr", "interpret"))
def cluster_propagate(pts_planar, starts, *, wr: int = 7,
                      interpret: bool = False):
    """One min-label hop over the sorted windows.

    pts_planar f32[NR, 8, 128]: channels [x, y, z, w, label, r2, 0, 0]
    (w = validity, label = current component label as exact-int f32, r2 =
    squared cluster radius broadcast); held fully VMEM-resident. starts
    i32[NB, 3S + 2] as in `sweep_select` plus a trailing per-block ACTIVE
    column (skip columns unused; length columns bound the dynamic
    per-shift loops; inactive blocks pass labels through).

    Returns (labels f32[NB*128] new per-query labels, changed f32[NB*128]
    1.0 where a label decreased).
    """
    from jax.experimental.pallas import tpu as pltpu

    nr, nch, width = pts_planar.shape
    nb = starts.shape[0]
    nshift = (starts.shape[1] - 2) // 3
    assert (nch, width) == (8, 128) and nb <= nr and nr >= wr, (
        pts_planar.shape,
        starts.shape,
    )
    starts = jnp.transpose(starts)  # [3S+2, NB]
    kern = _cluster_propagate_kernel(wr, nshift)
    z = np.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda b, starts_ref: (b, z, z)),
            pl.BlockSpec((nr, 8, 128), lambda b, starts_ref: (z, z, z)),
        ],
        out_specs=pl.BlockSpec((2, 128), lambda b, starts_ref: (z, b)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, nb * 128), jnp.float32),
        interpret=interpret,
    )(starts, pts_planar, pts_planar)
    return out[0], out[1]


# ── Multi-sweep cluster kernel: the whole propagation loop on-chip ──────────
#
# The hop-per-dispatch formulation above pays the XLA loop-body tax every
# iteration (label-array gathers, planar rebuild, pallas-call boundaries:
# ~12 ms/hop at 262K where the hop kernel alone is ~3.5 ms). This kernel
# runs the ENTIRE connected-components iteration inside one pallas call:
#
# - grid (sweeps+1, NB), executed sequentially on the TPU: t = 0
#   initializes a persistent VMEM label scratch (labels = sorted
#   positions as exact-int f32); each t >= 1 is one full min-label sweep.
# - SERPENTINE block order (forward on even t, backward on odd): within a
#   sweep, later blocks read labels already lowered by earlier blocks
#   (Gauss-Seidel, not Jacobi) — min labels race through monotone chains
#   in ONE sweep per direction, so real scenes converge in a handful of
#   alternating sweeps instead of a diameter-bound hop count. Stale-vs-
#   fresh interleaving is sound: labels only decrease, and min-
#   propagation tolerates any interleaving.
# - An SMEM change counter per sweep short-circuits converged tails:
#   once a full sweep makes no change (the fixpoint proof: at a full-
#   sweep fixpoint every within-radius pair has equal labels), remaining
#   sweeps degrade to per-block label copies.
#
# Outputs per block (written at every visit; last visit wins): row 0 the
# current labels, row 1 the per-lane changed flags of the block's final
# running sweep — a zero total certifies convergence, which the caller
# folds into `exact`.


def _cluster_multisweep_kernel(cap: int, nb: int, nr: int):
    def kernel(rows_ref, pts_ref, r2_ref, out_ref, lab_ref, cnt_ref,
               blk_ref):
        # rows_ref i32[cap + 2, NB]: per block, ``cap`` candidate row ids
        # into the padded planar array (pad slots point at the all-masked
        # pad row nr), the block-valid flag, and the true row count. The
        # flat row list replaces the 9 dynamic-bound window loops in BOTH
        # the frontier test (static-unrolled SMEM flag reads) and the
        # label walk (one fori_loop with 4-slot trips) — the old per-shift
        # scalar loops dominated the converged sweeps' cost.
        # r2_ref holds radius^2 broadcast over one row.
        # blk_ref i32[2*(nr+1)]: double-buffered per-ROW changed flags —
        # the FRONTIER (the pad row nr is pinned 0 in both buffers). A
        # block whose candidate rows saw no label change in the previous
        # sweep would recompute its exact previous result, so it passes
        # through untouched; once the wave of merges localizes (sweep 3+
        # on real scenes), each sweep touches only the blocks adjacent to
        # actual changes instead of all of them.
        t = pl.program_id(0)
        b = pl.program_id(1)
        bs = jax.lax.rem(t, jnp.int32(2)) * (jnp.int32(nb - 1) - 2 * b) + b
        biglab = jnp.float32(float(1 << 25))
        zrow = jnp.zeros((1, 128), jnp.float32)

        @pl.when(t == 0)
        def _():
            base = (bs * jnp.int32(128)).astype(jnp.float32)
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(jnp.float32)
            lab_ref[pl.ds(bs, 1), :] = base + iota
            out_ref[0:1, :] = base + iota
            out_ref[1:2, :] = zrow
            blk_ref[bs] = jnp.int32(1)  # sweep 1 reads buffer 0: all live
            blk_ref[nr + 1 + bs] = jnp.int32(0)

            @pl.when(b == 0)
            def _():
                cnt_ref[0] = jnp.int32(1)  # force sweep 1 to run
                cnt_ref[1] = jnp.int32(1)

                # Padding rows (>= nb) and the pad row nr never change
                # labels: pin both frontier buffers to 0 there, once.
                def zr(r, c):
                    blk_ref[r] = jnp.int32(0)
                    blk_ref[nr + 1 + r] = jnp.int32(0)
                    return c

                jax.lax.fori_loop(
                    jnp.int32(nb), jnp.int32(nr + 1), zr, jnp.int32(0)
                )

        @pl.when(t > 0)
        def _():
            cur = jax.lax.rem(t, jnp.int32(2))
            prev = 1 - cur
            pbase = prev * jnp.int32(nr + 1)

            @pl.when(b == 0)
            def _():
                cnt_ref[cur] = jnp.int32(0)

            qlab = lab_ref[pl.ds(bs, 1), :]  # [1, 128]
            bv = rows_ref[cap, bs]
            glive = jnp.logical_and(bv != 0, cnt_ref[prev] != 0)

            # Frontier test: OR of the previous sweep's changed flags
            # over this block's candidate rows — static-unrolled SMEM
            # reads (pad slots read the pinned-zero pad entry).
            acc = jnp.int32(0)
            for s_ in range(cap):
                acc = acc | blk_ref[pbase + rows_ref[s_, bs]]
            live = jnp.logical_and(glive, acc != 0)

            @pl.when(jnp.logical_not(live))
            def _():
                out_ref[0:1, :] = qlab
                out_ref[1:2, :] = zrow
                blk_ref[cur * jnp.int32(nr + 1) + bs] = jnp.int32(0)

            @pl.when(live)
            def _():
                row_q = pts_ref[pl.ds(bs, 1), :, :]
                qx = jnp.transpose(row_q[0, 0:1, :], (1, 0))  # [128, 1]
                qy = jnp.transpose(row_q[0, 1:2, :], (1, 0))
                qz = jnp.transpose(row_q[0, 2:3, :], (1, 0))
                qm = jnp.transpose(row_q[0, 3:4, :], (1, 0))
                qlab_t = jnp.transpose(qlab, (1, 0))  # [128, 1]
                r2 = r2_ref[0:1, :]  # [1, 128] broadcast of radius^2

                # Lane-carry min over the flat row list: one fori_loop
                # with 4-slot trips (the old 9 per-shift dynamic loops
                # paid 9 scalar-loop setups per live block). Per-lane
                # running label mins stay elementwise in the loop and
                # reduce over lanes ONCE after the walk. The caller
                # pre-masks invalid coordinates to 1e9 and appends a
                # 1e9-coordinate PAD row at index nr; pad/over-read slots
                # point there (d2 >> r2 excludes them) — no per-row
                # validity/live mask arithmetic at all.
                unroll = 4
                qmb = qm > 0.5  # [128, 1] query-validity broadcast
                best_l0 = jnp.full((128, 128), biglab, jnp.float32)

                def body(i, best_l):
                    for u in range(unroll):
                        rd = rows_ref[i * jnp.int32(unroll) + jnp.int32(u), bs]
                        rowp = pts_ref[pl.ds(rd, 1), :, :]
                        rowl = lab_ref[pl.ds(rd, 1), :]  # [1, 128]
                        cx = rowp[0, 0:1, :]
                        cy = rowp[0, 1:2, :]
                        cz = rowp[0, 2:3, :]
                        d2 = (
                            (qx - cx) ** 2
                            + (qy - cy) ** 2
                            + (qz - cz) ** 2
                        )
                        within = jnp.where(
                            jnp.logical_and(qmb, d2 <= r2),
                            rowl + 0.0 * d2,  # label bcast over queries
                            biglab,
                        )
                        best_l = jnp.minimum(best_l, within)
                    return best_l

                nrows_b = rows_ref[cap + 1, bs]
                ntrips = jax.lax.div(
                    nrows_b + jnp.int32(unroll - 1), jnp.int32(unroll)
                )
                best_l = jax.lax.fori_loop(
                    jnp.int32(0), ntrips, body, best_l0
                )
                best = jnp.minimum(
                    jnp.where(qm > 0.5, qlab_t, biglab),
                    jnp.min(best_l, axis=1, keepdims=True),
                )

                # The intra-row closure below is only needed when this
                # sweep's window pass actually lowered a label (or on the
                # block's first running sweep, to close the iota init):
                # one closure application reaches the row-internal
                # fixpoint, so an unimproved row is already closed from
                # the sweep that last changed it. Skipping the 7 MXU
                # squarings + masks for live-but-unimproved blocks
                # (frontier granularity is whole windows, so most live
                # blocks receive nothing) is the multisweep's main saving.
                impr = jnp.sum(
                    jnp.where(
                        jnp.transpose(best, (1, 0)) < qlab,
                        jnp.float32(1.0),
                        jnp.float32(0.0),
                    )
                ).astype(jnp.int32)
                need_close = jnp.logical_or(impr > 0, t == 1)

                @pl.when(jnp.logical_not(need_close))
                def _():
                    out_ref[0:1, :] = qlab
                    out_ref[1:2, :] = zrow
                    blk_ref[cur * jnp.int32(nr + 1) + bs] = jnp.int32(0)

                @pl.when(need_close)
                def _():
                    # Intra-row transitive closure: block-internal
                    # propagation would otherwise be Jacobi (one edge per
                    # sweep — a chain along one row would need up to 127
                    # sweeps). Build the row's own adjacency tile and
                    # square it log2(128) = 7 times on the MXU (0/1 sums
                    # <= 128 are exact in bf16), then one masked-min
                    # application collapses every row-internal chain this
                    # sweep.
                    cxo = row_q[0, 0:1, :]
                    cyo = row_q[0, 1:2, :]
                    czo = row_q[0, 2:3, :]
                    cwo = row_q[0, 3:4, :]
                    d2o = (
                        (qx - cxo) ** 2 + (qy - cyo) ** 2 + (qz - czo) ** 2
                    )
                    adj = jnp.where(
                        jnp.logical_and(qm * cwo > 0.5, d2o <= r2),
                        jnp.float32(1.0),
                        jnp.float32(0.0),
                    )
                    for _ in range(7):
                        adj = jnp.where(
                            jax.lax.dot(adj, adj) > 0.5,
                            jnp.float32(1.0),
                            jnp.float32(0.0),
                        )
                    best_row = jnp.transpose(best, (1, 0))  # [1, 128]
                    closed = jnp.where(
                        adj > 0.5, best_row + 0.0 * adj, biglab
                    )
                    bestc = jnp.minimum(
                        best, jnp.min(closed, axis=1, keepdims=True)
                    )

                    newlab_t = jnp.minimum(qlab_t, bestc)
                    newlab = jnp.transpose(newlab_t, (1, 0))  # [1, 128]
                    ch = jnp.where(
                        newlab < qlab, jnp.float32(1.0), jnp.float32(0.0)
                    )
                    lab_ref[pl.ds(bs, 1), :] = newlab
                    chs = jnp.sum(ch).astype(jnp.int32)
                    cnt_ref[cur] = cnt_ref[cur] + chs
                    blk_ref[cur * jnp.int32(nr + 1) + bs] = jnp.where(
                        chs > 0, jnp.int32(1), jnp.int32(0)
                    )
                    out_ref[0:1, :] = newlab
                    out_ref[1:2, :] = ch

    return kernel


@partial(jax.jit, static_argnames=("cap", "sweeps", "interpret"))
def cluster_multisweep(pts_planar, rowlist, r2, *, cap: int,
                       sweeps: int = 12, interpret: bool = False):
    """Full connected-components propagation in one pallas call.

    pts_planar f32[NR, 4, 128] (x, y, z, w); rowlist i32[NB, cap + 2]
    (flat per-block candidate row lists from `_window_row_lists` with
    nmax = NR: ids, block-valid flag, true row count; blocks overflowing
    ``cap`` must fail the caller's exactness certificate); r2 the squared
    cluster radius (static-ish float). Returns
    (labels f32[NB*128] in SORTED order, changed f32[NB*128] per-lane
    flags of each block's final sweep — all-zero certifies convergence).
    """
    from jax.experimental.pallas import tpu as pltpu

    nr, nch, width = pts_planar.shape
    nb = rowlist.shape[0]
    assert (nch, width) == (4, 128) and nb <= nr, (
        pts_planar.shape,
        rowlist.shape,
    )
    assert rowlist.shape[1] == cap + 2 and cap % 4 == 0, (
        rowlist.shape, cap,
    )
    r2row = jnp.broadcast_to(
        jnp.asarray(r2, jnp.float32)[None, None], (1, 128)
    )
    rows_t = jnp.transpose(rowlist)  # [cap+2, NB]
    # Pre-mask invalid coordinates to 1e9 and append a 1e9 PAD row at
    # index nr: pad/over-read slots in the row lists point there and
    # d2 > r2 excludes them — no per-row validity/live arithmetic in the
    # hot loop.
    big = jnp.float32(1e9)
    w = pts_planar[:, 3:4, :]
    pts_masked = jnp.concatenate(
        [jnp.where(w > 0.5, pts_planar[:, :3, :], big), w], axis=1
    )
    pad_row = jnp.concatenate(
        [
            jnp.full((1, 3, 128), big, jnp.float32),
            jnp.zeros((1, 1, 128), jnp.float32),
        ],
        axis=1,
    )
    pts_padded = jnp.concatenate([pts_masked, pad_row], axis=0)
    kern = _cluster_multisweep_kernel(cap, nb, nr)
    z = np.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(sweeps + 1, nb),
        in_specs=[
            pl.BlockSpec((nr + 1, 4, 128), lambda t, b, s: (z, z, z)),
            pl.BlockSpec((1, 128), lambda t, b, s: (z, z)),
        ],
        out_specs=pl.BlockSpec(
            (2, 128),
            lambda t, b, s: (
                z,
                jax.lax.rem(t, jnp.int32(2))
                * (jnp.int32(nb - 1) - jnp.int32(2) * b)
                + b,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((nr + 1, 128), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((2 * (nr + 1),), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, nb * 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(rows_t, pts_padded, r2row)
    return out[0], out[1]


# ── Windows-walk multisweep (dense-workload fallback) ───────────────────
#
# The pre-row-list propagation kernel (9 dynamic per-shift window
# loops): kept as the second attempt for workloads whose per-block
# candidate row unions exceed the flat row-list cap (dense aerial
# clusters at r=2.0, percolating slabs) — the row-list kernel fails
# its `fits` certificate there, and degrading straight to the
# cell-graph/brute paths measured 113-2000 ms where this kernel
# does the same frames in ~30-110 ms (round-3 numbers).

def _cluster_multisweep_windows_kernel(nshift: int, nb: int, nr: int,
                                       resume: bool = False):
    def kernel(starts_ref, pts_ref, r2_ref, *rest):
        if resume:
            lab0_ref, out_ref, lab_ref, cnt_ref, blk_ref = rest
        else:
            lab0_ref = None
            out_ref, lab_ref, cnt_ref, blk_ref = rest
        # starts_ref i32[3*nshift + 1, NB]: starts / skips / lengths /
        # block-valid; r2_ref holds radius^2 broadcast over one row.
        # blk_ref i32[2*nr]: double-buffered per-ROW changed flags — the
        # FRONTIER. A block whose windows saw no label change in the
        # previous sweep would recompute its exact previous result, so it
        # passes through untouched; once the wave of merges localizes
        # (sweep 3+ on real scenes), each sweep touches only the blocks
        # adjacent to actual changes instead of all of them.
        t = pl.program_id(0)
        b = pl.program_id(1)
        bs = jax.lax.rem(t, jnp.int32(2)) * (jnp.int32(nb - 1) - 2 * b) + b
        biglab = jnp.float32(float(1 << 25))
        zrow = jnp.zeros((1, 128), jnp.float32)

        @pl.when(t == 0)
        def _():
            if resume:
                # Continue from a previous run's labels (the convergence
                # completion loop in sweep.py) — frontier still starts
                # all-live: the prior run's change pattern is unknown.
                init = lab0_ref[pl.ds(bs, 1), :]
            else:
                base = (bs * jnp.int32(128)).astype(jnp.float32)
                iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(jnp.float32)
                init = base + iota
            lab_ref[pl.ds(bs, 1), :] = init
            out_ref[0:1, :] = init
            out_ref[1:2, :] = zrow
            blk_ref[bs] = jnp.int32(1)  # sweep 1 reads buffer 0: all live
            blk_ref[nr + bs] = jnp.int32(0)

            @pl.when(b == 0)
            def _():
                cnt_ref[0] = jnp.int32(1)  # force sweep 1 to run
                cnt_ref[1] = jnp.int32(1)

                # Padding rows (>= nb) never change labels: pin both
                # frontier buffers to 0 there, once.
                def zr(r, c):
                    blk_ref[r] = jnp.int32(0)
                    blk_ref[nr + r] = jnp.int32(0)
                    return c

                jax.lax.fori_loop(
                    jnp.int32(nb), jnp.int32(nr), zr, jnp.int32(0)
                )

        @pl.when(t > 0)
        def _():
            cur = jax.lax.rem(t, jnp.int32(2))
            prev = 1 - cur
            pbase = prev * jnp.int32(nr)

            @pl.when(b == 0)
            def _():
                cnt_ref[cur] = jnp.int32(0)

            qlab = lab_ref[pl.ds(bs, 1), :]  # [1, 128]
            bv = starts_ref[3 * nshift, bs]
            glive = jnp.logical_and(bv != 0, cnt_ref[prev] != 0)

            # Frontier test: OR of the previous sweep's changed flags
            # over this block's window rows (zero-trip when glive is
            # already false — ln collapses to sk).
            acc = jnp.int32(0)
            for j in range(nshift):
                st = starts_ref[j, bs]
                sk = starts_ref[nshift + j, bs]
                ln = jnp.where(
                    glive, starts_ref[2 * nshift + j, bs], sk
                )

                def fb(r, a, st=st):
                    return a | blk_ref[pbase + st + r]

                acc = jax.lax.fori_loop(sk, ln, fb, acc)
            live = jnp.logical_and(glive, acc != 0)

            @pl.when(jnp.logical_not(live))
            def _():
                out_ref[0:1, :] = qlab
                out_ref[1:2, :] = zrow
                blk_ref[cur * jnp.int32(nr) + bs] = jnp.int32(0)

            @pl.when(live)
            def _():
                row_q = pts_ref[pl.ds(bs, 1), :, :]
                qx = jnp.transpose(row_q[0, 0:1, :], (1, 0))  # [128, 1]
                qy = jnp.transpose(row_q[0, 1:2, :], (1, 0))
                qz = jnp.transpose(row_q[0, 2:3, :], (1, 0))
                qm = jnp.transpose(row_q[0, 3:4, :], (1, 0))
                qlab_t = jnp.transpose(qlab, (1, 0))  # [128, 1]
                r2 = r2_ref[0:1, :]  # [1, 128] broadcast of radius^2

                # Lane-carry min with a 4x-unrolled dynamic-bound walk:
                # the per-lane running label min stays elementwise in the
                # row loop (the old per-row jnp.min lane-reduce was a
                # multi-step shuffle costing ~3x the real work) and
                # reduces over lanes ONCE after all shifts. The caller
                # pre-masks invalid coordinates to 1e9 and appends a
                # 1e9-coordinate PAD row at index nr, so tail rows past a
                # window length read the pad row (d2 >> r2 excludes them)
                # — no per-row validity/live mask arithmetic at all.
                unroll = 4
                nmax = jnp.int32(nr)  # the pad row
                qmb = qm > 0.5  # [128, 1] query-validity broadcast
                best_l = jnp.full((128, 128), biglab, jnp.float32)
                for j in range(nshift):
                    st = starts_ref[j, bs]
                    sk = starts_ref[nshift + j, bs]
                    ln = starts_ref[2 * nshift + j, bs]

                    def body(i, best_l, st=st, sk=sk, ln=ln):
                        for u in range(unroll):
                            r = sk + i * jnp.int32(unroll) + jnp.int32(u)
                            rd = jnp.where(r < ln, st + r, nmax)
                            rowp = pts_ref[pl.ds(rd, 1), :, :]
                            rowl = lab_ref[pl.ds(rd, 1), :]  # [1, 128]
                            cx = rowp[0, 0:1, :]
                            cy = rowp[0, 1:2, :]
                            cz = rowp[0, 2:3, :]
                            d2 = (
                                (qx - cx) ** 2
                                + (qy - cy) ** 2
                                + (qz - cz) ** 2
                            )
                            within = jnp.where(
                                jnp.logical_and(qmb, d2 <= r2),
                                rowl + 0.0 * d2,  # label bcast over queries
                                biglab,
                            )
                            best_l = jnp.minimum(best_l, within)
                        return best_l

                    ntrips = jax.lax.div(
                        ln - sk + jnp.int32(unroll - 1), jnp.int32(unroll)
                    )
                    best_l = jax.lax.fori_loop(
                        jnp.int32(0), ntrips, body, best_l
                    )
                best = jnp.minimum(
                    jnp.where(qm > 0.5, qlab_t, biglab),
                    jnp.min(best_l, axis=1, keepdims=True),
                )

                # The intra-row closure below is only needed when this
                # sweep's window pass actually lowered a label (or on the
                # block's first running sweep, to close the iota init):
                # one closure application reaches the row-internal
                # fixpoint, so an unimproved row is already closed from
                # the sweep that last changed it. Skipping the 7 MXU
                # squarings + masks for live-but-unimproved blocks
                # (frontier granularity is whole windows, so most live
                # blocks receive nothing) is the multisweep's main saving.
                impr = jnp.sum(
                    jnp.where(
                        jnp.transpose(best, (1, 0)) < qlab,
                        jnp.float32(1.0),
                        jnp.float32(0.0),
                    )
                ).astype(jnp.int32)
                need_close = jnp.logical_or(impr > 0, t == 1)

                @pl.when(jnp.logical_not(need_close))
                def _():
                    out_ref[0:1, :] = qlab
                    out_ref[1:2, :] = zrow
                    blk_ref[cur * jnp.int32(nr) + bs] = jnp.int32(0)

                @pl.when(need_close)
                def _():
                    # Intra-row transitive closure: block-internal
                    # propagation would otherwise be Jacobi (one edge per
                    # sweep — a chain along one row would need up to 127
                    # sweeps). Build the row's own adjacency tile and
                    # square it log2(128) = 7 times on the MXU (0/1 sums
                    # <= 128 are exact in bf16), then one masked-min
                    # application collapses every row-internal chain this
                    # sweep.
                    cxo = row_q[0, 0:1, :]
                    cyo = row_q[0, 1:2, :]
                    czo = row_q[0, 2:3, :]
                    cwo = row_q[0, 3:4, :]
                    d2o = (
                        (qx - cxo) ** 2 + (qy - cyo) ** 2 + (qz - czo) ** 2
                    )
                    adj = jnp.where(
                        jnp.logical_and(qm * cwo > 0.5, d2o <= r2),
                        jnp.float32(1.0),
                        jnp.float32(0.0),
                    )
                    for _ in range(7):
                        adj = jnp.where(
                            jax.lax.dot(adj, adj) > 0.5,
                            jnp.float32(1.0),
                            jnp.float32(0.0),
                        )
                    best_row = jnp.transpose(best, (1, 0))  # [1, 128]
                    closed = jnp.where(
                        adj > 0.5, best_row + 0.0 * adj, biglab
                    )
                    bestc = jnp.minimum(
                        best, jnp.min(closed, axis=1, keepdims=True)
                    )

                    newlab_t = jnp.minimum(qlab_t, bestc)
                    newlab = jnp.transpose(newlab_t, (1, 0))  # [1, 128]
                    ch = jnp.where(
                        newlab < qlab, jnp.float32(1.0), jnp.float32(0.0)
                    )
                    lab_ref[pl.ds(bs, 1), :] = newlab
                    chs = jnp.sum(ch).astype(jnp.int32)
                    cnt_ref[cur] = cnt_ref[cur] + chs
                    blk_ref[cur * jnp.int32(nr) + bs] = jnp.where(
                        chs > 0, jnp.int32(1), jnp.int32(0)
                    )
                    out_ref[0:1, :] = newlab
                    out_ref[1:2, :] = ch

    return kernel


@partial(jax.jit, static_argnames=("sweeps", "interpret"))
def cluster_multisweep_windows(pts_planar, starts, r2, *, sweeps: int = 12,
                       interpret: bool = False, labels0=None):
    """Full connected-components propagation in one pallas call.

    pts_planar f32[NR, 4, 128] (x, y, z, w); starts i32[NB, 3S + 1] (the
    plain `_window_starts` pack — block-valid in its last column); r2 the
    squared cluster radius (static-ish float). Returns
    (labels f32[NB*128] in SORTED order, changed f32[NB*128] per-lane
    flags of each block's final sweep — all-zero certifies convergence).
    """
    from jax.experimental.pallas import tpu as pltpu

    nr, nch, width = pts_planar.shape
    nb = starts.shape[0]
    nshift = (starts.shape[1] - 1) // 3
    assert (nch, width) == (4, 128) and nb <= nr, (
        pts_planar.shape,
        starts.shape,
    )
    r2row = jnp.broadcast_to(
        jnp.asarray(r2, jnp.float32)[None, None], (1, 128)
    )
    starts = jnp.transpose(starts)  # [3S+1, NB]
    # Pre-mask invalid coordinates to 1e9 and append a 1e9 PAD row at
    # index nr: the kernel's window walk routes past-length reads to the
    # pad row and lets d2 > r2 exclude them — no per-row validity/live
    # arithmetic in the hot loop.
    big = jnp.float32(1e9)
    w = pts_planar[:, 3:4, :]
    pts_masked = jnp.concatenate(
        [jnp.where(w > 0.5, pts_planar[:, :3, :], big), w], axis=1
    )
    pad_row = jnp.concatenate(
        [
            jnp.full((1, 3, 128), big, jnp.float32),
            jnp.zeros((1, 1, 128), jnp.float32),
        ],
        axis=1,
    )
    pts_padded = jnp.concatenate([pts_masked, pad_row], axis=0)
    resume = labels0 is not None
    kern = _cluster_multisweep_windows_kernel(nshift, nb, nr, resume=resume)
    z = np.int32(0)
    in_specs = [
        pl.BlockSpec((nr + 1, 4, 128), lambda t, b, s: (z, z, z)),
        pl.BlockSpec((1, 128), lambda t, b, s: (z, z)),
    ]
    if resume:
        in_specs.append(pl.BlockSpec((nb, 128), lambda t, b, s: (z, z)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(sweeps + 1, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (2, 128),
            lambda t, b, s: (
                z,
                jax.lax.rem(t, jnp.int32(2))
                * (jnp.int32(nb - 1) - jnp.int32(2) * b)
                + b,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((nr + 1, 128), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((2 * nr,), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, nb * 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(starts, pts_padded, r2row,
      *(() if not resume else (labels0.reshape(nb, 128),)))
    return out[0], out[1]



# ── KNN-moments kernel (normal estimation) ───────────────────────────────────
#
# PCA normal estimation needs, per point, the first and second moments of
# its k nearest neighbors (self included, ref:
# crates/normals/src/estimate.rs:42-107). Same sorted-window structure as
# the SOR sweep, in TWO on-chip phases:
#
#   A. segmented k-smallest selection on d2 ALONE (per_seg registers —
#      the insertion loop's live carry stays small, which is what bounds
#      this kernel's speed: every carried [128, 128] register is VMEM
#      read+written per candidate row);
#   B. once the kth distance is fixed, a second walk over the SAME
#      windows (VMEM-resident or still in the DMA scratch) accumulates
#      QUERY-CENTERED moments (sum of c-q and (c-q)x(c-q)) of all
#      candidates inside the inclusion band — computed TRANSPOSED
#      ([cand, query] tiles) so the reductions run over sublanes into
#      [1, 128] accumulators whose carry is ~44 KB, not ten live tiles.
#
# Query-centering keeps the accumulation exact at georeferenced offsets
# (the covariance is translation-invariant; the reference's
# absolute-coordinate accumulation loses it in f32 — one of the
# deliberate fixes).
#
# BANDED INCLUSION (why phase B does NOT test d2 <= kth exactly): the
# compiler may re-derive a fused predicate separately for each consumer,
# with different FMA contraction each time, so a recomputed d2 is only
# reproducible to ~1 ulp — and the kth candidate sits EXACTLY on the
# d2 == kth boundary, so an exact threshold drops or double-counts it
# nondeterministically (observed as a real miscompile-grade inconsistency
# on the XLA:CPU interpret path: same program, rx=0.57, le=1, rx*le=0).
# Instead phase B includes candidates with d2 <= kth*(1+D2_BAND) and
# counts candidates with d2 <= kth*(1+3*D2_BAND) (count_le). D2_BAND is
# ~7 ulp, comfortably above any contraction jitter, so:
#   - every true top-k candidate is ALWAYS included (jitter-proof), and
#   - any candidate close enough to kth to contaminate the moments is
#     provably counted by the outer band, making count_le > count flag
#     the row for exact rescue.
# On certified rows (count_le == count) the included set is therefore
# EXACTLY the true top-k. Ties at kth flag the row exactly as before,
# and one tied-at-kth candidate squeezed out of a segment's finalists is
# visible to the full-width count_le — the caller's cle == count check is
# airtight, with semantics identical to the XLA mirror's.


def _sweep_moments_kernel(k: int, wr: int, per_seg: int, nshift: int,
                          resident: bool):
    from jax.experimental.pallas import tpu as pltpu

    nwin = nshift * wr

    def kernel(starts_ref, q_ref, pts_ref, out_ref, *scratch):
        # starts_ref i32[3*nshift + 1, NB] (transposed, like sweep_select).
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        bv = starts_ref[3 * nshift, b]
        big = jnp.float32(jnp.inf)

        if not resident:
            win, sems = scratch

            def dma(blk, j, slot):
                st = starts_ref[j, blk]
                return pltpu.make_async_copy(
                    pts_ref.at[pl.ds(st, wr), :, :],
                    win.at[pl.ds(slot * jnp.int32(nwin) + jnp.int32(j * wr), wr), :, :],
                    sems.at[slot, jnp.int32(j)],
                )

            @pl.when(jnp.logical_and(b == jnp.int32(0), bv != 0))
            def _():
                for j in range(nshift):
                    dma(jnp.int32(0), j, jnp.int32(0)).start()

            nxt_b = jnp.minimum(b + jnp.int32(1), nb - jnp.int32(1))

            @pl.when(
                jnp.logical_and(
                    b + jnp.int32(1) < nb, starts_ref[3 * nshift, nxt_b] != 0
                )
            )
            def _():
                nxt = jax.lax.rem(b + jnp.int32(1), jnp.int32(2))
                for j in range(nshift):
                    dma(nxt_b, j, nxt).start()

        @pl.when(bv == 0)
        def _():
            z = jnp.zeros((1, 128), jnp.float32)
            for row_i in range(12):
                out_ref[row_i : row_i + 1, :] = z
            out_ref[12:13, :] = z + jnp.float32(1.0)  # ok (masked anyway)
            for row_i in range(13, 16):
                out_ref[row_i : row_i + 1, :] = z

        @pl.when(bv != 0)
        def _():
            qx = jnp.transpose(q_ref[0, 0:1, :], (1, 0))  # [128, 1]
            qy = jnp.transpose(q_ref[0, 1:2, :], (1, 0))
            qz = jnp.transpose(q_ref[0, 2:3, :], (1, 0))
            qm = jnp.transpose(q_ref[0, 3:4, :], (1, 0))
            qx_row = q_ref[0, 0:1, :]  # [1, 128] (for the transposed pass)
            qy_row = q_ref[0, 1:2, :]
            qz_row = q_ref[0, 2:3, :]
            qm_row = q_ref[0, 3:4, :]

            if not resident:
                slot = jax.lax.rem(b, jnp.int32(2))
                for j in range(nshift):
                    dma(b, j, slot).wait()
                base = slot * jnp.int32(nwin)

            def walk(fold, state):
                """Fold over the block's candidate rows (the deduped
                [start + skip, start + len) window set), either with
                dynamic loop bounds (resident) or a static unroll with a
                keep mask (DMA scratch)."""
                if resident:
                    # 2x-unrolled dynamic-bound walk (see sweep_select):
                    # halves the fori overhead; tail rows past the window
                    # length ride the folds' existing keep-mask contract
                    # (reads clamped in-bounds, keep = 0).
                    unroll = 2
                    nmax = jnp.int32(pts_ref.shape[0] - 1)
                    for j in range(nshift):
                        st = starts_ref[j, b]
                        sk = starts_ref[nshift + j, b]
                        ln = starts_ref[2 * nshift + j, b]

                        def body(i, s, st=st, sk=sk, ln=ln):
                            for u in range(unroll):
                                r = (
                                    sk + i * jnp.int32(unroll)
                                    + jnp.int32(u)
                                )
                                rd = jnp.minimum(st + r, nmax)
                                row = pts_ref[pl.ds(rd, 1), :, :]
                                live = jnp.where(
                                    r < ln,
                                    jnp.float32(1.0),
                                    jnp.float32(0.0),
                                )
                                s = fold(s, row, live)
                            return s

                        ntrips = jax.lax.div(
                            ln - sk + jnp.int32(unroll - 1),
                            jnp.int32(unroll),
                        )
                        state = jax.lax.fori_loop(
                            jnp.int32(0), ntrips, body, state
                        )
                else:
                    for j in range(nshift):
                        sk = starts_ref[nshift + j, b]
                        ln = starts_ref[2 * nshift + j, b]
                        for r in range(wr):
                            row = win[
                                pl.ds(base + jnp.int32(j * wr + r), 1), :, :
                            ]
                            keep = jnp.where(
                                jnp.logical_and(
                                    jnp.int32(r) >= sk, jnp.int32(r) < ln
                                ),
                                jnp.float32(1.0),
                                jnp.float32(0.0),
                            )
                            state = fold(state, row, keep)
                return state

            # ── Phase A: segmented k-smallest selection on d2 alone ──
            def foldA(regs, row, keep):
                cx = row[0, 0:1, :]
                cy = row[0, 1:2, :]
                cz = row[0, 2:3, :]
                cw = row[0, 3:4, :]
                d2 = (qx - cx) ** 2 + (qy - cy) ** 2 + (qz - cz) ** 2
                pair = qm * cw * keep
                w = jnp.where(pair > 0.5, d2, big)
                return tuple(_insert_smallest(list(regs), w))

            regs = walk(
                foldA,
                tuple(jnp.full((128, 128), big) for _ in range(per_seg)),
            )

            # Extract count + kth from the finalists (certs come after
            # phase B, which supplies the full-width candidate count).
            f = jnp.concatenate(
                [jnp.transpose(x, (1, 0)) for x in regs], axis=0
            )  # [per_seg*128, 128]
            nf = per_seg * 128
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (nf, 128), 0)
            zrow = jnp.zeros((1, 128), jnp.float32)

            def ext(_, state):
                fw, count, kth = state
                mn = jnp.min(fw, axis=0, keepdims=True)
                okf = jnp.isfinite(mn)
                am = jnp.min(
                    jnp.where(fw == mn, rows_i, jnp.int32(nf)),
                    axis=0,
                    keepdims=True,
                )
                count = count + jnp.where(
                    okf, jnp.float32(1.0), jnp.float32(0.0)
                )
                kth = jnp.where(okf, mn, kth)
                fw = jnp.where(rows_i == am, big, fw)
                return fw, count, kth

            _, count, kth = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(k), ext, (f, zrow, zrow)
            )

            kth_hi = kth * jnp.float32(1.0 + D2_BAND)
            kth_hi2 = kth * jnp.float32(1.0 + 3.0 * D2_BAND)

            # ── Phase B: transposed rescan — moments of all candidates
            # inside the inclusion band, plus banded cle / count_all (see
            # module comment for the band's jitter-proofing role).
            # d2 / the masks stay [cand, query] elementwise (bit-parity
            # of counts with the XLA mirror), but the NINE moment
            # accumulations ride ONE MXU matmul per candidate row:
            # Σ_c le[c,q]·f(c) = F[10, cand] @ le[cand, query], with
            # candidate features CENTERED at the block's mean query so
            # the post-walk recombination (m2 = S2 - 2q'S1 + s0·q'^2
            # etc.) stays at local magnitude — the eleven per-row
            # [128,128] sublane reduces this replaces were ~8 ms of the
            # aerial frame. le is 0/1, so every product is exact and
            # only the summation tree differs from the mirror's (within
            # ulps of the centered magnitudes).
            qs11 = jnp.maximum(
                jnp.sum(qm_row, axis=1, keepdims=True), jnp.float32(1.0)
            )  # [1, 1]
            c0x = jnp.sum(qx_row * qm_row, axis=1, keepdims=True) / qs11
            c0y = jnp.sum(qy_row * qm_row, axis=1, keepdims=True) / qs11
            c0z = jnp.sum(qz_row * qm_row, axis=1, keepdims=True) / qs11
            ones_row = jnp.ones((1, 128), jnp.float32)

            def foldB(accs, row, keep):
                S, cle, cnt_all = accs
                cx_row = row[0, 0:1, :]  # [1, 128] candidates
                cy_row = row[0, 1:2, :]
                cz_row = row[0, 2:3, :]
                cx_t = jnp.transpose(cx_row, (1, 0))  # [128, 1]
                cy_t = jnp.transpose(cy_row, (1, 0))
                cz_t = jnp.transpose(cz_row, (1, 0))
                cw_t = jnp.transpose(row[0, 3:4, :], (1, 0))
                rx = cx_t - qx_row  # [cand, query] (c - q)
                ry = cy_t - qy_row
                rz = cz_t - qz_row
                d2 = rx * rx + ry * ry + rz * rz
                pair = cw_t * qm_row * keep
                le = jnp.where(
                    jnp.logical_and(pair > 0.5, d2 <= kth_hi),
                    jnp.float32(1.0),
                    jnp.float32(0.0),
                )
                in_band = jnp.where(
                    jnp.logical_and(pair > 0.5, d2 <= kth_hi2),
                    jnp.float32(1.0),
                    jnp.float32(0.0),
                )

                def csum(a):  # [128, 128] -> [1, 128] (sublane reduce)
                    return jnp.sum(a, axis=0, keepdims=True)

                cxc = cx_row - c0x
                cyc = cy_row - c0y
                czc = cz_row - c0z
                feats = jnp.concatenate(
                    [
                        ones_row,  # S0 = Σ le (the selected count)
                        cxc, cyc, czc,
                        cxc * cxc, cyc * cyc, czc * czc,
                        cxc * cyc, cxc * czc, cyc * czc,
                    ],
                    axis=0,
                )  # [10, cand]
                S = S + jnp.dot(
                    feats, le, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                return (S, cle + csum(in_band), cnt_all + csum(pair))

            S, cle, cnt_all = walk(
                foldB, (jnp.zeros((10, 128), jnp.float32), zrow, zrow)
            )

            # Recombine to query-centered moments: with q' = q - c0 and
            # the features centered at c0,
            #   m1 = S1 - s0 q',  m2_aa = S2_aa - 2 q'_a S1_a + s0 q'_a^2,
            #   m2_ab = S2_ab - q'_a S1_b - q'_b S1_a + s0 q'_a q'_b.
            s0 = S[0:1, :]
            Sx, Sy, Sz = S[1:2, :], S[2:3, :], S[3:4, :]
            Sxx, Syy, Szz = S[4:5, :], S[5:6, :], S[6:7, :]
            Sxy, Sxz, Syz = S[7:8, :], S[8:9, :], S[9:10, :]
            qxc = qx_row - c0x
            qyc = qy_row - c0y
            qzc = qz_row - c0z
            m1x = Sx - s0 * qxc
            m1y = Sy - s0 * qyc
            m1z = Sz - s0 * qzc
            mxx = Sxx - 2.0 * qxc * Sx + s0 * qxc * qxc
            myy = Syy - 2.0 * qyc * Sy + s0 * qyc * qyc
            mzz = Szz - 2.0 * qzc * Sz + s0 * qzc * qzc
            mxy = Sxy - qxc * Sy - qyc * Sx + s0 * qxc * qyc
            mxz = Sxz - qxc * Sz - qzc * Sx + s0 * qxc * qzc
            myz = Syz - qyc * Sz - qzc * Sy + s0 * qyc * qzc

            # Certificates (same semantics as _phase2_from_finalists /
            # the XLA mirror's _segmented_smallest_k): every segment's
            # last finalist >= kth, and as many extracted as the true
            # top-k holds.
            sl_t = jnp.transpose(regs[-1], (1, 0))  # [128, 128]
            cert1 = jnp.min(
                jnp.where(sl_t >= kth, jnp.float32(1.0), jnp.float32(0.0)),
                axis=0,
                keepdims=True,
            )
            cert2 = jnp.where(
                count >= jnp.minimum(jnp.float32(k), cnt_all),
                jnp.float32(1.0),
                jnp.float32(0.0),
            )

            out_ref[0:1, :] = m1x
            out_ref[1:2, :] = m1y
            out_ref[2:3, :] = m1z
            out_ref[3:4, :] = mxx
            out_ref[4:5, :] = myy
            out_ref[5:6, :] = mzz
            out_ref[6:7, :] = mxy
            out_ref[7:8, :] = mxz
            out_ref[8:9, :] = myz
            out_ref[9:10, :] = cle
            out_ref[10:11, :] = count
            out_ref[11:12, :] = kth
            out_ref[12:13, :] = cert1 * cert2
            out_ref[13:14, :] = zrow
            out_ref[14:15, :] = zrow
            out_ref[15:16, :] = zrow

    return kernel


@partial(jax.jit, static_argnames=("k", "wr", "per_seg", "interpret"))
def sweep_moments(pts_planar, starts, *, k: int, wr: int = 4, per_seg: int = 3,
                  interpret: bool = False):
    """Selection + neighbor-moment accumulation over sorted windows.

    Same inputs as `sweep_select`. Returns a [16, NB*128] f32 array:
    rows 0-2  sum of (c - q) over selected neighbors,
    rows 3-8  sum of outer products (xx, yy, zz, xy, xz, yz),
    row  9    count_le (candidates with d2 <= kth — includes kth ties),
    row 10    selection count (<= k), row 11 kth d2, row 12 segment cert.
    """
    from jax.experimental.pallas import tpu as pltpu

    nr, nch, width = pts_planar.shape
    nb = starts.shape[0]
    nshift = (starts.shape[1] - 1) // 3
    assert (nch, width) == (4, 128) and nb <= nr and nr >= wr, (
        pts_planar.shape,
        starts.shape,
    )
    starts = jnp.transpose(starts)  # [3S+1, NB]
    resident = nr * 4 * 128 * 4 <= RESIDENT_PLANAR_BYTES
    kern = _sweep_moments_kernel(k, wr, per_seg, nshift, resident)
    z = np.int32(0)
    pts_spec = (
        pl.BlockSpec((nr, 4, 128), lambda b, starts_ref: (z, z, z))
        if resident
        else pl.BlockSpec(memory_space=pl.ANY)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 4, 128), lambda b, starts_ref: (b, z, z)),
            pts_spec,
        ],
        out_specs=pl.BlockSpec((16, 128), lambda b, starts_ref: (z, b)),
        scratch_shapes=[]
        if resident
        else [
            pltpu.VMEM((2 * nshift * wr, 4, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nshift)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, nb * 128), jnp.float32),
        # Resident planar + selection registers exceed the 16 MB scoped cap.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(starts, pts_planar, pts_planar)


# ── Radius-count kernel ──────────────────────────────────────────────────────
#
# Radius outlier removal / radius_count: per point, the number of cloud
# points within the radius (self included). One masked-count pass over the
# sorted windows — no selection at all. The squared radius rides the w
# channel (w = r2 for valid points, 0 for masked), so validity and the
# threshold share one comparison chain. Exact BY CONSTRUCTION when the
# sort cell >= radius + fp margin and the window certificate holds.


def _count_within_kernel(wr: int, nshift: int):
    from jax.experimental.pallas import tpu as pltpu

    nwin = nshift * wr

    def kernel(starts_ref, q_ref, pts_ref, out_ref, win, sems):
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        bv = starts_ref[3 * nshift, b]

        def dma(blk, j, slot):
            st = starts_ref[j, blk]
            return pltpu.make_async_copy(
                pts_ref.at[pl.ds(st, wr), :, :],
                win.at[pl.ds(slot * jnp.int32(nwin) + jnp.int32(j * wr), wr), :, :],
                sems.at[slot, jnp.int32(j)],
            )

        @pl.when(jnp.logical_and(b == jnp.int32(0), bv != 0))
        def _():
            for j in range(nshift):
                dma(jnp.int32(0), j, jnp.int32(0)).start()

        nxt_b = jnp.minimum(b + jnp.int32(1), nb - jnp.int32(1))

        @pl.when(
            jnp.logical_and(
                b + jnp.int32(1) < nb, starts_ref[3 * nshift, nxt_b] != 0
            )
        )
        def _():
            nxt = jax.lax.rem(b + jnp.int32(1), jnp.int32(2))
            for j in range(nshift):
                dma(nxt_b, j, nxt).start()

        @pl.when(bv == 0)
        def _():
            out_ref[0:1, :] = jnp.zeros((1, 128), jnp.float32)

        @pl.when(bv != 0)
        def _():
            slot = jax.lax.rem(b, jnp.int32(2))
            for j in range(nshift):
                dma(b, j, slot).wait()

            qx = jnp.transpose(q_ref[0, 0:1, :], (1, 0))
            qy = jnp.transpose(q_ref[0, 1:2, :], (1, 0))
            qz = jnp.transpose(q_ref[0, 2:3, :], (1, 0))
            qm = jnp.transpose(q_ref[0, 3:4, :], (1, 0))  # r2 or 0

            cnt = jnp.zeros((128, 128), jnp.float32)
            base = slot * jnp.int32(nwin)
            for j in range(nshift):
                sk = starts_ref[nshift + j, b]
                ln = starts_ref[2 * nshift + j, b]
                for r in range(wr):
                    row = win[pl.ds(base + jnp.int32(j * wr + r), 1), :, :]
                    cx = row[0, 0:1, :]
                    cy = row[0, 1:2, :]
                    cz = row[0, 2:3, :]
                    cw = row[0, 3:4, :]  # r2 (valid) or 0
                    d2 = (qx - cx) ** 2 + (qy - cy) ** 2 + (qz - cz) ** 2
                    keep = jnp.where(
                        jnp.logical_and(
                            jnp.int32(r) >= sk, jnp.int32(r) < ln
                        ),
                        jnp.float32(1.0),
                        jnp.float32(0.0),
                    )
                    hit = jnp.where(
                        jnp.logical_and(
                            jnp.logical_and(qm > 0.0, cw > 0.0), d2 <= cw
                        ),
                        keep,
                        jnp.float32(0.0),
                    )
                    cnt = cnt + hit

            out_ref[0:1, :] = jnp.transpose(
                jnp.sum(cnt, axis=1, keepdims=True), (1, 0)
            )

    return kernel


@partial(jax.jit, static_argnames=("wr", "interpret"))
def count_within(pts_planar, starts, *, wr: int = 4, interpret: bool = False):
    """Per-query count of candidates within the radius over sorted windows.

    pts_planar f32[NR, 4, 128] with w = r2 (valid) / 0 (masked);
    starts as in `sweep_select` (dedup skip consulted — duplicated window
    candidates would double-count). Returns counts f32[NB*128]."""
    from jax.experimental.pallas import tpu as pltpu

    nr, nch, width = pts_planar.shape
    nb = starts.shape[0]
    nshift = (starts.shape[1] - 1) // 3
    assert (nch, width) == (4, 128) and nb <= nr and nr >= wr, (
        pts_planar.shape,
        starts.shape,
    )
    starts = jnp.transpose(starts)
    kern = _count_within_kernel(wr, nshift)
    z = np.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 4, 128), lambda b, starts_ref: (b, z, z)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda b, starts_ref: (z, b)),
        scratch_shapes=[
            pltpu.VMEM((2 * nshift * wr, 4, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nshift)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, nb * 128), jnp.float32),
        interpret=interpret,
    )(starts, pts_planar, pts_planar)
    return out[0]


# ── KNN kernel (indices + distances) ─────────────────────────────────────────
#
# Same-cloud k-nearest-neighbors with INDICES: the insertion network runs
# on (value, index) register pairs — indices ride as exact-int f32 global
# candidate positions (tile row * 128 + lane), a [1, 128] row vector per
# tile since a tile's candidates share one planar row. Phase 2 extracts
# the k smallest (value, index) pairs into the output rows. Tie order is
# first-encountered (window order) — deterministic, but not the
# reference's internal KD-tree order; distances are identical.


def _insert_smallest_with_payloads(regs_v, regs_p, v, p):
    """Insertion network on (value, payload...) tuples: regs_p is a list of
    payload register lists (one per payload channel), p the new tile's
    payload channels. Ties keep the earlier-seen register."""
    out_v = []
    out_p = [[] for _ in regs_p]
    cur_v, cur_p = v, list(p)
    for lvl, rv in enumerate(regs_v):
        swap = cur_v < rv
        lo_v = jnp.minimum(rv, cur_v)
        hi_v = jnp.maximum(rv, cur_v)
        out_v.append(lo_v)
        for c, channel in enumerate(regs_p):
            rp = channel[lvl]
            out_p[c].append(jnp.where(swap, cur_p[c], rp))
            cur_p[c] = jnp.where(swap, rp, cur_p[c])
        cur_v = hi_v
    return out_v, out_p


def _insert_smallest_with_idx(regs_v, regs_i, v, i):
    out_v, out_i = [], []
    cur_v, cur_i = v, i
    for rv, ri in zip(regs_v, regs_i):
        swap = cur_v < rv  # strict: ties keep the earlier-seen register
        lo_v = jnp.minimum(rv, cur_v)
        hi_v = jnp.maximum(rv, cur_v)
        lo_i = jnp.where(swap, cur_i, ri)
        hi_i = jnp.where(swap, ri, cur_i)
        out_v.append(lo_v)
        out_i.append(lo_i)
        cur_v, cur_i = hi_v, hi_i
    return out_v, out_i


def _sweep_knn_kernel(k: int, wr: int, per_seg: int, nshift: int,
                      resident: bool):
    from jax.experimental.pallas import tpu as pltpu

    nwin = nshift * wr

    def kernel(starts_ref, q_ref, pts_ref, out_ref, *scratch):
        b = pl.program_id(0)
        nb = pl.num_programs(0)
        bv = starts_ref[3 * nshift, b]
        big = jnp.float32(jnp.inf)

        if not resident:
            win, sems = scratch

            def dma(blk, j, slot):
                st = starts_ref[j, blk]
                return pltpu.make_async_copy(
                    pts_ref.at[pl.ds(st, wr), :, :],
                    win.at[
                        pl.ds(slot * jnp.int32(nwin) + jnp.int32(j * wr), wr),
                        :,
                        :,
                    ],
                    sems.at[slot, jnp.int32(j)],
                )

            @pl.when(jnp.logical_and(b == jnp.int32(0), bv != 0))
            def _():
                for j in range(nshift):
                    dma(jnp.int32(0), j, jnp.int32(0)).start()

            nxt_b = jnp.minimum(b + jnp.int32(1), nb - jnp.int32(1))

            @pl.when(
                jnp.logical_and(
                    b + jnp.int32(1) < nb, starts_ref[3 * nshift, nxt_b] != 0
                )
            )
            def _():
                nxt = jax.lax.rem(b + jnp.int32(1), jnp.int32(2))
                for j in range(nshift):
                    dma(nxt_b, j, nxt).start()

        @pl.when(bv == 0)
        def _():
            z = jnp.zeros((1, 128), jnp.float32)
            for i in range(k):
                out_ref[i : i + 1, :] = z + big
                out_ref[k + i : k + i + 1, :] = z - jnp.float32(1.0)
            out_ref[2 * k : 2 * k + 1, :] = z
            out_ref[2 * k + 1 : 2 * k + 2, :] = z
            out_ref[2 * k + 2 : 2 * k + 3, :] = z + jnp.float32(1.0)

        @pl.when(bv != 0)
        def _():
            qx = jnp.transpose(q_ref[0, 0:1, :], (1, 0))
            qy = jnp.transpose(q_ref[0, 1:2, :], (1, 0))
            qz = jnp.transpose(q_ref[0, 2:3, :], (1, 0))
            qm = jnp.transpose(q_ref[0, 3:4, :], (1, 0))

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(
                jnp.float32
            )  # (f32 iota is not a legal tpu.iota result type)

            regs_v = [jnp.full((128, 128), big) for _ in range(per_seg)]
            regs_i = [
                jnp.full((128, 128), jnp.float32(-1.0)) for _ in range(per_seg)
            ]
            cnt = jnp.zeros((128, 128), jnp.float32)

            if resident:
                # Windows walked in place with DYNAMIC per-shift bounds:
                # work scales with the actual candidate rows, not
                # nshift * wr (the static unroll below costs ~10x more at
                # wr=16 where the median window is 1-2 rows). 2x-unrolled
                # (see sweep_select): tail rows past the window length
                # are masked via pair (clamped in-bounds reads).
                unroll = 2
                nmax = jnp.int32(pts_ref.shape[0] - 1)
                state = (tuple(regs_v), tuple(regs_i), cnt)
                for j in range(nshift):
                    st = starts_ref[j, b]
                    sk = starts_ref[nshift + j, b]
                    ln = starts_ref[2 * nshift + j, b]

                    def body(i, s, st=st, sk=sk, ln=ln):
                        rv, ri, cnt_ = s
                        for u in range(unroll):
                            r = sk + i * jnp.int32(unroll) + jnp.int32(u)
                            rd = jnp.minimum(st + r, nmax)
                            row = pts_ref[pl.ds(rd, 1), :, :]
                            cx = row[0, 0:1, :]
                            cy = row[0, 1:2, :]
                            cz = row[0, 2:3, :]
                            cw = row[0, 3:4, :]
                            live = jnp.where(
                                r < ln, jnp.float32(1.0), jnp.float32(0.0)
                            )
                            d2 = (
                                (qx - cx) ** 2
                                + (qy - cy) ** 2
                                + (qz - cz) ** 2
                            )
                            pair = qm * (cw * live)
                            w = jnp.where(pair > 0.5, d2, big)
                            gidx = (
                                rd.astype(jnp.float32) * jnp.float32(128.0)
                                + lane
                            )
                            rv, ri = (
                                tuple(x)
                                for x in _insert_smallest_with_idx(
                                    list(rv), list(ri), w, gidx + 0.0 * d2
                                )
                            )
                            cnt_ = cnt_ + jnp.where(
                                pair > 0.5, jnp.float32(1.0), 0.0
                            )
                        return (rv, ri, cnt_)

                    ntrips = jax.lax.div(
                        ln - sk + jnp.int32(unroll - 1), jnp.int32(unroll)
                    )
                    state = jax.lax.fori_loop(
                        jnp.int32(0), ntrips, body, state
                    )
                regs_v, regs_i, cnt = (
                    list(state[0]), list(state[1]), state[2]
                )
            else:
                slot = jax.lax.rem(b, jnp.int32(2))
                for j in range(nshift):
                    dma(b, j, slot).wait()
                base = slot * jnp.int32(nwin)
                for j in range(nshift):
                    sk = starts_ref[nshift + j, b]
                    ln = starts_ref[2 * nshift + j, b]
                    for r in range(wr):
                        st = starts_ref[j, b]
                        row = win[
                            pl.ds(base + jnp.int32(j * wr + r), 1), :, :
                        ]
                        cx = row[0, 0:1, :]
                        cy = row[0, 1:2, :]
                        cz = row[0, 2:3, :]
                        cw = row[0, 3:4, :]
                        d2 = (
                            (qx - cx) ** 2 + (qy - cy) ** 2 + (qz - cz) ** 2
                        )
                        keep = jnp.where(
                            jnp.logical_and(
                                jnp.int32(r) >= sk, jnp.int32(r) < ln
                            ),
                            jnp.float32(1.0),
                            jnp.float32(0.0),
                        )
                        pair = qm * cw * keep
                        w = jnp.where(pair > 0.5, d2, big)
                        gidx = (
                            (st + jnp.int32(r)).astype(jnp.float32)
                            * jnp.float32(128.0)
                            + lane
                        )  # [1, 128] global sorted position, exact-int f32
                        regs_v, regs_i = _insert_smallest_with_idx(
                            regs_v, regs_i, w, gidx + 0.0 * d2
                        )
                        cnt = cnt + jnp.where(
                            pair > 0.5, jnp.float32(1.0), 0.0
                        )

            count_all = jnp.sum(
                jnp.transpose(cnt, (1, 0)), axis=0, keepdims=True
            )
            seg_last = regs_v[-1]

            fv = jnp.concatenate(
                [jnp.transpose(x, (1, 0)) for x in regs_v], axis=0
            )  # [per_seg*128, 128]
            fi = jnp.concatenate(
                [jnp.transpose(x, (1, 0)) for x in regs_i], axis=0
            )
            nf = per_seg * 128
            rows = jax.lax.broadcasted_iota(jnp.int32, (nf, 128), 0)

            # Phase 2 unrolled with STATIC output rows: dynamic-index
            # stores (out_ref[pl.ds(traced_i)]) trip a Mosaic masked-swap
            # lowering bug.
            zf = jnp.zeros((1, 128), jnp.float32)
            fw, fidx, count, kth = fv, fi, zf, zf
            for i in range(k):
                mn = jnp.min(fw, axis=0, keepdims=True)
                ok = jnp.isfinite(mn)
                am = jnp.min(
                    jnp.where(fw == mn, rows, jnp.int32(nf)),
                    axis=0,
                    keepdims=True,
                )
                hitm = jnp.where(
                    rows == am, jnp.float32(1.0), jnp.float32(0.0)
                )
                idx_val = jnp.sum(hitm * fidx, axis=0, keepdims=True)
                out_ref[i : i + 1, :] = jnp.where(
                    ok, jnp.sqrt(jnp.maximum(mn, 0.0)), big
                )
                out_ref[k + i : k + i + 1, :] = jnp.where(
                    ok, idx_val, jnp.float32(-1.0)
                )
                count = count + jnp.where(ok, jnp.float32(1.0), 0.0)
                kth = jnp.where(ok, mn, kth)
                fw = jnp.where(rows == am, big, fw)

            sl_t = jnp.transpose(seg_last, (1, 0))
            cert1 = jnp.min(
                jnp.where(sl_t >= kth, jnp.float32(1.0), jnp.float32(0.0)),
                axis=0,
                keepdims=True,
            )
            cert2 = jnp.where(
                count >= jnp.minimum(jnp.float32(k), count_all),
                jnp.float32(1.0),
                jnp.float32(0.0),
            )
            out_ref[2 * k : 2 * k + 1, :] = count
            out_ref[2 * k + 1 : 2 * k + 2, :] = kth
            out_ref[2 * k + 2 : 2 * k + 3, :] = cert1 * cert2

    return kernel


@partial(jax.jit, static_argnames=("k", "wr", "per_seg", "interpret"))
def sweep_knn_select(pts_planar, starts, *, k: int, wr: int = 4,
                     per_seg: int = 4, interpret: bool = False,
                     q_planar=None):
    """KNN distances + global sorted positions over sorted windows.

    ``q_planar``: separately sorted query frame [QB, 4, 128] whose block b
    is swept against windows of ``pts_planar`` (the cross-cloud path);
    default = ``pts_planar`` (same-cloud: query blocks ARE point blocks).

    Returns a [2k+3, NB*128] f32 array: rows [0, k) Euclidean distances
    ascending (+inf pad), rows [k, 2k) candidate positions in the SORTED
    frame (-1 pad), rows 2k..2k+2 = count / kth d2 / segment certificate.
    """
    from jax.experimental.pallas import tpu as pltpu

    if q_planar is None:
        q_planar = pts_planar
    nr, nch, width = pts_planar.shape
    nb = starts.shape[0]
    nshift = (starts.shape[1] - 1) // 3
    assert (nch, width) == (4, 128) and nb <= q_planar.shape[0] and nr >= wr, (
        pts_planar.shape,
        q_planar.shape,
        starts.shape,
    )
    starts = jnp.transpose(starts)
    # Resident path (planar fits VMEM): windows read in place with DYNAMIC
    # per-shift bounds — the DMA path's static wr-unroll costs ~10x the
    # actual candidate work at wr=16 (median window 1-2 rows).
    resident = planar_resident_fits(nr * 128)
    kern = _sweep_knn_kernel(k, wr, per_seg, nshift, resident)
    z = np.int32(0)
    pts_spec = (
        pl.BlockSpec((nr, 4, 128), lambda b, starts_ref: (z, z, z))
        if resident
        else pl.BlockSpec(memory_space=pl.ANY)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 4, 128), lambda b, starts_ref: (b, z, z)),
            pts_spec,
        ],
        out_specs=pl.BlockSpec((2 * k + 3, 128), lambda b, starts_ref: (z, b)),
        scratch_shapes=[]
        if resident
        else [
            pltpu.VMEM((2 * nshift * wr, 4, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, nshift)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2 * k + 3, nb * 128), jnp.float32),
        # The unrolled phase-2 extraction keeps many live [512, 128]
        # intermediates; the default 16 MB scoped-vmem cap is too tight.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(starts, q_planar, pts_planar)


# ── Fused 1-NN (distance + argmin) kernel ────────────────────────────────────
#
# Correspondence search for ICP (ops/registration._nn_1): each source
# point's nearest neighbor in the target cloud. The XLA one-shot path
# materializes the full [Q, N] distance matrix in HBM (~1 GB at the
# reference's 10K x 10K row) and re-reads it for the argmin — ~9.5 ms per
# ICP iteration, all bandwidth. This kernel keeps the target VMEM-resident
# and reduces each [128-query, 128-candidate] tile in registers: no HBM
# transient at all, compute-bound at ~N*Q*8 VPU flops.
# (ref: crates/registration/src/correspondence.rs:16-39 — per-point
# kdtree.knn(k=1); same exact-distance semantics, batched TPU-style.)


def _nn_argmin_kernel(nr: int, unroll: int = 4):
    def kernel(q_ref, cand_ref, out_ref):
        big = jnp.float32(jnp.inf)

        qx = jnp.transpose(q_ref[0, 0:1, :], (1, 0))  # [128, 1]
        qy = jnp.transpose(q_ref[0, 1:2, :], (1, 0))
        qz = jnp.transpose(q_ref[0, 2:3, :], (1, 0))

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(
            jnp.float32
        )

        # Lane-carry reduction: per candidate row only ELEMENTWISE ops
        # (d2 + validity mask + per-lane best/row tracking) — the two
        # cross-lane reduces the previous formulation paid per row
        # (rowmin + tie-position max, each a multi-step lane shuffle) run
        # exactly once per block after the loop. Tie-break is unchanged:
        # per lane the later row overwrites on equality (<=), and the
        # final tie extraction takes the max flat position among tied
        # lanes, so the overall winner is max(128*row + lane) among all
        # global minima — the same last-index rule as _nn_1's XLA path.
        def row_step(r, state):
            best_l, brow_l = state
            row = cand_ref[pl.ds(r, 1), :, :]
            cx = row[0, 0:1, :]
            cy = row[0, 1:2, :]
            cz = row[0, 2:3, :]
            cw = row[0, 3:4, :]
            d2 = (qx - cx) ** 2 + (qy - cy) ** 2 + (qz - cz) ** 2
            w = jnp.where(cw > 0.5, d2, big)  # [128, 128]
            rf = jnp.float32(r)  # works for traced i32 AND static tail ints
            brow_l = jnp.where(w <= best_l, rf, brow_l)
            best_l = jnp.minimum(best_l, w)
            return best_l, brow_l

        # Unrolled main loop: the per-iteration fori overhead (scalar
        # control flow + bounds arithmetic) is comparable to the VPU work
        # per candidate row, so running `unroll` rows per trip cuts it.
        def block_step(i, state):
            for u in range(unroll):
                state = row_step(i * unroll + u, state)
            return state

        best0 = jnp.full((128, 128), big, jnp.float32)
        brow0 = jnp.zeros((128, 128), jnp.float32)
        state = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(nr // unroll), block_step,
            (best0, brow0),
        )
        # Tail rows (nr not divisible by unroll) with static offsets.
        for r in range(nr - nr % unroll, nr):
            state = row_step(r, state)
        best_l, brow_l = state
        gmin = jnp.min(best_l, axis=1, keepdims=True)  # [128, 1]
        pos = lane + jnp.float32(128.0) * brow_l  # [128, 128]
        bpos = jnp.max(
            jnp.where(best_l <= gmin, pos, jnp.float32(-1.0)),
            axis=1,
            keepdims=True,
        )
        out_ref[0:1, :] = jnp.transpose(gmin, (1, 0))
        out_ref[1:2, :] = jnp.transpose(bpos, (1, 0))

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def nn_argmin(q_planar, cand_planar, *, interpret: bool = False):
    """For every query, the exact squared distance to — and position of —
    its nearest valid candidate.

    q_planar f32[QB, 4, 128] (channels x/y/z/any), cand_planar
    f32[NR, 4, 128] (w channel = validity, VMEM-resident: callers gate on
    RESIDENT_PLANAR_BYTES). Returns f32[2, QB*128]: row 0 = min d2
    (direct (q-p)^2 form, exact per pair; +inf if no valid candidate),
    row 1 = flat candidate position (exact in f32 below 2^24 points;
    ties take the LAST position). Invalid queries return garbage rows —
    callers mask by query validity.
    """
    from jax.experimental.pallas import tpu as pltpu

    nr, nch, width = cand_planar.shape
    qb = q_planar.shape[0]
    assert (nch, width) == (4, 128), cand_planar.shape
    z = np.int32(0)
    out = pl.pallas_call(
        _nn_argmin_kernel(nr),
        grid=(qb,),
        in_specs=[
            pl.BlockSpec((1, 4, 128), lambda b: (b, z, z)),
            # Whole target VMEM-resident for every grid step (explicit
            # identity map — see rescue_select).
            pl.BlockSpec((nr, 4, 128), lambda b: (z, z, z)),
        ],
        out_specs=pl.BlockSpec((2, 128), lambda b: (z, b)),
        out_shape=jax.ShapeDtypeStruct((2, qb * 128), jnp.float32),
        interpret=interpret,
    )(q_planar, cand_planar)
    return out[0], out[1]


# ── Brute k-NN rescue kernel (unconditionally exact, with indices) ───────────
#
# The fused per-op rescue (ops/fusedops): flagged queries re-resolved
# against the WHOLE cloud. The XLA path does lax.top_k over [cap, N]
# distance rows — ~50 ms at [4096, 131K] on TPU (top_k over 131K lanes is
# a partial sort). Here each query lane keeps its own k smallest in
# registers (per_seg = k, so every global k-smallest candidate survives
# its lane's selection — exact WITHOUT a certificate), then the standard
# phase-2 extraction merges lanes. Candidates stay VMEM-resident in
# original order, so flat positions are original row ids.


def _brute_knn_kernel(k: int, nr: int):
    def kernel(q_ref, cand_ref, out_ref):
        big = jnp.float32(jnp.inf)

        qm_row = q_ref[0, 3:4, :]  # [1, 128]
        # The fused-op callers compact flagged queries to the FRONT, so
        # whole trailing blocks are padding: skipping them makes the
        # static-cap rescue cost scale with the true flagged count
        # (ceil(nflag/128) blocks), not with cap.
        bv = jnp.max(qm_row)

        @pl.when(bv <= 0.5)
        def _():
            z = jnp.zeros((1, 128), jnp.float32)
            for i in range(k):
                out_ref[i : i + 1, :] = z + big
                out_ref[k + i : k + i + 1, :] = z - jnp.float32(1.0)
            out_ref[2 * k : 2 * k + 1, :] = z

        @pl.when(bv > 0.5)
        def _():
            qx = jnp.transpose(q_ref[0, 0:1, :], (1, 0))  # [128, 1]
            qy = jnp.transpose(q_ref[0, 1:2, :], (1, 0))
            qz = jnp.transpose(q_ref[0, 2:3, :], (1, 0))
            qm = jnp.transpose(qm_row, (1, 0))

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(
                jnp.float32
            )

            regs_v0 = tuple(jnp.full((128, 128), big) for _ in range(k))
            regs_i0 = tuple(
                jnp.full((128, 128), jnp.float32(-1.0)) for _ in range(k)
            )

            def row_step(r, state):
                rv, ri, cnt = state
                row = cand_ref[pl.ds(r, 1), :, :]
                cx = row[0, 0:1, :]
                cy = row[0, 1:2, :]
                cz = row[0, 2:3, :]
                cw = row[0, 3:4, :]
                d2 = (qx - cx) ** 2 + (qy - cy) ** 2 + (qz - cz) ** 2
                pair = qm * cw
                w = jnp.where(pair > 0.5, d2, big)
                gidx = r.astype(jnp.float32) * jnp.float32(128.0) + lane
                rv2, ri2 = _insert_smallest_with_idx(
                    list(rv), list(ri), w, gidx + 0.0 * d2
                )
                cnt = cnt + jnp.where(pair > 0.5, jnp.float32(1.0), 0.0)
                return (tuple(rv2), tuple(ri2), cnt)

            regs_v, regs_i, cnt = jax.lax.fori_loop(
                jnp.int32(0),
                jnp.int32(nr),
                row_step,
                (regs_v0, regs_i0, jnp.zeros((128, 128), jnp.float32)),
            )

            fv = jnp.concatenate(
                [jnp.transpose(x, (1, 0)) for x in regs_v], axis=0
            )  # [k*128, 128]
            fi = jnp.concatenate(
                [jnp.transpose(x, (1, 0)) for x in regs_i], axis=0
            )
            nf = k * 128
            rows = jax.lax.broadcasted_iota(jnp.int32, (nf, 128), 0)

            zf = jnp.zeros((1, 128), jnp.float32)
            fw, count = fv, zf
            for i in range(k):
                mn = jnp.min(fw, axis=0, keepdims=True)
                ok = jnp.isfinite(mn)
                am = jnp.min(
                    jnp.where(fw == mn, rows, jnp.int32(nf)),
                    axis=0,
                    keepdims=True,
                )
                hitm = jnp.where(
                    rows == am, jnp.float32(1.0), jnp.float32(0.0)
                )
                idx_val = jnp.sum(hitm * fi, axis=0, keepdims=True)
                out_ref[i : i + 1, :] = jnp.where(
                    ok, jnp.sqrt(jnp.maximum(mn, 0.0)), big
                )
                out_ref[k + i : k + i + 1, :] = jnp.where(
                    ok, idx_val, jnp.float32(-1.0)
                )
                count = count + jnp.where(ok, jnp.float32(1.0), 0.0)
                fw = jnp.where(rows == am, big, fw)
            out_ref[2 * k : 2 * k + 1, :] = count

    return kernel


@partial(jax.jit, static_argnames=("k", "interpret"))
def brute_knn_idx(q_planar, cand_planar, *, k: int, interpret: bool = False):
    """Exact k nearest valid candidates of every query over the WHOLE
    resident candidate array (no windows, no certificate needed).

    Returns f32[2k + 1, QB*128]: rows [0, k) Euclidean distances ascending
    (+inf pad), rows [k, 2k) flat candidate positions (-1 pad; exact-int
    f32, callers gate n <= 2^24), row 2k = valid-candidate count. Ties
    resolve toward the smallest position (matches lax.top_k).
    """
    from jax.experimental.pallas import tpu as pltpu

    nr, nch, width = cand_planar.shape
    qb = q_planar.shape[0]
    assert (nch, width) == (4, 128), cand_planar.shape
    z = np.int32(0)
    return pl.pallas_call(
        _brute_knn_kernel(k, nr),
        grid=(qb,),
        in_specs=[
            pl.BlockSpec((1, 4, 128), lambda b: (b, z, z)),
            pl.BlockSpec((nr, 4, 128), lambda b: (z, z, z)),
        ],
        out_specs=pl.BlockSpec((2 * k + 1, 128), lambda b: (z, b)),
        out_shape=jax.ShapeDtypeStruct((2 * k + 1, qb * 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(q_planar, cand_planar)


def _brute_radius_count_kernel(nr: int):
    def kernel(q_ref, cand_ref, out_ref):
        qr2_row = q_ref[0, 3:4, :]  # [1, 128] r^2; -1 marks invalid
        bv = jnp.max(qr2_row)

        @pl.when(bv < 0.0)
        def _():
            # Whole block is padding (flagged queries are front-compacted):
            # skip the candidate walk entirely.
            out_ref[0:1, :] = jnp.zeros((1, 128), jnp.float32)

        @pl.when(bv >= 0.0)
        def _():
            qx = jnp.transpose(q_ref[0, 0:1, :], (1, 0))  # [128, 1]
            qy = jnp.transpose(q_ref[0, 1:2, :], (1, 0))
            qz = jnp.transpose(q_ref[0, 2:3, :], (1, 0))
            qr2 = jnp.transpose(qr2_row, (1, 0))

            def row_step(r, cnt):
                row = cand_ref[pl.ds(r, 1), :, :]
                cx = row[0, 0:1, :]
                cy = row[0, 1:2, :]
                cz = row[0, 2:3, :]
                cw = row[0, 3:4, :]
                d2 = (qx - cx) ** 2 + (qy - cy) ** 2 + (qz - cz) ** 2
                hit = jnp.where(
                    jnp.logical_and(cw > 0.5, d2 <= qr2),
                    jnp.float32(1.0),
                    jnp.float32(0.0),
                )
                return cnt + hit

            cnt = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(nr), row_step,
                jnp.zeros((128, 128), jnp.float32),
            )
            out_ref[0:1, :] = jnp.sum(
                jnp.transpose(cnt, (1, 0)), axis=0, keepdims=True
            )

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def brute_radius_count(q_planar, cand_planar, *, interpret: bool = False):
    """Exact inclusive within-radius counts of every query over the whole
    resident candidate array. The per-query squared radius rides the
    query w channel; w = -1 marks an invalid query (d2 <= -1 is never
    true, so invalid rows count 0, and radius = 0 keeps its inclusive
    coincident-point semantics). Returns f32[QB*128] counts."""
    nr, nch, width = cand_planar.shape
    qb = q_planar.shape[0]
    assert (nch, width) == (4, 128), cand_planar.shape
    z = np.int32(0)
    out = pl.pallas_call(
        _brute_radius_count_kernel(nr),
        grid=(qb,),
        in_specs=[
            pl.BlockSpec((1, 4, 128), lambda b: (b, z, z)),
            pl.BlockSpec((nr, 4, 128), lambda b: (z, z, z)),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda b: (z, b)),
        out_shape=jax.ShapeDtypeStruct((1, qb * 128), jnp.float32),
        interpret=interpret,
    )(q_planar, cand_planar)
    return out[0]


# ── Group-pruned k-NN rescue kernel (with indices + certificates) ────────────
#
# The generic twin of `rescue_select` (which serves SOR's pass-2): flagged
# queries are re-resolved against only the candidate row-GROUPS whose
# bounding box intersects the rescue ball (active lists computed in-graph
# by the caller — sweep.sweep_knn_two_pass). Returns distances AND global
# sorted-frame positions, plus the count / kth / per-lane-squeeze
# certificate, so KNN-with-indices and normals can rescue without paying
# a whole-cloud scan.


def _rescue_knn_kernel(k: int, per_seg: int, gr: int):
    def kernel(active_ref, q_ref, cand_ref, out_ref):
        b = pl.program_id(0)
        big = jnp.float32(jnp.inf)

        qm_row = q_ref[0, 3:4, :]
        bv = jnp.max(qm_row)

        @pl.when(bv <= 0.5)
        def _():
            z = jnp.zeros((1, 128), jnp.float32)
            for i in range(k):
                out_ref[i : i + 1, :] = z + big
                out_ref[k + i : k + i + 1, :] = z - jnp.float32(1.0)
            out_ref[2 * k : 2 * k + 1, :] = z
            out_ref[2 * k + 1 : 2 * k + 2, :] = z
            out_ref[2 * k + 2 : 2 * k + 3, :] = z + jnp.float32(1.0)

        @pl.when(bv > 0.5)
        def _():
            qx = jnp.transpose(q_ref[0, 0:1, :], (1, 0))  # [128, 1]
            qy = jnp.transpose(q_ref[0, 1:2, :], (1, 0))
            qz = jnp.transpose(q_ref[0, 2:3, :], (1, 0))
            qm = jnp.transpose(qm_row, (1, 0))

            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1).astype(
                jnp.float32
            )

            def group_step(t, state):
                rv, ri, cnt = state
                g = active_ref[b, jnp.int32(1) + t]
                base = g * jnp.int32(gr)
                for r in range(gr):
                    row = cand_ref[pl.ds(base + jnp.int32(r), 1), :, :]
                    cx = row[0, 0:1, :]
                    cy = row[0, 1:2, :]
                    cz = row[0, 2:3, :]
                    cw = row[0, 3:4, :]
                    d2 = (qx - cx) ** 2 + (qy - cy) ** 2 + (qz - cz) ** 2
                    pair = qm * cw
                    w = jnp.where(pair > 0.5, d2, big)
                    gidx = (
                        (base + jnp.int32(r)).astype(jnp.float32)
                        * jnp.float32(128.0)
                        + lane
                    )
                    rv, ri = _insert_smallest_with_idx(
                        rv, ri, w, gidx + 0.0 * d2
                    )
                    cnt = cnt + jnp.where(
                        pair > 0.5, jnp.float32(1.0), 0.0
                    )
                return (rv, ri, cnt)

            regs_v0 = [jnp.full((128, 128), big) for _ in range(per_seg)]
            regs_i0 = [
                jnp.full((128, 128), jnp.float32(-1.0))
                for _ in range(per_seg)
            ]
            regs_v, regs_i, cnt = jax.lax.fori_loop(
                jnp.int32(0),
                active_ref[b, 0].astype(jnp.int32),
                group_step,
                (regs_v0, regs_i0, jnp.zeros((128, 128), jnp.float32)),
            )

            count_all = jnp.sum(
                jnp.transpose(cnt, (1, 0)), axis=0, keepdims=True
            )
            seg_last = regs_v[-1]

            fv = jnp.concatenate(
                [jnp.transpose(x, (1, 0)) for x in regs_v], axis=0
            )
            fi = jnp.concatenate(
                [jnp.transpose(x, (1, 0)) for x in regs_i], axis=0
            )
            nf = per_seg * 128
            rows = jax.lax.broadcasted_iota(jnp.int32, (nf, 128), 0)

            zf = jnp.zeros((1, 128), jnp.float32)
            fw, count, kth = fv, zf, zf
            for i in range(k):
                mn = jnp.min(fw, axis=0, keepdims=True)
                ok = jnp.isfinite(mn)
                am = jnp.min(
                    jnp.where(fw == mn, rows, jnp.int32(nf)),
                    axis=0,
                    keepdims=True,
                )
                hitm = jnp.where(
                    rows == am, jnp.float32(1.0), jnp.float32(0.0)
                )
                idx_val = jnp.sum(hitm * fi, axis=0, keepdims=True)
                out_ref[i : i + 1, :] = jnp.where(
                    ok, jnp.sqrt(jnp.maximum(mn, 0.0)), big
                )
                out_ref[k + i : k + i + 1, :] = jnp.where(
                    ok, idx_val, jnp.float32(-1.0)
                )
                count = count + jnp.where(ok, jnp.float32(1.0), 0.0)
                kth = jnp.where(ok, mn, kth)
                fw = jnp.where(rows == am, big, fw)

            # Per-lane squeeze certificate (cert1 of the sweep KNN kernel):
            # every lane's per_seg-th finalist must be >= the extracted
            # kth, else a closer candidate may have been squeezed out.
            sl_t = jnp.transpose(seg_last, (1, 0))
            cert1 = jnp.min(
                jnp.where(sl_t >= kth, jnp.float32(1.0), jnp.float32(0.0)),
                axis=0,
                keepdims=True,
            )
            cert2 = jnp.where(
                count >= jnp.minimum(jnp.float32(k), count_all),
                jnp.float32(1.0),
                jnp.float32(0.0),
            )
            out_ref[2 * k : 2 * k + 1, :] = count
            out_ref[2 * k + 1 : 2 * k + 2, :] = kth
            out_ref[2 * k + 2 : 2 * k + 3, :] = cert1 * cert2

    return kernel


@partial(jax.jit, static_argnames=("k", "per_seg", "gr", "interpret"))
def rescue_knn_idx(cand_planar, q_planar, active, *, k: int,
                   per_seg: int = 4, gr: int = 8,
                   interpret: bool = False):
    """Group-pruned exact k-NN of flagged query blocks with positions.

    cand_planar f32[NRG, 4, 128] (NRG a multiple of gr, VMEM-resident),
    q_planar f32[QB, 4, 128], active i32[QB, 1+NG]: per block, the count
    and ascending indices of candidate row-groups to visit. Soundness
    contract: a pruned group must contain no candidate within the
    caller's rescue radius of any query in the block — callers certify
    with kth <= radius^2 afterwards.

    Returns f32[2k + 3, QB*128]: rows [0, k) Euclidean distances
    ascending (+inf pad), rows [k, 2k) flat positions in the padded
    SORTED frame (-1 pad), rows 2k..2k+2 = count / kth d2 / segment
    certificate. Fully-padding query blocks are skipped in-kernel.
    """
    from jax.experimental.pallas import tpu as pltpu

    nr, nch, width = cand_planar.shape
    qb = q_planar.shape[0]
    ng = nr // gr
    assert (nch, width) == (4, 128) and nr % gr == 0, cand_planar.shape
    assert active.shape == (qb, 1 + ng), (active.shape, qb, ng)
    kern = _rescue_knn_kernel(k, per_seg, gr)
    z = np.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(qb,),
        in_specs=[
            pl.BlockSpec((1, 4, 128), lambda b, active_ref: (b, z, z)),
            pl.BlockSpec((nr, 4, 128), lambda b, active_ref: (z, z, z)),
        ],
        out_specs=pl.BlockSpec(
            (2 * k + 3, 128), lambda b, active_ref: (z, b)
        ),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2 * k + 3, qb * 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(active, q_planar, cand_planar)


def _rescue_radius_count_kernel(gr: int):
    def kernel(active_ref, q_ref, cand_ref, out_ref):
        b = pl.program_id(0)

        qr2_row = q_ref[0, 3:4, :]  # r^2; -1 marks invalid
        bv = jnp.max(qr2_row)

        @pl.when(bv < 0.0)
        def _():
            out_ref[0:1, :] = jnp.zeros((1, 128), jnp.float32)

        @pl.when(bv >= 0.0)
        def _():
            qx = jnp.transpose(q_ref[0, 0:1, :], (1, 0))
            qy = jnp.transpose(q_ref[0, 1:2, :], (1, 0))
            qz = jnp.transpose(q_ref[0, 2:3, :], (1, 0))
            qr2 = jnp.transpose(qr2_row, (1, 0))

            def group_step(t, cnt):
                g = active_ref[b, jnp.int32(1) + t]
                base = g * jnp.int32(gr)
                for r in range(gr):
                    row = cand_ref[pl.ds(base + jnp.int32(r), 1), :, :]
                    cx = row[0, 0:1, :]
                    cy = row[0, 1:2, :]
                    cz = row[0, 2:3, :]
                    cw = row[0, 3:4, :]
                    d2 = (qx - cx) ** 2 + (qy - cy) ** 2 + (qz - cz) ** 2
                    cnt = cnt + jnp.where(
                        jnp.logical_and(cw > 0.5, d2 <= qr2),
                        jnp.float32(1.0),
                        jnp.float32(0.0),
                    )
                return cnt

            cnt = jax.lax.fori_loop(
                jnp.int32(0),
                active_ref[b, 0].astype(jnp.int32),
                group_step,
                jnp.zeros((128, 128), jnp.float32),
            )
            out_ref[0:1, :] = jnp.sum(
                jnp.transpose(cnt, (1, 0)), axis=0, keepdims=True
            )

    return kernel


@partial(jax.jit, static_argnames=("gr", "interpret"))
def rescue_radius_count_groups(cand_planar, q_planar, active, *,
                               gr: int = 8, interpret: bool = False):
    """Group-pruned exact inclusive within-radius counts of flagged query
    blocks. The per-query r^2 rides the query w channel (-1 = invalid).
    Counting needs no kth certificate: the caller's active lists cover
    every group intersecting the radius ball, so valid-query counts are
    exact by construction. Returns f32[QB*128]."""
    from jax.experimental.pallas import tpu as pltpu

    nr, nch, width = cand_planar.shape
    qb = q_planar.shape[0]
    ng = nr // gr
    assert (nch, width) == (4, 128) and nr % gr == 0, cand_planar.shape
    assert active.shape == (qb, 1 + ng), (active.shape, qb, ng)
    z = np.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(qb,),
        in_specs=[
            pl.BlockSpec((1, 4, 128), lambda b, active_ref: (b, z, z)),
            pl.BlockSpec((nr, 4, 128), lambda b, active_ref: (z, z, z)),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda b, active_ref: (z, b)),
    )
    out = pl.pallas_call(
        _rescue_radius_count_kernel(gr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, qb * 128), jnp.float32),
        interpret=interpret,
    )(active, q_planar, cand_planar)
    return out[0]


# ── RANSAC hypothesis-scoring kernel ─────────────────────────────────────────
#
# Full-scoring inlier counts for every plane hypothesis in one streamed
# pass over the cloud (ops/segmentation.ransac_plane_masked; ref:
# crates/segmentation/src/ransac_plane.rs:81-91 — the reference's
# parallel path scores EVERY hypothesis on EVERY point). The XLA mirror
# materializes the [N, I] distance matrix in HBM (~260 MB f32 at the
# 131K x 512 benchmark row, re-read for the mask and the count reduce);
# here the per-(point-block, hypothesis) hit counts accumulate in a
# lane-carry VMEM tile and reduce over sublanes once, so HBM traffic is
# one read of the planar cloud.


def _ransac_score_kernel(nr: int):
    def kernel(hyp_ref, pts_ref, out_ref, acc):
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        @pl.when(b == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        qx = jnp.transpose(pts_ref[0, 0:1, :], (1, 0))  # [128, 1]
        qy = jnp.transpose(pts_ref[0, 1:2, :], (1, 0))
        qz = jnp.transpose(pts_ref[0, 2:3, :], (1, 0))
        qm = jnp.transpose(pts_ref[0, 3:4, :], (1, 0))
        nx = hyp_ref[0:1, :]  # [1, NH]
        ny = hyp_ref[1:2, :]
        nz = hyp_ref[2:3, :]
        dd = hyp_ref[3:4, :]
        th = hyp_ref[4:5, :]  # threshold broadcast; -1 marks a pad slot

        dist = jnp.abs(qx * nx + qy * ny + qz * nz + dd)  # [128, NH]
        hit = jnp.where(
            jnp.logical_and(qm > 0.5, dist <= th),
            jnp.float32(1.0),
            jnp.float32(0.0),
        )
        acc[...] += hit

        @pl.when(b == nb - 1)
        def _():
            out_ref[0:1, :] = jnp.sum(acc[...], axis=0, keepdims=True)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def ransac_score_counts(hyp, pts_planar, *, interpret: bool = False):
    """Inlier counts per plane hypothesis over the whole masked cloud.

    hyp f32[5, NH] (rows: nx, ny, nz, d, threshold; NH a multiple of
    128 — pad slots carry threshold = -1 so they count 0), pts_planar
    f32[NR, 4, 128] (w = validity). Returns f32[NH] counts (exact: f32
    integer sums stay exact below 2^24 points). Distances are the same
    |n.p + d| form as the XLA score path; counts are bit-identical."""
    from jax.experimental.pallas import tpu as pltpu

    nr, nch, width = pts_planar.shape
    nh = hyp.shape[1]
    assert (nch, width) == (4, 128), pts_planar.shape
    assert hyp.shape[0] == 5 and nh % 128 == 0, hyp.shape
    z = np.int32(0)
    out = pl.pallas_call(
        _ransac_score_kernel(nr),
        grid=(nr,),
        in_specs=[
            pl.BlockSpec((5, nh), lambda b: (z, z)),
            pl.BlockSpec((1, 4, 128), lambda b: (b, z, z)),
        ],
        out_specs=pl.BlockSpec((1, nh), lambda b: (z, z)),
        out_shape=jax.ShapeDtypeStruct((1, nh), jnp.float32),
        scratch_shapes=[pltpu.VMEM((128, nh), jnp.float32)],
        interpret=interpret,
    )(hyp, pts_planar)
    return out[0]


# ── Segmented-scan kernel (voxel-downsample segment sums) ───────────────────
#
# The voxel stage's 5-channel segmented associative_scan is the single most
# expensive piece of the KITTI frame's voxel front-end (~1.9 ms standalone
# at 131K rows): XLA lowers the work-efficient scan as ~2·log2(N) full-array
# combine passes over five 1-D channels, each paying a cross-lane relayout.
# This kernel runs ONE pass over the data instead: each [BR, 128] tile does
# a Hillis-Steele segmented inclusive scan in VMEM (7 lane steps + log2(BR)
# sublane steps of roll + select + add) and a 5-scalar SMEM carry chains
# tiles across the sequential grid.
#
# The XLA mirror below replays the EXACT same combine tree (same rolls,
# same masks, same add order), so kernel and mirror agree BITWISE — the
# fused pipelines and the per-op voxel path may mix them freely across
# hosts without breaking centroid-equality contracts (on one platform).


def _segscan5_kernel(br: int):
    nlast = br * 128 - 1

    def kernel(f_ref, x_ref, y_ref, z_ref, c_ref,
               xo_ref, yo_ref, zo_ref, co_ref, carry_ref):
        from jax.experimental.pallas import tpu as pltpu

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            # f32-pinned literals: under the package's x64 mode a bare
            # 0.0 scalar store lowers as f64 and the Mosaic layout pass
            # CHECK-fails on the 64-bit width.
            zf = jnp.float32(0.0)
            carry_ref[0] = zf  # accumulated flag (any segment start seen)
            carry_ref[1] = zf  # x sum carry
            carry_ref[2] = zf  # y
            carry_ref[3] = zf  # z
            carry_ref[4] = zf  # count

        f = f_ref[...]
        x = x_ref[...]
        y = y_ref[...]
        z = z_ref[...]
        c = c_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, (br, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (br, 128), 0)
        flat = row * 128 + lane

        d = 1
        while d < 128:
            def sh(a, d=d):
                # np.int32 shifts: python ints become i64 under x64 and
                # tpu.dynamic_rotate requires an i32 operand.
                s1 = pltpu.roll(a, shift=np.int32(d), axis=1)
                s2 = pltpu.roll(s1, shift=np.int32(1), axis=0)
                return jnp.where(lane < d, s2, s1)

            ok = flat >= d
            fs = jnp.where(ok, sh(f), 0.0)
            xs = jnp.where(ok, sh(x), 0.0)
            ys = jnp.where(ok, sh(y), 0.0)
            zs = jnp.where(ok, sh(z), 0.0)
            cs = jnp.where(ok, sh(c), 0.0)
            x = jnp.where(f > 0.5, x, x + xs)
            y = jnp.where(f > 0.5, y, y + ys)
            z = jnp.where(f > 0.5, z, z + zs)
            c = jnp.where(f > 0.5, c, c + cs)
            f = jnp.maximum(f, fs)
            d *= 2
        dr = 1
        while dr < br:
            def shr(a, dr=dr):
                return pltpu.roll(a, shift=np.int32(dr), axis=0)

            ok = row >= dr
            fs = jnp.where(ok, shr(f), 0.0)
            xs = jnp.where(ok, shr(x), 0.0)
            ys = jnp.where(ok, shr(y), 0.0)
            zs = jnp.where(ok, shr(z), 0.0)
            cs = jnp.where(ok, shr(c), 0.0)
            x = jnp.where(f > 0.5, x, x + xs)
            y = jnp.where(f > 0.5, y, y + ys)
            z = jnp.where(f > 0.5, z, z + zs)
            c = jnp.where(f > 0.5, c, c + cs)
            f = jnp.maximum(f, fs)
            dr *= 2

        # Apply the left-of-tile carry to rows before the tile's first
        # segment start, then chain the carry from the (post-carry) last
        # element. Scalar extraction via a one-hot masked sum (exact: one
        # nonzero term) — Mosaic has no arbitrary vector->scalar extract.
        cx = carry_ref[1]
        cy = carry_ref[2]
        cz = carry_ref[3]
        cc = carry_ref[4]
        xo = jnp.where(f > 0.5, x, x + cx)
        yo = jnp.where(f > 0.5, y, y + cy)
        zo = jnp.where(f > 0.5, z, z + cz)
        co = jnp.where(f > 0.5, c, c + cc)
        xo_ref[...] = xo
        yo_ref[...] = yo
        zo_ref[...] = zo
        co_ref[...] = co
        # (flat == nlast) cast, NOT where(.., 1.0, 0.0): an all-literal
        # where is weakly typed and lowers f64 under x64 — 64-bit vectors
        # CHECK-crash the Mosaic layout pass.
        last = (flat == nlast).astype(jnp.float32)
        carry_ref[0] = jnp.maximum(carry_ref[0], jnp.sum(f * last))
        carry_ref[1] = jnp.sum(xo * last)
        carry_ref[2] = jnp.sum(yo * last)
        carry_ref[3] = jnp.sum(zo * last)
        carry_ref[4] = jnp.sum(co * last)

    return kernel


def _segscan5_block(br: int):
    """The kernel's per-tile Hillis-Steele steps as XLA ops on
    [T, BR, 128] channel stacks — IDENTICAL roll/mask/add order."""

    def block(f, x, y, z, c):
        lane = jax.lax.broadcasted_iota(jnp.int32, (br, 128), 1)[None]
        row = jax.lax.broadcasted_iota(jnp.int32, (br, 128), 0)[None]
        flat = row * 128 + lane
        d = 1
        while d < 128:
            def sh(a, d=d):
                s1 = jnp.roll(a, d, axis=2)
                s2 = jnp.roll(s1, 1, axis=1)
                return jnp.where(lane < d, s2, s1)

            ok = flat >= d
            fs = jnp.where(ok, sh(f), 0.0)
            xs = jnp.where(ok, sh(x), 0.0)
            ys = jnp.where(ok, sh(y), 0.0)
            zs = jnp.where(ok, sh(z), 0.0)
            cs = jnp.where(ok, sh(c), 0.0)
            x = jnp.where(f > 0.5, x, x + xs)
            y = jnp.where(f > 0.5, y, y + ys)
            z = jnp.where(f > 0.5, z, z + zs)
            c = jnp.where(f > 0.5, c, c + cs)
            f = jnp.maximum(f, fs)
            d *= 2
        dr = 1
        while dr < br:
            def shr(a, dr=dr):
                return jnp.roll(a, dr, axis=1)

            ok = row >= dr
            fs = jnp.where(ok, shr(f), 0.0)
            xs = jnp.where(ok, shr(x), 0.0)
            ys = jnp.where(ok, shr(y), 0.0)
            zs = jnp.where(ok, shr(z), 0.0)
            cs = jnp.where(ok, shr(c), 0.0)
            x = jnp.where(f > 0.5, x, x + xs)
            y = jnp.where(f > 0.5, y, y + ys)
            z = jnp.where(f > 0.5, z, z + zs)
            c = jnp.where(f > 0.5, c, c + cs)
            f = jnp.maximum(f, fs)
            dr *= 2
        return f, x, y, z, c

    return block


def _segscan_br(nrows: int) -> int:
    """Tile height: one compiled shape per (nrows) — kernel and mirror
    derive it identically so their combine trees match."""
    return min(512, nrows)


@partial(jax.jit, static_argnames=("interpret",))
def segmented_scan_sums(first, x, y, z, c, *, interpret: bool = False):
    """Segmented inclusive scan of 4 f32 value channels over flat [N]
    arrays (N % 128 == 0), segments starting where ``first`` = 1.0.
    Returns (sx, sy, sz, sc) f32[N]. Combine tree = per-tile
    Hillis-Steele + sequential tile carry; `segmented_scan_sums_xla` is
    the bitwise-identical XLA mirror."""
    n = first.shape[0]
    nrows = max(-(-n // 128), 1)
    br = _segscan_br(nrows)
    t = -(-nrows // br)
    pad = t * br * 128 - n
    if pad:
        zf = jnp.zeros((pad,), jnp.float32)
        first, x, y, z, c = (
            jnp.concatenate([a, zf]) for a in (first, x, y, z, c)
        )

    def shape2(a):
        return a.reshape(t * br, 128)

    from jax.experimental.pallas import tpu as pltpu

    zi = np.int32(0)
    im = lambda i: (i, zi)  # noqa: E731
    outs = pl.pallas_call(
        _segscan5_kernel(br),
        grid=(t,),
        in_specs=[pl.BlockSpec((br, 128), im)] * 5,
        out_specs=[pl.BlockSpec((br, 128), im)] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((t * br, 128), jnp.float32)
            for _ in range(4)
        ],
        scratch_shapes=[pltpu.SMEM((8,), jnp.float32)],
        interpret=interpret,
    )(shape2(first), shape2(x), shape2(y), shape2(z), shape2(c))
    return tuple(o.reshape(-1)[:n] for o in outs)


@jax.jit
def segmented_scan_sums_xla(first, x, y, z, c):
    """Bitwise mirror of `segmented_scan_sums` (same tree, no kernel)."""
    n = first.shape[0]
    nrows = max(-(-n // 128), 1)
    br = _segscan_br(nrows)
    t = -(-nrows // br)
    pad = t * br * 128 - n
    if pad:
        zf = jnp.zeros((pad,), jnp.float32)
        first, x, y, z, c = (
            jnp.concatenate([a, zf]) for a in (first, x, y, z, c)
        )

    def shape3(a):
        return a.reshape(t, br, 128)

    f3, x3, y3, z3, c3 = (shape3(a) for a in (first, x, y, z, c))
    bf, bx, by, bz, bc = _segscan5_block(br)(f3, x3, y3, z3, c3)

    # Sequential tile-carry chain, identical formulas to the kernel.
    def step(carry, tile):
        cf, cx, cy, cz, cc = carry
        f, xx, yy, zz, ct = tile
        xo = jnp.where(f > 0.5, xx, xx + cx)
        yo = jnp.where(f > 0.5, yy, yy + cy)
        zo = jnp.where(f > 0.5, zz, zz + cz)
        co = jnp.where(f > 0.5, ct, ct + cc)
        nf = jnp.maximum(cf, f[-1, -1])
        return (nf, xo[-1, -1], yo[-1, -1], zo[-1, -1], co[-1, -1]), (
            xo, yo, zo, co
        )

    zero = jnp.float32(0.0)
    _, (ox, oy, oz, oc) = jax.lax.scan(
        step, (zero, zero, zero, zero, zero), (bf, bx, by, bz, bc)
    )
    return tuple(o.reshape(-1)[:n] for o in (ox, oy, oz, oc))
