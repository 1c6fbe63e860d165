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
from jax.experimental import pallas as pl


def _sor_select_kernel(k: int, ncand: int, m: int):
    def kernel(q_ref, qm_ref, cand_ref, cv_ref, total_ref, count_ref, kth_ref):
        # One cell per grid step. This exact formulation compiles under
        # Mosaic; keep weak-typed Python-int sentinels and the fused
        # where-min "argmin" (cosmetically equivalent variants have failed
        # to legalize).
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
                jnp.where(w == mn, rows, ncand), axis=0, keepdims=True
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
            0, k + 1, body, (work, zf, jnp.zeros((1, m), jnp.int32), zf)
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
    total, count, kth = pl.pallas_call(
        kern,
        grid=(c,),
        in_specs=[
            pl.BlockSpec((1, 3, m), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, ncand, 3), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, ncand, 1), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0)),
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
