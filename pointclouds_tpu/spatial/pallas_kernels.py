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
