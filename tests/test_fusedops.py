"""Fused-op kernel-path parity on CPU (interpret mode): the single-
dispatch fused ops with use_kernel=True must reproduce the XLA-mirror
path bit-for-bit at the op-output level — this covers the rescue-kernel
WIRING (planar packing, transposes, position clipping) that otherwise
only executes on TPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.ops import fusedops as fo
from pointclouds_tpu.spatial import engine


def _cloud(n=4096, seed=3):
    # Above BRUTE_THRESHOLD so the sweep path (not the small brute) runs;
    # mixed density so some rows actually get flagged and rescued.
    rng = np.random.default_rng(seed)
    pts = np.vstack([
        (rng.random((n - 32, 3)) * 8).astype(np.float32),
        # Mild sparse halo: flags a handful of rows into the rescue
        # without wrecking the global cell estimate.
        (rng.random((32, 3)) * 16 - 4).astype(np.float32),
    ])
    assert len(pts) > engine.BRUTE_THRESHOLD
    return make_cloud_arrays(pts)


def _run_pair(fn):
    a = fn(uk=False)
    b = fn(uk=True)
    return a, b


def test_sor_fused_kernel_parity():
    arrs = _cloud()
    n = arrs.capacity
    cap = fo.fused_rescue_cap(n)

    def run(uk):
        out, info = fo.sor_fused(
            arrs, jnp.float32(1.5), k=10, wr=4, cap=cap, use_kernel=uk,
            interpret=uk,
        )
        return np.asarray(out.xyz), np.asarray(out.valid), np.asarray(info)

    (x0, v0, i0), (x1, v1, i1) = _run_pair(lambda uk: run(uk))
    assert i0[1] == 1 and i1[1] == 1, "rescue cap overflowed; enlarge cap"
    assert i0[0] == i1[0]
    np.testing.assert_array_equal(v0, v1)
    np.testing.assert_allclose(x0[v0], x1[v1], atol=0)


def test_ror_fused_kernel_parity():
    arrs = _cloud(seed=5)
    n = arrs.capacity
    cap = fo.fused_rescue_cap(n)

    def run(uk):
        out, info = fo.ror_fused(
            arrs, jnp.float32(0.6), jnp.int32(4), wr=4, cap=cap,
            use_kernel=uk, interpret=uk,
        )
        return np.asarray(out.valid), np.asarray(info)

    (v0, i0), (v1, i1) = _run_pair(lambda uk: run(uk))
    assert i0[1] == 1 and i1[1] == 1
    assert i0[0] == i1[0]
    np.testing.assert_array_equal(v0, v1)


def test_normals_fused_kernel_parity():
    arrs = _cloud(seed=7)
    n = arrs.capacity
    cap = 2048  # headroom: the sparse halo flags many rows
    vp = jnp.asarray([0.0, 0.0, 100.0], jnp.float32)

    def run(uk):
        nrm, exact = fo.normals_fused(
            arrs.xyz, arrs.valid, vp, k=10, wr=4, cap=cap, use_kernel=uk,
            interpret=uk,
        )
        return np.asarray(nrm), int(np.asarray(exact))

    (n0, e0), (n1, e1) = _run_pair(lambda uk: run(uk))
    assert e0 == 1 and e1 == 1
    valid = np.asarray(arrs.valid)
    # Kernel and mirror may pick different-but-equidistant neighbor sets
    # at exact ties; on random data normals should agree to fp tolerance.
    dot = np.abs(np.sum(n0[valid] * n1[valid], axis=1))
    assert (dot > 1.0 - 1e-4).mean() > 0.999


def test_knn_fused_kernel_parity():
    arrs = _cloud(seed=9)
    n = arrs.capacity
    cap = 2048  # headroom: the sparse halo flags many rows

    def run(uk):
        d, i, nv, exact = fo.knn_fused(
            arrs.xyz, arrs.valid, k=8, wr=4, cap=cap, use_kernel=uk,
            interpret=uk,
        )
        return (np.asarray(d), np.asarray(i), np.asarray(nv),
                int(np.asarray(exact)))

    (d0, i0, v0, e0), (d1, i1, v1, e1) = _run_pair(lambda uk: run(uk))
    assert e0 == 1 and e1 == 1
    valid = np.asarray(arrs.valid)
    np.testing.assert_array_equal(v0[valid], v1[valid])
    np.testing.assert_allclose(
        d0[valid][v0[valid]], d1[valid][v1[valid]], atol=1e-5
    )
    # Indices may differ only at exact distance ties (none expected in
    # random data).
    same = (i0[valid] == i1[valid]) | ~v0[valid]
    assert same.mean() > 0.9999
