"""KNN-moments sweep: kernel (interpret) vs XLA mirror vs f64 brute force.

The two-phase moments kernel re-derives squared distances against the kth
threshold, so it uses BANDED inclusion (pallas_kernels.D2_BAND) to stay
deterministic under per-consumer FMA contraction; certified rows must be
exactly the true top-k. These tests pin:
- kernel/mirror flag agreement and certified-row value parity,
- certified rows against an f64 brute-force oracle,
- both the VMEM-resident and the DMA kernel variants.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pointclouds_tpu.spatial.pallas_kernels as pk
from pointclouds_tpu.spatial.sweep import sweep_knn_moments


def _cloud(seed, n, invalid_frac=0.1):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    valid = rng.random(n) > invalid_frac
    bad = ~valid & (rng.random(n) > 0.5)
    xyz[bad] = np.nan
    return xyz, valid


@pytest.mark.parametrize(
    "n,k,cell", [(4096, 15, 1.3), (2000, 8, 1.4), (1500, 5, 2.0)]
)
def test_moments_kernel_matches_mirror(n, k, cell):
    xyz, valid = _cloud(0, n)
    a = sweep_knn_moments(
        jnp.asarray(xyz), jnp.asarray(valid), np.float32(cell), k=k,
        use_kernel=True, interpret=True,
    )
    b = sweep_knn_moments(
        jnp.asarray(xyz), jnp.asarray(valid), np.float32(cell), k=k,
        use_kernel=False,
    )
    m1a, m2a, ca, oka = (np.asarray(x) for x in a)
    m1b, m2b, cb, okb = (np.asarray(x) for x in b)
    assert (oka == okb).all()
    assert oka.mean() > 0.5  # the scene must actually certify broadly
    sel = oka
    np.testing.assert_allclose(m1a[sel], m1b[sel], atol=1e-4)
    np.testing.assert_allclose(m2a[sel], m2b[sel], atol=1e-3)
    np.testing.assert_array_equal(ca[sel], cb[sel])


def test_moments_certified_match_f64_brute():
    k, cell = 10, 1.2
    xyz, valid = _cloud(1, 3000)
    m1, m2, cnt, ok = (
        np.asarray(x)
        for x in sweep_knn_moments(
            jnp.asarray(xyz), jnp.asarray(valid), np.float32(cell), k=k,
            use_kernel=True, interpret=True,
        )
    )
    fin = np.isfinite(xyz).all(1) & valid
    fxyz = xyz[fin].astype(np.float64)
    idx = np.nonzero(ok)[0]
    assert len(idx) > 500
    for i in idx[:: max(1, len(idx) // 80)]:
        d2 = ((fxyz - xyz[i].astype(np.float64)) ** 2).sum(1)
        o = np.argsort(d2)
        rel = fxyz[o[:k]] - xyz[i].astype(np.float64)
        np.testing.assert_allclose(m1[i], rel.sum(0), atol=2e-3)
        np.testing.assert_allclose(cnt[i], k)


def test_moments_dma_variant_matches_mirror(monkeypatch):
    monkeypatch.setattr(pk, "RESIDENT_PLANAR_BYTES", 0)
    xyz, valid = _cloud(3, 4096)
    a = sweep_knn_moments(
        jnp.asarray(xyz), jnp.asarray(valid), np.float32(1.3), k=15,
        use_kernel=True, interpret=True,
    )
    b = sweep_knn_moments(
        jnp.asarray(xyz), jnp.asarray(valid), np.float32(1.3), k=15,
        use_kernel=False,
    )
    m1a, _, _, oka = (np.asarray(x) for x in a)
    m1b, _, _, okb = (np.asarray(x) for x in b)
    assert (oka == okb).all()
    sel = oka
    np.testing.assert_allclose(m1a[sel], m1b[sel], atol=1e-4)


def test_moments_duplicate_points_tie_flagged():
    """Exact duplicates put >k candidates at the kth distance: those rows
    must flag (cle > count), not silently pick an arbitrary subset."""
    rng = np.random.default_rng(7)
    base = rng.uniform(0, 5, (400, 3)).astype(np.float32)
    xyz = np.concatenate([base, base, base])  # every point tripled
    valid = np.ones(len(xyz), bool)
    k = 4
    m1, m2, cnt, ok = (
        np.asarray(x)
        for x in sweep_knn_moments(
            jnp.asarray(xyz), jnp.asarray(valid), np.float32(1.0), k=k,
            use_kernel=True, interpret=True,
        )
    )
    # With triplicated points the k=4 boundary usually falls inside a
    # duplicate group somewhere; every certified row must have an
    # unambiguous neighbor set. Cross-check certified rows against f64.
    fxyz = xyz.astype(np.float64)
    idx = np.nonzero(ok)[0]
    for i in idx[:: max(1, len(idx) // 50)]:
        d2 = ((fxyz - fxyz[i]) ** 2).sum(1)
        o = np.argsort(d2, kind="stable")
        kth = np.sort(d2)[k - 1]
        assert (d2 <= kth).sum() == k  # certified => tie-free
        rel = fxyz[o[:k]] - fxyz[i]
        np.testing.assert_allclose(m1[i], rel.sum(0), atol=2e-3)
