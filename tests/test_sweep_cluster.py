"""Differential tests for sweep min-label clustering (spatial/sweep.py
sweep_cluster_labels) vs a numpy union-find oracle."""

import collections

import numpy as np
import jax.numpy as jnp
import pytest

import pointclouds_tpu  # noqa: F401
from pointclouds_tpu.spatial.sweep import sweep_cluster_labels


def brute_components(pts, mask, r):
    """Union-find over all pairs with distance <= r (f32)."""
    ok = mask & np.isfinite(pts).all(axis=1)
    idx = np.nonzero(ok)[0]
    P = pts[idx].astype(np.float32)
    n = len(pts)
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    d2 = ((P[:, None, :] - P[None, :, :]) ** 2).sum(-1)
    r2 = np.float32(r) * np.float32(r)
    for i, j in zip(*np.nonzero(d2 <= r2)):
        if i < j:
            ra, rb = find(idx[i]), find(idx[j])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) if ok[i] else i for i in range(n)]), ok


def canon(labels, ok):
    groups = collections.defaultdict(list)
    for i in np.nonzero(ok)[0]:
        groups[labels[i]].append(i)
    return sorted(tuple(sorted(v)) for v in groups.values())


def _check(xyz, valid, r, use_kernel, row_cap=16, wr=7):
    labels, exact = sweep_cluster_labels(
        jnp.asarray(xyz),
        jnp.asarray(valid),
        np.float32(r),
        use_kernel=use_kernel,
        interpret=use_kernel,
        row_cap=row_cap,
        wr=wr,
    )
    labels = np.asarray(labels)
    expect, ok = brute_components(xyz, valid, r)
    assert bool(exact), "window overflow on a test scene"
    assert canon(labels, ok) == canon(expect, ok)
    # representative = smallest member row (cell_graph_labels contract)
    for g in canon(labels, ok):
        assert all(labels[i] == min(g) for i in g)
    return labels


def test_cluster_windows_backend_dense_blobs():
    """row_cap=None routes to the 9-dynamic-window multisweep (the dense
    workload backend restored for aerial/slab scenes): same components as
    union-find on a scene whose per-block candidate rows overflow the
    flat row list."""
    rng = np.random.default_rng(11)
    # One dense slab: ~350 points per cluster cell -> 9-window candidate
    # unions of ~25 rows, far past any practical flat-list cap.
    xyz = np.vstack([
        (rng.random((3500, 3)) * [2.0, 2.0, 0.05]).astype(np.float32),
        (rng.random((596, 3)) * 12.0 + 8.0).astype(np.float32),
    ]).astype(np.float32)
    valid = np.ones(len(xyz), bool)
    # The flat row list must overflow here (else the scene is too thin to
    # exercise the fallback); the windows backend must still be exact.
    _, exact16 = sweep_cluster_labels(
        jnp.asarray(xyz), jnp.asarray(valid), np.float32(0.5),
        use_kernel=True, interpret=True, row_cap=8,
    )
    assert not bool(exact16)
    # wr=32: the engine's resident ladder uses wr=min(nrows, 64); the
    # dense slab's window spans exceed the sparse-scene default wr=7.
    _check(xyz, valid, 0.5, True, row_cap=None, wr=32)


@pytest.mark.parametrize("use_kernel", [False, True])
def test_cluster_blobs_and_noise(use_kernel):
    rng = np.random.default_rng(7)
    pts = np.vstack(
        [
            rng.normal([0, 0, 0], 0.3, (300, 3)),
            rng.normal([5, 5, 0], 0.4, (400, 3)),
            rng.normal([9, 1, 1], 0.2, (150, 3)),
            rng.random((150, 3)) * 12,
        ]
    ).astype(np.float32)
    n = len(pts)
    xyz = np.zeros((1024, 3), np.float32)
    xyz[:n] = pts
    valid = np.zeros(1024, bool)
    valid[:n] = True
    xyz[50] = np.inf
    valid[60] = False
    labels = _check(xyz, valid, 0.5, use_kernel)
    assert labels[50] == 50 and labels[60] == 60  # singletons keep own row


@pytest.mark.parametrize("use_kernel", [False, True])
def test_cluster_chain_needs_iterations(use_kernel):
    # A long chain exercises convergence (propagation + pointer jumping).
    n = 400
    t = np.linspace(0, 30, n)
    pts = np.column_stack([t, np.sin(t), np.zeros(n)]).astype(np.float32)
    xyz = np.zeros((512, 3), np.float32)
    xyz[:n] = pts
    valid = np.zeros(512, bool)
    valid[:n] = True
    labels = _check(xyz, valid, 0.2, use_kernel)
    assert (labels[:n] == labels[0]).all()  # one chain component


@pytest.mark.parametrize("use_kernel", [False, True])
def test_cluster_inclusive_boundary(use_kernel):
    # Points at EXACTLY distance r must connect (inclusive threshold,
    # ref: crates/segmentation/src/euclidean.rs behavior).
    xyz = np.zeros((256, 3), np.float32)
    xyz[0] = [0, 0, 0]
    xyz[1] = [1.0, 0, 0]
    xyz[2] = [2.5, 0, 0]
    valid = np.zeros(256, bool)
    valid[:3] = True
    labels = _check(xyz, valid, 1.0, use_kernel)
    assert labels[0] == labels[1] == 0
    assert labels[2] == 2


@pytest.mark.parametrize("use_kernel", [False, True])
def test_cluster_georeferenced(use_kernel):
    rng = np.random.default_rng(9)
    pts = np.vstack(
        [
            rng.normal([2, 0, 0], 0.2, (200, 3)),
            rng.normal([8, 3, 1], 0.2, (200, 3)),
        ]
    ).astype(np.float32) + np.float32([4.5e5, 1.2e5, 300.0])
    xyz = np.zeros((512, 3), np.float32)
    xyz[: len(pts)] = pts
    valid = np.zeros(512, bool)
    valid[: len(pts)] = True
    _check(xyz, valid, 1.0, use_kernel)
