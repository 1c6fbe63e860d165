"""Interpret-mode parity of the resident brute rescue kernels
(pallas_kernels.brute_knn_idx / brute_radius_count / nn_argmin) against
the tiled XLA brute paths they replace on TPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from pointclouds_tpu.ops.registration import _to_planar
from pointclouds_tpu.spatial.knn import (
    bruteforce_knn,
    bruteforce_radius_count,
)
from pointclouds_tpu.spatial.pallas_kernels import (
    brute_knn_idx,
    brute_radius_count,
)


@pytest.mark.parametrize(
    "n_q,n_p,k", [(300, 500, 5), (128, 128, 3), (7, 1000, 11), (257, 950, 10)]
)
def test_brute_knn_idx_matches_xla(n_q, n_p, k):
    rng = np.random.default_rng(0)
    q = (rng.random((n_q, 3)) * 10).astype(np.float32)
    p = (rng.random((n_p, 3)) * 10).astype(np.float32)
    qu = jnp.asarray(rng.random(n_q) > 0.1)
    pu = jnp.asarray(rng.random(n_p) > 0.1)
    out = np.asarray(
        brute_knn_idx(
            _to_planar(jnp.asarray(q), qu), _to_planar(jnp.asarray(p), pu),
            k=k, interpret=True,
        )
    )
    kd = out[:k, :n_q].T
    kidx = out[k : 2 * k, :n_q].T.astype(int)
    xd, xidx, xv = map(
        np.asarray, bruteforce_knn(jnp.asarray(p), pu, jnp.asarray(q), qu, k)
    )
    qu_np = np.asarray(qu)
    np.testing.assert_allclose(
        kd[qu_np][xv[qu_np]], xd[qu_np][xv[qu_np]], atol=1e-5
    )
    # Index mismatches only possible at exact float ties (none in random
    # data).
    assert (kidx[qu_np] == xidx[qu_np])[xv[qu_np]].all()


def test_brute_radius_count_matches_xla():
    rng = np.random.default_rng(1)
    n_q, n_p, r = 300, 900, 1.2
    q = (rng.random((n_q, 3)) * 10).astype(np.float32)
    p = (rng.random((n_p, 3)) * 10).astype(np.float32)
    qu = jnp.asarray(rng.random(n_q) > 0.1)
    pu = jnp.asarray(rng.random(n_p) > 0.1)
    qp = _to_planar(jnp.asarray(q), qu)
    r2w = jnp.where(np.asarray(qu), np.float32(r * r), -1.0)
    qp = qp.at[:, 3, :].set(
        jnp.pad(
            r2w, (0, qp.shape[0] * 128 - n_q), constant_values=-1.0
        ).reshape(qp.shape[0], 128)
    )
    counts = np.asarray(
        brute_radius_count(
            qp, _to_planar(jnp.asarray(p), pu), interpret=True
        )
    )[:n_q]
    ref = np.asarray(
        bruteforce_radius_count(
            jnp.asarray(p), pu, jnp.asarray(q), qu, np.float32(r)
        )
    )
    qu_np = np.asarray(qu)
    assert (counts[qu_np].astype(int) == ref[qu_np]).all()
    assert (counts[~qu_np] == 0).all()
