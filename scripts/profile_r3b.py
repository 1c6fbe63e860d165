#!/usr/bin/env python3
"""Round-3 deep profile: ICP per-iteration cost, sweep cost breakdown on
a uniform-3D 100K cloud (the bench_ops workload), voxel-1M sort split."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import pointclouds_tpu as pc
from pointclouds_tpu.spatial import engine
from pointclouds_tpu.spatial import sweep as _sweep
from pointclouds_tpu.ops import fusedops as _fused
from pointclouds_tpu.ops import filters as _filters
from pointclouds_tpu.ops import registration as _reg


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def t(label, fn, reps=3):
    out = fn()
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label:52s} {min(ts):9.2f} ms", flush=True)
    return out


def main():
    f = jax.jit(lambda a: a + 1)
    x = jnp.ones((8,), jnp.float32)
    sync(f(x))
    floor_ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        sync(f(x))
        floor_ts.append((time.perf_counter() - t0) * 1e3)
    print(f"floor: {np.percentile(floor_ts, 50):.2f} ms", flush=True)

    rng = np.random.default_rng(0)

    # ── ICP per-iteration ──
    print("== ICP 10K ==", flush=True)
    src = (rng.random((10_000, 3)) * 10).astype(np.float32)
    s = pc.PointCloud.from_numpy(src)
    tg = pc.PointCloud.from_numpy(src + np.float32(0.05))
    sa, ta = s._arrs, tg._arrs
    for iters in (1, 2, 4, 8):
        t(f"icp packed max_iterations={iters}",
          lambda it=iters: _reg.icp_point_to_point_packed(
              sa.xyz, sa.valid, ta.xyz, ta.valid, it,
              jnp.float32(0.0), jnp.float32(np.inf)))
    nn = jax.jit(lambda a, av, b, bv: _reg._nn_1(a, av, b, bv))
    t("nn_1 10K->10K (one correspondence pass)",
      lambda: nn(sa.xyz, sa.valid, ta.xyz, ta.valid))

    # ── Sweep breakdown at 100K uniform box=10 (bench_ops cloud) ──
    print("== sweep 100K uniform ==", flush=True)
    pts = (rng.random((100_000, 3)) * 10).astype(np.float32)
    c = pc.PointCloud.from_numpy(pts)
    xyz, valid = c._arrs.xyz, c._arrs.valid
    n = xyz.shape[0]
    k = 10
    cellf = float(np.asarray(engine.estimate_cell_size(xyz, valid, k)))
    wr = engine._sweep_wr(n)
    ts_ = _sweep.SWEEP_TABLE_SIZE
    print(f"n(padded)={n} cell={cellf:.4f} wr={wr}", flush=True)

    structure = jax.jit(
        lambda x_, v_: _sweep._sorted_structure(
            x_, v_, jnp.float32(cellf), wr, ts_
        )["planar"]
    )
    t("sorted_structure only", lambda: structure(xyz, valid))

    t("sweep_knn (kernel)",
      lambda: jax.jit(
          lambda x_, v_: _sweep.sweep_knn(
              x_, v_, jnp.float32(cellf), k=k, wr=wr, use_kernel=True
          )
      )(xyz, valid))
    out = t("knn_fused (sweep + in-graph rescue)",
            lambda: _fused.knn_fused(
                xyz, valid, k=k, wr=wr, cap=_fused.fused_rescue_cap(n),
                use_kernel=True))
    t("sweep_knn_moments (kernel)",
      lambda: jax.jit(
          lambda x_, v_: _sweep.sweep_knn_moments(
              x_, v_, jnp.float32(cellf), k=k, wr=wr, use_kernel=True
          )
      )(xyz, valid))
    t("sweep_sor_two_pass (kernel)",
      lambda: jax.jit(
          lambda x_, v_: _sweep.sweep_sor_two_pass(
              x_, v_, jnp.float32(cellf), k=k, wr=wr, use_kernel=True
          )
      )(xyz, valid))
    knn_out = jax.jit(
        lambda x_, v_: _sweep.sweep_knn(
            x_, v_, jnp.float32(cellf), k=k, wr=wr, use_kernel=True
        )
    )(xyz, valid)
    print(f"knn certified: {int(np.asarray(knn_out[3]).sum())}/{n}",
          flush=True)

    # ── voxel 1M split ──
    print("== voxel 1M ==", flush=True)
    big = (rng.random((1_000_000, 3)) * 10).astype(np.float32)
    cb = pc.PointCloud.from_numpy(big)
    bxyz, bvalid = cb._arrs.xyz, cb._arrs.valid
    t("voxel_fused 1M", lambda: _fused.voxel_fused(
        bxyz, bvalid, jnp.float32(0.5)))

    key = jax.jit(
        lambda x_, v_: jnp.where(
            jnp.logical_and(v_, jnp.all(jnp.isfinite(x_), axis=-1)),
            _filters.pack_cell_key(_filters.cell_coords(x_, jnp.float32(0.5))),
            _filters.INVALID_KEY,
        )
    )
    kk = t("pack keys 1M", lambda: key(bxyz, bvalid))
    t("argsort keys 1M", lambda: jax.jit(
        lambda a: jnp.argsort(a, stable=True))(kk))
    t("sort keys only 1M", lambda: jax.jit(jnp.sort)(kk))
    t("lax.sort key+xyz payload 1M", lambda: jax.jit(
        lambda a, x_: jax.lax.sort(
            (a, x_[:, 0], x_[:, 1], x_[:, 2]), num_keys=1, is_stable=True
        )
    )(kk, bxyz))


if __name__ == "__main__":
    main()
