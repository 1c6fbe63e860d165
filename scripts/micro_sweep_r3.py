#!/usr/bin/env python3
"""Per-kernel sweep timings at 100K (uniform + segmented scenes), varying
wr — separates window-walk overhead from selection cost. All jits are
module-level (a fresh jax.jit per rep retraces and poisons the timing)."""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import pointclouds_tpu as pc
from pointclouds_tpu.spatial import engine, sweep


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def t(label, fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label:56s} {min(ts):9.2f} ms", flush=True)
    return out


@partial(jax.jit, static_argnames=("wr",))
def struct_only(xyz, valid, cell, *, wr):
    return sweep._sorted_structure(
        xyz, valid, cell, wr, sweep.SWEEP_TABLE_SIZE
    )["planar"]


@partial(jax.jit, static_argnames=("wr", "k"))
def knn_k(xyz, valid, cell, *, k, wr):
    return sweep.sweep_knn(xyz, valid, cell, k=k, wr=wr, use_kernel=True)


@partial(jax.jit, static_argnames=("wr", "k"))
def moments_k(xyz, valid, cell, *, k, wr):
    return sweep.sweep_knn_moments(
        xyz, valid, cell, k=k, wr=wr, use_kernel=True
    )


@partial(jax.jit, static_argnames=("wr", "k"))
def sor_k(xyz, valid, cell, *, k, wr):
    return sweep.sweep_sor_two_pass(
        xyz, valid, cell, k=k, wr=wr, use_kernel=True
    )


@partial(jax.jit, static_argnames=("wr",))
def count_k(xyz, valid, radius, *, wr):
    return sweep.sweep_radius_count(
        xyz, valid, radius, wr=wr, use_kernel=True
    )


def main():
    f = jax.jit(lambda a: a + 1)
    x = jnp.ones((8,), jnp.float32)
    sync(f(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        sync(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    floor = float(np.percentile(ts, 50))
    print(f"floor: {floor:.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    scenes = {
        "uniform100K": (rng.random((100_000, 3)) * 10).astype(np.float32),
        "seg100K": np.vstack([
            (rng.random((80_000, 3)) * [20, 20, 0.05]).astype(np.float32),
            (rng.random((20_000, 3)) * 20).astype(np.float32),
        ]),
    }
    k = 10
    for name, pts in scenes.items():
        c = pc.PointCloud.from_numpy(pts)
        xyz, valid = c._arrs.xyz, c._arrs.valid
        cell = jnp.float32(
            float(np.asarray(engine.estimate_cell_size(xyz, valid, k)))
        )
        print(f"── {name} (cell={float(cell):.4f}) ──", flush=True)
        for wr in (4, 16):
            t(f"{name} structure wr={wr}", struct_only, xyz, valid, cell,
              wr=wr)
            t(f"{name} radius_count wr={wr}", count_k, xyz, valid,
              jnp.float32(float(cell)), wr=wr)
            out = t(f"{name} sweep_knn k=10 wr={wr}", knn_k, xyz, valid,
                    cell, k=k, wr=wr)
            print(f"    certified: {int(np.asarray(out[3]).sum())}",
                  flush=True)
            t(f"{name} knn_moments k=10 wr={wr}", moments_k, xyz, valid,
              cell, k=k, wr=wr)
            t(f"{name} sor_two_pass k=10 wr={wr}", sor_k, xyz, valid, cell,
              k=k, wr=wr)


if __name__ == "__main__":
    main()
