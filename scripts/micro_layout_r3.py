#!/usr/bin/env python3
"""Quantify the per-call [N,3] jit-arg relayout at 1M and test the fix:
device_put the array ONCE into the compiled program's preferred input
layout (jax.experimental.layout), then call with zero per-call copies."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import pointclouds_tpu as pc
from pointclouds_tpu.ops import fusedops as _fused


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def t(label, fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{label:56s} {min(ts):9.2f} ms", flush=True)
    return out


def main():
    f = jax.jit(lambda a: a + 1)
    x = jnp.ones((8,), jnp.float32)
    sync(f(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        sync(f(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"floor: {np.percentile(ts, 50):.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    big = (rng.random((1_000_000, 3)) * 10).astype(np.float32)
    cb = pc.PointCloud.from_numpy(big)
    xyz, valid = cb._arrs.xyz, cb._arrs.valid
    print(f"xyz committed layout: {getattr(xyz, 'format', None)}",
          flush=True)

    vf = _fused.voxel_fused
    lowered = jax.jit(lambda a, v, s: vf(a, v, s)).lower(
        xyz, valid, jnp.float32(0.5)
    )
    compiled = lowered.compile()
    try:
        fmts = compiled.input_formats
    except AttributeError:
        fmts = getattr(compiled, "input_layouts", None)
    print(f"voxel_fused wants input formats: {fmts}", flush=True)

    t("voxel_fused (default layouts)", vf, xyz, valid, jnp.float32(0.5))

    # Pass xyz flattened (1-D has a unique layout) and reshape inside.
    @jax.jit
    def vf_flat(flat, v, s):
        return vf(flat.reshape(-1, 3), v, s)

    flat = jnp.asarray(big.reshape(-1))
    t("voxel_fused (flat 1-D arg + in-jit reshape)", vf_flat, flat, valid,
      jnp.float32(0.5))

    # Pass SoA components.
    @jax.jit
    def vf_soa(ax, ay, az, v, s):
        return vf(jnp.stack([ax, ay, az], axis=1), v, s)

    ax = jnp.asarray(big[:, 0].copy())
    ay = jnp.asarray(big[:, 1].copy())
    az = jnp.asarray(big[:, 2].copy())
    t("voxel_fused (SoA 1-D args + in-jit stack)", vf_soa, ax, ay, az,
      valid, jnp.float32(0.5))

    # device_put into the program's preferred layout, if exposed.
    if fmts:
        try:
            want = jax.tree_util.tree_leaves(fmts)[0]
            xyz_fmt = jax.device_put(big, want)
            t("voxel_fused (pre-formatted arg)", vf, xyz_fmt, valid,
              jnp.float32(0.5))
        except Exception as e:
            print("pre-format path failed:", repr(e), flush=True)

    # Identity-ish op to isolate pure relayout cost.
    @jax.jit
    def touch(a):
        return a[0, 0] + a[-1, -1]

    t("touch [1M,3] arg", touch, xyz)

    @jax.jit
    def touch_flat(a):
        return a[0] + a[-1]

    t("touch flat [3M] arg", touch_flat, flat)


if __name__ == "__main__":
    main()
