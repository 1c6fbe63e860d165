#!/usr/bin/env python3
"""Measure the per-call cost of passing [N, 3] xyz as a jit argument vs
SoA 1-D component arrays, at KITTI (131K) and aerial (262K) sizes."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pointclouds_tpu.utils.profiling import measure_dispatch_floor


def stream(fn, args, reps=30):
    o = fn(*args)
    np.asarray(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args)
    np.asarray(o)
    return (time.perf_counter() - t0) * 1e3 / reps


def main():
    floor = measure_dispatch_floor()
    print(f"floor {floor:.1f} ms", flush=True)
    for n in (131072, 262144):
        rng = np.random.default_rng(0)
        h = rng.normal(size=(n, 3)).astype(np.float32)
        xyz = jax.device_put(h)
        x = jax.device_put(h[:, 0].copy())
        y = jax.device_put(h[:, 1].copy())
        z = jax.device_put(h[:, 2].copy())

        @jax.jit
        def f_rows(a):
            s = a[:, 0] + a[:, 1] * 2.0 + a[:, 2] * 3.0
            return jnp.sum(jnp.sort(s))

        @jax.jit
        def f_soa(ax, ay, az):
            s = ax + ay * 2.0 + az * 3.0
            return jnp.sum(jnp.sort(s))

        @jax.jit
        def f_soa_stack(ax, ay, az):
            a = jnp.stack([ax, ay, az], axis=1)
            s = a[:, 0] + a[:, 1] * 2.0 + a[:, 2] * 3.0
            return jnp.sum(jnp.sort(s))

        t_rows = stream(f_rows, (xyz,))
        t_soa = stream(f_soa, (x, y, z))
        t_stk = stream(f_soa_stack, (x, y, z))
        print(
            f"n={n}: [N,3] arg {t_rows:6.2f} ms  "
            f"SoA args {t_soa:6.2f} ms  SoA+stack {t_stk:6.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
