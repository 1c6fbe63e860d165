#!/usr/bin/env python3
"""Measure frames-only vs frames x points sharding on the virtual 8-CPU
mesh, and list the collectives GSPMD inserts for the sweep's global sort.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       PYTHONPATH=/root/repo:$PYTHONPATH python scripts/measure_sharding.py
"""

import os
import re
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from pointclouds_tpu.core.cloud import make_cloud_arrays
from pointclouds_tpu.parallel.sharding import (
    sharded_aerial_pipeline,
    sharded_kitti_pipeline,
)
from pointclouds_tpu.pipelines.scenes import aerial_scene, kitti_scene

SCALE = 0.2  # ~14K pts/frame kitti, ~48K aerial: real sort/collective work


def mesh_of(frames, points):
    devs = np.array(jax.devices()[: frames * points]).reshape(frames, points)
    return Mesh(devs, ("frames", "points"))


def bench(step, args, reps=3):
    out = step(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def collectives(step, args):
    lowered = step.lower(*args)
    hlo = lowered.compile().as_text()
    ops = {}
    for op in ("all-gather", "all-reduce", "reduce-scatter", "collective-permute",
               "all-to-all"):
        cnt = len(re.findall(rf"{op}(?:-start)?\(", hlo)) + len(
            re.findall(rf" {op}\b", hlo)
        )
        found = hlo.count(op)
        if found:
            ops[op] = found
    return ops


def run_kitti():
    print("== KITTI pipeline ==", flush=True)
    for fr, pt in ((8, 1), (4, 2), (2, 4)):
        mesh = mesh_of(fr, pt)
        b = fr
        frames = [
            make_cloud_arrays(kitti_scene(seed=s, scale=SCALE))
            for s in range(b)
        ]
        args = (
            jnp.stack([f.xyz for f in frames]),
            jnp.stack([f.valid for f in frames]),
            jnp.float32(0.15),
            jnp.float32(2.0),
            jnp.float32(0.15),
            jnp.arange(b, dtype=jnp.int32),
            jnp.float32(0.8),
        )
        step = sharded_kitti_pipeline(
            mesh, sor_k=10, ransac_iters=50, obstacle_cap=2048
        )
        ms = bench(step, args)
        cols = collectives(step, args)
        print(
            f"mesh frames={fr} points={pt}: {ms:8.1f} ms/batch "
            f"({ms / b:6.1f} ms/frame)  collectives={cols}",
            flush=True,
        )


def run_aerial():
    print("== Aerial pipeline ==", flush=True)
    vp = jnp.asarray([0.0, 0.0, 10000.0], jnp.float32)
    for fr, pt in ((8, 1), (4, 2), (2, 4)):
        mesh = mesh_of(fr, pt)
        b = fr
        frames = [
            make_cloud_arrays(aerial_scene(seed=s, scale=SCALE))
            for s in range(b)
        ]
        args = (
            jnp.stack([f.xyz for f in frames]),
            jnp.stack([f.valid for f in frames]),
            jnp.float32(0.5),
            jnp.float32(4.0),
            jnp.float32(0.3),
            jnp.arange(b, dtype=jnp.int32),
            jnp.float32(2.0),
            vp,
        )
        step = sharded_aerial_pipeline(
            mesh, normals_k=15, ransac_iters=50, obstacle_cap=16384
        )
        ms = bench(step, args)
        cols = collectives(step, args)
        print(
            f"mesh frames={fr} points={pt}: {ms:8.1f} ms/batch "
            f"({ms / b:6.1f} ms/frame)  collectives={cols}",
            flush=True,
        )


def run_kitti_tiled():
    """Spatial-tile points axis (parallel/tiles.py): route + halo +
    replicated tail instead of GSPMD's distributed sorts."""
    from pointclouds_tpu.parallel.tiles import tiled_kitti_pipeline

    print("== KITTI pipeline (spatial tiles) ==", flush=True)
    for fr, pt in ((8, 1), (4, 2), (2, 4)):
        mesh = mesh_of(fr, pt)
        b = fr
        frames = [
            make_cloud_arrays(kitti_scene(seed=s, scale=SCALE))
            for s in range(b)
        ]
        xs = jnp.stack([f.xyz for f in frames])
        args = (
            xs,
            jnp.stack([f.valid for f in frames]),
            jnp.float32(0.15),
            jnp.float32(2.0),
            jnp.float32(0.15),
            jnp.arange(b, dtype=jnp.int32),
            jnp.float32(0.8),
        )
        step = tiled_kitti_pipeline(
            mesh, xs.shape[1], sor_k=10, ransac_iters=50, obstacle_cap=2048
        )
        ms = bench(step, args)
        cols = collectives(step, args)
        print(
            f"mesh frames={fr} points={pt}: {ms:8.1f} ms/batch "
            f"({ms / b:6.1f} ms/frame)  collectives={cols}",
            flush=True,
        )


def run_kitti_latency():
    """SINGLE-frame latency: the honest metric for the points axis (the
    throughput sections above share 8 CPU threads across all frames, so
    per-frame numbers conflate device sharing; here ONE frame runs on
    1/2/4 devices and wall time IS the frame latency)."""
    from pointclouds_tpu.parallel.tiles import tiled_kitti_pipeline

    print("== KITTI single-frame latency (tiles) ==", flush=True)
    f = make_cloud_arrays(kitti_scene(seed=0, scale=SCALE))
    xs = jnp.stack([f.xyz])
    vs = jnp.stack([f.valid])
    args = (
        xs, vs, jnp.float32(0.15), jnp.float32(2.0), jnp.float32(0.15),
        jnp.arange(1, dtype=jnp.int32), jnp.float32(0.8),
    )
    for pt in (1, 2, 4):
        mesh = mesh_of(1, pt)
        step = tiled_kitti_pipeline(
            mesh, xs.shape[1], sor_k=10, ransac_iters=50, obstacle_cap=2048
        )
        ms = bench(step, args)
        print(f"mesh frames=1 points={pt}: {ms:8.1f} ms/frame", flush=True)


if __name__ == "__main__":
    print(f"devices: {len(jax.devices())}", flush=True)
    run_kitti()
    run_kitti_tiled()
    run_kitti_latency()
    run_aerial()
