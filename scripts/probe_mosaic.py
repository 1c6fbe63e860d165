#!/usr/bin/env python3
"""Probe two Mosaic capabilities the multi-sweep cluster kernel needs:
1. dynamic-index stores into VMEM scratch (persistent across grid steps),
2. output index_map arithmetic on grid indices (serpentine order),
3. SMEM scratch scalar accumulation across grid steps.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe():
    NB = 8
    T = 3

    def kernel(starts_ref, pts_ref, out_ref, lab_ref, cnt_ref):
        t = pl.program_id(0)
        b = pl.program_id(1)
        nbm1 = jnp.int32(NB - 1)
        bs = jax.lax.rem(t, jnp.int32(2)) * (nbm1 - 2 * b) + b

        @pl.when(t == 0)
        def _():
            # dynamic-index store into VMEM scratch
            row = jax.lax.broadcasted_iota(
                jnp.int32, (1, 128), 1
            ).astype(jnp.float32) + (bs * jnp.int32(128)).astype(jnp.float32)
            lab_ref[pl.ds(bs, 1), :] = row
            cnt_ref[0] = jnp.int32(0)

        @pl.when(t > 0)
        def _():
            # dynamic read + update + store
            row = lab_ref[pl.ds(bs, 1), :]
            lab_ref[pl.ds(bs, 1), :] = row + jnp.float32(1000.0)
            cnt_ref[0] = cnt_ref[0] + jnp.int32(1)

        out_ref[0:1, :] = lab_ref[pl.ds(bs, 1), :]
        out_ref[1:2, :] = jnp.full((1, 128), 1.0) * cnt_ref[0].astype(
            jnp.float32
        )

    z = np.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, NB),
        in_specs=[pl.BlockSpec((1, 128), lambda t, b, s: (z, z))],
        out_specs=pl.BlockSpec(
            (2, 128),
            lambda t, b, s: (z, jax.lax.rem(t, 2) * (NB - 1 - 2 * b) + b),
        ),
        scratch_shapes=[
            pltpu.VMEM((NB, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    starts = jnp.zeros((1, NB), jnp.int32)
    pts = jnp.zeros((1, 128), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, NB * 128), jnp.float32),
    )(starts, pts)
    out = np.asarray(out)
    lab = out[0].reshape(NB, 128)
    cnt = out[1].reshape(NB, 128)
    base = np.arange(NB * 128, dtype=np.float32).reshape(NB, 128)
    # After T=3: init at t=0, +1000 at t=1 and t=2 -> labels = base + 2000.
    ok_lab = np.allclose(lab, base + 2000.0)
    # cnt at final visits: t=2 visits add 1 each, forward order: block b's
    # final visit is at t=2 step b -> cnt = NB (t=1) + (b+1).
    print("labels ok:", ok_lab)
    print("cnt row0 sample:", cnt[:, 0])
    assert ok_lab
    print("PROBE PASS")


if __name__ == "__main__":
    probe()
