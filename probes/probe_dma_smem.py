"""Feasibility probe: HBM -> SMEM dynamic-sliced async DMA inside a kernel.

The mega3 streaming design (worklist groups DMA'd from an HBM triangle blob
into an SMEM ring buffer) needs:
  1. an input left in HBM (memory_space=pl.ANY),
  2. make_async_copy with a DYNAMIC source offset (worklist group id),
  3. an SMEM destination scratch, read back as broadcast scalars.

This probe checks each on the real backend.  Run: python probes/probe_dma_smem.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(wl_ref, cnt_ref, blob_ref, out_ref, scratch, sems):
    D = scratch.shape[0]  # ring depth
    cnt = cnt_ref[0]

    def issue(j):
        g = wl_ref[j]
        pltpu.make_async_copy(
            blob_ref.at[pl.ds(g * 8, 8), :], scratch.at[j % D], sems.at[j % D]
        ).start()

    def prologue(i, c):
        issue(i)
        return c

    jax.lax.fori_loop(0, jnp.minimum(cnt, D), prologue, 0)

    def body(j, acc):
        pltpu.make_async_copy(
            blob_ref.at[pl.ds(0, 8), :], scratch.at[j % D], sems.at[j % D]
        ).wait()
        # read scalars from the SMEM scratch, broadcast over a register
        s = scratch[j % D, 0, 0] + scratch[j % D, 7, 19]
        acc = acc + s

        @pl.when(j + D < cnt)
        def _():
            issue(j + D)

        return acc

    acc = jax.lax.fori_loop(0, cnt, body, jnp.float32(0.0))
    out_ref[:] = jnp.full((8, 128), acc, jnp.float32)


def main():
    T = 1024  # triangles
    ng = T // 8
    blob = jnp.arange(T * 20, dtype=jnp.float32).reshape(T, 20)
    wl = jnp.asarray(np.random.default_rng(0).permutation(ng), jnp.int32)
    cnt = jnp.asarray([37], jnp.int32)

    fn = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((4, 8, 20), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    t0 = time.perf_counter()
    out = jax.jit(lambda b: fn(wl, cnt, b))(blob)
    val = float(out[0, 0])
    print(f"compiled+ran in {time.perf_counter()-t0:.1f}s")

    # expected: sum over first 37 worklist groups of blob[g*8,0] + blob[g*8+7,19]
    w = np.asarray(wl)[:37]
    exp = float(np.sum(w * 8 * 20.0 + (w * 8 + 7) * 20.0 + 19.0))
    print(f"probe value {val}, expected {exp}, match={abs(val-exp) < 1e-3 * max(1, abs(exp))}")


if __name__ == "__main__":
    main()
