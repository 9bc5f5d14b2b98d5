"""Feasibility probe: blob -> SMEM dynamic-sliced async DMA inside a kernel.

The mega3 streaming design (worklist groups DMA'd from a triangle blob into
an SMEM ring buffer) needs:
  1. an input outside SMEM (memory_space=pl.ANY; the compiler picks VMEM/HBM),
  2. make_async_copy with a DYNAMIC source offset (worklist group id),
  3. an SMEM destination scratch, read back as broadcast scalars.

Mosaic constraints learned here: DMA slices must be aligned to the source's
(8, 128) tiling — a lane-dim slice of 20 fails ("must be aligned to tiling
(128)") and a sublane slice of 1 row fails ("must be aligned to tiling (8)").
So the minimum DMA unit is an (8, 128k) row-block: here one SUPER-GROUP of
8 cull groups (64 triangles), one group per row, 160 floats padded to 256
lanes.  Run: python probes/probe_dma_smem.py
"""

import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 4  # ring depth


def kernel(wl_ref, cnt_ref, blob_ref, out_ref, scratch, sems):
    cnt = cnt_ref[0]

    def issue(j):
        slot = jax.lax.rem(j, D)
        g = wl_ref[j]
        pltpu.make_async_copy(
            blob_ref.at[pl.ds(g * 8, 8), :], scratch.at[slot],
            sems.at[slot],
        ).start()

    def prologue(i, c):
        issue(i)
        return c

    jax.lax.fori_loop(0, jnp.minimum(cnt, D), prologue, 0)

    def body(j, acc):
        slot = jax.lax.rem(j, D)
        pltpu.make_async_copy(
            blob_ref.at[pl.ds(0, 8), :], scratch.at[slot],
            sems.at[slot],
        ).wait()
        # read scalars from the SMEM scratch, accumulate
        acc = acc + scratch[slot, 0, 0] + scratch[slot, 7, 255]

        @pl.when(j + D < cnt)
        def _():
            issue(j + D)

        return acc

    acc = jax.lax.fori_loop(0, cnt, body, jnp.float32(0.0))
    out_ref[:] = jnp.full((8, 128), acc, jnp.float32)


def main():
    ng = 128  # super-groups; one (8, 256) row-block each
    blob = jnp.arange(ng * 8 * 256, dtype=jnp.float32).reshape(ng * 8, 256)
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
            pltpu.SMEM((D, 8, 256), jnp.float32),
            pltpu.SemaphoreType.DMA((D,)),
        ],
    )

    t0 = time.perf_counter()
    out = jax.jit(lambda b: fn(wl, cnt, b))(blob)
    val = float(out[0, 0])
    print(f"compiled+ran in {time.perf_counter()-t0:.1f}s")

    w = np.asarray(wl)[:37].astype(np.float64)
    exp = float(np.sum(w * 8 * 256.0 + ((w * 8 + 7) * 256.0 + 255.0)))
    print(f"probe value {val}, expected {exp}, match={abs(val-exp) < 1e-3 * max(1, abs(exp))}")


if __name__ == "__main__":
    main()
