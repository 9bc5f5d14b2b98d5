"""Probe: SMEM capacity + cost of a fori_loop over SMEM triangle scalars.

Validates the megakernel-v2 cost model: (8,128) ray tiles, per-triangle
scalar broadcast from SMEM, fori_loop with dynamic indices.  The scan input
is data-dependent per step so XLA cannot hoist the dispatch out of the loop.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(T, worklist):
    def kernel(tri_ref, wl_ref, out_ref):
        i = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1).astype(jnp.float32)
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0).astype(jnp.float32)
        rx = lane * 0.01 + i
        ry = sub * 0.1
        rz = rx * 0.0 + 1.0
        t_best = jnp.full((8, 128), 1e30, jnp.float32)
        idx_best = jnp.zeros((8, 128), jnp.float32)

        def body(j, carry):
            t_best, idx_best = carry
            jj = wl_ref[0, j] if worklist else j
            v = [tri_ref[jj, k] for k in range(12)]
            ex, ey, ez = v[3] - v[0], v[4] - v[1], v[5] - v[2]
            fx, fy, fz = v[6] - v[0], v[7] - v[1], v[8] - v[2]
            px = ry * fz - rz * fy
            py = rz * fx - rx * fz
            pz = rx * fy - ry * fx
            det = ex * px + ey * py + ez * pz
            inv = 1.0 / jnp.where(jnp.abs(det) < 1e-8, 1.0, det)
            sx, sy, sz = rx - v[0], ry - v[1], rz - v[2]
            u = (sx * px + sy * py + sz * pz) * inv
            qx = sy * ez - sz * ey
            qy = sz * ex - sx * ez
            qz = sx * ey - sy * ex
            w = (rx * qx + ry * qy + rz * qz) * inv
            t = (fx * qx + fy * qy + fz * qz) * inv
            ok = (u >= 0.0) & (w >= 0.0) & (u + w <= 1.0) & (t > 1e-4) & (t < t_best)
            t_best = jnp.where(ok, t, t_best)
            idx_best = jnp.where(ok, v[9], idx_best)
            return t_best, idx_best

        t_best, idx_best = jax.lax.fori_loop(0, T, body, (t_best, idx_best))
        out_ref[:] = t_best + idx_best

    return kernel


def run(T, tiles, worklist, reps=3):
    tri = jnp.asarray(np.random.rand(T, 12).astype(np.float32))
    wl = jnp.asarray(np.random.permutation(T).astype(np.int32))[None, :]
    f = pl.pallas_call(
        make_kernel(T, worklist),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((T, 12), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * tiles, 128), jnp.float32),
    )

    @jax.jit
    def go(tri, wl):
        def body(c, _):
            # data-dependent input -> no hoisting/CSE across scan steps
            s = jnp.sum(f(tri + c * 1e-12, wl), dtype=jnp.float32)
            return c + s, None

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=8)
        return tot

    float(go(tri, wl))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(go(tri, wl))
        best = min(best, time.perf_counter() - t0)
    per_frame = best / 8
    print(
        f"T={T:5d} wl={int(worklist)} ({T*12*4/1024:6.1f} KB SMEM) tiles={tiles}: "
        f"{per_frame*1e3:8.3f} ms/dispatch, "
        f"{per_frame/(tiles*T)*1e9:6.1f} ns/(tile,tri), "
        f"{tiles*T*1024/per_frame/1e9:7.2f} G ray-tri tests/s",
        flush=True,
    )


if __name__ == "__main__":
    for T in [int(x) for x in sys.argv[1:]] or [64, 384, 1024]:
        for worklist in (False, True):
            try:
                run(T, tiles=300, worklist=worklist)
            except Exception as e:
                print(f"T={T} wl={worklist}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
