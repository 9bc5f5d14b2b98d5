"""Probe: mega2 SMEM triangle budget sweep on the optional scene (3,087 tris).

Round-3 verdict: optional forward is 6.28 ms vs the <=3.5 ms target.  The
scene runs a 3-launch mega2 chain (ceil(3087/1200)); each extra launch pays
raygen + 11 accumulator HBM round-trips + pipeline drain.  If Mosaic accepts
a bigger SMEM blob, fewer (or one) launches should close most of the gap.

Sweeps MEGA2_MAX_SMEM_TRIS and times render_image_mega2_f32.  A config that
fails to compile prints the Mosaic error and moves on (that's the SMEM
capacity edge).

Usage: timeout 1700 python probes/probe_mega2budget.py [budgets...]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import functools
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.render import pallas_kernel as pk


def bench(scene, config, frames=16, repeats=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def go(s, n):
        ts = jnp.linspace(0.0, 2.0 * np.pi, n)

        def body(c, t):
            img = pk.render_image_mega2_f32(s.update(t), config)
            return c + jnp.sum(img, dtype=jnp.float32), None

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), ts)
        return tot

    t0 = time.perf_counter()
    float(go(scene, frames))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(go(scene, frames))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / frames, compile_s


def main():
    budgets = [int(x) for x in sys.argv[1:]] or [1200, 1600, 2000, 2600, 3200]
    print("device:", jax.devices()[0], flush=True)
    config = RenderConfig(width=640, height=480, ray_chunk=640 * 480)
    for name in ("optional", "bunny"):
        scene = scenes.get(name).build()
        for b in budgets:
            if name == "bunny" and b > 1200:
                continue  # bunny is single-launch already
            pk.MEGA2_MAX_SMEM_TRIS = b
            launches = -(-scene.triangles.count // b)
            try:
                ms, cs = bench(scene, config)
                print(f"{name}: budget={b} ({launches} launches, "
                      f"{b*20*4/1024:.0f} KB blob): {ms:.2f} ms/frame "
                      f"(compile {cs:.0f}s)", flush=True)
            except Exception:
                print(f"{name}: budget={b}: FAILED", flush=True)
                traceback.print_exc(limit=3)
            jax.clear_caches()


if __name__ == "__main__":
    main()
