"""Amortized all-occluded shadow early exit: K-sweep A/B on real TPU.

Run: timeout 1500 python probes/probe_earlyexit.py
"""

import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.render import pallas_kernel as pk


def bench(scene, cfg, frames=16, repeats=3):
    @functools.partial(jax.jit, static_argnames=("n", "k"))
    def run(s, n, k):
        ts = jnp.linspace(0.0, 2.0 * np.pi, n)

        def body(c, t):
            return c + jnp.sum(pk.render_image_mega2_f32(s.update(t), cfg),
                               dtype=jnp.float32), None

        return jax.lax.scan(body, jnp.float32(0.0), ts)[0]

    float(run(scene, frames, pk.MEGA2_EARLY_EXIT_K))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(scene, frames, pk.MEGA2_EARLY_EXIT_K))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / frames


def main():
    cfg = RenderConfig(width=640, height=480)
    for name in ("bunny", "optional"):
        scene = scenes.get(name).build()
        base = None
        for K in (0, 4, 8, 16):
            pk.MEGA2_EARLY_EXIT_K = K
            ms = bench(scene, cfg)
            if K == 0:
                base = ms
            print(f"{name} K={K}: {ms:.2f} ms/frame"
                  + (f" ({base/ms:.2f}x vs off)" if K else ""), flush=True)
        # parity at the chosen K
        pk.MEGA2_EARLY_EXIT_K = 8
        small = RenderConfig(width=64, height=32)
        a = np.asarray(jax.jit(lambda s: pk.render_image_mega2_f32(s, small))(scene))
        pk.MEGA2_EARLY_EXIT_K = 0
        b = np.asarray(jax.jit(lambda s: pk.render_image_mega2_f32(s, small))(scene))
        print(f"{name}: K=8 vs off mismatched px:",
              int((np.abs(a - b).max(axis=-1) > 1e-6).sum()), flush=True)
        pk.MEGA2_EARLY_EXIT_K = 8


if __name__ == "__main__":
    main()
