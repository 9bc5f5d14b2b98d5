"""mega3 (DMA-streamed single-launch) vs mega2 (SMEM launch chain): same-window
TPU A/B on the course scenes.  Run: timeout 900 python probes/probe_mega3.py
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


def bench(render_fn, scene, config, frames=16, repeats=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(s, n):
        ts = jnp.linspace(0.0, 2.0 * np.pi, n)

        def body(carry, t):
            img = render_fn(s.update(t), config)
            return carry + jnp.sum(img, dtype=jnp.float32), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), ts)
        return total

    t0 = time.perf_counter()
    float(run(scene, frames))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(scene, frames))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / frames, compile_s


def main():
    cfg = RenderConfig(width=640, height=480)
    for name in ("bunny", "optional"):
        scene = scenes.get(name).build()
        # parity first (one frame, small): catches Mosaic lowering bugs
        small = RenderConfig(width=64, height=32)
        a = np.asarray(jax.jit(lambda s: pk.render_image_mega2_f32(s, small))(scene))
        b = np.asarray(jax.jit(lambda s: pk.render_image_mega3_f32(s, small))(scene))
        bad = int((np.abs(a - b).max(axis=-1) > 1e-5).sum())
        print(f"{name}: TPU small-frame mega2-vs-mega3 mismatched px = {bad}/{a.shape[0]*a.shape[1]}")

        for label, fn in (("mega2", pk.render_image_mega2_f32),
                          ("mega3", pk.render_image_mega3_f32)):
            ms, cs = bench(fn, scene, cfg)
            print(f"{name} {label}: {ms:.2f} ms/frame (compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
