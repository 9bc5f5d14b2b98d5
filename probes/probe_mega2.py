"""Probe: mega2 frame time on real TPU for big-mesh scenes.

Usage: python probe_mega2.py <scene> [WxH] [frames]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.render import pallas_kernel as pk

name = sys.argv[1] if len(sys.argv) > 1 else "bunny"
wh = sys.argv[2] if len(sys.argv) > 2 else "640x480"
FRAMES = int(sys.argv[3]) if len(sys.argv) > 3 else 8
W, H = (int(v) for v in wh.split("x"))

spec = scenes.get(name)
scene = spec.build()
config = RenderConfig(width=W, height=H)


@functools.partial(jax.jit, static_argnames=("n",))
def run(s, n):
    ts = jnp.linspace(0.0, 2.0 * np.pi, n)

    def body(c, t):
        img = pk.render_image_mega2_f32(spec.animate(s, t), config)
        return c + jnp.sum(jnp.where(jnp.isfinite(img), img, 0.0), dtype=jnp.float32), None

    tot, _ = jax.lax.scan(body, jnp.float32(0.0), ts)
    return tot


t0 = time.perf_counter()
float(run(scene, FRAMES))
print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    float(run(scene, FRAMES))
    best = min(best, time.perf_counter() - t0)
ms = best / FRAMES * 1e3
print(f"{name} {W}x{H} mega2: {ms:8.2f} ms/frame  ({W*H/ms*1e3/1e6:.1f} M primary rays/s)", flush=True)
