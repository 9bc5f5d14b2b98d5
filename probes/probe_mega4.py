"""Probe: mega2 stage split — closest-hit chain vs shadow+shade chain cost.

Renders `optional`/`bunny` with shadows on vs off (shadow chain collapses to
one payload-free shade launch when off) to attribute frame time per stage.
"""
import dataclasses, functools, sys, time
import jax, jax.numpy as jnp, numpy as np
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.render import pallas_kernel as pk

FRAMES = 16
for name in ("optional", "bunny"):
    spec = scenes.get(name)
    scene = spec.build()
    for shadows in (True, False):
        config = RenderConfig(width=640, height=480, shadows=shadows)

        @functools.partial(jax.jit, static_argnames=("n",))
        def run(s, n, _cfg=config):
            ts = jnp.linspace(0.0, 2.0 * np.pi, n)
            def body(c, t):
                img = pk.render_image_mega2_f32(spec.animate(s, t), _cfg)
                return c + jnp.sum(img, dtype=jnp.float32), None
            tot, _ = jax.lax.scan(body, jnp.float32(0.0), ts)
            return tot

        t0 = time.perf_counter(); float(run(scene, FRAMES)); comp = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(run(scene, FRAMES)); best = min(best, time.perf_counter() - t0)
        print(f"{name} shadows={int(shadows)}: {best/FRAMES*1e3:8.2f} ms/frame (compile {comp:.0f}s)", flush=True)
