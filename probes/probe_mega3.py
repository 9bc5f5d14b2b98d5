"""Probe: mega2 cull-group size sweep on real TPU."""
import functools, sys, time
import jax, jax.numpy as jnp, numpy as np
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.render import pallas_kernel as pk

FRAMES = 16
for name, wh in (("optional", (640, 480)), ("bunny", (640, 480))):
    spec = scenes.get(name)
    scene = spec.build()
    W, H = wh
    config = RenderConfig(width=W, height=H)
    for G in (4, 8, 16):
        pk.MEGA2_G = G

        @functools.partial(jax.jit, static_argnames=("n",))
        def run(s, n, _G=G):
            ts = jnp.linspace(0.0, 2.0 * np.pi, n)
            def body(c, t):
                img = pk.render_image_mega2_f32(spec.animate(s, t), config)
                return c + jnp.sum(img, dtype=jnp.float32), None
            tot, _ = jax.lax.scan(body, jnp.float32(0.0), ts)
            return tot

        t0 = time.perf_counter(); float(run(scene, FRAMES)); comp = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(run(scene, FRAMES)); best = min(best, time.perf_counter() - t0)
        print(f"{name} {W}x{H} G={G:2d}: {best/FRAMES*1e3:8.2f} ms/frame (compile {comp:.0f}s)", flush=True)
pk.MEGA2_G = 16
