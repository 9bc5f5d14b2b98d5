"""Probe: mega2 tile-order ray feed for the soft kernels (A/B, same window).

Measures render_soft_f32 fwd and fwd+bwd at 640x480 on bunny/optional with
TILE_KERNEL_RAYS on vs off.
"""
import time, dataclasses
import jax, jax.numpy as jnp
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.grad import diff_render

config = RenderConfig(width=640, height=480)
N = 8

def timeit(name, fn):
    @jax.jit
    def run():
        def body(c, _):
            return c + fn(), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N)
        return tot
    t0 = time.perf_counter(); float(run()); comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter(); float(run()); best = min(best, time.perf_counter() - t0)
    print(f"{name:56s} {best/N*1e3:8.2f} ms  (compile {comp:.0f}s)", flush=True)

def mk(scene_name):
    scene = scenes.get(scene_name).build()
    color0 = scene.materials.color
    def loss(c):
        s = dataclasses.replace(scene, materials=dataclasses.replace(scene.materials, color=c))
        return jnp.sum(diff_render.render_soft_f32(s, config))
    fwd = lambda: loss(color0)
    fb = lambda: jnp.sum(jax.grad(loss)(color0)) + loss(color0)
    return fwd, fb

timeit("noop scan (floor)", lambda: jnp.float32(1.0) * 2.0)
for name in ("bunny", "optional"):
    for tiled in (False, True):
        diff_render.TILE_KERNEL_RAYS = tiled
        diff_render.render_soft_f32.clear_cache()
        fwd, fb = mk(name)
        tag = "tiled" if tiled else "rowmaj"
        timeit(f"{name} {tag}: soft fwd", fwd)
        timeit(f"{name} {tag}: soft fwd+bwd(mat)", fb)
