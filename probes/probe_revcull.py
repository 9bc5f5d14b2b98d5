"""Probe (TPU): reversed shadow cull A/B on the whole-frame forward renderer
and the differentiable soft path, same window."""
import time, dataclasses
import jax, jax.numpy as jnp
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.grad import diff_render
from raytpu.render import pallas_kernel as pk

config = RenderConfig(width=640, height=480)
N = 16

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

timeit("noop scan (floor)", lambda: jnp.float32(1.0) * 2.0)
for name in ("bunny", "optional"):
    scene = scenes.get(name).build()
    timeit(f"{name}: mega2 forward frame",
           lambda s=scene: jnp.sum(pk.render_image_mega2_f32(s, config)))
    color0 = scene.materials.color
    def loss(c, s=scene):
        s2 = dataclasses.replace(s, materials=dataclasses.replace(s.materials, color=c))
        return jnp.sum(diff_render.render_soft_f32(s2, config))
    timeit(f"{name}: soft fwd", lambda l=loss, c=color0: l(c))
    timeit(f"{name}: soft fwd+bwd(mat)",
           lambda l=loss, c=color0: jnp.sum(jax.grad(l)(c)) + l(c))
