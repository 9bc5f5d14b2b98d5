"""Probe: diff path with absolute pallas anchor to calibrate window health."""
import time, dataclasses
import jax, jax.numpy as jnp
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.grad import diff_render
from raytpu.render import renderer, pallas_kernel as pk

scene = scenes.get("reference").build()
config = RenderConfig(width=640, height=480, soft_shadows=True)
config_hard = RenderConfig(width=640, height=480)
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
    print(f"{name:46s} {best/N*1e3:8.2f} ms  (compile {comp:.0f}s)", flush=True)

color0 = scene.materials.color
def mk_loss(render, cfg=config):
    def loss(c):
        s = dataclasses.replace(scene, materials=dataclasses.replace(scene.materials, color=c))
        return jnp.sum(render(s, cfg))
    return loss
def gsum(loss):
    return lambda: jnp.sum(jax.grad(loss)(color0)) + loss(color0)

timeit("pallas mega fwd (anchor ~0.76ms)", lambda: jnp.sum(pk.render_image_mega_f32(scene, config_hard)))
timeit("jnp hard fwd", lambda: mk_loss(renderer.render_image_f32, config_hard)(color0))
timeit("jnp soft fwd (anchor ~3.2ms)", lambda: mk_loss(renderer.render_image_f32)(color0))
timeit("remat+detached fwd+bwd (render_soft)", gsum(mk_loss(diff_render.render_soft_f32)))
