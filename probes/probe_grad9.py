"""Probe: one-hot payload assembly vs indexed gathers, same window."""
import time, dataclasses
import jax, jax.numpy as jnp
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.ops import intersect
from raytpu.grad import diff_render
from raytpu.render import renderer

scene = scenes.get("reference").build()
config = RenderConfig(width=640, height=480, soft_shadows=True)
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
    print(f"{name:52s} {best/N*1e3:8.2f} ms  (compile {comp:.0f}s)", flush=True)

color0 = scene.materials.color
def mk_loss(render, cfg=config):
    def loss(c):
        s = dataclasses.replace(scene, materials=dataclasses.replace(scene.materials, color=c))
        return jnp.sum(render(s, cfg))
    return loss
def gsum(loss):
    return lambda: jnp.sum(jax.grad(loss)(color0)) + loss(color0)

timeit("noop scan (floor)", lambda: jnp.float32(1.0) * 2.0)

intersect._ONEHOT_MAX_ELEMS = 0
renderer.render_image_f32.clear_cache()
timeit("indexed: full jnp soft fwd", lambda: jnp.sum(renderer.render_image_f32(scene, config)))
intersect._ONEHOT_MAX_ELEMS = 1 << 25
renderer.render_image_f32.clear_cache()
timeit("onehot:  full jnp soft fwd", lambda: jnp.sum(renderer.render_image_f32(scene, config)))
timeit("onehot:  full jnp hard fwd", lambda: jnp.sum(renderer.render_image_f32(
    scene, RenderConfig(width=640, height=480))))
timeit("onehot:  render_soft fwd+bwd", gsum(mk_loss(diff_render.render_soft_f32)))
for chunk in (38400, 76800, 153600):
    cfgc = RenderConfig(width=640, height=480, soft_shadows=True, ray_chunk=chunk)
    timeit(f"onehot:  soft fwd chunk={chunk}", lambda c=cfgc: jnp.sum(renderer.render_image_f32(scene, c)))
    timeit(f"onehot:  fwd+bwd chunk={chunk}", gsum(mk_loss(diff_render.render_soft_f32, cfgc)))
