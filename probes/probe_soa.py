"""Probe: components-major (SoA) jnp path vs PERF round-2 numbers."""
import dataclasses, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
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
timeit("SoA: full jnp soft fwd (auto chunk)", lambda: jnp.sum(renderer.render_image_f32(scene, config)))
timeit("SoA: full jnp hard fwd (auto chunk)", lambda: jnp.sum(renderer.render_image_f32(
    scene, RenderConfig(width=640, height=480))))
timeit("SoA: render_soft fwd+bwd (auto chunk)", gsum(mk_loss(diff_render.render_soft_f32)))
for chunk in (307200, 153600, 38400):
    cfgc = RenderConfig(width=640, height=480, soft_shadows=True, ray_chunk=chunk)
    timeit(f"SoA: soft fwd chunk={chunk}", lambda c=cfgc: jnp.sum(renderer.render_image_f32(scene, c)))
    timeit(f"SoA: fwd+bwd chunk={chunk}", gsum(mk_loss(diff_render.render_soft_f32, cfgc)))
# bunny soft (BASELINE config 5 class): big-T detached path
bunny = scenes.get("bunny").build()
cfgb = RenderConfig(width=640, height=480, soft_shadows=True)
cb0 = bunny.materials.color
def bloss(c):
    s = dataclasses.replace(bunny, materials=dataclasses.replace(bunny.materials, color=c))
    return jnp.sum(diff_render.render_soft_f32(s, cfgb))
timeit("SoA: bunny 640x480 fwd+bwd", lambda: jnp.sum(jax.grad(bloss)(cb0)) + bloss(cb0))
