"""Probe: remat + gather-strategy matrix for the differentiable path."""
import time
import dataclasses
import jax, jax.numpy as jnp
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.grad import diff_render
from raytpu.render import renderer
from raytpu.grad.fast import detached_closest_hit

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
    print(f"{name:46s} {best/N*1e3:8.2f} ms  (compile {comp:.0f}s)", flush=True)

color0 = scene.materials.color

def mk_loss(render):
    def loss(c):
        s = dataclasses.replace(scene, materials=dataclasses.replace(scene.materials, color=c))
        return jnp.sum(render(s, config))
    return loss

def gsum(loss):
    return lambda: jnp.sum(jax.grad(loss)(color0)) + loss(color0)

def remat_render(closest_fn):
    def render(s, cfg):
        cfg = dataclasses.replace(cfg, soft_shadows=True)
        ro, rd = renderer.generate_rays(s.camera, cfg)
        body = jax.checkpoint(
            lambda s_, rds: renderer.shade_rays(s_, ro, rds, cfg, closest_fn=closest_fn))
        return body(s, rd).reshape(cfg.height, cfg.width, 3)
    return render

# healthy-window sanity anchor: pure forward (known ~3.2 ms)
timeit("jnp soft fwd (anchor)", lambda: mk_loss(renderer.render_image_f32)(color0))
timeit("jnp remat fwd+bwd", gsum(mk_loss(remat_render(None))))
timeit("fast remat fwd+bwd", gsum(mk_loss(remat_render(detached_closest_hit))))
timeit("jnp plain fwd+bwd", gsum(mk_loss(renderer.render_image_f32)))
