"""Probe: backward-pass cost breakdown, grads actually materialized."""
import functools, time
import dataclasses
import jax, jax.numpy as jnp
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.grad import diff_render
from raytpu.render import renderer
from raytpu.grad.fast import detached_closest_hit

scene = scenes.get("reference").build()
config = RenderConfig(width=640, height=480, soft_shadows=True)
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
    for _ in range(3):
        t0 = time.perf_counter(); float(run()); best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} {best/N*1e3:8.2f} ms  (compile {comp:.0f}s)", flush=True)

color0 = scene.materials.color

def mk_loss(render):
    def loss(c):
        s = dataclasses.replace(scene, materials=dataclasses.replace(scene.materials, color=c))
        return jnp.sum(render(s, config))
    return loss

def gsum(loss):
    return lambda: jnp.sum(jax.grad(loss)(color0)) + loss(color0)

# 1. forwards
timeit("jnp soft fwd", lambda: mk_loss(renderer.render_image_f32)(color0))
# 2. fwd+bwd, grads used
timeit("jnp soft fwd+bwd", gsum(mk_loss(renderer.render_image_f32)))
timeit("fast soft fwd+bwd", gsum(mk_loss(diff_render.render_soft_f32)))

# 3. fast path with remat around the whole shade
def render_remat(s, cfg):
    cfg = dataclasses.replace(cfg, soft_shadows=True)
    ro, rd = renderer.generate_rays(s.camera, cfg)
    body = jax.checkpoint(
        lambda s_, rds: renderer.shade_rays(s_, ro, rds, cfg, closest_fn=detached_closest_hit)
    )
    return body(s, rd).reshape(cfg.height, cfg.width, 3)
timeit("fast remat(whole) fwd+bwd", gsum(mk_loss(render_remat)))

# 4. jnp path with remat
def render_remat_jnp(s, cfg):
    cfg = dataclasses.replace(cfg, soft_shadows=True)
    ro, rd = renderer.generate_rays(s.camera, cfg)
    body = jax.checkpoint(lambda s_, rds: renderer.shade_rays(s_, ro, rds, cfg))
    return body(s, rd).reshape(cfg.height, cfg.width, 3)
timeit("jnp remat(whole) fwd+bwd", gsum(mk_loss(render_remat_jnp)))
