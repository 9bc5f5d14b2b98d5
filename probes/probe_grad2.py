"""Probe: stage breakdown of the differentiable path on real TPU."""
import functools, time
import jax, jax.numpy as jnp
import dataclasses
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.grad import diff_render
from raytpu.render import renderer
from raytpu.ops import intersect
from raytpu.grad.fast import detached_closest_hit

scene = scenes.get("reference").build()
config = RenderConfig(width=640, height=480, soft_shadows=True)
N = 16

def timeit(name, fn, *args):
    @functools.partial(jax.jit)
    def run(*a):
        def body(c, _):
            return c + fn(*a), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=N)
        return tot
    t0 = time.perf_counter(); float(run(*args)); c = time.perf_counter()-t0
    best = min(__import__('builtins').min([(lambda: (lambda t0: (float(run(*args)), time.perf_counter()-t0)[1])(time.perf_counter()))() for _ in range(3)]), 1e9)
    print(f"{name:45s} {best/N*1e3:8.2f} ms  (compile {c:.0f}s)", flush=True)

ro, rd = renderer.generate_rays(scene.camera, config)
ro_b = jnp.broadcast_to(ro, rd.shape)

# 1. fast soft forward only
timeit("fast soft fwd", lambda s: jnp.sum(diff_render.render_soft_f32(s, config)), scene)
# 2. jnp soft forward only
timeit("jnp soft fwd", lambda s: jnp.sum(renderer.render_image_f32(s, dataclasses.replace(config))), scene)
# 3. fast fwd+bwd (grad wrt materials)
def loss_fast(color, s):
    s = dataclasses.replace(s, materials=dataclasses.replace(s.materials, color=color))
    return jnp.sum(diff_render.render_soft_f32(s, config))
timeit("fast fwd+bwd (material color)", lambda c_, s: jax.value_and_grad(loss_fast)(c_, s)[0], scene.materials.color, scene)
def loss_jnp(color, s):
    s = dataclasses.replace(s, materials=dataclasses.replace(s.materials, color=color))
    return jnp.sum(renderer.render_image_f32(s, config))
timeit("jnp fwd+bwd (material color)", lambda c_, s: jax.value_and_grad(loss_jnp)(c_, s)[0], scene.materials.color, scene)
# 5. detached closest hit alone (fwd)
timeit("detached closest_hit fwd", lambda s: jnp.sum(detached_closest_hit(s, ro_b, rd, config.ray_min).t.clip(0,10)), scene)
# 6. soft_transmittance alone fwd (3 lights)
def st(s):
    rec = intersect.closest_hit(s, ro_b, rd, config.ray_min)
    p_off = rec.point + rec.normal * jnp.float32(config.normal_offset)
    tot = jnp.float32(0)
    from raytpu.ops import shading
    for li in range(s.lights.count):
        l, mag = shading.direction_to_light(s.lights, li, p_off)
        tot += jnp.sum(intersect.soft_transmittance(s, p_off, l, jnp.float32(config.ray_min), mag, jnp.float32(config.soft_beta)))
    return tot
timeit("closest_hit + 3x soft_transmittance fwd", st, scene)
def st_g(color, s):
    s = dataclasses.replace(s, materials=dataclasses.replace(s.materials, color=color))
    return st(s)
