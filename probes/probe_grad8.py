"""Probe: granular jnp-forward stage timing — locate the 16.5ms."""
import time, dataclasses
import jax, jax.numpy as jnp
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.ops import intersect, shading
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
    print(f"{name:46s} {best/N*1e3:8.2f} ms  (compile {comp:.0f}s)", flush=True)

ro, rd = renderer.generate_rays(scene.camera, config)
ro_b = jnp.broadcast_to(ro, rd.shape)

def with_rec(f):
    rec = intersect.closest_hit(scene, ro_b, rd, config.ray_min)
    return f(rec)

timeit("noop scan (floor)", lambda: jnp.float32(1.0) * 2.0)
timeit("raygen only", lambda: jnp.sum(renderer.generate_rays(scene.camera, config)[1]))
timeit("t-matrix only", lambda: jnp.sum(jnp.where(jnp.isfinite(
    intersect.scene_t_matrix(scene, ro_b, rd, config.ray_min, intersect.INF, shadow_pass=False)), 1.0, 0.0)))
timeit("closest_hit (t-matrix+argmin+payload)", lambda: with_rec(
    lambda rec: jnp.sum(rec.point) + jnp.sum(rec.normal) + jnp.sum(jnp.where(rec.hit, rec.t, 0.0))))
def soft1(rec):
    l, mag = shading.direction_to_light(scene.lights, 0, rec.point)
    return jnp.sum(intersect.soft_transmittance(
        scene, rec.point, l, jnp.float32(config.ray_min), mag, jnp.float32(config.soft_beta)))
timeit("closest+1soft", lambda: with_rec(soft1))
def shade1(rec):
    l, _ = shading.direction_to_light(scene.lights, 0, rec.point)
    return jnp.sum(shading.shade(scene.materials, rec.material, rec.normal, l, -rd))
timeit("closest+shade1", lambda: with_rec(shade1))
timeit("full jnp soft fwd", lambda: jnp.sum(renderer.render_image_f32(scene, config)))
timeit("full jnp hard fwd", lambda: jnp.sum(renderer.render_image_f32(
    scene, RenderConfig(width=640, height=480))))
for chunk in (38400, 76800, 153600, 262144):
    cfgc = RenderConfig(width=640, height=480, soft_shadows=True, ray_chunk=chunk)
    timeit(f"full soft fwd ray_chunk={chunk}", lambda c=cfgc: jnp.sum(renderer.render_image_f32(scene, c)))
