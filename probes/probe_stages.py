"""Probe: per-stage device cost of the jnp soft forward (reference scene)."""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.grad import fast
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
    print(f"{name:52s} {best/N*1e3:8.2f} ms  (compile {comp:.0f}s)", flush=True)

ro, rd = renderer.generate_rays(scene.camera, config)
ro_b = jnp.broadcast_to(ro, rd.shape)
rec = jax.jit(lambda: intersect.closest_hit(scene, ro_b, rd, config.ray_min))()
rec = jax.tree.map(lambda x: x.block_until_ready(), rec)
l0, mag0 = shading.direction_to_light(scene.lights, 0, rec.point)
beta = jnp.float32(config.soft_beta)
tmin = jnp.float32(config.ray_min)

timeit("noop scan (floor)", lambda: jnp.float32(1.0) * 2.0)
timeit("raygen", lambda: jnp.sum(renderer.generate_rays(scene.camera, config)[1]))
timeit("closest_hit (t-matrix+argmin+assemble)", lambda: jnp.sum(
    intersect.closest_hit(scene, ro_b, rd, config.ray_min).point))
timeit("detached_closest_hit", lambda: jnp.sum(
    fast.detached_closest_hit(scene, ro_b, rd, config.ray_min).point))
timeit("t-matrix+argmin only", lambda: jnp.sum(jnp.argmin(
    intersect._scene_t_matrix_T(
        scene, (ro_b[:, 0], ro_b[:, 1], ro_b[:, 2]), (rd[:, 0], rd[:, 1], rd[:, 2]),
        config.ray_min, intersect.INF, False),
    axis=0).astype(jnp.float32)))
timeit("direction_to_light x3", lambda: sum(
    jnp.sum(shading.direction_to_light(scene.lights, li, rec.point)[0]) for li in range(3)))
timeit("soft_transmittance x3", lambda: sum(
    jnp.sum(intersect.soft_transmittance(scene, rec.point, l0, tmin, mag0, beta))
    for _ in range(3)))
timeit("radiance x3", lambda: sum(
    jnp.sum(shading.radiance(scene.lights, li, rec.point)) for li in range(3)))
timeit("shade (BRDF table) x3", lambda: sum(
    jnp.sum(shading.shade(scene.materials, rec.material, rec.normal, l0, -rd))
    for _ in range(3)))
timeit("full shade_rays (1 chunk)", lambda: jnp.sum(
    renderer.shade_rays(scene, ro_b, rd, config)))
timeit("full render auto-chunk", lambda: jnp.sum(
    renderer.render_image_f32(scene, config)))
