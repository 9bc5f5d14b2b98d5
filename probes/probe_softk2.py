"""Probe: isolate the Pallas soft-path pieces on bunny 640x480."""
import dataclasses, functools, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.grad import diff_render
from raytpu.grad.fast import detached_closest_hit
from raytpu.grad.soft import soft_trans_lights, _jnp_ref
from raytpu.ops import intersect, shading
from raytpu.render import renderer, pallas_soft
from raytpu.render import pallas_kernel as pk

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

scene = scenes.get("bunny").build()
cfg = RenderConfig(width=640, height=480, soft_shadows=True)
ro, rd = renderer.generate_rays(scene.camera, cfg)
ro_b = jnp.broadcast_to(ro, rd.shape)
rec = jax.jit(lambda: intersect.closest_hit(scene, ro_b, rd, cfg.ray_min))()
rec = jax.tree.map(lambda x: x.block_until_ready(), rec)
p = rec.point + rec.normal * jnp.float32(cfg.normal_offset)
lds = [shading.direction_to_light(scene.lights, li, p) for li in range(scene.lights.count)]
dirs = jnp.stack([l for l, _ in lds])
mags = jnp.stack([m for _, m in lds])

timeit("noop scan (floor)", lambda: jnp.float32(1.0) * 2.0)
timeit("jnp soft_trans x3 (dense)", lambda: jnp.sum(
    _jnp_ref(cfg.ray_min, cfg.soft_beta, scene, p, dirs, mags)))
timeit("pallas soft_trans_lights (fused)", lambda: jnp.sum(
    pallas_soft.soft_trans_lights_pallas(scene, p, dirs, mags, cfg.ray_min, cfg.soft_beta)))
timeit("pallas scene_min_t", lambda: jnp.sum(
    pk.scene_min_t(scene, pk.pack_rays(ro_b, rd, jnp.inf), float(cfg.ray_min), False)[0][:rd.shape[0]]))
timeit("detached_closest_hit jnp", lambda: jnp.sum(
    detached_closest_hit(scene, ro_b, rd, cfg.ray_min).point))
timeit("detached_closest_hit pallas min_t", lambda: jnp.sum(
    detached_closest_hit(scene, ro_b, rd, cfg.ray_min,
                         min_t_fn=diff_render._pallas_min_t).point))
timeit("render kernels=False", lambda: jnp.sum(
    diff_render.render_soft_f32(scene, cfg, kernels=False)))
timeit("render kernels=True", lambda: jnp.sum(
    diff_render.render_soft_f32(scene, cfg, kernels=True)))
# kernel soft only (jnp closest): emulate by calling render_pixels with soft_multi only
soft_fn = functools.partial(soft_trans_lights, True, float(cfg.ray_min), float(cfg.soft_beta))
cfg2 = dataclasses.replace(cfg, soft_shadows=True)
timeit("render soft-kernel only (jnp closest)", lambda: jnp.sum(
    renderer.render_pixels_f32(scene, ro, rd, cfg2, closest_fn=detached_closest_hit,
                               remat=True, soft_multi_fn=soft_fn)))
