"""Probe (TPU): stage split of the big-mesh differentiable soft forward —
detached winner search vs the soft transmittance kernels vs the rest
(payload assembly + shading in XLA).  Tiled ray order, same window."""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time, functools
import jax, jax.numpy as jnp
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.grad import diff_render
from raytpu.grad.soft import soft_trans_lights
from raytpu.ops import intersect, shading
from raytpu.render import renderer, pallas_soft, pallas_kernel as pk

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
    print(f"{name:56s} {best/N*1e3:8.2f} ms  (compile {comp:.0f}s)", flush=True)

timeit("noop scan (floor)", lambda: jnp.float32(1.0) * 2.0)
for name in ("bunny", "optional"):
    scene = scenes.get(name).build()
    ro, rd = renderer.generate_rays(scene.camera, config)
    rd = pk._mega2_fold(rd, config.height, config.width)
    ro_b = jnp.broadcast_to(ro, rd.shape)
    tmin = float(config.ray_min)

    timeit(f"{name}: winner search (scene_min_t_mega2)",
           lambda s=scene, r=rd, o=ro_b: jnp.sum(
               pallas_soft.scene_min_t_mega2(s, o, r, tmin)[0]))

    t, idx = jax.jit(pallas_soft.scene_min_t_mega2, static_argnums=3)(
        scene, ro_b, rd, tmin)
    rec = intersect.assemble_hit_records(scene, ro_b, rd, t, idx)
    p = rec.point + rec.normal * jnp.float32(config.normal_offset)
    lds = [shading.direction_to_light(scene.lights, li, p)
           for li in range(scene.lights.count)]
    dirs = jnp.stack([l for l, _ in lds])
    mags = jnp.stack([m for _, m in lds])
    p_, dirs_, mags_ = jax.block_until_ready((p, dirs, mags))

    timeit(f"{name}: payload assembly (assemble_hit_records)",
           lambda s=scene, o=ro_b, r=rd, tt=t, ii=idx: jnp.sum(
               intersect.assemble_hit_records(s, o, r, tt, ii).normal))

    timeit(f"{name}: soft kernels (all lights)",
           lambda s=scene, a=p_, b=dirs_, c=mags_: jnp.sum(
               soft_trans_lights(True, tmin, float(config.soft_beta), s, a, b, c)))

    timeit(f"{name}: full soft fwd",
           lambda s=scene: jnp.sum(diff_render.render_soft_f32(s, RenderConfig(width=640, height=480))))
