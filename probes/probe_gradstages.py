"""Probe (TPU): where does the optional fwd+bwd (16.5 ms round 3) go?

Splits the differentiable step into: hard forward (yardstick), soft forward,
winner search, payload assembly (fwd and with-backward), soft kernels
(fwd and fwd+vjp), shade-only fwd+bwd at fixed hit records, and the full
fwd+bwd — all same-window, 16-rep scans, floor included.
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
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
    for _ in range(4):
        t0 = time.perf_counter(); float(run()); best = min(best, time.perf_counter() - t0)
    print(f"{name:56s} {best/N*1e3:8.2f} ms  (compile {comp:.0f}s)", flush=True)

timeit("noop scan (floor)", lambda: jnp.float32(1.0) * 2.0)
name = "optional"
scene = scenes.get(name).build()
hard_cfg = RenderConfig(width=640, height=480, ray_chunk=640 * 480)
timeit(f"{name}: HARD forward (mega2, yardstick)",
       lambda s=scene: jnp.sum(pk.render_image_f32(s, hard_cfg)))
timeit(f"{name}: soft forward (render_soft_f32)",
       lambda s=scene: jnp.sum(diff_render.render_soft_f32(s, config)))

target = jnp.zeros((config.height, config.width, 3), jnp.float32)
def mat_loss(c, s):
    import dataclasses
    s2 = dataclasses.replace(s, materials=dataclasses.replace(s.materials, color=c))
    img = diff_render.render_soft_f32(s2, config)
    return jnp.mean((img - target) ** 2)

timeit(f"{name}: full fwd+bwd (material grads)",
       lambda s=scene: mat_loss(s.materials.color, s)
       + jnp.sum(jax.grad(mat_loss)(s.materials.color, s)))

# fixed-inputs stage splits
ro, rd = renderer.generate_rays(scene.camera, config)
rd = pk._mega2_fold(rd, config.height, config.width)
ro_b = jnp.broadcast_to(ro, rd.shape)
tmin = float(config.ray_min)
t, idx = jax.jit(pallas_soft.scene_min_t_mega2, static_argnums=3)(scene, ro_b, rd, tmin)
rec = intersect.assemble_hit_records(scene, ro_b, rd, t, idx)
p = rec.point + rec.normal * jnp.float32(config.normal_offset)
lds = [shading.direction_to_light(scene.lights, li, p)
       for li in range(scene.lights.count)]
dirs = jnp.stack([l for l, _ in lds])
mags = jnp.stack([m for _, m in lds])
p_, dirs_, mags_ = jax.block_until_ready((p, dirs, mags))

timeit(f"{name}: winner search fwd",
       lambda s=scene: jnp.sum(pallas_soft.scene_min_t_mega2(s, ro_b, rd, tmin)[0]))
timeit(f"{name}: payload assembly fwd",
       lambda s=scene: jnp.sum(intersect.assemble_hit_records(s, ro_b, rd, t, idx).normal))

def payload_loss(v0, s):
    import dataclasses
    tr = dataclasses.replace(s.triangles, v0=v0)
    s2 = dataclasses.replace(s, triangles=tr)
    r = intersect.assemble_hit_records(s2, ro_b, rd, t, idx)
    return jnp.sum(r.normal) + jnp.sum(r.t)

timeit(f"{name}: payload assembly fwd+vjp (geom)",
       lambda s=scene: payload_loss(s.triangles.v0, s)
       + jnp.sum(jax.grad(payload_loss)(s.triangles.v0, s)))

beta = float(config.soft_beta)
timeit(f"{name}: soft kernels fwd",
       lambda s=scene: jnp.sum(soft_trans_lights(True, tmin, beta, s, p_, dirs_, mags_)))

def soft_loss(pp, s):
    return jnp.sum(soft_trans_lights(True, tmin, beta, s, pp, dirs_, mags_) ** 2)

timeit(f"{name}: soft kernels fwd+vjp (ray-side)",
       lambda s=scene: soft_loss(p_, s) + jnp.sum(jax.grad(soft_loss)(p_, s)))
