"""Probe: soft-path config matrix on TPU — which pieces ride Pallas?

Configs per scene (fwd / fwd+bwd(mat) / fwd+bwd(light)):
  jnp        — everything jnp (kernels=False)
  soft       — Pallas soft-transmittance custom-VJP kernel, jnp closest hit
  soft+minl  — + the Pallas chunk-culled min-t inside the detached closest hit
"""
import dataclasses, functools, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.grad import diff_render
from raytpu.grad.fast import detached_closest_hit
from raytpu.grad.soft import soft_trans_lights
from raytpu.render import renderer

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
    print(f"{name:44s} {best/N*1e3:8.2f} ms  (compile {comp:.0f}s)", flush=True)


def render(scene, cfg, mode):
    soft_fn = None
    closest_fn = detached_closest_hit
    if mode in ("soft", "soft+minl"):
        soft_fn = functools.partial(
            soft_trans_lights, True, float(cfg.ray_min), float(cfg.soft_beta))
    if mode == "soft+minl":
        closest_fn = functools.partial(
            detached_closest_hit, min_t_fn=diff_render._pallas_min_t)
    ro, rd = renderer.generate_rays(scene.camera, cfg)
    cols = renderer.render_pixels_f32(scene, ro, rd, cfg, closest_fn=closest_fn,
                                      remat=True, soft_multi_fn=soft_fn)
    return cols


timeit("noop scan (floor)", lambda: jnp.float32(1.0) * 2.0)
for name in ("bunny", "optional"):
    scene = scenes.get(name).build()
    cfg = RenderConfig(width=640, height=480, soft_shadows=True)
    c0 = scene.materials.color
    l0 = scene.lights.position
    for mode in ("jnp", "soft", "soft+minl"):
        timeit(f"{name} fwd {mode}", lambda s=scene, m=mode: jnp.sum(render(s, cfg, m)))
        def mloss(c, s=scene, m=mode):
            s2 = dataclasses.replace(s, materials=dataclasses.replace(s.materials, color=c))
            return jnp.sum(render(s2, cfg, m))
        timeit(f"{name} fwd+bwd(mat) {mode}", lambda l=mloss, c=c0: jnp.sum(jax.grad(l)(c)) + l(c))
        def lloss(p, s=scene, m=mode):
            s2 = dataclasses.replace(s, lights=dataclasses.replace(s.lights, position=p))
            return jnp.sum(render(s2, cfg, m))
        timeit(f"{name} fwd+bwd(light) {mode}", lambda l=lloss, p=l0: jnp.sum(jax.grad(l)(p)) + l(p))
