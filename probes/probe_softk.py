"""Probe: Pallas soft-transmittance custom-VJP path vs jnp (big meshes)."""
import dataclasses, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.grad import diff_render

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
    cfg = RenderConfig(width=640, height=480, soft_shadows=True)
    c0 = scene.materials.color
    l0 = scene.lights.position
    for k in (False, True):
        timeit(f"{name} soft fwd kernels={k}", lambda s=scene, cfg=cfg, k=k: jnp.sum(
            diff_render.render_soft_f32(s, cfg, kernels=k)))
        def mloss(c, s=scene, cfg=cfg, k=k):
            s2 = dataclasses.replace(s, materials=dataclasses.replace(s.materials, color=c))
            return jnp.sum(diff_render.render_soft_f32(s2, cfg, kernels=k))
        timeit(f"{name} fwd+bwd(mat) kernels={k}", lambda l=mloss, c=c0: jnp.sum(jax.grad(l)(c)) + l(c))
        def lloss(p, s=scene, cfg=cfg, k=k):
            s2 = dataclasses.replace(s, lights=dataclasses.replace(s.lights, position=p))
            return jnp.sum(diff_render.render_soft_f32(s2, cfg, kernels=k))
        timeit(f"{name} fwd+bwd(light) kernels={k}", lambda l=lloss, p=l0: jnp.sum(jax.grad(l)(p)) + l(p))
