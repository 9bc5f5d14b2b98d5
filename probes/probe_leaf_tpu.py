"""Probe (TPU): mega2 forward frame time vs SAH builder leaf size."""
import importlib, pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
from raytpu.core.types import RenderConfig
from raytpu.ops import accel

N = 32

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
    print(f"{name:40s} {best/N*1e3:8.2f} ms  (compile {comp:.0f}s)", flush=True)

from raytpu.render import pallas_kernel as pk

timeit("noop scan (floor)", lambda: jnp.float32(1.0) * 2.0)
for leaf in (64, 16, 8):
    accel.SAH_LEAF = leaf
    import raytpu.core.scenes as scenes
    for name in ("bunny", "optional"):
        scene = scenes.get(name).build()
        cfg = RenderConfig(width=640, height=480)
        timeit(f"leaf={leaf:2d} {name} mega2 fwd", lambda s=scene: jnp.sum(
            pk.render_image_f32(s, cfg)))
