import sys, time, functools
import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from raytpu.core.scenes import scene_bunny_subdiv
from raytpu.core.types import RenderConfig
from raytpu.render import pallas_kernel as pk

scene = scene_bunny_subdiv(3)
print("T =", scene.triangles.count, flush=True)
cfg = RenderConfig(width=640, height=480)
F = 8

def timed(tag, frame_fn):
    @functools.partial(jax.jit, static_argnames=("n",))
    def scan(s, n):
        ts = jnp.linspace(0.0, 2.0 * np.pi, n)
        def body(c, t):
            return c + jnp.sum(frame_fn(s.update(t)), dtype=jnp.float32), None
        return jax.lax.scan(body, jnp.float32(0.0), ts)[0]
    float(scan(scene, F))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(scan(scene, F))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best*1e3/F:.3f} ms/frame", flush=True)

timed("mega3", lambda s: pk.render_image_mega3_f32(s, cfg))
timed("packed", lambda s: pk.render_image_packed_f32(s, cfg))
timed("mega3 (2nd)", lambda s: pk.render_image_mega3_f32(s, cfg))
