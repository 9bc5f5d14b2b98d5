import sys, time, functools
import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.parallel.sharding import make_mesh, _render_sharded_jit
from raytpu.render import pallas_kernel as pk

scene = scenes.get("reference").build()
cfg = RenderConfig(width=640, height=480)
mesh = make_mesh(px=1, prim=1, devices=jax.devices()[:1])
F = 32

def timed(tag, frame_fn):
    @functools.partial(jax.jit, static_argnames=("n",))
    def scan(s, n):
        ts = jnp.linspace(0.0, 2.0 * np.pi, n)
        def body(c, t):
            return c + jnp.sum(frame_fn(s.update(t)), dtype=jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), ts)
        return tot
    float(scan(scene, F))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(scan(scene, F))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best*1e3/F:.3f} ms/frame", flush=True)

timed("whole-frame mega", lambda s: pk.render_image_mega_f32(s, cfg))
timed("tile-range mega (no shard_map)",
      lambda s: pk.render_image_mega_f32(s, cfg, tile0=jnp.int32(0), tiles=300))
timed("fused sharded 1x1", lambda s: _render_sharded_jit(s, cfg, mesh, "pallas"))
