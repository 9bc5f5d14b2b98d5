"""Probe (real TPU): single-chip 'packed pipeline' (payload-emitting winner
search + streamed all-lights any-hit + XLA shade) vs the whole-frame mega3
kernels on big meshes.  Motivated by round 5's sharded A/B where the
winner-search composition measured ~9% FASTER than fused mega3 at 74k tris
(65.9 vs 71.9 ms via shard_map 1x1)."""
import pathlib, sys, time, functools, argparse
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.render import pallas_kernel as pk
from raytpu.render import pallas_soft as ps
from raytpu.render import renderer as rn

ap = argparse.ArgumentParser()
ap.add_argument("--scene", default="bunny50k")
ap.add_argument("--frames", type=int, default=4)
a = ap.parse_args()
scene = scenes.get(a.scene).build()
cfg = RenderConfig(width=640, height=480)
W, H = cfg.width, cfg.height

def packed(s):
    ro, rd = rn.generate_rays(s.camera, cfg)
    rd = pk._mega2_fold(rd, H, W)  # tile-order feed for tight cull cones
    ro_b = jnp.broadcast_to(ro, rd.shape)
    t, idx, normal, mat = ps.scene_min_t_mega2(s, ro_b, rd, float(cfg.ray_min), payload=True)
    rec = ps.hit_records_from_payload(ro_b, rd, t, normal, mat)
    def any_multi(s2, p, dirs, mags, tmin):
        return ps.any_hit_lights_mega2(s2, p, dirs, mags, float(tmin))
    colors = rn.shade_from_records(s, rec, rd, cfg, any_multi_fn=any_multi)
    return pk._mega2_unfold_rows(colors, H, W).reshape(H, W, 3)

def timed(tag, frame_fn):
    @functools.partial(jax.jit, static_argnames=("n",))
    def scan(s, n):
        ts = jnp.linspace(0.0, 2.0 * np.pi, n)
        def body(c, t):
            return c + jnp.sum(frame_fn(s.update(t)), dtype=jnp.float32), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), ts)
        return tot
    t0 = time.perf_counter()
    float(scan(scene, a.frames))
    print(f"{tag} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(scan(scene, a.frames))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best*1e3/a.frames:.3f} ms/frame", flush=True)

timed("mega3 whole-frame", lambda s: pk.render_image_mega3_f32(s, cfg))
timed("packed pipeline  ", packed)
timed("mega3 whole-frame (2nd)", lambda s: pk.render_image_mega3_f32(s, cfg))
