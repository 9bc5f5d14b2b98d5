"""Probe (real TPU): sharded 1x1 single-chip tax with the fused px-only path
(VERDICT r4 next #4).  A/B: fused whole-frame kernels per chip vs the
winner-search/merge pipeline, both through shard_map on a 1x1 mesh,
16-frame lax.scan dispatches, best of 3 — same methodology as
SCALING.json: scaling_tpu_1chip."""
import pathlib, sys, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp
import numpy as np
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.parallel.sharding import make_mesh, _render_sharded_jit

import argparse
ap = argparse.ArgumentParser()
ap.add_argument("--scene", default="reference")
ap.add_argument("--frames", type=int, default=16)
a = ap.parse_args()
scene = scenes.get(a.scene).build()
cfg = RenderConfig(width=640, height=480)
mesh = make_mesh(px=1, prim=1, devices=jax.devices()[:1])
FRAMES = a.frames

@functools.partial(jax.jit, static_argnames=("fused", "n"))
def scan_render(s, fused, n):
    ts = jnp.linspace(0.0, 2.0 * np.pi, n)
    def body(c, t):
        img = _render_sharded_jit(s.update(t), cfg, mesh, "pallas", fused)
        return c + jnp.sum(img, dtype=jnp.float32), None
    tot, _ = jax.lax.scan(body, jnp.float32(0.0), ts)
    return tot

for fused in (True, False):
    t0 = time.perf_counter()
    float(scan_render(scene, fused, FRAMES))
    print(f"fused={fused} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(scan_render(scene, fused, FRAMES))
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / FRAMES
    print(f"fused={fused}: {ms:.3f} ms/frame = {640*480*FRAMES/best/1e6:.1f} M rays/s", flush=True)
