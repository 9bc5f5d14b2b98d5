"""Probe: real-TPU lowering check + timing of the sharded render path.

Only one chip is attached, so this runs shard_map on a 1x1 mesh — it cannot
measure scaling, but it validates that the per-chip mega2 kernels compile
and execute on real hardware inside shard_map (interpret-mode CPU tests
skip Mosaic's checks) and gives a per-chip cost to compare with the
single-chip fused renderer.
"""
import pathlib, sys, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.parallel import make_mesh
from raytpu.parallel.sharding import _render_sharded_jit
from raytpu.render import pallas_kernel as pk

mesh = make_mesh(px=1, prim=1)
cfg = RenderConfig(width=640, height=480)

for name in ("reference", "bunny", "optional"):
    scene = scenes.get(name).build()
    t0 = time.perf_counter()
    img = _render_sharded_jit(scene, cfg, mesh, "pallas")
    s = float(jnp.sum(img))
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(jnp.sum(_render_sharded_jit(scene, cfg, mesh, "pallas")))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:12s} sharded(1x1) {best*1e3:8.2f} ms  (compile {comp:.0f}s, sum {s:.1f})",
          flush=True)
