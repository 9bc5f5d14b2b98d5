"""Sub-split the mega2 worklist-XLA cost (probe_m2split found ~1.7 ms/frame):
(a) raygen + per-tile ray bounds, (b) + cull matrix, (c) + argsort worklists.

Run: timeout 900 python probes/probe_wlxla.py
"""

import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.ops import accel
from raytpu.render import pallas_kernel as pk
from raytpu.render import renderer as _renderer

INF = float("inf")


def bench(fn, scene, frames=16, repeats=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(s, n):
        ts = jnp.linspace(0.0, 2.0 * np.pi, n)

        def body(c, t):
            return c + fn(s.update(t)), None

        return jax.lax.scan(body, jnp.float32(0.0), ts)[0]

    float(run(scene, frames))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(scene, frames))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / frames


def stage(scene, config, upto):
    W, H = config.width, config.height
    tmin = float(config.ray_min)
    tri = scene.triangles
    glo, ghi = accel.chunk_bounds(tri, pk.MEGA2_G)
    ro, rd = _renderer.generate_rays(scene.camera, config)
    rd_f = pk._mega2_fold(rd, H, W)
    rb = accel.ray_tile_bounds(jnp.broadcast_to(ro, rd_f.shape), rd_f, INF, tile=1024)
    if upto == "bounds":
        return jnp.sum(rb) + jnp.sum(glo)
    cullm = accel.cull_matrix(rb, glo, ghi, tmin)
    if upto == "cull":
        return jnp.sum(cullm)
    ng = cullm.shape[1]
    gpl = max(1, pk.MEGA2_MAX_SMEM_TRIS // pk.MEGA2_G)
    NL = max(1, -(-ng // gpl))
    acc = jnp.float32(0.0)
    for k in range(NL):
        wl, cnt = pk.chunk_worklist(cullm[:, k * gpl : (k + 1) * gpl])
        acc = acc + jnp.sum(wl) + jnp.sum(cnt)
    return acc.astype(jnp.float32)


def main():
    cfg = RenderConfig(width=640, height=480)
    for name in ("bunny", "optional"):
        scene = scenes.get(name).build()
        a = bench(lambda s: stage(s, cfg, "bounds"), scene)
        b = bench(lambda s: stage(s, cfg, "cull"), scene)
        c = bench(lambda s: stage(s, cfg, "wl"), scene)
        print(f"{name}: bounds {a:.2f} | +cull {b:.2f} (cull {b-a:.2f}) | "
              f"+argsort {c:.2f} (sort {c-b:.2f}) ms/frame", flush=True)


if __name__ == "__main__":
    main()
