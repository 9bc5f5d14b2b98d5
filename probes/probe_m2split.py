"""Decompose the mega2 frame: worklist XLA / closest chain / shade launch /
shadow stage, via nested ablations (same window, real TPU):

  t0 = primary worklist XLA only (bounds + cull + per-launch argsorts)
  t1 = lights-stripped render  (= t0 + closest chain; L=0 short-circuits)
  t2 = shadows-off render      (= t1 + shade launch)
  t3 = full render             (= t2 + shadow worklist XLA + shadow launches)

Run: PYTHONPATH=/root/.axon_site:/root/repo timeout 1200 python probes/probe_m2split.py
"""

import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


import dataclasses
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


def primary_worklists_only(scene, config):
    """The XLA prelude of the mega2 closest chain, through every launch's
    chunk_worklist."""
    W, H = config.width, config.height
    tmin = float(config.ray_min)
    tri = scene.triangles
    ng = -(-tri.count // pk.MEGA2_G)
    gpl = max(1, pk.MEGA2_MAX_SMEM_TRIS // pk.MEGA2_G)
    NL = max(1, -(-ng // gpl))
    glo, ghi = accel.chunk_bounds(tri, pk.MEGA2_G)
    ro, rd = _renderer.generate_rays(scene.camera, config)
    rd_f = pk._mega2_fold(rd, H, W)
    rb = accel.ray_tile_bounds(jnp.broadcast_to(ro, rd_f.shape), rd_f, INF, tile=1024)
    cullm = accel.cull_matrix(rb, glo, ghi, tmin)
    acc = jnp.float32(0.0)
    for k in range(NL):
        wl, cnt = pk.chunk_worklist(cullm[:, k * gpl : (k + 1) * gpl])
        acc = acc + jnp.sum(wl) + jnp.sum(cnt)
    return acc.astype(jnp.float32)


def main():
    cfg = RenderConfig(width=640, height=480)
    cfg_nosh = dataclasses.replace(cfg, shadows=False)
    for name in ("bunny", "optional"):
        scene = scenes.get(name).build()
        nolights = dataclasses.replace(
            scene, lights=dataclasses.replace(
                scene.lights,
                position=scene.lights.position[:0], direction=scene.lights.direction[:0],
                color=scene.lights.color[:0], intensity=scene.lights.intensity[:0],
                kind=scene.lights.kind[:0]))
        t0 = bench(lambda s: primary_worklists_only(s, cfg), scene)
        t1 = bench(lambda s: jnp.sum(pk.render_image_mega2_f32(s, cfg), dtype=jnp.float32), nolights)
        t2 = bench(lambda s: jnp.sum(pk.render_image_mega2_f32(s, cfg_nosh), dtype=jnp.float32), scene)
        t3 = bench(lambda s: jnp.sum(pk.render_image_mega2_f32(s, cfg), dtype=jnp.float32), scene)
        print(f"{name}: wlXLA {t0:.2f} | +closest {t1:.2f} (chain {t1-t0:.2f}) | "
              f"+shade {t2:.2f} (launch {t2-t1:.2f}) | full {t3:.2f} (shadow {t3-t2:.2f})",
              flush=True)


if __name__ == "__main__":
    main()
