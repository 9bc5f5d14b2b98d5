"""Probe: decompose bunny's 37ms frame into perm / kernels / XLA-shade costs."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.ops import shading
from raytpu.render import pallas_kernel as pk
from raytpu.render import renderer

spec = scenes.get("bunny")
scene = spec.build()
config = RenderConfig(width=640, height=480, ray_chunk=640 * 480)
FRAMES = 8


def timeit(name, fn):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(s, n):
        ts = jnp.linspace(0.0, 2.0 * np.pi, n)

        def body(c, t):
            return c + fn(spec.animate(s, t)), None

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), ts)
        return tot

    float(run(scene, FRAMES))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(scene, FRAMES))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<28} {best/FRAMES*1e3:8.2f} ms/frame", flush=True)
    return best / FRAMES


def fsum(x):
    return jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0), dtype=jnp.float32)


def v_animate(s):
    return fsum(s.triangles.v0)


def v_kernels(s):
    ro, rd = renderer.generate_rays(s.camera, config)
    rec = pk.closest_hit_pallas(s, jnp.broadcast_to(ro, rd.shape), rd, config.ray_min)
    p_off = rec.point + rec.normal * jnp.float32(config.normal_offset)
    lds = [shading.direction_to_light(s.lights, li, p_off) for li in range(s.lights.count)]
    occ = pk.any_hit_lights_pallas(
        s, p_off, jnp.stack([l for l, _ in lds]), jnp.stack([m for _, m in lds]), config.ray_min
    )
    return fsum(rec.t) + jnp.sum(occ.astype(jnp.float32))


def v_noperm(s):
    ro, rd = renderer.generate_rays(s.camera, config)
    return fsum(pk.shade_rays(s, ro, rd, config))


def v_full(s):
    return fsum(pk.render_image_f32(s, config))


def v_jnp_shade_zero_occ(s):
    # XLA shading cost in isolation: pallas closest-hit + fake occlusion
    ro, rd = renderer.generate_rays(s.camera, config)
    colors = renderer.shade_rays(
        s, ro, rd, config,
        closest_fn=pk.closest_hit_pallas,
        any_fn=None,
        any_multi_fn=lambda sc, p, d, m, t: jnp.zeros((d.shape[0], d.shape[1]), bool),
    )
    return fsum(colors)


import sys

VARIANTS = {
    "animate": ("animate only", v_animate),
    "kernels": ("kernels (closest+shadow)", v_kernels),
    "noperm": ("noperm shade_rays", v_noperm),
    "full": ("full (with perm)", v_full),
    "zeroocc": ("closest + zero-occ shade", v_jnp_shade_zero_occ),
}
name, fn = VARIANTS[sys.argv[1]]
timeit(name, fn)
