"""Per-pipeline-stage timing: the observability upgrade over the reference's
whole-frame Timer (reference: source/Timer.cpp:103-130, which can only time
complete frames; SURVEY.md §5.1 commits to per-stage rays/s counters).

Everything under jit is fused, so stages are measured as *cumulative
prefixes* of the pipeline (raygen | +closest-hit | +shadow | full frame),
each dispatched separately with K animated frames per dispatch (lax.scan —
per CLAUDE.md, microbenchmarks must amortize the per-dispatch tunnel
latency), then differenced into per-stage times.

Usage:
    from raytpu.utils.stage_profile import profile_stages
    report = profile_stages(scene_spec, config)   # dict stage -> ms/frame
"""

from __future__ import annotations

import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

STAGES = ("raygen", "closest_hit", "shadow", "shade")


def _finite_sum(x):
    return jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0), dtype=jnp.float32)


def _make_prefix_fns(config, pallas: bool):
    """Cumulative pipeline prefixes, each reducing to one scalar."""
    from raytpu.ops import intersect, shading
    from raytpu.render import renderer

    if pallas:
        from raytpu.render import pallas_kernel as pk

        closest_fn = pk.closest_hit_pallas
        full_fn = pk.render_image_f32
        any_lights = pk.any_hit_lights_pallas
    else:
        closest_fn = intersect.closest_hit
        full_fn = renderer.render_image_f32

        def any_lights(scene, ro, dirs, mags, tmin):
            return jnp.stack(
                [intersect.any_hit(scene, ro, dirs[li], tmin, mags[li]) for li in range(dirs.shape[0])]
            )

    def raygen(scene):
        ro, rd = renderer.generate_rays(scene.camera, config)
        return _finite_sum(rd)

    def closest(scene):
        ro, rd = renderer.generate_rays(scene.camera, config)
        rec = closest_fn(scene, jnp.broadcast_to(ro, rd.shape), rd, config.ray_min)
        return _finite_sum(rec.t) + _finite_sum(rec.normal)

    def shadow(scene):
        ro, rd = renderer.generate_rays(scene.camera, config)
        rec = closest_fn(scene, jnp.broadcast_to(ro, rd.shape), rd, config.ray_min)
        p_off = rec.point + rec.normal * jnp.float32(config.normal_offset)
        lds = [shading.direction_to_light(scene.lights, li, p_off) for li in range(scene.lights.count)]
        if not lds:
            return _finite_sum(rec.t)
        occ = any_lights(
            scene,
            p_off,
            jnp.stack([l for l, _ in lds]),
            jnp.stack([m for _, m in lds]),
            config.ray_min,
        )
        return _finite_sum(rec.t) + jnp.sum(occ.astype(jnp.float32))

    def full(scene):
        return _finite_sum(full_fn(scene, config))

    return {"raygen": raygen, "closest_hit": closest, "shadow": shadow, "shade": full}


def _time_fn(fn: Callable, spec, scene, frames: int, repeats: int) -> float:
    """Best-of-repeats seconds/frame for ``fn`` over animated frames.

    ``spec.animate`` varies the scene per scan step so XLA cannot hoist the
    body; the scalar result is fetched to host (block_until_ready may return
    early on tunneled backends — CLAUDE.md)."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(s, n):
        ts = jnp.linspace(0.0, 2.0 * np.pi, n)

        def body(carry, t):
            return carry + fn(spec.animate(s, t)), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), ts)
        return total

    float(run(scene, frames))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(scene, frames))
        best = min(best, time.perf_counter() - t0)
    return best / frames


def profile_stages(spec, scene, config, *, pallas: bool = True, frames: int = 16, repeats: int = 3):
    """Per-stage ms/frame + rays/s for a scene.

    Args:
      spec: a SceneSpec (``spec.animate(scene, t)`` drives the per-frame
        variation, mirroring the reference's animating Update loop).
      scene: the built Scene pytree.
    Returns a dict with cumulative and differenced per-stage numbers.
    """
    fns = _make_prefix_fns(config, pallas)
    cum = {name: _time_fn(fn, spec, scene, frames, repeats) for name, fn in fns.items()}
    n_rays = config.width * config.height
    n_shadow = n_rays * int(scene.lights.count) if config.shadows else 0
    order = ["raygen", "closest_hit", "shadow", "shade"]
    stage_s = {}
    prev = 0.0
    for name in order:
        stage_s[name] = max(cum[name] - prev, 0.0)
        prev = max(cum[name], prev)
    report = {
        "frame_ms": cum["shade"] * 1e3,
        "stages_ms": {k: v * 1e3 for k, v in stage_s.items()},
        "cumulative_ms": {k: v * 1e3 for k, v in cum.items()},
        "primary_rays_per_s": n_rays / cum["shade"] if cum["shade"] else 0.0,
        "stage_rays_per_s": {
            "closest_hit": n_rays / stage_s["closest_hit"] if stage_s["closest_hit"] else float("inf"),
            "shadow": n_shadow / stage_s["shadow"] if stage_s["shadow"] else float("inf"),
        },
    }
    return report


def format_report(report: dict) -> str:
    lines = [f"frame: {report['frame_ms']:.2f} ms  ({report['primary_rays_per_s']/1e6:.1f} M primary rays/s)"]
    for k, v in report["stages_ms"].items():
        extra = ""
        rps = report["stage_rays_per_s"].get(k)
        if rps and np.isfinite(rps):
            extra = f"  ({rps/1e6:.1f} M rays/s)"
        lines.append(f"  {k:<12} {v:8.2f} ms{extra}")
    return "\n".join(lines)
