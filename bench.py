"""Benchmark: primary rays/s on the full reference scene at 640x480.

Renders K animated frames per device dispatch (lax.scan over the mesh-yaw
animation, mirroring the reference's F6 benchmark of the animating
Scene_W4_ReferenceScene) so per-dispatch host<->device latency is amortized.

Prints ONE JSON line:
  {"metric": "primary_rays_per_s", "value": N, "unit": "rays/s", "vs_baseline": N}

Baseline: the reference's committed benchmark.txt average of 11.0285 FPS at
640x480 => 3.388e6 primary rays/s (BASELINE.md).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_PRIMARY_RAYS_PER_S = 11.0285 * 640 * 480  # reference benchmark.txt avg


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="reference")
    p.add_argument("--size", default="640x480")
    p.add_argument("--frames", type=int, default=64, help="frames per timed dispatch")
    p.add_argument("--repeats", type=int, default=3, help="timed dispatches (best taken)")
    p.add_argument("--platform", default=None)
    p.add_argument("--backend", default="auto", choices=["auto", "jnp", "pallas"])
    p.add_argument("--grad", action="store_true",
                   help="benchmark fwd+bwd (soft-shadow inverse-rendering steps) instead of forward")
    p.add_argument("--stages", action="store_true",
                   help="print a per-stage (raygen/closest/shadow/shade) ms breakdown to stderr")
    p.add_argument("--trace", metavar="DIR", default=None,
                   help="capture a jax.profiler trace of one timed dispatch into DIR")
    args = p.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from raytpu.core import scenes
    from raytpu.core.types import RenderConfig

    try:
        w, h = (int(x) for x in args.size.lower().split("x"))
        assert w > 0 and h > 0
    except (ValueError, AssertionError):
        print(f"error: --size must be WxH (got {args.size!r})", file=sys.stderr)
        return 2
    num_rays = w * h
    # single-chunk rendering: the whole ray grid in one batch (no lax.map)
    config = RenderConfig(width=w, height=h, ray_chunk=num_rays)
    scene = scenes.get(args.scene).build()

    if args.grad:
        return bench_grad(args, scene, config, num_rays)

    render_fn = None
    backend = "jnp"
    if args.backend in ("auto", "pallas"):
        try:
            from raytpu.render.pallas_kernel import render_image_f32 as render_fn  # noqa: F811

            backend = "pallas"
        except Exception:
            if args.backend == "pallas":
                raise
            render_fn = None
    if render_fn is None:
        from raytpu.render.renderer import render_image_f32 as render_fn  # noqa: F811

    @functools.partial(jax.jit, static_argnames=("n",))
    def bench_n_frames(s, n):
        ts = jnp.linspace(0.0, 2.0 * np.pi, n)

        def body(carry, t):
            img = render_fn(s.update(t), config)
            return carry + jnp.sum(img, dtype=jnp.float32), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), ts)
        return total

    print(f"bench: scene={args.scene} {w}x{h} frames/dispatch={args.frames} backend={backend} "
          f"device={jax.devices()[0]}", file=sys.stderr)

    # NOTE: fetch the scalar to host — on tunneled backends block_until_ready
    # can return before remote execution finishes; a value fetch cannot.
    t0 = time.perf_counter()
    float(bench_n_frames(scene, args.frames))
    print(f"compile+first dispatch: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        float(bench_n_frames(scene, args.frames))
        best = min(best, time.perf_counter() - t0)

    if args.trace:
        from raytpu.utils.profiling import trace

        with trace(args.trace):
            float(bench_n_frames(scene, args.frames))
        print(f"profiler trace written to {args.trace}", file=sys.stderr)

    if args.stages:
        from raytpu.utils.stage_profile import format_report, profile_stages

        spec = scenes.get(args.scene)
        report = profile_stages(spec, scene, config, pallas=(backend == "pallas"),
                                frames=min(args.frames, 16))
        print(format_report(report), file=sys.stderr)

    fps = args.frames / best
    rays_per_s = fps * num_rays
    print(f"best: {best*1e3/args.frames:.2f} ms/frame = {fps:.1f} fps", file=sys.stderr)
    print(json.dumps({
        "metric": "primary_rays_per_s",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / BASELINE_PRIMARY_RAYS_PER_S,
    }))
    return 0


def bench_grad(args, scene, config, num_rays) -> int:
    """fwd+bwd ms/frame: chained soft-shadow inverse-rendering steps (one
    lax.scan dispatch of K value_and_grad+sgd steps on material params)."""
    import dataclasses

    import jax.numpy as jnp

    from raytpu.grad import diff_render

    target = jnp.zeros((config.height, config.width, 3), jnp.float32)
    soft_cfg = dataclasses.replace(config, soft_shadows=True)

    def loss_fn(params):
        s = diff_render.merge_material_params(scene, params)
        img = diff_render.render_soft_f32(s, soft_cfg)
        return jnp.mean((img - target) ** 2)

    @functools.partial(jax.jit, static_argnames=("n",))
    def steps(params, n):
        def body(p, _):
            loss, g = jax.value_and_grad(loss_fn)(p)
            p = jax.tree_util.tree_map(lambda x, gx: x - 1e-2 * gx, p, g)
            return p, loss
        return jax.lax.scan(body, params, None, length=n)

    params = diff_render.material_params(scene)
    t0 = time.perf_counter()
    p, losses = steps(params, args.frames)
    jnp.asarray(losses).block_until_ready()
    float(losses[-1])
    print(f"compile+first dispatch: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        _, losses = steps(params, args.frames)
        float(jnp.asarray(losses)[-1])
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / args.frames
    print(f"best: {ms:.2f} fwd+bwd ms/frame (loss {float(losses[-1]):.5f})", file=sys.stderr)
    print(json.dumps({
        "metric": "fwd_bwd_ms_per_frame",
        "value": ms,
        "unit": "ms",
        "vs_baseline": (1000.0 / 11.0285) / ms,  # reference fwd-only frame time / our fwd+bwd
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
