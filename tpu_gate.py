"""TPU lowering gate: compile + execute every Pallas entry point on the REAL
backend and record ok/fail per kernel in TPUGATE.json.

Interpret-mode CPU tests do NOT run Mosaic's block-mapping checks — a
blob/BlockSpec width mismatch once passed the whole CPU suite and only failed
at real-TPU lowering (CLAUDE.md round 2).  This gate closes that blind spot:
run it in every TPU window after kernel changes.

Each entry runs in its OWN subprocess under a timeout (the axon remote-compile
service stalls intermittently; one stuck compile must not sink the rest) and
is retried once on timeout.  Results are appended to TPUGATE.json as they
arrive, so a killed run still leaves a partial record.

Usage:
  python tpu_gate.py                 # all entries, real TPU, writes TPUGATE.json
  python tpu_gate.py --platform cpu  # interpret-mode smoke of the gate itself
  python tpu_gate.py --only mega2_tiled --timeout 900
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

GATE_ENTRIES = [
    # name -> covered kernels
    "mega",                # whole-frame megakernel (<=72 prims)
    "mega2_tiled",         # mega2 closest+shadow worklist kernels, 32x32 tile order
    "mega2_untiled",       # mega2 kernels, raster-order raygen
    "chunked_pipeline",    # (RT,CT) closest_hit_pallas + any_hit_lights + shadow_shade
    "mega3_fine",          # DMA-streamed single-launch kernels, per-group worklists
    "mega3_coarse",        # DMA-streamed kernels, per-super-group worklists (74k tris)
    "mega3_coarse2",       # per-super-super-group worklists (299k tris, no 131k cliff)
    "soft_forward",        # soft_trans_lights_pallas fwd + scene_min_t_mega2 + any_hit_lights_mega2
    "soft_fwd_bwd",        # + custom-VJP backward kernels (dray, dprim) via value_and_grad
    "soft_stream_fine",    # DMA-streamed soft fwd+bwd, per-group worklists (18.7k tris)
    "soft_stream_coarse",  # DMA-streamed soft fwd+bwd, super-group worklists (74.7k tris)
    "soft_stream_coarse2",  # coarse2 soft kernels + chained dprim (299k tris; ~8 min compile)
    "sharded_1x1",         # shard_map winner-search/merge composition, 1x1 mesh
    "sharded_px_fused_mega",   # px-only fused whole-frame megakernel per chip
    "sharded_px_fused_mega2",  # px-only fused mega2 chain per chip (tile-range)
    "sharded_px_fused_mega3",  # px-only fused DMA-streamed mega3 per chip (50k tris)
    "packed_pipeline",     # payload winner search + streamed any-hit + XLA shade
                           # (round-5 default for the 9.6k..1M band)
]

#: per-entry minimum subprocess timeout (seconds) — overrides a smaller
#: --timeout; the coarse2 diff chain alone compiles ~8 min on v5e
ENTRY_MIN_TIMEOUT = {
    "soft_stream_coarse2": 1200.0,
}


def _build(entry: str):
    """Build (fn, args) for one gate entry.  fn must be jittable."""
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp

    from raytpu.core import scenes
    from raytpu.core.types import RenderConfig
    from raytpu.render import renderer as _renderer
    from raytpu.render import pallas_kernel as pk

    if entry == "mega":
        scene = scenes.get("reference").build()
        cfg = RenderConfig(width=64, height=32)
        return functools.partial(pk.render_image_mega_f32, config=cfg), (scene,)

    if entry in ("mega2_tiled", "mega2_untiled"):
        scene = scenes.get("bunny").build()
        cfg = RenderConfig(width=64, height=32) if entry == "mega2_tiled" else \
            RenderConfig(width=60, height=40)
        return functools.partial(pk.render_image_mega2_f32, config=cfg), (scene,)

    if entry in ("mega3_fine", "mega3_coarse", "mega3_coarse2"):
        name = {"mega3_fine": "optional", "mega3_coarse": "bunny50k",
                "mega3_coarse2": "bunny300k"}[entry]
        scene = scenes.get(name).build()
        cfg = RenderConfig(width=64, height=32)
        return functools.partial(pk.render_image_mega3_f32, config=cfg), (scene,)

    if entry == "packed_pipeline":
        scene = scenes.get("bunny50k").build()
        cfg = RenderConfig(width=64, height=32)
        return functools.partial(pk.render_image_packed_f32, config=cfg), (scene,)

    if entry == "chunked_pipeline":
        # the >9600-tri fallback path: (RT, CT) chunked closest hit +
        # multi-light any-hit + fused shadow/shade kernel
        scene = scenes.get("bunny").build()
        cfg = RenderConfig(width=64, height=32)

        def chunked(s):
            ro, rd = _renderer.generate_rays(s.camera, cfg)
            rec = pk.closest_hit_pallas(s, jnp.broadcast_to(ro, rd.shape), rd, cfg.ray_min)
            return pk.shadow_shade_pallas(s, rec, rd, cfg)

        return chunked, (scene,)

    if entry == "soft_forward":
        from raytpu.grad import diff_render

        scene = scenes.get("bunny").build()
        cfg = RenderConfig(width=64, height=32)
        return (
            functools.partial(diff_render.render_soft_f32, config=cfg, kernels=True),
            (scene,),
        )

    if entry == "soft_fwd_bwd":
        from raytpu.grad import diff_render

        scene = scenes.get("bunny").build()
        cfg = RenderConfig(width=64, height=32)
        target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

        def loss_fn(params, s):
            s = diff_render.merge_material_params(s, params["mat"])
            s = diff_render.merge_light_params(s, params["light"])
            s = diff_render.merge_geometry_params(s, params["geom"])
            img = diff_render.render_soft_f32(s, cfg, kernels=True)
            return jnp.mean((img - target) ** 2)

        params = {
            "mat": diff_render.material_params(scene),
            "light": diff_render.light_params(scene),
            "geom": diff_render.geometry_params(scene),
        }

        def fwd_bwd(p, s):
            loss, g = jax.value_and_grad(loss_fn)(p, s)
            # consume every grad leaf — an unused cotangent lets XLA DCE the
            # backward kernels and the gate would pass vacuously
            return loss + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

        return fwd_bwd, (params, scene)

    if entry in ("soft_stream_fine", "soft_stream_coarse", "soft_stream_coarse2"):
        # the round-4 DMA-streamed differentiable path: soft fwd + mint +
        # dray + dprim past the 9,600-tri SMEM chain (fine: per-group
        # worklists at 18.7k tris; coarse: super-group worklists at 74.7k;
        # coarse2: super-super-group worklists + ~37-launch chained dprim
        # at 299k tris — give this one --timeout >= 900, compile is ~8 min)
        from raytpu.core.scenes import scene_bunny_subdiv
        from raytpu.grad import diff_render

        scene = {"soft_stream_fine": lambda: scene_bunny_subdiv(3),
                 "soft_stream_coarse": lambda: scenes.get("bunny50k").build(),
                 "soft_stream_coarse2": lambda: scenes.get("bunny300k").build(),
                 }[entry]()
        cfg = RenderConfig(width=64, height=32)
        target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

        def loss_fn(params, s):
            s = diff_render.merge_material_params(s, params["mat"])
            s = diff_render.merge_geometry_params(s, params["geom"])
            img = diff_render.render_soft_f32(s, cfg, kernels=True)
            return jnp.mean((img - target) ** 2)

        params = {
            "mat": diff_render.material_params(scene),
            "geom": diff_render.geometry_params(scene),
        }

        def fwd_bwd(p, s):
            loss, g = jax.value_and_grad(loss_fn)(p, s)
            return loss + sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))

        return fwd_bwd, (params, scene)

    if entry == "sharded_1x1":
        from raytpu.parallel import make_mesh, render_image_sharded

        scene = scenes.get("bunny").build()
        cfg = RenderConfig(width=64, height=32)
        mesh = make_mesh(px=1, prim=1, devices=jax.devices()[:1])
        # fused=False: keep this entry covering the packed winner-search +
        # any-hit + merge composition (px-only meshes route fused by default)
        return functools.partial(render_image_sharded, config=cfg, mesh=mesh,
                                 fused=False), (scene,)

    if entry in ("sharded_px_fused_mega", "sharded_px_fused_mega2",
                 "sharded_px_fused_mega3"):
        from raytpu.parallel import make_mesh, render_image_sharded
        from raytpu.parallel.sharding import _render_fused_px

        name = {"sharded_px_fused_mega": "reference",
                "sharded_px_fused_mega2": "bunny",
                "sharded_px_fused_mega3": "bunny50k"}[entry]
        scene = scenes.get(name).build()
        cfg = RenderConfig(width=64, height=32)
        mesh = make_mesh(px=1, prim=1, devices=jax.devices()[:1])
        if entry == "sharded_px_fused_mega3":
            # off the default routing (winner-search measured faster in its
            # band) but kept lowering-gated — call the fused body directly
            return functools.partial(_render_fused_px, config=cfg, mesh=mesh,
                                     kind="mega3"), (scene,)
        return functools.partial(render_image_sharded, config=cfg, mesh=mesh), (scene,)

    raise SystemExit(f"unknown gate entry {entry!r}")


def run_one(entry: str, platform: str | None) -> dict:
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    fn, args = _build(entry)
    t0 = time.perf_counter()
    jitted = jax.jit(fn)
    compiled = jitted.lower(*args).compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = compiled(*args)
    # fetch a value: on tunneled backends block_until_ready can return early
    val = float(jax.numpy.asarray(out).ravel()[0])
    t_exec = time.perf_counter() - t0
    ok = bool(jax.numpy.isfinite(jax.numpy.asarray(out)).all())
    return {
        "kernel": entry,
        "status": "ok" if ok else "nonfinite",
        "compile_s": round(t_compile, 2),
        "exec_s": round(t_exec, 2),
        "probe_value": val,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--only", action="append", help="run only these entries")
    p.add_argument("--platform", default=None)
    p.add_argument("--timeout", type=float, default=600.0, help="per-entry seconds")
    p.add_argument("--retries", type=int, default=1, help="retries per entry on timeout")
    p.add_argument("--out", default="TPUGATE.json")
    p.add_argument("--one", help=argparse.SUPPRESS)  # subprocess worker mode
    args = p.parse_args(argv)

    if args.one:
        res = run_one(args.one, args.platform)
        print("GATE_RESULT " + json.dumps(res))
        return 0

    entries = args.only or GATE_ENTRIES
    results = []
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), args.out)

    # --only runs MERGE into the existing artifact (a partial run must not
    # clobber the full per-kernel record)
    carried = []
    if args.only and os.path.exists(out_path):
        try:
            with open(out_path) as f:
                carried = [r for r in json.load(f).get("results", [])
                           if r.get("kernel") not in entries]
        except Exception:
            carried = []

    def flush():
        merged = carried + results
        with open(out_path, "w") as f:
            json.dump({
                "platform": args.platform or "default(tpu)",
                "results": merged,
                "ok": sum(1 for r in merged if r["status"] == "ok"),
                "total": len(carried) + len(entries),
            }, f, indent=1)

    for entry in entries:
        rec = None
        entry_timeout = max(args.timeout, ENTRY_MIN_TIMEOUT.get(entry, 0.0))
        for attempt in range(args.retries + 1):
            cmd = [sys.executable, os.path.abspath(__file__), "--one", entry]
            if args.platform:
                cmd += ["--platform", args.platform]
            t0 = time.perf_counter()
            try:
                proc = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=entry_timeout
                )
            except subprocess.TimeoutExpired:
                rec = {"kernel": entry, "status": "timeout",
                       "compile_s": round(time.perf_counter() - t0, 2), "exec_s": None}
                print(f"{entry}: TIMEOUT after {entry_timeout:.0f}s "
                      f"(attempt {attempt + 1})", file=sys.stderr)
                continue  # retry: tunnel stalls are routine
            for line in proc.stdout.splitlines():
                if line.startswith("GATE_RESULT "):
                    rec = json.loads(line[len("GATE_RESULT "):])
                    break
            else:
                tail = (proc.stderr or proc.stdout).strip().splitlines()[-12:]
                rec = {"kernel": entry, "status": "fail",
                       "compile_s": round(time.perf_counter() - t0, 2),
                       "exec_s": None, "error": "\n".join(tail)}
            break
        results.append(rec)
        print(f"{entry}: {rec['status']} (compile {rec.get('compile_s')}s, "
              f"exec {rec.get('exec_s')}s)", file=sys.stderr)
        flush()

    bad = [r for r in results if r["status"] != "ok"]
    print(json.dumps({"gate": "tpu_lowering", "ok": len(results) - len(bad),
                      "failed": [r["kernel"] for r in bad], "out": out_path}))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
