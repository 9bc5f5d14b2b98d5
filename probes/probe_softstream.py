"""TPU probe: DMA-streamed soft/diff kernels past the 9,600-tri SMEM chain.

1. Lowering gate: compile+execute all 5 streamed kernel families on the real
   backend (interpret tests skip Mosaic's block-mapping checks — CLAUDE.md).
2. Parity vs the jnp reference ops at small resolution.
3. Timing: bunny50k fwd+bwd (material SGD steps) streamed vs the jnp diff
   path (the round-3 fallback that measured 2,515 ms forward-alone).

Usage: timeout 1200 python probes/probe_softstream.py [--skip-jnp]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.core import scenes
from raytpu.core.scenes import scene_bunny_subdiv
from raytpu.core.types import RenderConfig
from raytpu.grad import diff_render
from raytpu.ops import intersect


def fetch(x):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), x)


def shadow_inputs(scene, R, spread=1.5, seed=0):
    key = jax.random.PRNGKey(seed)
    center = scene.triangles.v0.mean(axis=0)
    p = jnp.asarray(center + jax.random.normal(key, (R, 3)) * spread, jnp.float32)
    dirs, mags = [], []
    for li in range(scene.lights.count):
        d = scene.lights.position[li] - p
        m = jnp.linalg.norm(d, axis=1)
        dirs.append(d / m[:, None])
        mags.append(m)
    return p, jnp.stack(dirs), jnp.stack(mags)


def kernel_parity(scene, tag, bwd_ref=True):
    from raytpu.render import pallas_soft as ps

    T = scene.triangles.count
    p, dirs, mags = shadow_inputs(scene, 2048)
    tmin, beta = 1e-4, 8.0

    t0 = time.perf_counter()
    a = fetch(jax.jit(lambda *x: ps.soft_trans_lights_pallas(scene, *x, tmin, beta, stream=True))(p, dirs, mags))
    print(f"[{tag} T={T}] soft fwd stream compiled+ran {time.perf_counter()-t0:.1f}s", flush=True)
    ref = fetch(jax.jit(lambda *x: jnp.stack([
        intersect.soft_transmittance(scene, x[0], x[1][li], jnp.float32(tmin), x[2][li], jnp.float32(beta))
        for li in range(scene.lights.count)]))(p, dirs, mags))
    print(f"  fwd maxdiff vs jnp: {np.max(np.abs(a - ref)):.3e}", flush=True)

    t0 = time.perf_counter()
    occ = fetch(jax.jit(lambda *x: ps.any_hit_lights_mega2(scene, *x, tmin, stream=True))(p, dirs, mags))
    occ_ref = fetch(jax.jit(lambda *x: jnp.stack([
        intersect.any_hit(scene, x[0], x[1][li], tmin, x[2][li])
        for li in range(scene.lights.count)]))(p, dirs, mags))
    print(f"  anyhit ran {time.perf_counter()-t0:.1f}s, mismatches {np.sum(occ != occ_ref)}/{occ.size}", flush=True)

    t0 = time.perf_counter()
    tt, idx = jax.jit(lambda *x: ps.scene_min_t_mega2(scene, x[0], x[1], tmin, stream=True))(p, dirs[0])
    tt, idx = fetch((tt, idx))
    tmat = fetch(jax.jit(lambda *x: intersect.scene_t_matrix(scene, x[0], x[1], tmin, jnp.inf, shadow_pass=False))(p, dirs[0]))
    idx_ref = np.argmin(tmat, axis=1)
    t_ref = np.min(tmat, axis=1)
    bad = np.sum((idx != idx_ref) & np.isfinite(t_ref))
    print(f"  mint ran {time.perf_counter()-t0:.1f}s, idx mismatches {bad}/{idx.size} "
          f"(boundary flips allowed), t maxdiff {np.max(np.abs(np.where(np.isfinite(t_ref), tt - t_ref, 0.0))):.3e}", flush=True)

    g = jnp.ones_like(jnp.asarray(a)) * 0.5
    t0 = time.perf_counter()
    dr = fetch(jax.jit(lambda *x: ps.soft_dray_pallas(scene, *x, tmin, beta, stream=True))(p, dirs, mags, g, jnp.asarray(a)))
    print(f"  dray ran {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    dp = fetch(jax.jit(lambda *x: ps.soft_dprim_pallas(scene, *x, tmin, beta, stream=True))(p, dirs, mags, g, jnp.asarray(a)))
    print(f"  dprim ran {time.perf_counter()-t0:.1f}s", flush=True)

    # backward parity vs the jnp VJP (dense residuals OOM past ~30k tris —
    # the reason the streamed kernels exist; verified at 18.7k)
    if not bwd_ref:
        return

    def jnp_trans(s, pp, dd, mm):
        return jnp.stack([
            intersect.soft_transmittance(s, pp, dd[li], jnp.float32(tmin), mm[li], jnp.float32(beta))
            for li in range(scene.lights.count)])

    _, vjp = jax.vjp(jnp_trans, scene, p, dirs, mags)
    d_scene, g_p, g_dirs, g_mags = fetch(vjp(g))
    print(f"  dray g_p maxdiff {np.max(np.abs(dr[0] - g_p)):.3e} "
          f"g_dirs {np.max(np.abs(dr[1] - g_dirs)):.3e} g_mags {np.max(np.abs(dr[2] - g_mags)):.3e}", flush=True)
    print(f"  dprim g_v0 maxdiff {np.max(np.abs(dp[0] - d_scene.triangles.v0)):.3e} "
          f"g_v1 {np.max(np.abs(dp[1] - d_scene.triangles.v1)):.3e} "
          f"g_v2 {np.max(np.abs(dp[2] - d_scene.triangles.v2)):.3e} "
          f"(scale {np.max(np.abs(d_scene.triangles.v1)):.3e})", flush=True)


def bench_fwd_bwd(scene, tag, frames=2, repeats=2, kernels=True, size=(640, 480)):
    w, h = size
    config = RenderConfig(width=w, height=h, ray_chunk=w * h, soft_shadows=True)
    target = jnp.zeros((h, w, 3), jnp.float32)

    def loss_fn(params):
        s = diff_render.merge_material_params(scene, params)
        img = diff_render.render_soft_f32(s, config, kernels=kernels)
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
    _, losses = steps(params, frames)
    float(jnp.asarray(losses)[-1])
    print(f"[{tag}] kernels={kernels} compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _, losses = steps(params, frames)
        float(jnp.asarray(losses)[-1])
        best = min(best, time.perf_counter() - t0)
    ms = best * 1e3 / frames
    print(f"[{tag}] kernels={kernels} fwd+bwd {ms:.2f} ms/frame (loss {float(losses[-1]):.6f})", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-jnp", action="store_true")
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument("--frames", type=int, default=2)
    args = ap.parse_args()

    print("device:", jax.devices()[0], flush=True)
    fine = scene_bunny_subdiv(3)  # 18,688 tris -> FINE streamed worklists
    coarse = scenes.get("bunny50k").build()  # 74,752 -> COARSE

    if not args.skip_parity:
        kernel_parity(fine, "subdiv3/fine")
        kernel_parity(coarse, "bunny50k/coarse", bwd_ref=False)

    ms_k = bench_fwd_bwd(coarse, "bunny50k", frames=args.frames, kernels=True)
    if not args.skip_jnp:
        # the jnp diff path's (T, R)-chunk matrices OOM at real resolutions
        # (74752 x 75k f32 = 22 GB) — measure tiny and scale by ray count
        ms_j = bench_fwd_bwd(coarse, "bunny50k", frames=1, repeats=1, kernels=False,
                             size=(64, 48))
        scale = (640 * 480) / (64 * 48)
        print(f"jnp diff path (scaled to 640x480): ~{ms_j * scale:.0f} ms "
              f"-> streamed speedup ~{ms_j * scale / ms_k:.1f}x", flush=True)


if __name__ == "__main__":
    sys.exit(main())
