"""Probe (real TPU): the optional-forward roofline (VERDICT r4 next #2).

Two measurements close the 3-round-old 3.5 ms debt with arithmetic:

A. FOLD COUNT — replicate the mega2 router's own worklist construction
   (camera-tile cull for the closest pass, kernel-AABB light cull for the
   shadow pass) and count the group folds a frame actually executes.

B. FOLD SPEED — a two-point fit using the production kernel itself:
   time the normal (culled) frame vs a MEGA2_FORCE_DENSE frame whose fold
   count is known exactly (every tile folds every group, closest + L
   shadow passes).  slope = (T_dense - T_culled) / (F_dense - F_culled)
   is the marginal cost of one 8-triangle x 1024-ray group fold with all
   non-fold overhead (raygen, sphere/plane unrolls, shade, launch chain,
   XLA worklists) differenced away.

Roofline: fold_time = F_culled * slope vs the observed frame time; the
sustained VPU ops/s implied by slope vs the v5e peak says whether the fold
loop itself has headroom.  Run: python probes/probe_roofline.py [--scene
optional] [--size 640x480]
"""
import argparse
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--scene", default="optional")
p.add_argument("--size", default="640x480")
p.add_argument("--platform", default=None)
p.add_argument("--frames", type=int, default=16)
p.add_argument("--fcl", type=int, default=None,
               help="skip part A: known closest group-fold count")
p.add_argument("--fsh", type=int, default=None,
               help="skip part A: known shadow group-fold count")
args = p.parse_args()
if args.platform:
    jax.config.update("jax_platforms", args.platform)

from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.ops import accel, intersect
from raytpu.render import pallas_kernel as pk
from raytpu.render import renderer

W, H = (int(x) for x in args.size.split("x"))
cfg = RenderConfig(width=W, height=H)
scene = scenes.get(args.scene).build()
T = scene.triangles.count
L = scene.lights.count
tmin = float(cfg.ray_min)
tiled = (W % 32 == 0) and (H % 32 == 0)
R = W * H
nt = -(-R // 1024)
ng = -(-T // pk.MEGA2_G)
print(f"{args.scene} {W}x{H}: T={T} ng={ng} nt={nt} L={L} tiled={tiled}")

# ---- A. fold counts (replicates render_image_mega2_f32's worklists) ----
if args.fcl is not None and args.fsh is not None:
    f_closest, f_shadow = args.fcl, args.fsh  # reuse a previous run's counts
else:
    glo, ghi = accel.chunk_bounds(scene.triangles, pk.MEGA2_G)
    rb = accel.camera_tile_bounds(scene.camera, W, H, tiled, tile=1024)
    cullm = np.asarray(accel.cull_matrix(rb, glo, ghi, tmin))  # (nt, ng)
    f_closest = int(cullm.sum())

    # kernel-identical tile AABBs of offset hit points, from a chunked jnp
    # closest hit over FEED-order rays
    ro, rd = renderer.generate_rays(scene.camera, cfg)
    if tiled:
        rd = pk._mega2_fold(rd, H, W)
    CH = 8192

    @jax.jit
    def chunk_rec(rds):
        rec = intersect.closest_hit(scene, jnp.broadcast_to(ro, rds.shape), rds, tmin)
        p_off = rec.point + rec.normal * jnp.float32(cfg.normal_offset)
        return rec.hit, p_off

    pad = (-R) % CH
    rd_p = jnp.pad(rd, ((0, pad), (0, 0)), mode="edge").reshape(-1, CH, 3)
    hit, p_off = jax.lax.map(chunk_rec, rd_p)
    hit = np.asarray(hit).reshape(-1)[:R]
    p_off = np.asarray(p_off).reshape(-1, 3)[:R]
    hit_t = hit.reshape(nt, 1024)
    p_t = p_off.reshape(nt, 1024, 3)
    INF = np.float32(np.inf)
    bb_lo = np.where(hit_t[..., None], p_t, INF).min(axis=1)
    bb_hi = np.where(hit_t[..., None], p_t, -INF).max(axis=1)

    from raytpu.core.types import LightKind

    f_shadow = 0
    for li in range(L):
        is_pt = bool(scene.lights.kind[li] == LightKind.POINT)
        cl = accel.light_shadow_cull_from_aabb(
            jnp.asarray(bb_lo), jnp.asarray(bb_hi), scene.lights.position[li],
            scene.lights.direction[li], is_pt, glo, ghi, tmin)
        f_shadow += int(np.asarray(cl).sum())

f_culled = f_closest + f_shadow
f_dense = nt * ng * (1 + L)
print(f"folds/frame: closest {f_closest:,} ({f_closest/(nt*ng)*100:.1f}% of dense) "
      f"shadow {f_shadow:,} ({f_shadow/(nt*ng*L)*100:.1f}%)  total {f_culled:,}")
print(f"ray-tri tests/frame: {f_culled*8*1024/1e6:.0f} M culled-in "
      f"(dense would be {f_dense*8*1024/1e6:.0f} M)")

# ---- B. two-point fit with the production kernel ----
FR = args.frames


def timed(dense):
    pk.MEGA2_FORCE_DENSE = dense

    @functools.partial(jax.jit, static_argnames=("n",))
    def scan_render(s, n):
        ts = jnp.linspace(0.0, 2.0 * np.pi, n)

        def body(c, t):
            img = pk.render_image_mega2_f32(s.update(t), cfg)
            return c + jnp.sum(img, dtype=jnp.float32), None

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), ts)
        return tot

    t0 = time.perf_counter()
    float(scan_render(scene, FR))
    print(f"dense={dense} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(scan_render(scene, FR))
        best = min(best, time.perf_counter() - t0)
    pk.MEGA2_FORCE_DENSE = False
    return best * 1e3 / FR


t_culled = timed(False)
t_dense = timed(True)
slope_us = (t_dense - t_culled) * 1e3 / (f_dense - f_culled)  # us per group fold
fold_ms = f_culled * slope_us / 1e3
print(f"frame: culled {t_culled:.3f} ms, dense {t_dense:.3f} ms "
      f"({f_dense - f_culled:,} extra folds)")
print(f"slope: {slope_us*1e3:.1f} ns/group-fold "
      f"({slope_us*1e3/8/1024*1e3:.2f} ps per ray-tri test)")
print(f"fold time at culled count: {fold_ms:.3f} ms = "
      f"{fold_ms/t_culled*100:.0f}% of the frame")
# sustained VPU ops/s implied by the fold slope (static count: ~78 vector
# ops per ray-tri Moller-Trumbore fold incl. selects; 8 tris x 1024 lanes)
ops_per_fold = 78 * 8 * 1024
print(f"implied sustained VPU: {ops_per_fold/(slope_us*1e-6)/1e12:.2f} Tops/s "
      f"(v5e peak ~3.9 Tops/s f32: 8x128 lanes x 4 ALUs x ~0.94 GHz)")
t35_folds = (3.5 - (t_culled - fold_ms)) / (slope_us / 1e3)
print(f"a 3.5 ms frame at this slope allows {t35_folds:,.0f} folds "
      f"= {t35_folds/f_culled*100:.0f}% of the current culled-in count")
