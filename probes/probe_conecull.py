"""Probe (CPU): shadow cull pass rate with a cone-vs-sphere rejection added.

Shadow segments from a ray tile to a point light lie in the convex hull of
(origin box, light) — a cone from the light.  Test each group's bounding
sphere against that cone + a light-distance cap, ANDed with the existing
slab/segment-union tests, and compare pass rates vs the per-ray-exact
ceiling (tiled ray order).
"""
import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.ops import accel, intersect, shading
from raytpu.render import renderer, pallas_soft, pallas_kernel as pk
from raytpu.render.pallas_kernel import MEGA2_G


def cone_cull(rb, lp, lo, hi):
    """(nt, ng) 1.0 where the group may intersect a tile->light segment."""
    omin, omax = rb[:, 0:3], rb[:, 3:6]  # (nt,3)
    # 8 corners (nt, 8, 3)
    sel = jnp.asarray([[int(b) for b in f"{i:03b}"] for i in range(8)], jnp.float32)
    corners = omin[:, None, :] * (1 - sel[None]) + omax[:, None, :] * sel[None]
    v = corners - lp[None, None, :]
    dist = jnp.sqrt(jnp.sum(v * v, axis=-1))  # (nt, 8)
    far = dist.max(axis=1)  # (nt,)
    c = 0.5 * (omin + omax)
    ca = c - lp[None, :]
    ca_n = jnp.sqrt(jnp.sum(ca * ca, axis=-1, keepdims=True))
    a = ca / jnp.maximum(ca_n, 1e-20)  # (nt,3)
    cos_t = (jnp.sum(a[:, None, :] * v, axis=-1) / jnp.maximum(dist, 1e-20)).min(axis=1)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    degenerate = (cos_t <= 1e-3) | (ca_n[:, 0] < 1e-6)  # wide cone: skip test

    g = 0.5 * (lo + hi)  # (ng,3)
    r = 0.5 * jnp.sqrt(jnp.sum((hi - lo) ** 2, axis=-1))  # (ng,)
    d = g[None, :, :] - lp[None, None, :]
    proj = jnp.sum(a[:, None, :] * d, axis=-1)  # (nt, ng)
    dd = jnp.sum(d * d, axis=-1)
    e = jnp.sqrt(jnp.maximum(dd - proj * proj, 0.0))
    out_cone = (e * cos_t[:, None] - proj * sin_t[:, None]) > r[None, :]
    out_far = (jnp.sqrt(dd) - r[None, :]) > far[:, None]
    ok = ~(out_cone & ~degenerate[:, None]) & ~out_far
    return ok


for name in ("bunny", "optional"):
    scene = scenes.get(name).build()
    cfg = RenderConfig(width=160, height=128, soft_shadows=True)
    beta = float(cfg.soft_beta)
    ro, rd = renderer.generate_rays(scene.camera, cfg)
    rd = pk._mega2_fold(rd, cfg.height, cfg.width)
    ro_b = jnp.broadcast_to(ro, rd.shape)
    glo, ghi = accel.chunk_bounds(scene.triangles, MEGA2_G)
    slack = accel.chunk_soft_slack(scene.triangles, beta, MEGA2_G,
                                   pallas_soft.SOFT_SUPPORT)
    slo, shi = glo - slack[:, None], ghi + slack[:, None]
    L = scene.lights.count
    rec = intersect.closest_hit(scene, ro_b, rd, cfg.ray_min)
    p = rec.point + rec.normal * jnp.float32(cfg.normal_offset)
    base_r, cone_r = [], []
    for li in range(L):
        d, m = shading.direction_to_light(scene.lights, li, p)
        rb = accel.ray_tile_bounds(p, d, m, tile=1024)
        soft = accel.cull_matrix(rb, slo, shi, float(cfg.ray_min))
        lp = scene.lights.position[li]
        cone = cone_cull(rb, lp, slo, shi)
        both = soft * cone
        base_r.append(float(soft.mean()) * 100)
        cone_r.append(float(both.mean()) * 100)
    print(f"{name}: shadow(soft) slab+seg {np.mean(base_r):5.1f}%  +cone {np.mean(cone_r):5.1f}%")


print("--- reversed (light-anchored) slab test ---")
for name in ("bunny", "optional"):
    scene = scenes.get(name).build()
    cfg = RenderConfig(width=160, height=128, soft_shadows=True)
    beta = float(cfg.soft_beta)
    ro, rd = renderer.generate_rays(scene.camera, cfg)
    rd = pk._mega2_fold(rd, cfg.height, cfg.width)
    ro_b = jnp.broadcast_to(ro, rd.shape)
    glo, ghi = accel.chunk_bounds(scene.triangles, MEGA2_G)
    slack = accel.chunk_soft_slack(scene.triangles, beta, MEGA2_G,
                                   pallas_soft.SOFT_SUPPORT)
    slo, shi = glo - slack[:, None], ghi + slack[:, None]
    L = scene.lights.count
    rec = intersect.closest_hit(scene, ro_b, rd, cfg.ray_min)
    p = rec.point + rec.normal * jnp.float32(cfg.normal_offset)
    base_r, rev_r, both_r = [], [], []
    for li in range(L):
        d, m = shading.direction_to_light(scene.lights, li, p)
        rb = accel.ray_tile_bounds(p, d, m, tile=1024)
        soft = accel.cull_matrix(rb, slo, shi, float(cfg.ray_min))
        lp = scene.lights.position[li]
        # reversed rays: origin = the light point, dir = p - lp, t in [0,1]
        rd_rev = p - lp[None, :]
        ro_rev = jnp.broadcast_to(lp, rd_rev.shape)
        rb_rev = accel.ray_tile_bounds(ro_rev, rd_rev, jnp.ones(rd_rev.shape[0]), tile=1024)
        rev = accel.cull_matrix(rb_rev, slo, shi, 0.0)
        both = soft * rev
        base_r.append(float(soft.mean()) * 100)
        rev_r.append(float(rev.mean()) * 100)
        both_r.append(float(both.mean()) * 100)
    print(f"{name}: slab+seg {np.mean(base_r):5.1f}%  reversed {np.mean(rev_r):5.1f}%  both {np.mean(both_r):5.1f}%")


print("--- reversed + cone ---")
for name in ("bunny", "optional"):
    scene = scenes.get(name).build()
    cfg = RenderConfig(width=160, height=128, soft_shadows=True)
    beta = float(cfg.soft_beta)
    ro, rd = renderer.generate_rays(scene.camera, cfg)
    rd = pk._mega2_fold(rd, cfg.height, cfg.width)
    ro_b = jnp.broadcast_to(ro, rd.shape)
    glo, ghi = accel.chunk_bounds(scene.triangles, MEGA2_G)
    slack = accel.chunk_soft_slack(scene.triangles, beta, MEGA2_G,
                                   pallas_soft.SOFT_SUPPORT)
    slo, shi = glo - slack[:, None], ghi + slack[:, None]
    L = scene.lights.count
    rec = intersect.closest_hit(scene, ro_b, rd, cfg.ray_min)
    p = rec.point + rec.normal * jnp.float32(cfg.normal_offset)
    rows = []
    for li in range(L):
        d, m = shading.direction_to_light(scene.lights, li, p)
        rb = accel.ray_tile_bounds(p, d, m, tile=1024)
        lp = scene.lights.position[li]
        rd_rev = p - lp[None, :]
        ro_rev = jnp.broadcast_to(lp, rd_rev.shape)
        rb_rev = accel.ray_tile_bounds(ro_rev, rd_rev, jnp.ones(rd_rev.shape[0]), tile=1024)
        rev = accel.cull_matrix(rb_rev, slo, shi, 0.0)
        cone = cone_cull(rb, lp, slo, shi)
        rows.append(float((rev * cone).mean()) * 100)
    print(f"{name}: reversed+cone {np.mean(rows):5.1f}%")
