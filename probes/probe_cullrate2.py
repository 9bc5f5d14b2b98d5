"""Probe (CPU): cull pass rates row-major vs mega2 tile order, and the
per-ray-exact ceiling (what a perfect per-(tile,group) test could achieve).
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


def per_ray_slab(ro, rd, tmax, lo, hi, tmin):
    """(R, ng) exact per-ray slab test."""
    inv = 1.0 / jnp.where(jnp.abs(rd) < 1e-30, 1e-30, rd)  # (R,3)
    t0 = (lo[None, :, :] - ro[:, None, :]) * inv[:, None, :]
    t1 = (hi[None, :, :] - ro[:, None, :]) * inv[:, None, :]
    a = jnp.minimum(t0, t1).max(axis=-1)
    b = jnp.maximum(t0, t1).min(axis=-1)
    return (jnp.minimum(b, tmax[:, None]) >= jnp.maximum(a, tmin))


for name in ("bunny", "optional"):
    scene = scenes.get(name).build()
    cfg = RenderConfig(width=160, height=128, soft_shadows=True)
    beta = float(cfg.soft_beta)
    ro, rd = renderer.generate_rays(scene.camera, cfg)
    glo, ghi = accel.chunk_bounds(scene.triangles, MEGA2_G)
    slack = accel.chunk_soft_slack(scene.triangles, beta, MEGA2_G,
                                   pallas_soft.SOFT_SUPPORT)
    slo, shi = glo - slack[:, None], ghi + slack[:, None]
    L = scene.lights.count
    print(f"{name}: T={scene.triangles.count} L={L}")
    for order, rdo in (("rowmaj", rd), ("tiled", pk._mega2_fold(rd, cfg.height, cfg.width))):
        ro_b = jnp.broadcast_to(ro, rdo.shape)
        tmax = jnp.full((rdo.shape[0],), jnp.inf)
        rb = accel.ray_tile_bounds(ro_b, rdo, tmax, tile=1024)
        prim = accel.cull_matrix(rb, glo, ghi, float(cfg.ray_min))
        ex = per_ray_slab(ro_b, rdo, jnp.minimum(tmax, 3e37), glo, ghi, float(cfg.ray_min))
        exact = ex.reshape(-1, 1024, ex.shape[-1]).any(axis=1)
        print(f"  {order:7s} primary: tile-test {float(prim.mean())*100:5.1f}%  per-ray-exact ceiling {float(exact.mean())*100:5.1f}%")
        rec = intersect.closest_hit(scene, ro_b, rdo, cfg.ray_min)
        p = rec.point + rec.normal * jnp.float32(cfg.normal_offset)
        rates, ceils = [], []
        for li in range(L):
            d, m = shading.direction_to_light(scene.lights, li, p)
            rb = accel.ray_tile_bounds(p, d, m, tile=1024)
            soft = accel.cull_matrix(rb, slo, shi, float(cfg.ray_min))
            ex = per_ray_slab(p, d, m, slo, shi, float(cfg.ray_min))
            exact = ex.reshape(-1, 1024, ex.shape[-1]).any(axis=1)
            rates.append(float(soft.mean()) * 100)
            ceils.append(float(exact.mean()) * 100)
        print(f"  {order:7s} shadow(soft): tile-test {np.mean(rates):5.1f}%  per-ray-exact ceiling {np.mean(ceils):5.1f}%")
