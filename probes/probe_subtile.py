"""Probe (CPU): sub-tile union culling — evaluate the (reversed+forward)
shadow cull and the primary cull at 256-ray sub-tile granularity, OR the 4
sub-tile verdicts per 1024-ray kernel tile.  Tighter per-sub-tile bounds,
still conservative."""
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


def sub(cull, k):
    nt4, ng = cull.shape
    return cull.reshape(nt4 // k, k, ng).max(axis=1)


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

    tmax = jnp.full((rd.shape[0],), jnp.inf)
    for t_sub, k in ((1024, 1), (256, 4), (128, 8)):
        rbp = accel.ray_tile_bounds(ro_b, rd, tmax, tile=t_sub)
        prim = sub(accel.cull_matrix(rbp, glo, ghi, float(cfg.ray_min)), k)
        rates = []
        for li in range(L):
            d, m = shading.direction_to_light(scene.lights, li, p)
            c = accel.shadow_cull_matrix(
                p, d, m, scene.lights.position[li],
                scene.lights.kind[li] == 0, slo, shi, float(cfg.ray_min),
                tile=t_sub)
            rates.append(float(sub(c, k).mean()) * 100)
        print(f"{name} sub={t_sub:4d}: primary {float(prim.mean())*100:5.1f}%  shadow {np.mean(rates):5.1f}%")
