"""Probe (CPU): worklist pass rates for the soft kernels' slackened culling.

For each big-mesh scene, compares the per-(tile, light) group pass rate of
the soft-slackened cull matrix vs the hard (no-slack) one, at the mega2
group size.  High soft pass rates mean the sigmoid-support slack is
defeating the culling and the kernel degenerates to a dense fold.
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
from raytpu.render import renderer, pallas_soft
from raytpu.render.pallas_kernel import MEGA2_G

for name in ("bunny", "optional"):
    scene = scenes.get(name).build()
    cfg = RenderConfig(width=160, height=120, soft_shadows=True)
    beta = float(cfg.soft_beta)
    ro, rd = renderer.generate_rays(scene.camera, cfg)
    ro_b = jnp.broadcast_to(ro, rd.shape)
    rec = intersect.closest_hit(scene, ro_b, rd, cfg.ray_min)
    p = rec.point + rec.normal * jnp.float32(cfg.normal_offset)
    L = scene.lights.count
    glo, ghi = accel.chunk_bounds(scene.triangles, MEGA2_G)
    slack = accel.chunk_soft_slack(scene.triangles, beta, MEGA2_G,
                                   pallas_soft.SOFT_SUPPORT)
    print(f"{name}: T={scene.triangles.count} L={L} beta={beta} "
          f"slack mean={float(slack.mean()):.3f} max={float(slack.max()):.3f} "
          f"group diag mean={float(jnp.mean(ghi-glo)):.3f}")
    for li in range(L):
        d, m = shading.direction_to_light(scene.lights, li, p)
        rb = accel.ray_tile_bounds(p, d, m, tile=1024)
        hard = accel.cull_matrix(rb, glo, ghi, float(cfg.ray_min))
        soft = accel.cull_matrix(rb, glo - slack[:, None], ghi + slack[:, None],
                                 float(cfg.ray_min))
        print(f"  light {li}: hard pass {float(hard.mean())*100:5.1f}%   "
              f"soft pass {float(soft.mean())*100:5.1f}%")
