"""Probe (CPU): mega2 group-cull pass rates vs SAH builder leaf size.

The G=8 cull groups slice the scene triangle order; with leaf_size=64 the
slices straddle SAH boxes.  Building leaves down to the group size should
tighten group AABBs and cut worklist length for both primary (32x32 pixel
tiles) and shadow (1024-ray tiles) passes.
"""
import dataclasses, pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from raytpu.core import scenes
from raytpu.core.types import RenderConfig, Triangles
from raytpu.native import runtime as rt
from raytpu.ops import accel, intersect, shading
from raytpu.render import renderer
from raytpu.render.pallas_kernel import MEGA2_G, _mega2_fold

assert rt.available()
cfg = RenderConfig(width=640, height=480)

for name in ("bunny", "optional"):
    scene0 = scenes.get(name).build()
    tr0 = scene0.triangles
    tv = np.stack([np.asarray(tr0.v0), np.asarray(tr0.v1), np.asarray(tr0.v2)], axis=1)
    ro, rd = renderer.generate_rays(scene0.camera, cfg)
    ro_b = jnp.broadcast_to(ro, rd.shape)
    # mega2 tile order: 32x32 pixel blocks
    rd_f = _mega2_fold(rd, cfg.height, cfg.width)
    ro_f = jnp.broadcast_to(ro, rd_f.shape)
    rec = intersect.closest_hit(scene0, ro_b, rd, cfg.ray_min)
    p = rec.point + rec.normal * jnp.float32(cfg.normal_offset)
    for leaf in (64, 16, 8):
        _, _, order = rt.build_bvh(tv, leaf_size=leaf, bins=8)
        perm = jnp.asarray(order)
        tr = Triangles(v0=tr0.v0[perm], v1=tr0.v1[perm], v2=tr0.v2[perm],
                       normal=tr0.normal[perm], cull=tr0.cull[perm],
                       material=tr0.material[perm])
        scene = dataclasses.replace(scene0, triangles=tr)
        glo, ghi = accel.chunk_bounds(tr, MEGA2_G)
        rb_p = accel.ray_tile_bounds(ro_f, rd_f, jnp.inf, tile=1024)
        prim_pass = float(accel.cull_matrix(rb_p, glo, ghi, cfg.ray_min).mean())
        sh = []
        for li in range(scene.lights.count):
            d, m = shading.direction_to_light(scene.lights, li, p)
            rb = accel.ray_tile_bounds(p, d, m, tile=1024)
            sh.append(float(accel.cull_matrix(rb, glo, ghi, cfg.ray_min).mean()))
        print(f"{name:9s} leaf={leaf:3d}: primary pass {prim_pass*100:5.1f}%  "
              f"shadow pass {' '.join(f'{s*100:.1f}%' for s in sh)}", flush=True)
