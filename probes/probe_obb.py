"""Probe (CPU): does a per-group OBB tighten the reversed shadow cull?

Groups are 8-triangle SAH leaves; their AABBs are loose for diagonal
slivers.  Fit each group an OBB (PCA over its vertices), rotate the
reversed-ray interval boxes into the OBB frame exactly (center/extent via
|R|), and slab-test there.  Report pass rates of the current cull
(fwd slab+seg x reversed slab) vs + reversed-OBB, and the OBB volume ratio.
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


def fit_obbs(tris, G):
    """Per-group PCA OBB: returns R (ng,3,3 world->obb rows), c (ng,3),
    e (ng,3) half-extents, plus AABB half-extent for volume comparison."""
    T = int(tris.count)
    ng = -(-T // G)
    pts = np.stack([np.asarray(tris.v0), np.asarray(tris.v1),
                    np.asarray(tris.v2)], 1)  # (T,3,3)
    Rs, cs, es, vr = [], [], [], []
    for g in range(ng):
        p = pts[g * G:(g + 1) * G].reshape(-1, 3)
        mu = p.mean(0)
        cov = np.cov((p - mu).T) + 1e-12 * np.eye(3)
        _, vecs = np.linalg.eigh(cov)
        R = vecs.T  # rows = obb axes
        q = (p - mu) @ R.T
        qlo, qhi = q.min(0), q.max(0)
        c = mu + 0.5 * (qlo + qhi) @ R
        e = 0.5 * (qhi - qlo)
        alo, ahi = p.min(0), p.max(0)
        ae = 0.5 * (ahi - alo)
        vr.append(np.prod(np.maximum(e, 1e-9)) / np.prod(np.maximum(ae, 1e-9)))
        Rs.append(R); cs.append(c); es.append(e)
    return (jnp.asarray(np.stack(Rs), jnp.float32),
            jnp.asarray(np.stack(cs), jnp.float32),
            jnp.asarray(np.stack(es), jnp.float32), float(np.mean(vr)))


def obb_rev_slab(rb_rev, R, c, e, slack):
    """(nt, ng) reversed slab test in each group's OBB frame.

    Reversed rays share the exact light origin (omin==omax), direction
    interval box [dmin,dmax], t in [0, 1]."""
    o = rb_rev[:, 0:3]                      # (nt,3) exact light point
    dmin, dmax = rb_rev[:, 6:9], rb_rev[:, 9:12]
    dc, de = 0.5 * (dmin + dmax), 0.5 * (dmax - dmin)
    # rotate into each OBB frame: (nt, ng, 3)
    o_r = jnp.einsum("gij,tj->tgi", R, o) - jnp.einsum("gij,gj->gi", R, c)[None]
    dc_r = jnp.einsum("gij,tj->tgi", R, dc)
    de_r = jnp.einsum("gij,tj->tgi", jnp.abs(R), de)
    dmin_r, dmax_r = dc_r - de_r, dc_r + de_r
    eb = e[None] + slack[None, :, None]     # (1, ng, 3)
    sign_safe = (dmin_r > 0.0) | (dmax_r < 0.0)
    inv1, inv2 = 1.0 / dmin_r, 1.0 / dmax_r
    cands = jnp.stack([(b - o_r) * inv
                       for b in (-eb, eb) for inv in (inv1, inv2)])
    ax_lo = jnp.where(sign_safe, cands.min(0), -3.0e38)
    ax_hi = jnp.where(sign_safe, cands.max(0), 3.0e38)
    # axes where direction straddles 0: with t in [0,1] the ray moves at most
    # max(|dmin|,|dmax|) along the axis — reject if the box is out of reach
    reach = jnp.maximum(jnp.abs(dmin_r), jnp.abs(dmax_r))
    out = ~sign_safe & (jnp.abs(o_r) - eb > reach)
    t_lo = jnp.maximum(ax_lo.max(-1), 0.0)
    t_hi = jnp.minimum(ax_hi.min(-1), 1.0)
    return (t_hi >= t_lo) & ~out.any(-1)


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
    R, c, e, vol_ratio = fit_obbs(scene.triangles, MEGA2_G)
    rec = intersect.closest_hit(scene, ro_b, rd, cfg.ray_min)
    p = rec.point + rec.normal * jnp.float32(cfg.normal_offset)
    L = scene.lights.count
    cur_r, obb_r = [], []
    for li in range(L):
        from raytpu.core.types import LightKind
        if int(scene.lights.kind[li]) != int(LightKind.POINT):
            continue
        d, m = shading.direction_to_light(scene.lights, li, p)
        lp = scene.lights.position[li]
        cur = accel.shadow_cull_matrix(p, d, m, lp,
                                       scene.lights.kind[li] == LightKind.POINT,
                                       slo, shi, float(cfg.ray_min), tile=1024)
        rd_rev = p - lp[None, :]
        rb_rev = accel.ray_tile_bounds(
            jnp.broadcast_to(lp, p.shape), rd_rev,
            jnp.ones((p.shape[0],), jnp.float32), tile=1024)
        obb = obb_rev_slab(rb_rev, R, c, e, slack)
        both = cur * obb.astype(jnp.float32)
        cur_r.append(float(cur.mean()) * 100)
        obb_r.append(float(both.mean()) * 100)
    print(f"{name}: obb/aabb vol {vol_ratio:.2f}  shadow cull "
          f"{np.mean(cur_r):5.1f}% -> +obb {np.mean(obb_r):5.1f}%")
