"""Fast differentiable rendering: detached-hit closest intersection.

The closest-hit argmin over primitives is piecewise CONSTANT in the scene
parameters: except exactly at visibility boundaries (a measure-zero set),
moving a sphere center or a light does not change *which* primitive a pixel
sees.  So its gradient contribution is zero almost everywhere, and the
winning-primitive index can be computed entirely outside the autodiff graph.

``detached_closest_hit`` exploits this: the O(R*N) t-matrix + argmin runs
under ``stop_gradient`` (forward only — XLA saves no residuals and builds no
backward for it), then t, point, and normal are re-derived differentiably for
the ONE winning primitive per ray via index gathers — O(R) differentiated
work instead of O(R*N).  The value is the same math on the same winner as
:func:`raytpu.ops.intersect.closest_hit`, so the primal image is unchanged;
only the (exactly-zero-a.e.) boundary gradients are dropped.

The expensive differentiable term that REMAINS O(R*N*L) is
``soft_transmittance`` — intentionally: its sigmoid shadow edges are the
gradients inverse rendering needs (every nearby occluder contributes, not
just an argmin), so they cannot be detached.

Replaces the gradient path through ``Scene::GetClosestHit`` (reference:
source/Scene.cpp:29-66) — the reference has no gradients at all; this is the
TPU-native differentiability layer of SURVEY.md §7.4 made cheap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytpu.core import math3d
from raytpu.ops import intersect
from raytpu.ops.intersect import FLT_EPSILON, INF, HitRecords


def detached_closest_hit(scene, ro, rd, tmin) -> HitRecords:
    """Drop-in for ``intersect.closest_hit`` with a detached argmin.

    Differentiable w.r.t. scene geometry through the winning primitive's
    re-derived t/normal; the winner selection itself carries no gradient
    (exact a.e. — see module docstring).
    """
    sg = jax.lax.stop_gradient
    tmat = intersect.scene_t_matrix(
        sg(scene), sg(ro), sg(rd), tmin, INF, shadow_pass=False
    )
    idx = jnp.argmin(tmat, axis=1)  # first minimum wins ties
    hit = jnp.isfinite(jnp.take_along_axis(tmat, idx[:, None], axis=1)[:, 0])

    S, P, T = scene.spheres.count, scene.planes.count, scene.triangles.count
    R = rd.shape[0]
    t = jnp.full((R,), INF, rd.dtype)
    normal = jnp.zeros((R, 3), rd.dtype)
    material = jnp.zeros((R,), jnp.int32)

    if S:
        in_s = (idx < S) & hit
        si = jnp.clip(idx, 0, S - 1)
        c = scene.spheres.center[si]  # (R,3), grads scatter-add back
        r = scene.spheres.radius[si]
        L = c - ro
        proj = jnp.sum(rd * L, axis=-1)
        perp2 = jnp.sum(L * L, axis=-1) - proj * proj
        r2 = r * r
        # double-where: sqrt argument of non-winning lanes is clamped so its
        # unbounded partial never enters the VJP (CLAUDE.md gradient safety)
        arg = jnp.where(in_s, r2 - perp2, 1.0)
        t_s = proj - jnp.sqrt(jnp.maximum(arg, 1e-20))
        t = jnp.where(in_s, t_s, t)
        material = jnp.where(in_s, scene.spheres.material[si], material)

    if P:
        in_p = (idx >= S) & (idx < S + P) & hit
        pi = jnp.clip(idx - S, 0, P - 1)
        n_p = scene.planes.normal[pi]
        o_p = scene.planes.origin[pi]
        denom = jnp.sum(rd * n_p, axis=-1)
        denom = jnp.where(in_p & (jnp.abs(denom) > FLT_EPSILON), denom, 1.0)
        t_p = jnp.sum((o_p - ro) * n_p, axis=-1) / denom
        t = jnp.where(in_p, t_p, t)
        normal = jnp.where(in_p[:, None], n_p, normal)
        material = jnp.where(in_p, scene.planes.material[pi], material)

    if T:
        in_t = (idx >= S + P) & hit
        ti = jnp.clip(idx - S - P, 0, T - 1)
        tr = scene.triangles
        v0 = tr.v0[ti]
        e1 = tr.v1[ti] - v0
        e2 = tr.v2[ti] - v0
        h = jnp.cross(rd, e2)
        a = jnp.sum(e1 * h, axis=-1)
        a = jnp.where(in_t & (jnp.abs(a) >= FLT_EPSILON), a, 1.0)
        s = ro - v0
        q = jnp.cross(s, e1)
        t_t = jnp.sum(e2 * q, axis=-1) / a
        t = jnp.where(in_t, t_t, t)
        normal = jnp.where(in_t[:, None], tr.normal[ti], normal)
        material = jnp.where(in_t, tr.material[ti], material)

    t_safe = jnp.where(hit, t, 0.0)
    point = ro + t_safe[:, None] * rd

    if S:
        # sphere normal normalized after selection (reference: source/Scene.cpp:40)
        c_all = scene.spheres.center[jnp.clip(idx, 0, S - 1)]
        n_s = math3d.normalize_safe(point - c_all)
        normal = jnp.where(((idx < S) & hit)[:, None], n_s, normal)

    return HitRecords(
        hit=hit, t=jnp.where(hit, t, INF), point=point, normal=normal, material=material
    )
