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

Gathers of the winning primitive's parameters are expressed as one-hot
matmuls with a detached one-hot matrix: the VJP of an indexed gather is a
scatter-add, which serializes badly on TPU, while the matmul's transpose is
another matmul on the MXU.

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


def _gather_rows(table, li, mask, use_onehot):
    """Differentiable ``table[li]`` with rows zeroed where ``~mask``.

    ``use_onehot``: dispatch via a detached one-hot matmul (MXU-friendly
    VJP — the gradient to ``table`` is a matmul, not a TPU scatter-add).
    """
    if not use_onehot:
        return jnp.where(mask.reshape((-1,) + (1,) * (table.ndim - 1)), table[li], 0.0)
    flat = table.reshape(table.shape[0], -1)
    oh = ((li[:, None] == jnp.arange(table.shape[0])[None, :]) & mask[:, None]).astype(
        flat.dtype
    )
    out = jax.lax.stop_gradient(oh) @ flat
    return out.reshape((li.shape[0],) + table.shape[1:])


def detached_closest_hit(scene, ro, rd, tmin, onehot_max: int = 4096) -> HitRecords:
    """Drop-in for ``intersect.closest_hit`` with a detached argmin.

    Differentiable w.r.t. scene geometry through the winning primitive's
    re-derived t/normal; the winner selection itself carries no gradient
    (exact a.e. — see module docstring).  Classes with ``count <= onehot_max``
    gather via one-hot matmuls; larger tables fall back to indexed gathers.
    """
    sg = jax.lax.stop_gradient
    tmat = intersect.scene_t_matrix(
        sg(scene), sg(ro), sg(rd), tmin, INF, shadow_pass=False
    )
    idx = jnp.argmin(tmat, axis=1)  # first minimum wins ties
    hit = jnp.isfinite(jnp.take_along_axis(tmat, idx[:, None], axis=1)[:, 0])

    S, P, T = scene.spheres.count, scene.planes.count, scene.triangles.count
    R = rd.shape[0]
    # the (R, count) one-hot must also fit comfortably in HBM next to the
    # t-matrix: past ~32M elements fall back to indexed gathers
    onehot_max = min(onehot_max, max(1, (1 << 25) // max(R, 1)))
    t = jnp.full((R,), INF, rd.dtype)
    normal = jnp.zeros((R, 3), rd.dtype)
    material = jnp.zeros((R,), jnp.int32)
    c_sph = None

    if S:
        in_s = (idx < S) & hit
        si = jnp.clip(idx, 0, S - 1)
        cr = _gather_rows(
            jnp.concatenate(
                [
                    scene.spheres.center,
                    scene.spheres.radius[:, None],
                    scene.spheres.material[:, None].astype(rd.dtype),
                ],
                axis=1,
            ),
            si, in_s, S <= onehot_max,
        )
        c_sph, r = cr[:, :3], cr[:, 3]
        L = c_sph - ro
        proj = jnp.sum(rd * L, axis=-1)
        perp2 = jnp.sum(L * L, axis=-1) - proj * proj
        # double-where: the sqrt argument of non-winning lanes is clamped so
        # its unbounded partial never enters the VJP (CLAUDE.md grad safety)
        arg = jnp.where(in_s, r * r - perp2, 1.0)
        t_s = proj - jnp.sqrt(jnp.maximum(arg, 1e-20))
        t = jnp.where(in_s, t_s, t)
        # material ids are small ints: exact through the f32 gather
        material = jnp.where(in_s, jnp.round(cr[:, 4]).astype(jnp.int32), material)

    if P:
        in_p = (idx >= S) & (idx < S + P) & hit
        pi = jnp.clip(idx - S, 0, P - 1)
        no = _gather_rows(
            jnp.concatenate(
                [
                    scene.planes.normal,
                    scene.planes.origin,
                    scene.planes.material[:, None].astype(rd.dtype),
                ],
                axis=1,
            ),
            pi, in_p, P <= onehot_max,
        )
        n_p, o_p = no[:, :3], no[:, 3:6]
        denom = jnp.sum(rd * n_p, axis=-1)
        denom = jnp.where(in_p & (jnp.abs(denom) > FLT_EPSILON), denom, 1.0)
        t_p = jnp.sum((o_p - ro) * n_p, axis=-1) / denom
        t = jnp.where(in_p, t_p, t)
        normal = jnp.where(in_p[:, None], n_p, normal)
        material = jnp.where(in_p, jnp.round(no[:, 6]).astype(jnp.int32), material)

    if T:
        in_t = (idx >= S + P) & hit
        ti = jnp.clip(idx - S - P, 0, T - 1)
        tr = scene.triangles
        rows = _gather_rows(
            jnp.concatenate(
                [tr.v0, tr.v1, tr.v2, tr.normal, tr.material[:, None].astype(rd.dtype)],
                axis=1,
            ),
            ti, in_t, T <= onehot_max,
        )
        v0, v1, v2, n_t = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9], rows[:, 9:12]
        e1 = v1 - v0
        e2 = v2 - v0
        h = jnp.cross(rd, e2)
        a = jnp.sum(e1 * h, axis=-1)
        a = jnp.where(in_t & (jnp.abs(a) >= FLT_EPSILON), a, 1.0)
        s = ro - v0
        q = jnp.cross(s, e1)
        t_t = jnp.sum(e2 * q, axis=-1) / a
        t = jnp.where(in_t, t_t, t)
        normal = jnp.where(in_t[:, None], n_t, normal)
        material = jnp.where(in_t, jnp.round(rows[:, 12]).astype(jnp.int32), material)

    t_safe = jnp.where(hit, t, 0.0)
    point = ro + t_safe[:, None] * rd

    if S:
        # sphere normal normalized after selection (reference: source/Scene.cpp:40)
        n_s = math3d.normalize_safe(point - c_sph)
        normal = jnp.where(((idx < S) & hit)[:, None], n_s, normal)

    return HitRecords(
        hit=hit, t=jnp.where(hit, t, INF), point=point, normal=normal, material=material
    )
