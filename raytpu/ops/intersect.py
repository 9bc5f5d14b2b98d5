"""Batched ray-primitive intersection ops.

Every hit test from the reference (reference: source/Utils.h namespace
GeometryUtils) becomes a masked, vectorized formula over (rays x primitives);
``didHit`` booleans become masks, the ``t = FLT_MAX`` sentinel + first-argmin
replaces the sequential strict-< closest-hit update
(reference: source/Scene.cpp:29-66).

Conventions:
  * rays: ``ro`` (R,3) origins, ``rd`` (R,3) unit directions
  * a miss is encoded as ``t = +inf``
  * primitive order inside the flattened t-matrix is spheres, planes,
    triangles — jnp.argmin picks the first minimum, which reproduces the
    reference's iteration-order tie-break.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from raytpu.core import math3d
from raytpu.core.types import Scene

FLT_EPSILON = 1.1920929e-07
INF = jnp.inf
_OCC_MAX = 1.0 - 1e-6  # keep soft-occlusion factors away from exactly 1


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


# ---------------------------------------------------------------------------
# Per-class t computation: rays (R,3) x primitives (N,...) -> t (R,N)
# ---------------------------------------------------------------------------


def sphere_t(center, radius, ro, rd, tmin, tmax):
    """Geometric sphere test, near root only — rays starting inside a sphere
    miss it, exactly like the reference (reference: source/Utils.h:52-71)."""
    L = center[None, :, :] - ro[:, None, :]  # (R,S,3)
    L2 = _dot(L, L)
    proj = _dot(rd[:, None, :], L)
    perp2 = L2 - proj * proj
    r2 = (radius * radius)[None, :]
    inside = r2 >= perp2
    # double-where keeps sqrt's VJP finite on miss lanes without changing
    # any valid lane's forward value
    disc = jnp.where(inside, r2 - perp2, 1.0)
    t = proj - jnp.sqrt(disc)
    valid = inside & (t >= tmin) & (t <= tmax)
    return jnp.where(valid, t, INF)


def plane_t(origin, normal, ro, rd, tmin, tmax):
    """``t = dot(po-ro, n)/dot(rd, n)``, valid on [tmin, tmax)
    (reference: source/Utils.h:82-98)."""
    denom = _dot(rd[:, None, :], normal[None, :, :])
    num = _dot(origin[None, :, :] - ro[:, None, :], normal[None, :, :])
    denom_nz = denom != 0.0  # exactly-parallel rays miss (reference: inf fails the range test)
    t = num / jnp.where(denom_nz, denom, 1.0)
    valid = denom_nz & (t >= tmin) & (t < tmax)
    return jnp.where(valid, t, INF)


def triangle_t(v0, v1, v2, normal, cull, ro, rd, tmin, tmax, shadow_pass: bool):
    """Möller–Trumbore with per-triangle cull modes; shadow rays swap
    front/back culling (reference: source/Utils.h:109-184).

    ``shadow_pass`` is a static flag.  Valid t range is [tmin, tmax).
    """
    rdn = rd[:, None, :]  # (R,1,3)
    cull_dot = _dot(normal[None, :, :], rdn)  # (R,T)
    not_parallel = jnp.abs(cull_dot) >= FLT_EPSILON

    if shadow_pass:
        # FrontFaceCulling <-> BackFaceCulling; NoCulling unchanged
        cull_eff = jnp.where(cull == 2, 2, 1 - cull)
    else:
        cull_eff = cull
    culled = ((cull_eff == 0)[None, :] & (cull_dot < 0)) | ((cull_eff == 1)[None, :] & (cull_dot > 0))

    e1 = v1 - v0  # (T,3)
    e2 = v2 - v0
    h = jnp.cross(rdn, e2[None, :, :])  # (R,T,3)
    a = _dot(e1[None, :, :], h)
    det_ok = jnp.abs(a) >= FLT_EPSILON
    inv_a = 1.0 / jnp.where(det_ok, a, 1.0)
    s = ro[:, None, :] - v0[None, :, :]  # (R,T,3)
    u = inv_a * _dot(s, h)
    q = jnp.cross(s, e1[None, :, :])
    v = inv_a * _dot(rdn, q)
    t = inv_a * _dot(e2[None, :, :], q)
    bary_ok = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    valid = not_parallel & ~culled & det_ok & bary_ok & (t >= tmin) & (t < tmax)
    return jnp.where(valid, t, INF)


# ---------------------------------------------------------------------------
# Scene-level queries
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class HitRecords:
    """Batched HitRecord (reference: source/DataTypes.h:567-575)."""

    hit: jnp.ndarray  # (R,) bool
    t: jnp.ndarray  # (R,) f32, +inf on miss
    point: jnp.ndarray  # (R,3)
    normal: jnp.ndarray  # (R,3) unit
    material: jnp.ndarray  # (R,) i32


def scene_t_matrix(scene: Scene, ro, rd, tmin, tmax, shadow_pass: bool):
    """All primitive t values as one (R, S+P+T) matrix (inf = miss)."""
    cols = []
    if scene.spheres.count:
        cols.append(sphere_t(scene.spheres.center, scene.spheres.radius, ro, rd, tmin, tmax))
    if scene.planes.count:
        cols.append(plane_t(scene.planes.origin, scene.planes.normal, ro, rd, tmin, tmax))
    if scene.triangles.count:
        tr = scene.triangles
        cols.append(
            triangle_t(tr.v0, tr.v1, tr.v2, tr.normal, tr.cull, ro, rd, tmin, tmax, shadow_pass)
        )
    if not cols:
        return jnp.full((ro.shape[0], 1), INF, ro.dtype)
    return jnp.concatenate(cols, axis=1)


def closest_hit(scene: Scene, ro, rd, tmin) -> HitRecords:
    """First-argmin closest hit + payload gather for the winning primitive
    (replaces Scene::GetClosestHit, reference: source/Scene.cpp:29-66)."""
    tmat = scene_t_matrix(scene, ro, rd, tmin, INF, shadow_pass=False)
    idx = jnp.argmin(tmat, axis=1)  # first minimum wins ties
    t = jnp.take_along_axis(tmat, idx[:, None], axis=1)[:, 0]
    return assemble_hit_records(scene, ro, rd, t, idx)


# one-hot payload matmuls must fit next to the t-matrix in HBM
_ONEHOT_MAX_ELEMS = 1 << 25


def assemble_hit_records(scene: Scene, ro, rd, t, idx) -> HitRecords:
    """Build HitRecords from a per-ray winning (t, global primitive index)
    where the index runs over the sphere→plane→triangle concatenation.

    The winning primitive's payload (normal/center + material id) is gathered
    with ONE masked one-hot matmul against a packed per-primitive table: TPU
    dynamic row gathers are scalar-slow (measured ~10 ms of a 15 ms frame at
    640x480), while the one-hot contraction rides the MXU, and its transpose
    (the VJP) is another matmul instead of a serialized scatter-add.  Scenes
    past ``_ONEHOT_MAX_ELEMS`` one-hot elements keep the indexed-gather form
    (they render through the Pallas kernels anyway).
    """
    hit = jnp.isfinite(t)
    t_safe = jnp.where(hit, t, 0.0)
    point = ro + t_safe[:, None] * rd

    S, P = scene.spheres.count, scene.planes.count
    T = scene.triangles.count
    C = S + P + T
    normal = jnp.zeros_like(point)
    material = jnp.zeros(ro.shape[0], jnp.int32)

    if C and C * ro.shape[0] <= _ONEHOT_MAX_ELEMS:
        rows = []
        if S:  # sphere rows carry the CENTER (normal derived below)
            rows.append(
                jnp.concatenate(
                    [scene.spheres.center, scene.spheres.material[:, None].astype(ro.dtype)],
                    axis=1,
                )
            )
        if P:
            rows.append(
                jnp.concatenate(
                    [scene.planes.normal, scene.planes.material[:, None].astype(ro.dtype)],
                    axis=1,
                )
            )
        if T:
            tr = scene.triangles
            rows.append(
                jnp.concatenate([tr.normal, tr.material[:, None].astype(ro.dtype)], axis=1)
            )
        table = jnp.concatenate(rows, axis=0)  # (C, 4)
        oh = (idx[:, None] == jnp.arange(C)[None, :]) & hit[:, None]
        out = jax.lax.stop_gradient(oh.astype(ro.dtype)) @ table  # (R, 4)
        v = out[:, :3]  # center (spheres) or normal (planes/triangles)
        # material ids are small ints: exact through the f32 contraction
        material = jnp.round(out[:, 3]).astype(jnp.int32)
        if S:
            in_s = (idx < S) & hit
            # normal normalized after selection (reference: source/Scene.cpp:40);
            # double-where: keep the unselected normalize argument away from 0
            d = jnp.where(in_s[:, None], point - v, 1.0)
            normal = jnp.where(in_s[:, None], math3d.normalize_safe(d), v)
        else:
            normal = v
        return HitRecords(
            hit=hit, t=jnp.where(hit, t, INF), point=point, normal=normal, material=material
        )

    if S:
        si = jnp.clip(idx, 0, S - 1)
        c = scene.spheres.center[si]
        # normal normalized after selection (reference: source/Scene.cpp:40)
        n_s = math3d.normalize_safe(point - c)
        in_s = idx < S
        normal = jnp.where(in_s[:, None], n_s, normal)
        material = jnp.where(in_s, scene.spheres.material[si], material)
    if P:
        pi = jnp.clip(idx - S, 0, P - 1)
        in_p = (idx >= S) & (idx < S + P)
        normal = jnp.where(in_p[:, None], scene.planes.normal[pi], normal)
        material = jnp.where(in_p, scene.planes.material[pi], material)
    if T:
        ti = jnp.clip(idx - S - P, 0, T - 1)
        in_t = idx >= S + P
        normal = jnp.where(in_t[:, None], scene.triangles.normal[ti], normal)
        material = jnp.where(in_t, scene.triangles.material[ti], material)
    return HitRecords(hit=hit, t=jnp.where(hit, t, INF), point=point, normal=normal, material=material)


def soft_transmittance(scene: Scene, ro, rd, tmin, tmax, beta):
    """Differentiable visibility in [0, 1] for shadow rays.

    Replaces the binary ``DoesHit`` occlusion with a product over primitives
    of ``1 - occlusion_p``, where each occlusion is a sigmoid of a signed
    penetration margin (how solidly the shadow ray passes through the
    primitive).  Converges to ``1 - any_hit`` as ``beta -> inf``; gives the
    pixel gradients w.r.t. geometry/light positions that the hard visibility
    term zeroes out (SURVEY.md §7 "differentiability layered on").

    ``tmax`` is per-ray (R,).  Returns (R,) transmittance.

    Occlusions are clamped strictly below 1: jnp.prod's VJP divides by its
    factors, so an exactly-zero (1 - occ) factor would NaN the gradient.
    """
    trans = jnp.ones(ro.shape[0], ro.dtype)
    tmax_b = tmax[:, None]

    if scene.spheres.count:
        c, r = scene.spheres.center, scene.spheres.radius
        L = c[None, :, :] - ro[:, None, :]
        proj = _dot(rd[:, None, :], L)
        perp2 = _dot(L, L) - proj * proj
        r2 = (r * r)[None, :]
        margin = (r2 - perp2) / r2  # >0 when the ray core passes inside
        inside = margin > 0.0
        t = proj - jnp.sqrt(jnp.where(inside, r2 - perp2, 1.0))
        gate = inside & (t >= tmin) & (t <= tmax_b)
        occ = jnp.minimum(jax.nn.sigmoid(beta * margin), _OCC_MAX) * gate
        trans = trans * jnp.prod(1.0 - occ, axis=1)

    if scene.planes.count:
        # Planes are infinite, so their shadow boundary in image space comes
        # from the segment ENDPOINTS crossing the plane (receiver or light
        # moving through it), not from a silhouette edge.  The signed margin
        # is the distance (in t units) by which the crossing sits inside
        # [tmin, tmax): gradients flow to plane origin/normal through t and
        # to light/receiver positions through t and tmax.
        denom = _dot(rd[:, None, :], scene.planes.normal[None, :, :])
        num = _dot(scene.planes.origin[None, :, :] - ro[:, None, :], scene.planes.normal[None, :, :])
        denom_nz = jnp.abs(denom) > FLT_EPSILON
        t = num / jnp.where(denom_nz, denom, 1.0)
        margin = jnp.minimum(t - tmin, tmax_b - t)  # absolute t units
        gate = denom_nz & (margin > 0.0)
        occ = jnp.minimum(jax.nn.sigmoid(beta * margin), _OCC_MAX) * gate
        trans = trans * jnp.prod(1.0 - occ, axis=1)

    if scene.triangles.count:
        tr = scene.triangles
        rdn = rd[:, None, :]
        cull_dot = _dot(tr.normal[None, :, :], rdn)
        not_parallel = jnp.abs(cull_dot) >= FLT_EPSILON
        cull_eff = jnp.where(tr.cull == 2, 2, 1 - tr.cull)  # shadow pass inverts
        culled = ((cull_eff == 0)[None, :] & (cull_dot < 0)) | (
            (cull_eff == 1)[None, :] & (cull_dot > 0)
        )
        e1 = tr.v1 - tr.v0
        e2 = tr.v2 - tr.v0
        h = jnp.cross(rdn, e2[None, :, :])
        a = _dot(e1[None, :, :], h)
        det_ok = jnp.abs(a) >= FLT_EPSILON
        inv_a = 1.0 / jnp.where(det_ok, a, 1.0)
        s = ro[:, None, :] - tr.v0[None, :, :]
        u = inv_a * _dot(s, h)
        q = jnp.cross(s, e1[None, :, :])
        v = inv_a * _dot(rdn, q)
        t = inv_a * _dot(e2[None, :, :], q)
        # signed distance to the triangle boundary in barycentric coords
        margin = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
        gate = not_parallel & ~culled & det_ok & (t >= tmin) & (t < tmax_b)
        occ = jnp.minimum(jax.nn.sigmoid(beta * margin), _OCC_MAX) * gate
        trans = trans * jnp.prod(1.0 - occ, axis=1)

    return trans


def any_hit(scene: Scene, ro, rd, tmin, tmax):
    """Boolean occlusion query for shadow rays, with inverted triangle culling
    (replaces Scene::DoesHit, reference: source/Scene.cpp:68-96).

    ``tmax`` is per-ray (R,) — the distance to the light.
    """
    tmat = scene_t_matrix(scene, ro, rd, tmin, tmax[:, None], shadow_pass=True)
    return jnp.any(jnp.isfinite(tmat), axis=1)
