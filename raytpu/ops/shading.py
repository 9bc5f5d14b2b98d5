"""Batched BRDF library + material-table shading dispatch.

The reference's virtual ``Material::Shade`` (reference: source/Material.h:27)
becomes a data-parallel table lookup: per-ray material parameters are gathered
from the Materials table and all four material families are evaluated as
vectorized formulas, selected by ``jnp.where`` on the material kind.  Fully
differentiable by construction.

BRDF formulas transcribed from reference: source/BRDFs.h (including its
deliberate quirks: the clamped reflect inside Phong at :35, GGX with
alpha=roughness^2 at :62-68, and the k=(alpha+1)^2/8 geometry term at :81).
"""

from __future__ import annotations

import jax.numpy as jnp

from raytpu.core import math3d
from raytpu.core.types import LightKind, Lights, Materials

PI = 3.14159265358979323846


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def lambert(kd, cd):
    """``cd * kd / pi``; kd scalar (...,) or per-channel (...,3)
    (reference: source/BRDFs.h:14-22)."""
    if kd.ndim == cd.ndim - 1:
        kd = kd[..., None]
    return cd * kd / PI


def phong(ks, exp, l, v, n):
    """White specular lobe with the reference's clamped reflect
    (reference: source/BRDFs.h:33-40).

    ``cosa^exp`` is double-where guarded: at cosa==0 the power VJP is
    ``exp * cosa^(exp-1)`` which is 0*inf=NaN whenever exp<1 (e.g. the
    padded exp=0 rows of non-Phong materials in the dispatch table).
    Forward values match powf: pow(0, 0)=1, pow(0, e>0)=0.
    """
    refl = math3d.reflect(l, n)
    cosa = jnp.maximum(_dot(refl, v), 0.0)
    pos = cosa > 0.0
    powv = jnp.where(
        pos,
        jnp.power(jnp.where(pos, cosa, 1.0), exp),
        jnp.where(exp == 0.0, 1.0, 0.0),
    )
    return (ks * powv)[..., None] * jnp.ones(3, cosa.dtype)


def fresnel_schlick(h, v, f0):
    """(reference: source/BRDFs.h:49-53)."""
    return f0 + (1.0 - f0) * jnp.power(1.0 - jnp.maximum(_dot(h, v), 0.0), 5)[..., None]


def ggx_distribution(n, h, roughness):
    """Trowbridge-Reitz GGX with UE4 alpha = roughness^2
    (reference: source/BRDFs.h:62-68)."""
    a = roughness * roughness
    sqr_a = a * a
    ndh = jnp.maximum(_dot(n, h), 0.0)
    denom = ndh * ndh * (sqr_a - 1.0) + 1.0
    return sqr_a / (PI * denom * denom)


def schlick_ggx_geometry(n, x, roughness):
    """k = (alpha+1)^2/8 with alpha = roughness^2 — the reference's deviation
    from UE4's (roughness+1)^2/8 (reference: source/BRDFs.h:78-86)."""
    a = roughness * roughness
    k = (a + 1.0) * (a + 1.0) / 8.0
    cd = jnp.maximum(_dot(n, x), 0.0)
    return cd / (cd * (1.0 - k) + k)


def smith_geometry(n, v, l, roughness):
    """(reference: source/BRDFs.h:96-99)."""
    return schlick_ggx_geometry(n, v, roughness) * schlick_ggx_geometry(n, l, roughness)


def cook_torrance(albedo, metalness, roughness, n, l, v):
    """Microfacet specular + non-metal Lambert diffuse
    (reference: source/Material.h:107-123)."""
    h = math3d.normalize_safe(v + l)
    is_dielectric = (metalness == 0.0)[..., None]
    f0 = jnp.where(is_dielectric, jnp.full_like(albedo, 0.04), albedo)
    F = fresnel_schlick(h, v, f0)
    D = ggx_distribution(n, h, roughness)
    G = smith_geometry(n, v, l, roughness)
    denom = 4.0 * jnp.maximum(_dot(v, n), 1e-4) * jnp.maximum(_dot(l, n), 1e-4)
    specular = F * (D * G / denom)[..., None]
    kd = jnp.where(is_dielectric, 1.0 - F, jnp.zeros_like(F))
    diffuse = lambert(kd, albedo)
    return diffuse + specular


def shade(materials: Materials, mat_idx, n, l, v):
    """Table-dispatch shading: evaluate every family, select by kind.

    Args:
      materials: the scene material table.
      mat_idx: (R,) i32 per-ray material index.
      n, l, v: (R,3) unit normal, light and view directions.
    Returns (R,3) BRDF color.
    """
    # Per-ray material parameters via one-hot matmul instead of gathers:
    # TPU dynamic gathers are scalar-slow, a (R, M) @ (M, 7) matmul rides
    # the MXU (M = material count, tiny).
    M = materials.count
    table = jnp.concatenate(
        [materials.kind.astype(jnp.float32)[:, None], materials.color, materials.params],
        axis=1,
    )  # (M, 7)
    onehot = (mat_idx[:, None] == jnp.arange(M, dtype=mat_idx.dtype)[None, :]).astype(jnp.float32)
    vals = onehot @ table  # (R, 7)
    kind = vals[:, 0]  # compared against float literals below
    color = vals[:, 1:4]
    params = vals[:, 4:7]

    # Sanitize each family's parameters on the rows where it is NOT selected:
    # jnp.where protects forward values but not backward partials — e.g.
    # Cook-Torrance at roughness=0 (a Lambert row) has an infinite dD/ddenom
    # at ndh=1, and 0-cotangent * inf = NaN would leak into every gradient.
    is_ct = kind == 3
    rough_safe = jnp.where(is_ct, params[:, 1], 1.0)
    metal_safe = jnp.where(is_ct, params[:, 0], 1.0)
    is_lp = kind == 2
    exp_safe = jnp.where(is_lp, params[:, 2], 1.0)

    c_solid = color
    c_lambert = lambert(params[:, 0], color)
    c_lp = c_lambert + phong(params[:, 1], exp_safe, l, v, n)
    c_ct = cook_torrance(color, metal_safe, rough_safe, n, l, v)

    out = jnp.where((kind == 0)[:, None], c_solid, c_ct)
    out = jnp.where((kind == 1)[:, None], c_lambert, out)
    out = jnp.where((kind == 2)[:, None], c_lp, out)
    return out


def direction_to_light(lights: Lights, li: int, point):
    """Unit direction + distance from ``point`` to light ``li`` (branchless on
    the light kind so it works under jit with traced scenes).

    Point lights: toward light origin with its true distance
    (reference: source/Utils.h:341-353 + normalize at source/Renderer.cpp:131).
    Directional lights: ``-direction`` with infinite distance (implemented
    correctly; the reference's directional branch is dead code with a latent
    bug, reference: source/Utils.h:348).
    """
    is_point = lights.kind[li] == LightKind.POINT
    d = lights.position[li] - point
    mag_pt = jnp.sqrt(_dot(d, d))
    l_pt = d / mag_pt[:, None]
    l_dir = jnp.broadcast_to(-lights.direction[li], point.shape)
    flt_max = jnp.finfo(point.dtype).max
    l = jnp.where(is_point, l_pt, l_dir)
    mag = jnp.where(is_point, mag_pt, flt_max)
    return l, mag


def radiance(lights: Lights, li: int, target):
    """Point: ``color * intensity / dist^2``; directional: ``color * intensity``
    (reference: source/Utils.h:355-369)."""
    is_point = lights.kind[li] == LightKind.POINT
    d = lights.position[li] - target
    r_pt = lights.color[li] * (lights.intensity[li] / _dot(d, d))[:, None]
    r_dir = jnp.broadcast_to(lights.color[li] * lights.intensity[li], target.shape)
    return jnp.where(is_point, r_pt, r_dir)
