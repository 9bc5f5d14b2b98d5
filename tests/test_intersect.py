"""Hand-computed unit tests for the intersection ops, pinning the reference's
edge-case semantics (reference: source/Utils.h)."""

import jax.numpy as jnp
import numpy as np

from raytpu.core.types import CullMode
from raytpu.ops import intersect


def _ray(o, d):
    return jnp.asarray([o], jnp.float32), jnp.asarray([d], jnp.float32)


def test_sphere_near_root_only():
    # ray starting INSIDE the sphere misses it (near root behind origin,
    # reference: source/Utils.h:59-62)
    c = jnp.asarray([[0.0, 0.0, 0.0]])
    r = jnp.asarray([1.0])
    ro, rd = _ray([0, 0, 0], [0, 0, 1])
    t = intersect.sphere_t(c, r, ro, rd, 1e-4, jnp.inf)
    assert not bool(jnp.isfinite(t).any())
    # from outside: hits the near surface at t=4
    ro, rd = _ray([0, 0, -5], [0, 0, 1])
    t = intersect.sphere_t(c, r, ro, rd, 1e-4, jnp.inf)
    np.testing.assert_allclose(float(t[0, 0]), 4.0, rtol=1e-6)


def test_sphere_tmax_inclusive():
    c = jnp.asarray([[0.0, 0.0, 5.0]])
    r = jnp.asarray([1.0])
    ro, rd = _ray([0, 0, 0], [0, 0, 1])
    # t = 4.0; tmax = 4.0 is INCLUSIVE for spheres (reference: Utils.h:62)
    t = intersect.sphere_t(c, r, ro, rd, 1e-4, jnp.float32(4.0))
    assert bool(jnp.isfinite(t[0, 0]))


def test_plane_parallel_ray_misses():
    po = jnp.asarray([[0.0, 0.0, 0.0]])
    pn = jnp.asarray([[0.0, 1.0, 0.0]])
    ro, rd = _ray([0, 1, 0], [1, 0, 0])  # parallel above the plane
    t = intersect.plane_t(po, pn, ro, rd, 1e-4, jnp.inf)
    assert not bool(jnp.isfinite(t).any())


def test_plane_tmax_exclusive():
    po = jnp.asarray([[0.0, 0.0, 5.0]])
    pn = jnp.asarray([[0.0, 0.0, -1.0]])
    ro, rd = _ray([0, 0, 0], [0, 0, 1])
    # t = 5.0; tmax = 5.0 is EXCLUSIVE for planes (reference: Utils.h:85)
    t = intersect.plane_t(po, pn, ro, rd, 1e-4, jnp.float32(5.0))
    assert not bool(jnp.isfinite(t).any())
    t = intersect.plane_t(po, pn, ro, rd, 1e-4, jnp.float32(5.001))
    assert bool(jnp.isfinite(t[0, 0]))


def _tri(cull):
    v0 = jnp.asarray([[-1.0, -1.0, 5.0]])
    v1 = jnp.asarray([[1.0, -1.0, 5.0]])
    v2 = jnp.asarray([[0.0, 1.0, 5.0]])
    n = jnp.asarray([[0.0, 0.0, -1.0]])  # faces -z (toward a ray going +z)
    return v0, v1, v2, n, jnp.asarray([int(cull)], jnp.int32)


def test_triangle_cull_modes_primary():
    ro, rd = _ray([0, 0, 0], [0, 0, 1])  # cull_dot = dot(n, rd) = -1 < 0
    for cull, hits in [
        (CullMode.FRONT_FACE, False),  # front culling rejects cull_dot < 0 (Utils.h:131-133)
        (CullMode.BACK_FACE, True),
        (CullMode.NONE, True),
    ]:
        v0, v1, v2, n, c = _tri(cull)
        t = intersect.triangle_t(v0, v1, v2, n, c, ro, rd, 1e-4, jnp.inf, shadow_pass=False)
        assert bool(jnp.isfinite(t[0, 0])) == hits, cull


def test_triangle_cull_inverted_for_shadow_rays():
    # shadow rays swap front<->back culling (reference: Utils.h:114-127)
    ro, rd = _ray([0, 0, 0], [0, 0, 1])
    for cull, hits in [
        (CullMode.FRONT_FACE, True),
        (CullMode.BACK_FACE, False),
        (CullMode.NONE, True),
    ]:
        v0, v1, v2, n, c = _tri(cull)
        t = intersect.triangle_t(v0, v1, v2, n, c, ro, rd, 1e-4, jnp.inf, shadow_pass=True)
        assert bool(jnp.isfinite(t[0, 0])) == hits, cull


def test_triangle_barycentric_bounds():
    v0, v1, v2, n, c = _tri(CullMode.NONE)
    ro, rd = _ray([5, 0, 0], [0, 0, 1])  # outside the triangle
    t = intersect.triangle_t(v0, v1, v2, n, c, ro, rd, 1e-4, jnp.inf, shadow_pass=False)
    assert not bool(jnp.isfinite(t).any())


def test_closest_hit_class_tiebreak_order():
    # a sphere surface and plane at the same t: the sphere must win
    # (reference iteration order, Scene.cpp:29-66)
    from raytpu.core.types import SceneBuilder

    b = SceneBuilder()
    m = b.add_lambert((1, 1, 1), 1.0)
    b.add_sphere((0, 0, 6.0), 1.0, m)  # near surface at z=5
    b.add_plane((0, 0, 5.0), (0, 0, -1.0), m)  # plane exactly at z=5
    scene = b.build()
    ro = jnp.zeros((1, 3), jnp.float32)
    rd = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    rec = intersect.closest_hit(scene, ro, rd, 1e-4)
    np.testing.assert_allclose(float(rec.t[0]), 5.0, rtol=1e-6)
    # winner must be the sphere: its normal at the near pole faces -z
    np.testing.assert_allclose(np.asarray(rec.normal[0]), [0, 0, -1], atol=1e-5)


def test_shadow_dim_semantics():
    """Occluded light contributes nothing AND dims the pixel by 0.95
    (reference: source/Renderer.cpp:133-142,173)."""
    from raytpu.core.types import RenderConfig, SceneBuilder
    from raytpu.render.renderer import shade_rays

    b = SceneBuilder()
    m = b.add_lambert((1, 1, 1), 1.0)
    b.add_plane((0, 0, 5.0), (0, 0, -1.0), m)
    # light BEHIND a blocking sphere
    b.add_sphere((0, 2.5, 4.0), 0.5, m)
    b.add_point_light((0, 5, 3.0), 50.0, (1, 1, 1))
    # second light, unoccluded
    b.add_point_light((0, 0, 0.0), 50.0, (1, 1, 1))
    scene = b.build()
    ro = jnp.zeros(3, jnp.float32)
    rd = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    lit = shade_rays(scene, ro, rd, RenderConfig(width=1, height=1))
    unshadowed = shade_rays(scene, ro, rd, RenderConfig(width=1, height=1, shadows=False))
    # with shadows: only light 2 contributes, scaled by 0.95
    assert float(lit[0, 0]) < float(unshadowed[0, 0])
