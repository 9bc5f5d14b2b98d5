"""Custom-VJP soft-shadow transmittance: Pallas forward, jnp backward.

``soft_trans_lights`` computes every light's differentiable transmittance in
one call.  With ``kernels=True`` the forward (and every rematerialized
recompute under ``jax.checkpoint``) runs the fused, chunk-culled Pallas
kernel (raytpu/render/pallas_soft.py); the backward evaluates the VJP of the
jnp reference (``intersect.soft_transmittance``), so gradients are exactly
the jnp path's gradients.

This pairing is what makes remat cheap on big meshes: the checkpointed
shade recomputes its forward through the kernel at culled speed, and when
only material/light-color gradients are requested, XLA dead-code-eliminates
the (unused) geometry backward entirely.

Replaces the gradient path the reference does not have (its DoesHit is
boolean, reference: source/Scene.cpp:68-96); the hard-shadow limit is
``beta -> inf``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from raytpu.ops import intersect


def _jnp_ref(tmin, beta, scene, p, dirs, mags):
    L = dirs.shape[0]
    return jnp.stack(
        [
            intersect.soft_transmittance(
                scene, p, dirs[li], jnp.float32(tmin), mags[li], jnp.float32(beta)
            )
            for li in range(L)
        ]
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def soft_trans_lights(kernels: bool, tmin: float, beta: float, scene, p, dirs, mags):
    """(L, R) soft transmittance; ``kernels`` selects the Pallas forward.

    ``tmin``/``beta`` must be python floats (static).  Differentiable in
    scene geometry, shadow origins ``p`` (R,3), directions ``dirs`` (L,R,3),
    and light distances ``mags`` (L,R).
    """
    if kernels:
        from raytpu.render import pallas_soft

        return pallas_soft.soft_trans_lights_pallas(scene, p, dirs, mags, tmin, beta)
    return _jnp_ref(tmin, beta, scene, p, dirs, mags)


def _fwd(kernels, tmin, beta, scene, p, dirs, mags):
    out = soft_trans_lights(kernels, tmin, beta, scene, p, dirs, mags)
    return out, (scene, p, dirs, mags, out)


def _scene_cotangent(tmin, beta, scene, p, dirs, mags, g, trans):
    """Scene-geometry cotangents without any dense O(R*T) jnp work.

    The transmittance factorizes: trans = trans_sp * trans_tri (independent
    products over primitive classes).  Sphere/plane cotangents come from a
    jnp VJP on a TRIANGLE-FREE scene (<= 16 unrolled primitives, O(R) each)
    with the upstream cotangent scaled by the triangles' factor
    ``trans / trans_sp``; triangle-vertex cotangents come from the
    prim-parallel Pallas kernel (``pallas_soft.soft_dprim_pallas``).
    """
    import dataclasses

    from raytpu.core.types import Triangles
    from raytpu.render import pallas_soft

    no_tris = Triangles(
        v0=jnp.zeros((0, 3), jnp.float32), v1=jnp.zeros((0, 3), jnp.float32),
        v2=jnp.zeros((0, 3), jnp.float32), normal=jnp.zeros((0, 3), jnp.float32),
        cull=jnp.zeros((0,), jnp.int32), material=jnp.zeros((0,), jnp.int32),
    )

    def sp_only(s):
        return _jnp_ref(tmin, beta, dataclasses.replace(s, triangles=no_tris),
                        p, dirs, mags)

    trans_sp, vjp_sp = jax.vjp(sp_only, scene)
    # dL/d(sp) = g * trans_tri * d(trans_sp);  trans_tri = trans / trans_sp.
    # trans_sp underflows to exactly 0 only past ~8 near-opaque unrolled
    # occluders (factors are clamped >= 1e-6); jnp.prod's own VJP zeroes
    # there too, so the guard matches the reference gradient.
    g_eff = jnp.where(trans_sp > 0, g * trans / trans_sp, 0.0)
    (d_scene,) = vjp_sp(g_eff)

    if scene.triangles.count:
        g_v0, g_v1, g_v2 = pallas_soft.soft_dprim_pallas(
            scene, p, dirs, mags, g, trans, tmin, beta
        )
        d_tris = dataclasses.replace(
            d_scene.triangles, v0=g_v0, v1=g_v1, v2=g_v2
        )
        d_scene = dataclasses.replace(d_scene, triangles=d_tris)
    return d_scene


def _bwd(kernels, tmin, beta, res, g):
    scene, p, dirs, mags, trans = res
    if kernels:
        from raytpu.render import pallas_soft

        # ray-side cotangents (dgrad) and prim-side cotangents (wgrad) from
        # the hand-written culled Pallas kernels; XLA prunes whichever side
        # the optimization doesn't consume
        g_p, g_dirs, g_mags = pallas_soft.soft_dray_pallas(
            scene, p, dirs, mags, g, trans, tmin, beta
        )
        d_scene = _scene_cotangent(tmin, beta, scene, p, dirs, mags, g, trans)
        return d_scene, g_p, g_dirs, g_mags
    _, vjp = jax.vjp(
        lambda s, pp, dd, mm: _jnp_ref(tmin, beta, s, pp, dd, mm), scene, p, dirs, mags
    )
    return vjp(g)


soft_trans_lights.defvjp(_fwd, _bwd)
