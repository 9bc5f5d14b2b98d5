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


def _bwd(kernels, tmin, beta, res, g):
    scene, p, dirs, mags, trans = res
    if kernels:
        from raytpu.render import pallas_soft

        # ray-side cotangents from the hand-written culled Pallas kernel;
        # scene-geometry cotangents from the dense jnp VJP, which XLA prunes
        # whenever geometry is not being optimized (material/light fits)
        g_p, g_dirs, g_mags = pallas_soft.soft_dray_pallas(
            scene, p, dirs, mags, g, trans, tmin, beta
        )
        _, vjp_s = jax.vjp(lambda s: _jnp_ref(tmin, beta, s, p, dirs, mags), scene)
        (d_scene,) = vjp_s(g)
        return d_scene, g_p, g_dirs, g_mags
    _, vjp = jax.vjp(
        lambda s, pp, dd, mm: _jnp_ref(tmin, beta, s, pp, dd, mm), scene, p, dirs, mags
    )
    return vjp(g)


soft_trans_lights.defvjp(_fwd, _bwd)
