"""Differentiable rendering and inverse-rendering optimization.

The reference renderer is a pure forward program; this module layers
differentiability on top (SURVEY.md §7.4): the f32 forward pass is
differentiable almost everywhere w.r.t. material, light, and geometry
parameters (intersection ops are double-where guarded so VJPs are NaN-free),
and ``soft_shadows`` swaps the binary visibility for a sigmoid transmittance
so shadow boundaries carry gradients too.

``make_train_step`` builds the flagship optimization loop: fit scene
parameters to a target image by gradient descent — the framework's "training
step" (optimizer state is an optax pytree; see raytpu.parallel for the
sharded multi-chip version).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp

from raytpu.core.types import RenderConfig, Scene
from raytpu.grad.fast import detached_closest_hit
from raytpu.grad.soft import soft_trans_lights
from raytpu.render import renderer
from raytpu.render.renderer import render_image_f32


#: triangle count past which the differentiable path rides the Pallas kernels
KERNEL_MIN_TRIS = 256

#: feed the soft kernels rays in mega2 32x32-pixel-block order (tight
#: per-1024-ray cull cones); module-level escape hatch for A/B probes
TILE_KERNEL_RAYS = True


def _pallas_min_t(scene, ro, rd, tmin):
    """Chunk-culled Pallas winner search for the detached closest hit
    (mega2 scalar-broadcast layout — the (RT, CT) chunked ``scene_min_t``
    measured no faster than the dense jnp argmin, PERF.md round 2)."""
    from raytpu.render import pallas_soft

    return pallas_soft.scene_min_t_mega2(scene, ro, rd, tmin)


def _payload_closest_hit(scene, ro, rd, tmin):
    """Fully-detached closest hit: the winner-search kernel emits the hit
    payload (normal, material) from its own fold registers, so the XLA
    payload-assembly one-hot matmuls (and their remat recompute + VJP
    transposes) vanish.  Values match ``detached_closest_hit`` bit-for-bit;
    what is lost is ONLY the visible-surface geometry gradient (∂image/∂
    geometry through the hit point/normal).  Occluder-geometry gradients
    still flow through the soft transmittance, and material/light gradients
    are untouched (they never pass through the payload).  Select with
    ``render_soft_f32(..., payload_grad=False)``."""
    from raytpu.render import pallas_soft

    sg = jax.lax.stop_gradient
    ro_b = jnp.broadcast_to(ro, rd.shape)
    t, idx, normal, mat = pallas_soft.scene_min_t_mega2(
        sg(scene), sg(ro_b), sg(rd), tmin, payload=True)
    return pallas_soft.hit_records_from_payload(ro_b, rd, t, normal, mat)


def soft_backends(scene: Scene, cfg: RenderConfig, detached: bool = True,
                  kernels: bool | None = None, payload_grad: bool = True):
    """Resolve ``(closest_fn, soft_multi_fn)`` for the fast differentiable
    path.  ``kernels=None`` auto-enables the Pallas custom-VJP kernels on
    TPU when the scene fits their budgets (also used by the sharded train
    step, raytpu/parallel/training.py)."""
    if kernels is None:
        from raytpu.render import pallas_kernel as _pk
        from raytpu.render import pallas_soft as _ps

        kernels = (
            jax.default_backend() not in ("cpu",)
            and KERNEL_MIN_TRIS <= scene.triangles.count <= _ps.STREAM_MAX_TRIS
            and scene.spheres.count <= _pk.MEGA2_MAX_UNROLL
            and scene.planes.count <= _pk.MEGA2_MAX_UNROLL
            and scene.lights.count <= _pk.MEGA2_MAX_LIGHTS
            # coarse2 worklist SMEM (same bound as the forward router): a
            # many-light million-triangle scene must fall back to jnp
            and scene.lights.count * -(-scene.triangles.count // 512)
            <= _pk.MEGA3_WL_SMEM_ENTRIES
        )
    soft_multi_fn = None
    closest_fn = detached_closest_hit if detached else None
    if kernels:
        soft_multi_fn = functools.partial(
            soft_trans_lights, True, float(cfg.ray_min), float(cfg.soft_beta)
        )
        if detached and payload_grad:
            closest_fn = functools.partial(detached_closest_hit, min_t_fn=_pallas_min_t)
        elif detached:
            closest_fn = _payload_closest_hit
    if closest_fn is not None:
        # every closest_fn this resolver returns is a detached/O(R)-residual
        # winner search — mark it so render_pixels_f32 may hoist it outside
        # the remat checkpoint (unmarked overrides stay inside)
        closest_fn = renderer.mark_detached(closest_fn)
    return closest_fn, soft_multi_fn


@functools.partial(jax.jit, static_argnames=("config", "detached", "kernels",
                                             "payload_grad"))
def render_soft_f32(scene: Scene, config: RenderConfig, detached: bool = True,
                    kernels: bool | None = None, payload_grad: bool = True):
    """f32 soft-shadow render on the FAST differentiable path.

    Three measured wins over naive ``grad(render)`` (PERF.md round 2):
      * the shade is rematerialized (``jax.checkpoint``): the backward pass
        recomputes the fused forward instead of streaming O(R*N) residuals
        from HBM (the backward was ~10x the forward, HBM-bound);
      * ``detached`` (default): closest hits route through
        ``raytpu.grad.fast.detached_closest_hit`` — O(R) differentiated hit
        re-derivation with one-hot matmul gathers, so the autodiff graph
        never transposes the O(R*N) t-matrix;
      * ``kernels`` (default: auto — on TPU with >= 256 triangles): the soft
        transmittance and the detached winner search run as chunk-culled
        Pallas kernels with a custom VJP (raytpu.grad.soft); gradients stay
        the jnp path's gradients.
    """
    cfg = dataclasses.replace(config, soft_shadows=True)
    closest_fn, soft_multi_fn = soft_backends(scene, cfg, detached, kernels,
                                              payload_grad)
    ro, rd = renderer.generate_rays(scene.camera, cfg)
    # tile order for the kernel path: 32x32 pixel blocks give the culled
    # kernels tight per-1024-ray direction cones (and spatially compact
    # shadow origins), like the whole-frame mega2 renderer; a pure
    # reshape/transpose, inverted after shading
    tiled = (
        TILE_KERNEL_RAYS
        and soft_multi_fn is not None
        and cfg.height % 32 == 0 and cfg.width % 32 == 0
    )
    if tiled:
        from raytpu.render import pallas_kernel as pk

        rd = pk._mega2_fold(rd, cfg.height, cfg.width)
    colors = renderer.render_pixels_f32(
        scene, ro, rd, cfg,
        closest_fn=closest_fn,
        remat=True,
        soft_multi_fn=soft_multi_fn,
    )
    if tiled:
        colors = pk._mega2_unfold_rows(colors, cfg.height, cfg.width)
    return colors.reshape(cfg.height, cfg.width, 3)


def render_soft(scene: Scene, config: RenderConfig):
    """f32 render with soft (differentiable) shadow visibility."""
    return render_soft_f32(scene, config)


def image_loss(scene: Scene, target, config: RenderConfig):
    """Mean squared error against a target f32 image."""
    img = render_soft(scene, config)
    return jnp.mean((img - target) ** 2)


def make_train_step(config: RenderConfig, optimizer, param_fn: Callable[[Scene], dict], merge_fn):
    """Build a jitted inverse-rendering step.

    Args:
      optimizer: an optax GradientTransformation.
      param_fn: scene -> pytree of the parameters being optimized.
      merge_fn: (scene, params) -> scene with parameters substituted.
    Returns ``step(params, opt_state, scene, target) -> (params, opt_state, loss)``.
    """

    def loss_fn(params, scene, target):
        return image_loss(merge_fn(scene, params), target, config)

    # NOTE: params/opt_state are NOT donated: ``param_fn(scene)`` typically
    # returns views aliasing the scene's own arrays, so donating them would
    # delete the scene's buffers out from under later steps (the params here
    # are KB-scale material/light tables — donation buys nothing).
    @jax.jit
    def step(params, opt_state, scene, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, scene, target)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step


# -- convenient param selections for inverse rendering ----------------------


def material_params(scene: Scene) -> dict:
    return {"color": scene.materials.color, "params": scene.materials.params}


def merge_material_params(scene: Scene, p: dict) -> Scene:
    mats = dataclasses.replace(scene.materials, color=p["color"], params=p["params"])
    return dataclasses.replace(scene, materials=mats)


def light_params(scene: Scene) -> dict:
    return {
        "position": scene.lights.position,
        "color": scene.lights.color,
        "intensity": scene.lights.intensity,
    }


def merge_light_params(scene: Scene, p: dict) -> Scene:
    lights = dataclasses.replace(
        scene.lights, position=p["position"], color=p["color"], intensity=p["intensity"]
    )
    return dataclasses.replace(scene, lights=lights)


def geometry_params(scene: Scene) -> dict:
    return {
        "sphere_center": scene.spheres.center,
        "sphere_radius": scene.spheres.radius,
        "mesh_positions": scene.meshes.positions,
        "mesh_translation": scene.meshes.translation,
    }


def merge_geometry_params(scene: Scene, p: dict) -> Scene:
    spheres = dataclasses.replace(scene.spheres, center=p["sphere_center"], radius=p["sphere_radius"])
    meshes = dataclasses.replace(scene.meshes, translation=p["mesh_translation"])
    meshes = meshes.with_positions(p["mesh_positions"])  # also refreshes face normals
    scene = dataclasses.replace(scene, spheres=spheres)
    return scene.with_meshes(meshes)
