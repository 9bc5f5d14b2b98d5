"""Multi-chip sharding: the TPU-native replacement for the reference's
CPU-thread pixel fan-out (reference: source/Renderer.cpp:42-92).

Two composable axes over a ``jax.sharding.Mesh`` (SURVEY.md §2 parallelism
checklist):

  * ``px``  — data parallelism over the pixel/ray grid (the analog of
    PPL ``parallel_for`` chunking; each chip shades a contiguous ray block)
  * ``prim`` — primitive-array sharding ("model parallel" axis): triangles
    are split across chips, each chip intersects its shard against the whole
    ray block, and per-shard closest-hit records are merged with an
    all-gather + lexicographic (t, priority) argmin — the ray-tracing cousin
    of tensor-parallel partial-sum reduction.

Shadow occlusion reduces with a boolean ``any`` (pmax) over the prim axis.
Everything runs under ``shard_map`` so collectives are explicit and ride ICI.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raytpu.core import math3d
from raytpu.core.types import RenderConfig, Scene
from raytpu.ops import intersect
from raytpu.render.renderer import generate_rays, shade_rays


def make_mesh(px: Optional[int] = None, prim: int = 1, devices=None) -> Mesh:
    """Build a (px, prim) device mesh.  ``px`` defaults to all devices / prim."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if px is None:
        assert n % prim == 0, (n, prim)
        px = n // prim
    assert px * prim == n, f"px*prim must equal device count ({px}x{prim} != {n})"
    dev_grid = np.asarray(devices).reshape(px, prim)
    return Mesh(dev_grid, axis_names=("px", "prim"))


def _pad_rows(arr, multiple, value=0.0):
    pad = (-arr.shape[0]) % multiple
    if pad == 0:
        return arr
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, widths, constant_values=value)


def _pad_triangles(tris, multiple):
    """Pad with degenerate triangles (all-zero vertices fail the determinant
    test, zero normals fail the parallel test -> guaranteed miss)."""
    return dataclasses.replace(
        tris,
        v0=_pad_rows(tris.v0, multiple),
        v1=_pad_rows(tris.v1, multiple),
        v2=_pad_rows(tris.v2, multiple),
        normal=_pad_rows(tris.normal, multiple),
        cull=_pad_rows(tris.cull, multiple),
        material=_pad_rows(tris.material, multiple),
    )


# ---------------------------------------------------------------------------
# Sharded closest-hit: per-shard records + lexicographic merge
# ---------------------------------------------------------------------------


def _local_closest_hit(scene: Scene, ro, rd, tmin, tri_prio_offset):
    """Closest hit over (all spheres, all planes, THIS shard's triangles),
    plus a global priority id so the merge reproduces the reference's
    iteration-order tie-break (sphere < plane < triangle, low index first)."""
    rec = intersect.closest_hit(scene, ro, rd, tmin)
    tmat = intersect.scene_t_matrix(scene, ro, rd, tmin, jnp.inf, shadow_pass=False)
    idx = jnp.argmin(tmat, axis=1)
    S, Pn = scene.spheres.count, scene.planes.count
    # triangles sit after all spheres+planes globally; shift this shard's ids
    prio = jnp.where(idx < S + Pn, idx, idx + tri_prio_offset)
    return rec, prio


def _merge_records(rec: intersect.HitRecords, prio, axis: str):
    """All-gather per-shard winners over ``axis`` and pick (min t, min prio)."""
    g = lambda x: jax.lax.all_gather(x, axis)  # (D, R, ...)
    t = g(rec.t)
    prio_g = g(prio)
    t_min = jnp.min(t, axis=0)
    big = jnp.iinfo(jnp.int32).max
    cand = jnp.where(t == t_min[None, :], prio_g, big)
    d_star = jnp.argmin(cand, axis=0)  # (R,)
    take = lambda x: jnp.take_along_axis(
        g(x), d_star[(None, ...) + (None,) * (x.ndim - 1)], axis=0
    )[0]
    return intersect.HitRecords(
        hit=jnp.isfinite(t_min),
        t=t_min,
        point=take(rec.point),
        normal=take(rec.normal),
        material=take(rec.material),
    )


# ---------------------------------------------------------------------------
# The sharded render pipeline
# ---------------------------------------------------------------------------


def _shade_rays_sharded(scene: Scene, ro, rd, config: RenderConfig, tri_prio_offset, prim_axis: str):
    """shade_rays with the closest-hit/any-hit queries reduced over the
    triangle-shard axis.  Mirrors raytpu.render.renderer.shade_rays."""
    from raytpu.ops import shading  # local import to avoid cycles

    n = rd.shape[0]
    ro = jnp.broadcast_to(ro, rd.shape)
    rec_local, prio = _local_closest_hit(scene, ro, rd, jnp.float32(config.ray_min), tri_prio_offset)
    rec = _merge_records(rec_local, prio, prim_axis)

    p_off = rec.point + rec.normal * jnp.float32(config.normal_offset)
    color = jnp.zeros((n, 3), jnp.float32)
    shadow_factor = jnp.ones((n,), jnp.float32)
    mode = config.lighting_mode

    for li in range(scene.lights.count):
        l, mag = shading.direction_to_light(scene.lights, li, p_off)
        if config.shadows:
            occ_local = intersect.any_hit(scene, p_off, l, jnp.float32(config.ray_min), mag)
            occ = jax.lax.pmax(occ_local.astype(jnp.int32), prim_axis) > 0
            trans = jnp.where(occ & rec.hit, 0.0, 1.0)
        else:
            trans = jnp.ones((n,), jnp.float32)
        factor = jnp.where(trans == 0.0, jnp.float32(config.shadow_dim), 1.0)
        shadow_factor = shadow_factor * factor

        if mode.name == "COMBINED":
            oa = jnp.maximum(math3d.dot(rec.normal, l), 0.0)
            rad = shading.radiance(scene.lights, li, rec.point)
            brdf = shading.shade(scene.materials, rec.material, rec.normal, l, -rd)
            contrib = oa[:, None] * rad * brdf
        elif mode.name == "OBSERVED_AREA":
            oa = jnp.maximum(math3d.dot(rec.normal, l), 0.0)
            contrib = jnp.broadcast_to(oa[:, None], (n, 3))
        elif mode.name == "RADIANCE":
            contrib = shading.radiance(scene.lights, li, rec.point)
        else:
            contrib = shading.shade(scene.materials, rec.material, rec.normal, l, -rd)
        color = color + contrib * trans[:, None]

    color = color * shadow_factor[:, None]
    color = jnp.where(rec.hit[:, None], color, 0.0)
    return math3d.max_to_one(color)


def render_pixels_shard_map(scene: Scene, config: RenderConfig, mesh: Mesh):
    """Full sharded forward pass: rays split over ``px``, triangles over
    ``prim``.  Returns the (H, W, 3) f32 image (replicated)."""
    n_px = mesh.shape["px"]
    n_prim = mesh.shape["prim"]

    ro, rd = generate_rays(scene.camera, config)
    num_rays = rd.shape[0]
    rd = _pad_rows(rd, n_px, value=1.0)

    tris = _pad_triangles(scene.triangles, max(n_prim, 1)) if scene.triangles.count else scene.triangles
    shard_size = tris.count // n_prim if tris.count else 0
    scene_rest = dataclasses.replace(scene, triangles=None)

    rest_spec = jax.tree_util.tree_map(lambda _: P(), scene_rest)
    tri_spec = jax.tree_util.tree_map(lambda _: P("prim"), tris)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(rest_spec, tri_spec, P("px", None)),
        out_specs=P("px", None),
        check_vma=False,
    )
    def kernel(scene_rest_l, tris_l, rd_l):
        scene_l = dataclasses.replace(scene_rest_l, triangles=tris_l)
        offset = jax.lax.axis_index("prim") * shard_size
        colors = _shade_rays_sharded(scene_l, ro, rd_l, config, offset, "prim")
        return colors

    colors = kernel(scene_rest, tris, rd)[:num_rays]
    return colors.reshape(config.height, config.width, 3)


@functools.partial(jax.jit, static_argnames=("config", "mesh"))
def _render_sharded_jit(scene, config, mesh):
    return render_pixels_shard_map(scene, config, mesh)


def render_image_sharded(scene: Scene, config: RenderConfig, mesh: Mesh):
    """Jitted sharded render to uint8 (H, W, 3)."""
    return math3d.quantize_u8(_render_sharded_jit(scene, config, mesh))
