"""Cull pass-rate curve over a full mesh rotation (VERDICT r2 item 3).

The SAH grouping is computed ONCE from the t=0 world triangles; under
animation only the group AABBs refresh (accel.chunk_bounds in XLA).  Under
RIGID per-mesh motion a group's tightness is pose-invariant UNLESS the group
spans two meshes with different transforms (their union AABB balloons as the
meshes move apart).  This probe measures (pure XLA, CPU):
  * primary + per-light shadow group pass rates at 8 yaw phases over 2pi,
  * how many groups span meshes at t=0.

Run: PYTHONPATH=/root/repo python probes/probe_anim.py
"""

import pathlib, sys
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from raytpu.core import scenes
from raytpu.core.types import LightKind, RenderConfig
from raytpu.ops import accel, shading as _shading
from raytpu.render import pallas_kernel as pk
from raytpu.render import renderer as _renderer

INF = float("inf")


def pass_rates(scene, config):
    """(primary_rate, [shadow_rate per light]) at the scene's current pose."""
    W, H = config.width, config.height
    tmin = float(config.ray_min)
    glo, ghi = accel.chunk_bounds(scene.triangles, accel.SAH_LEAF)
    ro, rd = _renderer.generate_rays(scene.camera, config)
    rd_f = pk._mega2_fold(rd, H, W)
    rb = accel.ray_tile_bounds(jnp.broadcast_to(ro, rd_f.shape), rd_f, INF, tile=1024)
    cullm = accel.cull_matrix(rb, glo, ghi, tmin)
    primary = float(jnp.mean(cullm))

    # shadow rays from the true closest hits (oracle-free: use the jnp path's
    # detached hit depths via the renderer's intersect — approximate with the
    # slab-passing-only reference is unnecessary; reuse renderer internals)
    from raytpu.ops import intersect

    rec = intersect.closest_hit(scene, jnp.broadcast_to(ro, rd_f.shape), rd_f, tmin)
    hit_f = jnp.isfinite(rec.t)
    p_off = (
        ro[None, :]
        + jnp.where(hit_f, rec.t, 0.0)[:, None] * rd_f
        + rec.normal * jnp.float32(config.normal_offset)
    )
    rates = []
    for li in range(scene.lights.count):
        ld, mag = _shading.direction_to_light(scene.lights, li, p_off)
        mag = jnp.where(hit_f, mag, 0.0)
        is_pt = scene.lights.kind[li] == LightKind.POINT
        cm = accel.shadow_cull_matrix(
            p_off, ld, mag, scene.lights.position[li], is_pt, glo, ghi, tmin)
        rates.append(float(jnp.mean(cm)))
    return primary, rates


def cross_mesh_groups(scene):
    fm = np.asarray(scene.meshes.face_mesh)
    G = accel.SAH_LEAF
    ng = -(-len(fm) // G)
    fm_pad = np.pad(fm, (0, ng * G - len(fm)), constant_values=fm[-1] if len(fm) else 0)
    groups = fm_pad.reshape(ng, G)
    return int((groups.min(axis=1) != groups.max(axis=1)).sum()), ng


def main():
    # modest resolution: the dense closest_hit t-matrix is materialized on
    # CPU here; pass rates are per-1024-ray-tile and track full res closely
    config = RenderConfig(width=160, height=128)
    for name in ("bunny", "optional", "reference"):
        spec = scenes.get(name)
        scene0 = spec.build()
        if scene0.triangles.count < 64:
            continue
        span, ng = cross_mesh_groups(scene0)
        print(f"{name}: {ng} groups, {span} span meshes at t=0")
        for t in np.linspace(0.0, 2.0 * np.pi, 8, endpoint=False):
            s = scene0.update(float(t))
            primary, rates = jax.jit(pass_rates, static_argnames="config")(s, config) \
                if False else pass_rates(s, config)
            sh = " ".join(f"{r*100:.1f}" for r in rates)
            print(f"  t={t:.2f}: primary {primary*100:.2f}%  shadow[{sh}]%", flush=True)


if __name__ == "__main__":
    main()
