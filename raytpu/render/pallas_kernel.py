"""Fused Pallas TPU kernels for the hot loop: batched ray-primitive
min-t reduction.

The O(rays x primitives) intersection sweep is the frame's entire FLOP
budget (SURVEY.md §3.1); everything else is O(rays).  The jnp path
materializes (R, P) t-matrices and (R, P, 3) cross-product intermediates in
HBM; these kernels keep them in VMEM registers and emit only the O(R)
winning (t, index) pair per ray.

Layout: a 2D grid over (ray tiles x primitive chunks).
  * rays ride the sublane axis: a tile is RT=128 rays, with each packed ray
    component sliced as a (128, 1) column;
  * primitives ride the lane axis: a chunk is CT=128 primitives, each
    component a (1, 128) row of the transposed primitive tensor;
  * each grid step evaluates a full (128 rays x 128 prims) test in registers
    and folds it into per-ray (min-t, argmin) accumulators, revisited across
    the chunk axis of the grid (TPU grids iterate sequentially).

First-minimum tie-breaks (the reference's iteration-order semantics) are
preserved: within a chunk the lowest lane index wins; across chunks the
strictly-smaller-t update keeps the earliest chunk.

Packing (host-side, cached per scene):
  rays   (R, 8)  f32: [rox roy roz rdx rdy rdz tmax pad]
  sphere (8, S)  f32: [cx cy cz r2 material ...]
  plane  (8, P)  f32: [nx ny nz d=dot(po,n) material ...]
  tri    (16, T) f32: [v0(3) e1(3) e2(3) n(3) cull material ...]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytpu.core import math3d
from raytpu.core.types import LightKind, RenderConfig, Scene
from raytpu.ops import intersect
from raytpu.render import renderer as _renderer

RT = 512  # rays per tile (sublanes)
CT = 128  # primitives per chunk (lanes)
FLT_EPSILON = 1.1920929e-07
INF = float("inf")
BIG_I = 2**30

_interpret = False  # flipped on CPU for tests


def _cdiv(a, b):
    return -(-a // b)


def _pad_axis(x, axis, multiple, value):
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# ---------------------------------------------------------------------------
# Kernel bodies.  Shared structure: compute the (RT, CT) t-matrix for this
# (ray tile, prim chunk), then fold (min-t, first-argmin) into the outputs.
# ---------------------------------------------------------------------------


def _ray_cols(rays_ref):
    r = rays_ref[:]  # (RT, 8)
    cols = [r[:, i : i + 1] for i in range(7)]
    return cols  # rox roy roz rdx rdy rdz tmax


def _fold_min_refs(tm, payload, refs, offset):
    """Ref-mutating min-fold: accumulators live in the kernel's output refs,
    so a chunk skipped by pl.when costs nothing (lax.cond carries would copy
    every accumulator register through both branches per chunk)."""
    t_ref, idx_ref, nx_ref, ny_ref, nz_ref, m_ref = refs
    t_min = jnp.min(tm, axis=1, keepdims=True)  # (RT,1)
    lane = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 1)
    first = jnp.min(jnp.where(tm == t_min, lane, BIG_I), axis=1, keepdims=True)
    first_mask = lane == first
    better = t_min < t_ref[:]
    t_ref[:] = jnp.where(better, t_min, t_ref[:])
    idx_ref[:] = jnp.where(better, first + offset, idx_ref[:])
    for ref, cand in zip((nx_ref, ny_ref, nz_ref, m_ref), payload):
        won = jnp.sum(jnp.where(first_mask, jnp.broadcast_to(cand, tm.shape), 0.0),
                      axis=1, keepdims=True)
        ref[:] = jnp.where(better, won, ref[:])


def _fold_any_ref(tm, occ_ref):
    """Ref-mutating any-hit fold."""
    occ_ref[:] = jnp.maximum(
        occ_ref[:], jnp.max(jnp.where(jnp.isfinite(tm), 1.0, 0.0), axis=1, keepdims=True)
    )


def _sphere_t_matrix(tmin, cols, s):
    """Masked (RT, CT) sphere t-matrix (reference: source/Utils.h:52-71).
    Also returns candidate payload builders (normal, material row)."""
    rox, roy, roz, rdx, rdy, rdz, tmax = cols
    cx, cy, cz, r2 = (s[i : i + 1, :] for i in range(4))
    lx = cx - rox
    ly = cy - roy
    lz = cz - roz
    l2 = lx * lx + ly * ly + lz * lz
    proj = rdx * lx + rdy * ly + rdz * lz
    perp2 = l2 - proj * proj
    inside = r2 >= perp2
    t = proj - jnp.sqrt(jnp.where(inside, r2 - perp2, 1.0))
    valid = inside & (t >= tmin) & (t <= tmax)
    tm = jnp.where(valid, t, INF)
    # candidate normal = hit point - center (normalized later,
    # reference: source/Scene.cpp:40)
    payload = (rox + t * rdx - cx, roy + t * rdy - cy, roz + t * rdz - cz, s[4:5, :])
    return tm, payload


def _plane_t_matrix(tmin, cols, p):
    """Masked (RT, CT) plane t-matrix (reference: source/Utils.h:82-98)."""
    rox, roy, roz, rdx, rdy, rdz, tmax = cols
    nx, ny, nz, d = (p[i : i + 1, :] for i in range(4))
    denom = rdx * nx + rdy * ny + rdz * nz
    num = d - (rox * nx + roy * ny + roz * nz)
    denom_nz = denom != 0.0
    t = num / jnp.where(denom_nz, denom, 1.0)
    valid = denom_nz & (t >= tmin) & (t < tmax)
    return jnp.where(valid, t, INF), (nx, ny, nz, p[4:5, :])


def _triangle_t_matrix(tmin, shadow_pass, cols, tr):
    """Masked (RT, CT) Möller–Trumbore t-matrix with per-triangle cull modes;
    shadow rays swap front/back culling (reference: source/Utils.h:109-184)."""
    rox, roy, roz, rdx, rdy, rdz, tmax = cols
    v0x, v0y, v0z = (tr[i : i + 1, :] for i in range(3))
    e1x, e1y, e1z = (tr[i : i + 1, :] for i in range(3, 6))
    e2x, e2y, e2z = (tr[i : i + 1, :] for i in range(6, 9))
    nx, ny, nz = (tr[i : i + 1, :] for i in range(9, 12))
    cull = tr[12:13, :]  # 0=front-cull 1=back-cull 2=none (as f32)

    cull_dot = nx * rdx + ny * rdy + nz * rdz  # (RT, CT)
    not_parallel = jnp.abs(cull_dot) >= FLT_EPSILON
    if shadow_pass:
        cull_eff = jnp.where(cull == 2.0, 2.0, 1.0 - cull)
    else:
        cull_eff = cull
    culled = ((cull_eff == 0.0) & (cull_dot < 0.0)) | ((cull_eff == 1.0) & (cull_dot > 0.0))

    hx = rdy * e2z - rdz * e2y
    hy = rdz * e2x - rdx * e2z
    hz = rdx * e2y - rdy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    det_ok = jnp.abs(a) >= FLT_EPSILON
    inv_a = 1.0 / jnp.where(det_ok, a, 1.0)
    sx = rox - v0x
    sy = roy - v0y
    sz = roz - v0z
    u = inv_a * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = inv_a * (rdx * qx + rdy * qy + rdz * qz)
    t = inv_a * (e2x * qx + e2y * qy + e2z * qz)
    bary_ok = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    valid = not_parallel & ~culled & det_ok & bary_ok & (t >= tmin) & (t < tmax)
    return jnp.where(valid, t, INF), (nx, ny, nz, tr[13:14, :])


def pack_rays(ro, rd, tmax):
    """(R,8): [ro, rd, tmax, 0], R padded to RT with miss rays."""
    R = rd.shape[0]
    ro = jnp.broadcast_to(ro, rd.shape)
    tmax = jnp.broadcast_to(tmax, (R,))
    rays = jnp.concatenate(
        [ro, rd, tmax[:, None], jnp.zeros((R, 1), jnp.float32)], axis=1
    )
    return _pad_axis(rays, 0, RT, 0.0)  # padded rays: rd=0 -> all tests miss


def pack_spheres(spheres):
    s = jnp.stack(
        [
            spheres.center[:, 0],
            spheres.center[:, 1],
            spheres.center[:, 2],
            spheres.radius * spheres.radius,
            spheres.material.astype(jnp.float32),
        ]
    )  # (5, S)
    s = jnp.concatenate([s, jnp.zeros((3, s.shape[1]), jnp.float32)], axis=0)
    # pad with r2 = -1 (< perp2 always) -> padded lanes miss; but padding
    # value applies to ALL rows, so fix the r2 row after the pad
    padded = _pad_axis(s, 1, CT, 0.0)
    if padded.shape[1] != s.shape[1]:
        r2_row = padded[3].at[s.shape[1]:].set(-1.0)
        padded = padded.at[3].set(r2_row)
    return padded


def pack_planes(planes):
    d = jnp.sum(planes.origin * planes.normal, axis=1)
    p = jnp.stack([planes.normal[:, 0], planes.normal[:, 1], planes.normal[:, 2], d,
                   planes.material.astype(jnp.float32)])
    p = jnp.concatenate([p, jnp.zeros((3, p.shape[1]), jnp.float32)], axis=0)
    return _pad_axis(p, 1, CT, 0.0)  # padded normal 0 -> denom 0 -> miss


def pack_triangles(tris):
    e1 = tris.v1 - tris.v0
    e2 = tris.v2 - tris.v0
    rows = [
        tris.v0[:, 0], tris.v0[:, 1], tris.v0[:, 2],
        e1[:, 0], e1[:, 1], e1[:, 2],
        e2[:, 0], e2[:, 1], e2[:, 2],
        tris.normal[:, 0], tris.normal[:, 1], tris.normal[:, 2],
        tris.cull.astype(jnp.float32),
        tris.material.astype(jnp.float32),
    ]
    t = jnp.stack(rows)  # (14, T)
    t = jnp.concatenate([t, jnp.zeros((2, t.shape[1]), jnp.float32)], axis=0)
    return _pad_axis(t, 1, CT, 0.0)  # degenerate zero triangles miss


def _make_scene_kernel(tmin, shadow_pass, S, P, T, nc, culled):
    """ONE kernel per intersection pass over a 1D grid of ray tiles.

    All primitive data is VMEM-resident for the whole pass.  Culled scenes
    iterate a per-tile WORKLIST of passing chunk ids (fori_loop + dynamic
    lane slice): a culled chunk costs nothing at all — no predicate
    evaluation, no pipeline bubble — unlike a static pl.when chain, whose
    per-chunk fixed cost dominated many-chunk scenes in round 1."""

    def kernel(rays_ref, sph_ref, pl_ref, tri_ref, wl_ref, cnt_ref,
               t_ref, idx_ref, nx_ref, ny_ref, nz_ref, mat_ref):
        cols = _ray_cols(rays_ref)
        refs = (t_ref, idx_ref, nx_ref, ny_ref, nz_ref, mat_ref)
        t_ref[:] = jnp.full((RT, 1), INF, jnp.float32)
        idx_ref[:] = jnp.full((RT, 1), BIG_I, jnp.int32)
        for r in refs[2:]:
            r[:] = jnp.zeros((RT, 1), jnp.float32)
        if S:
            tm, pay = _sphere_t_matrix(tmin, cols, sph_ref[:])
            _fold_min_refs(tm, pay, refs, 0)
        if P:
            tm, pay = _plane_t_matrix(tmin, cols, pl_ref[:])
            _fold_min_refs(tm, pay, refs, S)
        if T:
            if culled:
                def body(j, carry):
                    c = wl_ref[0, 0, j]
                    off = pl.multiple_of(c * CT, CT)
                    tm, pay = _triangle_t_matrix(
                        tmin, shadow_pass, cols, tri_ref[:, pl.ds(off, CT)]
                    )
                    _fold_min_refs(tm, pay, refs, S + P + c * CT)
                    return carry

                jax.lax.fori_loop(0, cnt_ref[0, 0, 0], body, 0)
            else:
                for c in range(nc):
                    tm, pay = _triangle_t_matrix(
                        tmin, shadow_pass, cols, tri_ref[:, c * CT : (c + 1) * CT]
                    )
                    _fold_min_refs(tm, pay, refs, S + P + c * CT)

    return kernel


CULL_MIN_TRIS = 2 * CT  # chunk culling pays off past a couple of chunks


def chunk_worklist(cull):
    """(nr, nc) f32 cull matrix -> per-tile worklist of passing chunk ids.

    Returns ``(worklist (nr, nc) i32, count (nr, 1) i32)``: passing chunks
    first, in ascending chunk order (stable sort keeps the reference's
    iteration-order tie-break across chunks)."""
    order = jnp.argsort(-cull, axis=1, stable=True).astype(jnp.int32)
    count = jnp.sum(cull > 0.0, axis=1).astype(jnp.int32)[:, None]
    return order, count


def scene_min_t(scene: Scene, rays, tmin, shadow_pass: bool):
    """Fused min-t over all primitive classes -> (t (R,), global idx (R,))."""
    from raytpu.ops import accel

    R = rays.shape[0]
    S, P, T = scene.spheres.count, scene.planes.count, scene.triangles.count
    sph = pack_spheres(scene.spheres) if S else jnp.zeros((8, CT), jnp.float32)
    pln = pack_planes(scene.planes) if P else jnp.zeros((8, CT), jnp.float32)
    tri = pack_triangles(scene.triangles) if T else jnp.zeros((16, CT), jnp.float32)
    nc = tri.shape[1] // CT if T else 1
    culled = T >= CULL_MIN_TRIS
    if culled:
        rb = accel.ray_tile_bounds(rays[:, 0:3], rays[:, 3:6], rays[:, 6], tile=RT)
        lo, hi = accel.chunk_bounds(scene.triangles, CT)
        cull = accel.cull_matrix(rb, lo, hi, tmin)  # (nr, nc) f32
        wl, cnt = chunk_worklist(cull)
    else:
        wl = jnp.zeros((R // RT, nc), jnp.int32)
        cnt = jnp.full((R // RT, 1), nc, jnp.int32)

    interpret = _interpret or jax.default_backend() == "cpu"
    t, idx, nx, ny, nz, mat = pl.pallas_call(
        _make_scene_kernel(tmin, shadow_pass, S, P, T, nc, culled),
        grid=(R // RT,),
        in_specs=[
            pl.BlockSpec((RT, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CT), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CT), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tri.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nc), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((RT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(6)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ],
        interpret=interpret,
    )(rays, sph, pln, tri, wl[:, None, :], cnt[:, :, None])
    return t[:, 0], idx[:, 0], nx[:, 0], ny[:, 0], nz[:, 0], mat[:, 0]


def _make_shadow_kernel(tmin, S, P, T, nc, culled, L):
    """Fused any-hit kernel for ALL lights of a frame: one launch computes
    every light's occlusion for a ray tile, encoded as a bitmask in one f32
    output (bit li = light li occluded).  Payload-free folds (no argmin, no
    normal/material selects) — shadow rays only need a boolean
    (reference: source/Scene.cpp:68-96)."""

    def kernel(orig_ref, dirs_ref, sph_ref, pl_ref, tri_ref, wl_ref, cnt_ref,
               occ_ref, occ_scratch):
        o = orig_ref[:]  # (RT, 8): [ox oy oz ...]
        occ_ref[:] = jnp.zeros((RT, 1), jnp.float32)
        for li in range(L):
            d = dirs_ref[:, 4 * li : 4 * li + 4]  # (RT,4): [lx ly lz mag]
            cols = (
                o[:, 0:1], o[:, 1:2], o[:, 2:3],
                d[:, 0:1], d[:, 1:2], d[:, 2:3], d[:, 3:4],
            )
            occ_scratch[:] = jnp.zeros((RT, 1), jnp.float32)
            if S:
                _fold_any_ref(_sphere_t_matrix(tmin, cols, sph_ref[:])[0], occ_scratch)
            if P:
                _fold_any_ref(_plane_t_matrix(tmin, cols, pl_ref[:])[0], occ_scratch)
            if T:
                if culled:
                    def body(j, carry, cols=cols, li=li):
                        c = wl_ref[0, li, j]
                        off = pl.multiple_of(c * CT, CT)
                        _fold_any_ref(
                            _triangle_t_matrix(tmin, True, cols, tri_ref[:, pl.ds(off, CT)])[0],
                            occ_scratch,
                        )
                        return carry

                    jax.lax.fori_loop(0, cnt_ref[0, 0, li], body, 0)
                else:
                    for c in range(nc):
                        _fold_any_ref(
                            _triangle_t_matrix(tmin, True, cols, tri_ref[:, c * CT : (c + 1) * CT])[0],
                            occ_scratch,
                        )
            occ_ref[:] = occ_ref[:] + occ_scratch[:] * float(1 << li)

    return kernel


def any_hit_lights_pallas(scene: Scene, ro, dirs, mags, tmin):
    """Occlusion for all L lights in one kernel launch.

    ro (R,3) shared shadow origins; dirs (L,R,3); mags (L,R).
    Returns (L, R) bool.
    """
    from raytpu.ops import accel

    R = ro.shape[0]
    L = dirs.shape[0]
    # occlusion bits are summed into one f32 as occ * 2^li — exact only
    # while 2^L stays within f32's 24-bit integer range
    assert L <= 24, f"any_hit_lights_pallas supports at most 24 lights (got {L})"
    tmin = float(tmin)
    S, P, T = scene.spheres.count, scene.planes.count, scene.triangles.count
    sph = pack_spheres(scene.spheres) if S else jnp.zeros((8, CT), jnp.float32)
    pln = pack_planes(scene.planes) if P else jnp.zeros((8, CT), jnp.float32)
    tri = pack_triangles(scene.triangles) if T else jnp.zeros((16, CT), jnp.float32)
    nc = tri.shape[1] // CT if T else 1
    culled = T >= CULL_MIN_TRIS

    orig = _pad_axis(
        jnp.concatenate([ro, jnp.zeros((R, 5), jnp.float32)], axis=1), 0, RT, 0.0
    )  # (Rp, 8)
    dirs_flat = jnp.concatenate(
        [jnp.concatenate([dirs[li], mags[li][:, None]], axis=1) for li in range(L)],
        axis=1,
    )  # (R, 4L)
    dirs_flat = _pad_axis(dirs_flat, 0, RT, 0.0)
    Rp = orig.shape[0]

    if culled:
        wls, cnts = [], []
        lo, hi = accel.chunk_bounds(scene.triangles, CT)
        for li in range(L):
            is_pt = scene.lights.kind[li] == LightKind.POINT
            w, c = chunk_worklist(accel.shadow_cull_matrix(
                ro, dirs[li], mags[li], scene.lights.position[li], is_pt,
                lo, hi, tmin, tile=RT))
            wls.append(w)
            cnts.append(c)
        wl = jnp.stack(wls, axis=1)  # (nr, L, nc)
        cnt = jnp.concatenate(cnts, axis=1)  # (nr, L)
    else:
        wl = jnp.zeros((Rp // RT, L, nc), jnp.int32)
        cnt = jnp.full((Rp // RT, L), nc, jnp.int32)

    interpret = _interpret or jax.default_backend() == "cpu"
    occ_bits = pl.pallas_call(
        _make_shadow_kernel(tmin, S, P, T, nc, culled, L),
        grid=(Rp // RT,),
        in_specs=[
            pl.BlockSpec((RT, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 4 * L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CT), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CT), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tri.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, nc), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((RT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((RT, 1), jnp.float32)],
        interpret=interpret,
    )(orig, dirs_flat, sph, pln, tri, wl, cnt[:, None, :])
    bits = occ_bits[:R, 0].astype(jnp.int32)
    return jnp.stack([(bits & (1 << li)) > 0 for li in range(L)])


# ---------------------------------------------------------------------------
# Fused shadow+shade kernel: all L lights' any-hit folds + material shading +
# tone map in ONE kernel launch after the closest-hit pass.  Round 1 paid
# ~12-15 ms/frame of XLA glue (shading stage + permutation gathers) on
# big-mesh scenes; this kernel's only HBM traffic is the final color columns.
# ---------------------------------------------------------------------------


def pack_lights(lt):
    """(L,8) SMEM light blob: [pos|dir, color, intensity, kind] — directional
    lights keep their (normalized) direction in the pos slot."""
    if lt.count == 0:
        return jnp.zeros((0, 8), jnp.float32)
    lpos = jnp.where((lt.kind == 0)[:, None], lt.position, lt.direction)
    return jnp.stack(
        [
            lpos[:, 0], lpos[:, 1], lpos[:, 2],
            lt.color[:, 0], lt.color[:, 1], lt.color[:, 2],
            lt.intensity, lt.kind.astype(jnp.float32),
        ],
        axis=1,
    )


def _make_shadow_shade_kernel(config: RenderConfig, tmin, S, P, T, nc, culled, L):
    mode_name = config.lighting_mode.name
    shadows = bool(config.shadows)
    dim = float(config.shadow_dim)

    def kernel(orig_ref, dirs_ref, shade_ref, sph_ref, pl_ref, tri_ref, li_ref,
               wl_ref, cnt_ref, cr_ref, cg_ref, cb_ref, occ_scratch):
        o = orig_ref[:]  # (RT,8): [p_off, rd, 0, 0]
        sb = shade_ref[:]  # (RT,16): [hit, normal, point, mat(kind,rgb,p0..p2), 0, 0]
        ox_, oy_, oz_ = o[:, 0:1], o[:, 1:2], o[:, 2:3]
        vx, vy, vz = -o[:, 3:4], -o[:, 4:5], -o[:, 5:6]
        hit = sb[:, 0:1] > 0.5
        nx, ny, nz = sb[:, 1:2], sb[:, 2:3], sb[:, 3:4]
        px_, py_, pz_ = sb[:, 4:5], sb[:, 5:6], sb[:, 6:7]
        mk, mr, mg, mb = sb[:, 7:8], sb[:, 8:9], sb[:, 9:10], sb[:, 10:11]
        m0, m1, m2 = sb[:, 11:12], sb[:, 12:13], sb[:, 13:14]

        cr = jnp.zeros((RT, 1), jnp.float32)
        cg = jnp.zeros_like(cr)
        cb = jnp.zeros_like(cr)
        sf = jnp.ones_like(cr)
        for li in range(L):
            d = dirs_ref[:, 4 * li : 4 * li + 4]  # (RT,4): [lx ly lz mag]
            lx, ly, lz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
            if shadows:
                cols = (ox_, oy_, oz_, lx, ly, lz, d[:, 3:4])
                occ_scratch[:] = jnp.zeros((RT, 1), jnp.float32)
                if S:
                    _fold_any_ref(_sphere_t_matrix(tmin, cols, sph_ref[:])[0], occ_scratch)
                if P:
                    _fold_any_ref(_plane_t_matrix(tmin, cols, pl_ref[:])[0], occ_scratch)
                if T:
                    if culled:
                        def body(j, carry, cols=cols, li=li):
                            c = wl_ref[0, li, j]
                            off = pl.multiple_of(c * CT, CT)
                            _fold_any_ref(
                                _triangle_t_matrix(tmin, True, cols, tri_ref[:, pl.ds(off, CT)])[0],
                                occ_scratch,
                            )
                            return carry

                        jax.lax.fori_loop(0, cnt_ref[0, 0, li], body, 0)
                    else:
                        for c in range(nc):
                            _fold_any_ref(
                                _triangle_t_matrix(tmin, True, cols, tri_ref[:, c * CT : (c + 1) * CT])[0],
                                occ_scratch,
                            )
                lit = jnp.logical_not((occ_scratch[:] > 0.5) & hit)
                sf = sf * jnp.where(lit, 1.0, dim)
            else:
                lit = jnp.ones((RT, 1), jnp.bool_)

            lpx, lpy, lpz = li_ref[li, 0], li_ref[li, 1], li_ref[li, 2]
            lcr, lcg, lcb = li_ref[li, 3], li_ref[li, 4], li_ref[li, 5]
            lint = li_ref[li, 6]
            is_point = li_ref[li, 7] == 0.0
            wr, wg, wb = _shade_one_light(
                mode_name, is_point, (lpx, lpy, lpz), (lcr, lcg, lcb), lint,
                (px_, py_, pz_), (nx, ny, nz), (lx, ly, lz), (vx, vy, vz),
                (mk, mr, mg, mb, m0, m1, m2),
            )
            cr = cr + jnp.where(lit, wr, 0.0)
            cg = cg + jnp.where(lit, wg, 0.0)
            cb = cb + jnp.where(lit, wb, 0.0)

        cr = jnp.where(hit, cr * sf, 0.0)
        cg = jnp.where(hit, cg * sf, 0.0)
        cb = jnp.where(hit, cb * sf, 0.0)
        cr, cg, cb = _tonemap_rgb(cr, cg, cb)
        cr_ref[:] = cr
        cg_ref[:] = cg
        cb_ref[:] = cb

    return kernel


def shadow_shade_pallas(scene: Scene, rec: intersect.HitRecords, rd, config: RenderConfig):
    """Fused per-light shadow + shading + tonemap for a closest-hit batch.

    ``rec`` must be in the same ray order as ``rd``.  Returns (R,3) f32
    tone-mapped colors (the rest of RenderPixel after GetClosestHit,
    reference: source/Renderer.cpp:120-182, as one kernel)."""
    from raytpu.ops import accel, shading as _shading

    R = rd.shape[0]
    L = scene.lights.count
    if L == 0:
        return jnp.zeros((R, 3), jnp.float32)  # no lights -> black (reference W1)
    assert L <= 24, f"shadow_shade_pallas supports at most 24 lights (got {L})"
    tmin = float(config.ray_min)
    p_off = rec.point + rec.normal * jnp.float32(config.normal_offset)
    lds = [_shading.direction_to_light(scene.lights, li, p_off) for li in range(L)]

    # per-ray material row via one-hot matmul (MXU; TPU gathers are scalar-slow)
    mats = scene.materials
    table = jnp.concatenate(
        [mats.kind.astype(jnp.float32)[:, None], mats.color, mats.params], axis=1
    )  # (M,7)
    onehot = (rec.material[:, None] == jnp.arange(mats.count)[None, :]).astype(jnp.float32)
    vals = onehot @ table  # (R,7)

    orig = _pad_axis(
        jnp.concatenate([p_off, rd, jnp.zeros((R, 2), jnp.float32)], axis=1), 0, RT, 0.0
    )
    dirs_flat = _pad_axis(
        jnp.concatenate(
            [jnp.concatenate([l, m[:, None]], axis=1) for l, m in lds], axis=1
        ),
        0, RT, 0.0,
    )  # (Rp, 4L)
    shade_blob = _pad_axis(
        jnp.concatenate(
            [rec.hit.astype(jnp.float32)[:, None], rec.normal, rec.point, vals,
             jnp.zeros((R, 2), jnp.float32)],
            axis=1,
        ),
        0, RT, 0.0,
    )  # (Rp, 16)
    Rp = orig.shape[0]

    S, P, T = scene.spheres.count, scene.planes.count, scene.triangles.count
    sph = pack_spheres(scene.spheres) if S else jnp.zeros((8, CT), jnp.float32)
    pln = pack_planes(scene.planes) if P else jnp.zeros((8, CT), jnp.float32)
    tri = pack_triangles(scene.triangles) if T else jnp.zeros((16, CT), jnp.float32)
    nc = tri.shape[1] // CT if T else 1
    culled = T >= CULL_MIN_TRIS and config.shadows
    if culled:
        wls, cnts = [], []
        lo, hi = accel.chunk_bounds(scene.triangles, CT)
        for li, (l, m) in enumerate(lds):
            is_pt = scene.lights.kind[li] == LightKind.POINT
            w, c = chunk_worklist(accel.shadow_cull_matrix(
                p_off, l, m, scene.lights.position[li], is_pt,
                lo, hi, tmin, tile=RT))
            wls.append(w)
            cnts.append(c)
        wl = jnp.stack(wls, axis=1)  # (nr, L, nc)
        cnt = jnp.concatenate(cnts, axis=1)  # (nr, L)
    else:
        wl = jnp.zeros((Rp // RT, L, nc), jnp.int32)
        cnt = jnp.full((Rp // RT, L), nc, jnp.int32)

    interpret = _interpret or jax.default_backend() == "cpu"
    cr, cg, cb = pl.pallas_call(
        _make_shadow_shade_kernel(config, tmin, S, P, T, nc, culled, L),
        grid=(Rp // RT,),
        in_specs=[
            pl.BlockSpec((RT, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 4 * L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RT, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CT), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, CT), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, tri.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((max(L, 1), 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, L, nc), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((RT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_shape=[jax.ShapeDtypeStruct((Rp, 1), jnp.float32) for _ in range(3)],
        scratch_shapes=[pltpu.VMEM((RT, 1), jnp.float32)],
        interpret=interpret,
    )(orig, dirs_flat, shade_blob, sph, pln, tri, pack_lights(scene.lights), wl, cnt[:, None, :])
    return jnp.concatenate([cr[:R], cg[:R], cb[:R]], axis=1)


def closest_hit_pallas(scene: Scene, ro, rd, tmin) -> intersect.HitRecords:
    R = rd.shape[0]
    rays = pack_rays(ro, rd, INF)
    t, idx, nx, ny, nz, mat = scene_min_t(scene, rays, float(tmin), shadow_pass=False)
    t, idx = t[:R], idx[:R]
    normal = jnp.stack([nx[:R], ny[:R], nz[:R]], axis=1)
    # sphere normals come out unnormalized (reference: source/Scene.cpp:40)
    is_sphere = idx < scene.spheres.count
    normal = jnp.where(is_sphere[:, None], math3d.normalize_safe(normal), normal)
    hit = jnp.isfinite(t)
    t_safe = jnp.where(hit, t, 0.0)
    ro_b = jnp.broadcast_to(ro, rd.shape)
    return intersect.HitRecords(
        hit=hit,
        t=jnp.where(hit, t, INF),
        point=ro_b + t_safe[:, None] * rd,
        normal=normal,
        material=mat[:R].astype(jnp.int32),
    )


def any_hit_pallas(scene: Scene, ro, rd, tmin, tmax):
    R = rd.shape[0]
    rays = pack_rays(ro, rd, tmax)
    t, *_ = scene_min_t(scene, rays, float(tmin), shadow_pass=True)
    return jnp.isfinite(t[:R])


# ---------------------------------------------------------------------------
# Whole-frame megakernel (small scenes: primitives unrolled from SMEM)
#
# For scenes with up to MEGA_MAX_PRIMS primitives the winning layout is the
# transpose of the chunked kernels: RAYS occupy every lane of an (8, 128)
# tile (1024 rays/tile) and the primitive loop is unrolled with each
# primitive's parameters read as SMEM scalars.  The whole pipeline — raygen,
# closest-hit with running payload selects, per-light shadow any-hit,
# material-table shading, tone map — runs in registers; the only HBM traffic
# is the final color write.  This is the Pallas equivalent of the reference's
# entire RenderPixel (reference: source/Renderer.cpp:100-182) as one kernel.
# ---------------------------------------------------------------------------

MEGA_MAX_PRIMS = 72
MEGA_MAX_LIGHTS = 8
_MTILE = 1024  # rays per megakernel tile, as (8, 128)


def _msqnorm(x, y, z):
    return x * x + y * y + z * z


def _shade_one_light(mode_name, is_point, lp, lcol, lint, p, n, l, v, mat):
    """Per-light contribution ``(wr, wg, wb)`` for one in-kernel ray batch;
    every argument is a broadcast-compatible array (the megakernel passes
    (8,128) registers, the fused shadow+shade kernel (RT,1) columns).

    Transcribes RenderPixel's per-light shading: radiance at the UNOFFSET hit
    point (reference: source/Renderer.cpp:150), material-table dispatch in
    place of the Shade vtable (reference: source/Material.h:27), and the four
    debug lighting modes (reference: source/Renderer.cpp:145-171)."""
    lpx, lpy, lpz = lp
    lcr, lcg, lcb = lcol
    px_, py_, pz_ = p
    nx, ny, nz = n
    lx, ly, lz = l
    vx, vy, vz = v
    mk, mr, mg, mb, m0, m1, m2 = mat

    rdx_p = lpx - px_
    rdy_p = lpy - py_
    rdz_p = lpz - pz_
    inv_d2 = lint / _msqnorm(rdx_p, rdy_p, rdz_p)
    rad_scale = jnp.where(is_point, inv_d2, lint)
    ndl = nx * lx + ny * ly + nz * lz
    oa = jnp.maximum(ndl, 0.0)

    if mode_name in ("COMBINED", "BRDF"):
        # material-table dispatch on per-lane regs
        # Lambert: (cd*kd)/pi op order (reference: source/BRDFs.h:14-22)
        pi = np.float32(np.pi)
        lam_r = mr * m0 / pi
        lam_g = mg * m0 / pi
        lam_b = mb * m0 / pi
        # Phong lobe (kind 2): params [kd, ks, exp]
        two_ndl = 2.0 * jnp.maximum(ndl, 0.0)
        rfx = lx - two_ndl * nx
        rfy = ly - two_ndl * ny
        rfz = lz - two_ndl * nz
        cosa = jnp.maximum(rfx * vx + rfy * vy + rfz * vz, 0.0)
        spec_p = m1 * jnp.power(cosa, m2)
        # Cook-Torrance (kind 3): params [metal, rough]
        hx_ = vx + lx
        hy_ = vy + ly
        hz_ = vz + lz
        h_len = jnp.maximum(jnp.sqrt(_msqnorm(hx_, hy_, hz_)), 1e-20)
        hx_ = hx_ / h_len
        hy_ = hy_ / h_len
        hz_ = hz_ / h_len
        dielectric = m0 == 0.0
        f0r = jnp.where(dielectric, 0.04, mr)
        f0g = jnp.where(dielectric, 0.04, mg)
        f0b = jnp.where(dielectric, 0.04, mb)
        hdv = jnp.maximum(hx_ * vx + hy_ * vy + hz_ * vz, 0.0)
        fres_w = jnp.power(1.0 - hdv, 5)
        Fr = f0r + (1.0 - f0r) * fres_w
        Fg = f0g + (1.0 - f0g) * fres_w
        Fb = f0b + (1.0 - f0b) * fres_w
        a_ = m1 * m1
        sqr_a = a_ * a_
        ndh = jnp.maximum(nx * hx_ + ny * hy_ + nz * hz_, 0.0)
        dden = ndh * ndh * (sqr_a - 1.0) + 1.0
        D = sqr_a / (pi * dden * dden)
        kk = (a_ + 1.0) * (a_ + 1.0) / 8.0
        ndv = jnp.maximum(nx * vx + ny * vy + nz * vz, 0.0)
        ndl_c = jnp.maximum(ndl, 0.0)
        G = (ndv / (ndv * (1.0 - kk) + kk)) * (ndl_c / (ndl_c * (1.0 - kk) + kk))
        spec_den = 4.0 * jnp.maximum(ndv, 1e-4) * jnp.maximum(ndl_c, 1e-4)
        spec_s = D * G / spec_den
        ct_r = jnp.where(dielectric, mr * (1.0 - Fr) / pi, 0.0) + Fr * spec_s
        ct_g = jnp.where(dielectric, mg * (1.0 - Fg) / pi, 0.0) + Fg * spec_s
        ct_b = jnp.where(dielectric, mb * (1.0 - Fb) / pi, 0.0) + Fb * spec_s
        # select by material kind: 0 solid, 1 lambert, 2 lambert+phong, 3 CT
        br = jnp.where(mk == 0.0, mr, jnp.where(mk == 1.0, lam_r, jnp.where(mk == 2.0, lam_r + spec_p, ct_r)))
        bg = jnp.where(mk == 0.0, mg, jnp.where(mk == 1.0, lam_g, jnp.where(mk == 2.0, lam_g + spec_p, ct_g)))
        bb = jnp.where(mk == 0.0, mb, jnp.where(mk == 1.0, lam_b, jnp.where(mk == 2.0, lam_b + spec_p, ct_b)))

    if mode_name == "COMBINED":
        # ((oa * (color*scale)) * brdf) — the jnp path's op order
        wr = oa * (lcr * rad_scale) * br
        wg = oa * (lcg * rad_scale) * bg
        wb = oa * (lcb * rad_scale) * bb
    elif mode_name == "OBSERVED_AREA":
        wr = wg = wb = oa
    elif mode_name == "RADIANCE":
        wr = rad_scale * lcr
        wg = rad_scale * lcg
        wb = rad_scale * lcb
    else:  # BRDF
        wr, wg, wb = br, bg, bb
    return wr, wg, wb


def _tonemap_rgb(cr, cg, cb):
    """MaxToOne tone map (reference: source/ColorRGB.h:12-17); divide (not
    reciprocal-multiply) to match the jnp path bit-for-bit."""
    mx = jnp.maximum(cr, jnp.maximum(cg, cb))
    over = mx > 1.0
    return (
        jnp.where(over, cr / mx, cr),
        jnp.where(over, cg / mx, cg),
        jnp.where(over, cb / mx, cb),
    )


# ---------------------------------------------------------------------------
# Scalar-broadcast primitive tests: one primitive's parameters are loaded as
# SMEM scalars and broadcast against a whole (8, 128) ray-tile register.
# Unlike the (RT, CT) fold layout, every per-ray op here costs exactly ONE
# vector register — full lane utilization with no padded prim lanes.
# ---------------------------------------------------------------------------


def _sphere_t_reg(sph_ref, s, ox, oy, oz, ddx, ddy, ddz, lo, hi):
    """(8,128) sphere t for SMEM sphere row ``s`` (reference: source/Utils.h:52-71)."""
    cx_, cy_, cz_, r2 = sph_ref[s, 0], sph_ref[s, 1], sph_ref[s, 2], sph_ref[s, 3]
    lx = cx_ - ox
    ly = cy_ - oy
    lz = cz_ - oz
    l2 = _msqnorm(lx, ly, lz)
    proj = ddx * lx + ddy * ly + ddz * lz
    perp2 = l2 - proj * proj
    inside = r2 >= perp2
    tc = proj - jnp.sqrt(jnp.where(inside, r2 - perp2, 1.0))
    return jnp.where(inside & (tc >= lo) & (tc <= hi), tc, INF)


def _plane_t_reg(pl_ref, p, ox, oy, oz, ddx, ddy, ddz, lo, hi):
    """(8,128) plane t for SMEM plane row ``p`` (reference: source/Utils.h:82-98)."""
    nx_, ny_, nz_, d = pl_ref[p, 0], pl_ref[p, 1], pl_ref[p, 2], pl_ref[p, 3]
    denom = ddx * nx_ + ddy * ny_ + ddz * nz_
    num = d - (ox * nx_ + oy * ny_ + oz * nz_)
    dn_nz = denom != 0.0
    tc = num / jnp.where(dn_nz, denom, 1.0)
    return jnp.where(dn_nz & (tc >= lo) & (tc < hi), tc, INF)


def _tri_t_reg(tri_ref, k, ox, oy, oz, ddx, ddy, ddz, lo, hi, shadow):
    """(8,128) Möller–Trumbore t for SMEM triangle row ``k`` with cull modes;
    shadow rays swap front/back culling (reference: source/Utils.h:109-184)."""
    return _tri_t_read(lambda c: tri_ref[k, c], ox, oy, oz, ddx, ddy, ddz,
                       lo, hi, shadow)


def _tri_t_read(read, ox, oy, oz, ddx, ddy, ddz, lo, hi, shadow):
    """Möller–Trumbore fold reading the 13 triangle scalars via ``read(col)``
    (an SMEM blob row for mega/mega2, a DMA ring slot for mega3)."""
    v0x, v0y, v0z = read(0), read(1), read(2)
    e1x, e1y, e1z = read(3), read(4), read(5)
    e2x, e2y, e2z = read(6), read(7), read(8)
    nx_, ny_, nz_ = read(9), read(10), read(11)
    cull = read(12)
    cull_dot = nx_ * ddx + ny_ * ddy + nz_ * ddz
    not_par = jnp.abs(cull_dot) >= FLT_EPSILON
    cull_eff = jnp.where(cull == 2.0, 2.0, (1.0 - cull) if shadow else cull)
    culled = ((cull_eff == 0.0) & (cull_dot < 0.0)) | ((cull_eff == 1.0) & (cull_dot > 0.0))
    hx = ddy * e2z - ddz * e2y
    hy = ddz * e2x - ddx * e2z
    hz = ddx * e2y - ddy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    det_ok = jnp.abs(a) >= FLT_EPSILON
    inv_a = 1.0 / jnp.where(det_ok, a, 1.0)
    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    u = inv_a * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = inv_a * (ddx * qx + ddy * qy + ddz * qz)
    tc = inv_a * (e2x * qx + e2y * qy + e2z * qz)
    ok = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    return jnp.where(not_par & ~culled & det_ok & ok & (tc >= lo) & (tc < hi), tc, INF)


def _mat_of(ref, k, base):
    """7 material scalars [kind, rgb, p0..p2] inlined in a prim's SMEM row."""
    return tuple(ref[k, base + c] for c in range(7))


def _mat_read(read, base):
    """7 material scalars via a ``read(col)`` accessor (mega3 ring slots)."""
    return tuple(read(base + c) for c in range(7))


def _mega_kernel(config: RenderConfig, S, P, T, L, W, H,
                 cam_ref, sph_ref, pl_ref, tri_ref, li_ref, out_ref):
    """One (8,128) ray tile end to end.  cam/sph/pl/tri/li live in SMEM."""
    i = pl.program_id(0)
    # cam col 14 holds a global tile offset (0 for whole-frame renders) so a
    # px-sharded chip can run this same kernel on its contiguous tile range
    i = i + cam_ref[0, 14].astype(jnp.int32)
    tmin = float(config.ray_min)

    # ---- raygen (reference: source/Renderer.cpp:104-114) ----
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    rid = (i * 8 + sub) * 128 + lane
    pxi = jax.lax.rem(rid, W)
    pyi = jax.lax.div(rid, W)
    fov = cam_ref[0, 12]
    aspect = cam_ref[0, 13]
    # op order matches generate_rays exactly (fp parity):
    # cx = (2*(px+.5)/W - 1)*aspect*fov computed as ((2*u - 1)*aspect)*fov
    ux = (pxi.astype(jnp.float32) + 0.5) / W
    uy = (pyi.astype(jnp.float32) + 0.5) / H
    cx = (2.0 * ux - 1.0) * aspect * fov
    cy = (1.0 - 2.0 * uy) * fov
    rox, roy, roz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
    dx = cx * cam_ref[0, 3] + cy * cam_ref[0, 6] + cam_ref[0, 9]
    dy = cx * cam_ref[0, 4] + cy * cam_ref[0, 7] + cam_ref[0, 10]
    dz = cx * cam_ref[0, 5] + cy * cam_ref[0, 8] + cam_ref[0, 11]
    d_len = jnp.sqrt(_msqnorm(dx, dy, dz))
    rdx, rdy, rdz = dx / d_len, dy / d_len, dz / d_len

    # ---- closest hit with running payload selects ----
    # regs: t, unnormalized normal, is_sphere, material (kind,color,params)
    t = jnp.full((8, 128), INF, jnp.float32)
    nx = jnp.zeros((8, 128), jnp.float32)
    ny = jnp.zeros_like(nx)
    nz = jnp.zeros_like(nx)
    is_sph = jnp.zeros((8, 128), jnp.float32)  # 0/1 flag (Mosaic: no i1 vector selects)
    mk = jnp.zeros((8, 128), jnp.float32)  # material kind
    mr = jnp.zeros_like(nx)
    mg = jnp.zeros_like(nx)
    mb = jnp.zeros_like(nx)
    m0 = jnp.zeros_like(nx)
    m1 = jnp.zeros_like(nx)
    m2 = jnp.zeros_like(nx)

    def upd(sel, tc, nxc, nyc, nzc, sphere, mat):
        nonlocal t, nx, ny, nz, is_sph, mk, mr, mg, mb, m0, m1, m2
        t = jnp.where(sel, tc, t)
        nx = jnp.where(sel, nxc, nx)
        ny = jnp.where(sel, nyc, ny)
        nz = jnp.where(sel, nzc, nz)
        is_sph = jnp.where(sel, sphere, is_sph)  # sphere is 0.0/1.0
        mk = jnp.where(sel, mat[0], mk)
        mr = jnp.where(sel, mat[1], mr)
        mg = jnp.where(sel, mat[2], mg)
        mb = jnp.where(sel, mat[3], mb)
        m0 = jnp.where(sel, mat[4], m0)
        m1 = jnp.where(sel, mat[5], m1)
        m2 = jnp.where(sel, mat[6], m2)

    def sphere_t_one(s, ox, oy, oz, ddx, ddy, ddz, lo, hi):
        return _sphere_t_reg(sph_ref, s, ox, oy, oz, ddx, ddy, ddz, lo, hi)

    def plane_t_one(p, ox, oy, oz, ddx, ddy, ddz, lo, hi):
        return _plane_t_reg(pl_ref, p, ox, oy, oz, ddx, ddy, ddz, lo, hi)

    def tri_t_one(k, ox, oy, oz, ddx, ddy, ddz, lo, hi, shadow):
        return _tri_t_reg(tri_ref, k, ox, oy, oz, ddx, ddy, ddz, lo, hi, shadow)

    mat_of = _mat_of

    for s in range(S):
        tc = sphere_t_one(s, rox, roy, roz, rdx, rdy, rdz, tmin, INF)
        sel = tc < t
        px_ = rox + tc * rdx
        py_ = roy + tc * rdy
        pz_ = roz + tc * rdz
        upd(sel, tc, px_ - sph_ref[s, 0], py_ - sph_ref[s, 1], pz_ - sph_ref[s, 2], 1.0, mat_of(sph_ref, s, 4))
    for p in range(P):
        tc = plane_t_one(p, rox, roy, roz, rdx, rdy, rdz, tmin, INF)
        upd(tc < t, tc, pl_ref[p, 0], pl_ref[p, 1], pl_ref[p, 2], 0.0, mat_of(pl_ref, p, 4))
    for k in range(T):
        tc = tri_t_one(k, rox, roy, roz, rdx, rdy, rdz, tmin, INF, shadow=False)
        upd(tc < t, tc, tri_ref[k, 9], tri_ref[k, 10], tri_ref[k, 11], 0.0, mat_of(tri_ref, k, 13))

    hit = t < INF
    ts = jnp.where(hit, t, 0.0)
    px_ = rox + ts * rdx
    py_ = roy + ts * rdy
    pz_ = roz + ts * rdz
    # normalize sphere normals post-selection (reference: source/Scene.cpp:40)
    n_len = jnp.sqrt(jnp.maximum(_msqnorm(nx, ny, nz), 1e-20))
    sphm = is_sph > 0.5
    nx = jnp.where(sphm, nx / n_len, nx)
    ny = jnp.where(sphm, ny / n_len, ny)
    nz = jnp.where(sphm, nz / n_len, nz)
    off = float(config.normal_offset)
    ox_ = px_ + nx * off
    oy_ = py_ + ny * off
    oz_ = pz_ + nz * off
    vx, vy, vz = -rdx, -rdy, -rdz  # view direction for shading

    cr = jnp.zeros((8, 128), jnp.float32)
    cg = jnp.zeros_like(cr)
    cb = jnp.zeros_like(cr)
    sf = jnp.ones_like(cr)
    mode = config.lighting_mode

    for li in range(L):
        lpx, lpy, lpz = li_ref[li, 0], li_ref[li, 1], li_ref[li, 2]
        lcr, lcg, lcb = li_ref[li, 3], li_ref[li, 4], li_ref[li, 5]
        lint = li_ref[li, 6]
        lkind = li_ref[li, 7]  # 0 point, 1 directional; dir stored in pos slot negated
        is_point = lkind == 0.0
        ldx = lpx - ox_
        ldy = lpy - oy_
        ldz = lpz - oz_
        mag_pt = jnp.sqrt(_msqnorm(ldx, ldy, ldz))
        lx = jnp.where(is_point, ldx / mag_pt, -lpx)
        ly = jnp.where(is_point, ldy / mag_pt, -lpy)
        lz = jnp.where(is_point, ldz / mag_pt, -lpz)
        mag = jnp.where(is_point, mag_pt, 3.4028235e38)

        if config.shadows:
            occ = jnp.zeros((8, 128), jnp.bool_)
            for s in range(S):
                occ |= sphere_t_one(s, ox_, oy_, oz_, lx, ly, lz, tmin, mag) < INF
            for p in range(P):
                occ |= plane_t_one(p, ox_, oy_, oz_, lx, ly, lz, tmin, mag) < INF
            for k in range(T):
                occ |= tri_t_one(k, ox_, oy_, oz_, lx, ly, lz, tmin, mag, shadow=True) < INF
            lit = ~(occ & hit)
            sf = sf * jnp.where(lit, 1.0, float(config.shadow_dim))
        else:
            lit = jnp.ones((8, 128), jnp.bool_)

        wr, wg, wb = _shade_one_light(
            mode.name, is_point, (lpx, lpy, lpz), (lcr, lcg, lcb), lint,
            (px_, py_, pz_), (nx, ny, nz), (lx, ly, lz), (vx, vy, vz),
            (mk, mr, mg, mb, m0, m1, m2),
        )
        cr = cr + jnp.where(lit, wr, 0.0)
        cg = cg + jnp.where(lit, wg, 0.0)
        cb = cb + jnp.where(lit, wb, 0.0)

    cr = jnp.where(hit, cr * sf, 0.0)
    cg = jnp.where(hit, cg * sf, 0.0)
    cb = jnp.where(hit, cb * sf, 0.0)
    cr, cg, cb = _tonemap_rgb(cr, cg, cb)
    out_ref[0, :, :] = cr
    out_ref[1, :, :] = cg
    out_ref[2, :, :] = cb


def _mega_pack(scene: Scene, config: RenderConfig):
    """SMEM blobs: camera(16,), spheres (S,11), planes (P,11), tris (T,20),
    lights (L,8) — geometry + that primitive's material row inline."""
    mats = scene.materials

    def mat_cols(idx):
        return [
            mats.kind[idx].astype(jnp.float32),
            mats.color[idx, 0], mats.color[idx, 1], mats.color[idx, 2],
            mats.params[idx, 0], mats.params[idx, 1], mats.params[idx, 2],
        ]

    right, up, fwd = scene.camera.onb()
    cam = jnp.concatenate([
        scene.camera.origin, right, up, fwd,
        scene.camera.fov_scale[None], jnp.float32(config.aspect_ratio)[None],
        jnp.zeros(2, jnp.float32),
    ])[None, :]  # (1, 16): SMEM wants 2D

    sph = scene.spheres
    sph_blob = (
        jnp.stack([sph.center[:, 0], sph.center[:, 1], sph.center[:, 2], sph.radius * sph.radius]
                  + mat_cols(sph.material), axis=1)
        if sph.count else jnp.zeros((0, 11), jnp.float32)
    )
    pln = scene.planes
    pl_blob = (
        jnp.stack([pln.normal[:, 0], pln.normal[:, 1], pln.normal[:, 2],
                   jnp.sum(pln.origin * pln.normal, axis=1)] + mat_cols(pln.material), axis=1)
        if pln.count else jnp.zeros((0, 11), jnp.float32)
    )
    tr = scene.triangles
    if tr.count:
        e1 = tr.v1 - tr.v0
        e2 = tr.v2 - tr.v0
        tri_blob = jnp.stack(
            [tr.v0[:, 0], tr.v0[:, 1], tr.v0[:, 2],
             e1[:, 0], e1[:, 1], e1[:, 2],
             e2[:, 0], e2[:, 1], e2[:, 2],
             tr.normal[:, 0], tr.normal[:, 1], tr.normal[:, 2],
             tr.cull.astype(jnp.float32)] + mat_cols(tr.material), axis=1)
    else:
        tri_blob = jnp.zeros((0, 20), jnp.float32)
    return cam, sph_blob, pl_blob, tri_blob, pack_lights(scene.lights)


def render_image_mega_f32(scene: Scene, config: RenderConfig,
                          tile0=None, tiles: int | None = None):
    """Whole-frame megakernel render -> (H, W, 3) f32.

    With ``tile0``/``tiles`` set, renders only the 1024-ray tiles
    [tile0, tile0+tiles) and returns (tiles*1024, 3) colors in row-major ray
    order — the per-chip body of the px-sharded fused path (``tile0`` may be
    traced, e.g. ``axis_index('px') * tiles`` inside shard_map)."""
    W, H = config.width, config.height
    R = W * H
    whole = tiles is None
    grid_n = _cdiv(R, 1024) if whole else tiles
    rows_pad = grid_n * 8
    cam, sph, pln, tri, li = _mega_pack(scene, config)
    if not whole:
        cam = cam.at[0, 14].set(jnp.asarray(tile0, jnp.float32))
    S, P, T, L = sph.shape[0], pln.shape[0], tri.shape[0], li.shape[0]
    interpret = _interpret or jax.default_backend() == "cpu"

    kernel = functools.partial(_mega_kernel, config, S, P, T, L, W, H)
    smem = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kernel,
        grid=(grid_n,),
        in_specs=[
            smem((1, 16)),
            smem((max(S, 1), 11)),
            smem((max(P, 1), 11)),
            smem((max(T, 1), 20)),
            smem((max(L, 1), 8)),
        ],
        out_specs=pl.BlockSpec((3, 8, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, rows_pad, 128), jnp.float32),
        interpret=interpret,
    )(
        cam,
        sph if S else jnp.zeros((1, 11), jnp.float32),
        pln if P else jnp.zeros((1, 11), jnp.float32),
        tri if T else jnp.zeros((1, 20), jnp.float32),
        li if L else jnp.zeros((1, 8), jnp.float32),
    )
    colors = jnp.moveaxis(out.reshape(3, rows_pad * 128), 0, 1)
    if whole:
        return colors[:R].reshape(H, W, 3)
    return colors  # (tiles*1024, 3), rays [tile0*1024, (tile0+tiles)*1024)


# ---------------------------------------------------------------------------
# Megakernel v2: the megakernel's (8,128)-ray scalar-broadcast layout scaled
# to big meshes.  Triangles live in SMEM and are iterated with a fori_loop
# over a per-tile WORKLIST of 16-triangle cull groups, so per-ray math always
# runs on single full (8,128) registers (the (RT, CT) fold layout pays 64
# registers for every per-ray column op) and a culled group costs nothing.
# Scenes larger than the ~128 KB SMEM budget run a CHAIN of launches that
# carries the closest-hit / occlusion accumulators through aliased outputs.
#
# Replaces the reference's recursive BVH traversal (source/Utils.h:246-288)
# at equal capability: log-time via data-parallel conservative culling
# instead of per-ray pointer chasing.
# ---------------------------------------------------------------------------

MEGA2_G = 8  #: triangles per cull group (worklist granularity; swept 4/8/16 on v5e — 8 wins)
MEGA2_EARLY_EXIT_K = 0  #: shadow all-occluded exit checked every K groups.
#   DEFAULT OFF — measured a LOSS at every amortization K (probe_earlyexit:
#   0.97/0.93/0.85x at K=4/8/16 on bunny, 0.88/0.88/0.84x on optional): the
#   while_loop's scalar cond still serializes Mosaic's iteration pipeline,
#   as round 2 found for the per-iteration variant.  Kept for re-testing on
#   future Mosaic versions.
MEGA2_MAX_SMEM_TRIS = 1200  #: per-launch SMEM triangle budget (~94 KB of 128)
MEGA2_FORCE_DENSE = False  #: probe hook (trace-time): fill the cull
#   worklists so every tile folds every group — the known-fold-count
#   calibration point of the roofline fit (probes/probe_roofline.py), with
#   the kernel structure unchanged; never set in production
MEGA2_MAX_LAUNCHES = 8  #: chain cap -> mega2 serves up to 9600 triangles
MEGA2_MAX_LIGHTS = 8
MEGA2_MAX_UNROLL = 16  #: sphere/plane python-unroll budget per kernel


def _mega2_raygen(cam_ref, i, W, H, tiled):
    """Per-tile camera rays as (8,128) registers.  ``tiled``: the tile is a
    compact 32x32 pixel block (tight direction cone -> effective culling);
    otherwise 1024 row-major-consecutive pixels.  Same fp op order as
    generate_rays (reference: source/Renderer.cpp:104-114).

    cam col 14 is a global tile offset (0 for whole-frame renders): a
    px-sharded chip runs the same kernel over its contiguous tile range."""
    i = i + cam_ref[0, 14].astype(jnp.int32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    if tiled:
        TX = W // 32
        tx = jax.lax.rem(i, TX)
        ty = jax.lax.div(i, TX)
        pxi = tx * 32 + jax.lax.rem(lane, 32)
        pyi = ty * 32 + sub * 4 + jax.lax.div(lane, 32)
    else:
        rid = (i * 8 + sub) * 128 + lane
        pxi = jax.lax.rem(rid, W)
        pyi = jax.lax.div(rid, W)
    fov = cam_ref[0, 12]
    aspect = cam_ref[0, 13]
    ux = (pxi.astype(jnp.float32) + 0.5) / W
    uy = (pyi.astype(jnp.float32) + 0.5) / H
    cx = (2.0 * ux - 1.0) * aspect * fov
    cy = (1.0 - 2.0 * uy) * fov
    rox, roy, roz = cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2]
    dx = cx * cam_ref[0, 3] + cy * cam_ref[0, 6] + cam_ref[0, 9]
    dy = cx * cam_ref[0, 4] + cy * cam_ref[0, 7] + cam_ref[0, 10]
    dz = cx * cam_ref[0, 5] + cy * cam_ref[0, 8] + cam_ref[0, 11]
    d_len = jnp.sqrt(_msqnorm(dx, dy, dz))
    return rox, roy, roz, dx / d_len, dy / d_len, dz / d_len


def _make_mega2_closest_kernel(config, S, P, Tl, ngl, W, H, tiled, first, culled,
                               last=False):
    """One launch of the closest-hit chain over its SMEM triangle subset.
    ``first`` also folds spheres/planes and initializes the accumulators;
    later launches continue from the aliased accumulator inputs.  The
    ``last`` launch additionally emits the per-tile AABB of offset hit
    points, from which the shadow cull is built in O(tiles) XLA
    (accel.light_shadow_cull_from_aabb)."""
    tmin = float(config.ray_min)

    def kernel(cam_ref, sph_ref, pl_ref, tri_ref, wl_ref, cnt_ref, *refs):
        i = pl.program_id(0)
        cnt = cnt_ref[0, 0, 0]  # bind SMEM scalars outside any control flow
        rox, roy, roz, rdx, rdy, rdz = _mega2_raygen(cam_ref, i, W, H, tiled)
        out_refs = refs[0 if first else 11 :]
        if last:
            bb_ref = out_refs[-1]
            out_refs = out_refs[:-1]

        if first:
            t = jnp.full((8, 128), INF, jnp.float32)
            nx = jnp.zeros((8, 128), jnp.float32)
            ny, nz, mk, mr, mg, mb, m0, m1, m2 = (jnp.zeros_like(nx) for _ in range(9))
        else:
            t, nx, ny, nz, mk, mr, mg, mb, m0, m1, m2 = (r[:] for r in refs[:11])

        def upd(sel, tc, nc3, mat, acc):
            t, nx, ny, nz, mk, mr, mg, mb, m0, m1, m2 = acc
            t = jnp.where(sel, tc, t)
            nx = jnp.where(sel, nc3[0], nx)
            ny = jnp.where(sel, nc3[1], ny)
            nz = jnp.where(sel, nc3[2], nz)
            mk = jnp.where(sel, mat[0], mk)
            mr = jnp.where(sel, mat[1], mr)
            mg = jnp.where(sel, mat[2], mg)
            mb = jnp.where(sel, mat[3], mb)
            m0 = jnp.where(sel, mat[4], m0)
            m1 = jnp.where(sel, mat[5], m1)
            m2 = jnp.where(sel, mat[6], m2)
            return t, nx, ny, nz, mk, mr, mg, mb, m0, m1, m2

        acc = (t, nx, ny, nz, mk, mr, mg, mb, m0, m1, m2)
        if first:
            for s in range(S):
                tc = _sphere_t_reg(sph_ref, s, rox, roy, roz, rdx, rdy, rdz, tmin, INF)
                # candidate normal normalized up front (same value as the
                # reference's post-hit normalize, source/Scene.cpp:40)
                px_ = rox + tc * rdx
                py_ = roy + tc * rdy
                pz_ = roz + tc * rdz
                cnx = px_ - sph_ref[s, 0]
                cny = py_ - sph_ref[s, 1]
                cnz = pz_ - sph_ref[s, 2]
                n_len = jnp.sqrt(jnp.maximum(_msqnorm(cnx, cny, cnz), 1e-20))
                acc = upd(tc < acc[0], tc, (cnx / n_len, cny / n_len, cnz / n_len),
                          _mat_of(sph_ref, s, 4), acc)
            for p in range(P):
                tc = _plane_t_reg(pl_ref, p, rox, roy, roz, rdx, rdy, rdz, tmin, INF)
                acc = upd(tc < acc[0], tc, (pl_ref[p, 0], pl_ref[p, 1], pl_ref[p, 2]),
                          _mat_of(pl_ref, p, 4), acc)

        if Tl:
            def fold_group(base, acc):
                for kk in range(MEGA2_G):
                    k = base + kk
                    tc = _tri_t_reg(tri_ref, k, rox, roy, roz, rdx, rdy, rdz,
                                    tmin, INF, shadow=False)
                    acc = upd(tc < acc[0], tc,
                              (tri_ref[k, 9], tri_ref[k, 10], tri_ref[k, 11]),
                              _mat_of(tri_ref, k, 13), acc)
                return acc

            if culled:
                def body(j, acc):
                    g = wl_ref[0, 0, j]
                    return fold_group(g * MEGA2_G, acc)

                acc = jax.lax.fori_loop(0, cnt, body, acc)
            else:
                for g in range(ngl):
                    acc = fold_group(g * MEGA2_G, acc)

        for ref, reg in zip(out_refs, acc):
            ref[:] = reg
        if last:
            _emit_hit_bounds(bb_ref, config, acc, rox, roy, roz, rdx, rdy, rdz)

    return kernel


def _emit_hit_bounds(bb_ref, config, acc, rox, roy, roz, rdx, rdy, rdz):
    """Write the tile's AABB of offset hit points to a (1, 8) SMEM block:
    [min xyz, max xyz, 0, 0].  Miss lanes excluded; an all-miss tile emits
    an empty (+inf/-inf) box, which culls every group."""
    t, nx, ny, nz = acc[0], acc[1], acc[2], acc[3]
    hit = t < INF
    ts = jnp.where(hit, t, 0.0)
    off = float(config.normal_offset)
    ox_ = rox + ts * rdx + nx * off
    oy_ = roy + ts * rdy + ny * off
    oz_ = roz + ts * rdz + nz * off
    for c, v in enumerate((ox_, oy_, oz_)):
        bb_ref[0, 0, c] = jnp.min(jnp.where(hit, v, INF))
        bb_ref[0, 0, 3 + c] = jnp.max(jnp.where(hit, v, -INF))
    bb_ref[0, 0, 6] = 0.0
    bb_ref[0, 0, 7] = 0.0


def _make_mega2_shadow_kernel(config, S, P, Tl, ngl, L, W, H, tiled, first, last, culled):
    """One launch of the shadow/shade chain: folds this subset's occlusion
    per light; the LAST launch also shades and tone-maps (the whole
    RenderPixel tail, reference: source/Renderer.cpp:120-182, in-kernel)."""
    tmin = float(config.ray_min)
    shadows = bool(config.shadows)
    mode_name = config.lighting_mode.name

    def kernel(*refs):
        cam_ref, sph_ref, pl_ref, tri_ref, li_ref, wl_ref, cnt_ref = refs[:7]
        pos = 7
        t_ref, nx_ref, ny_ref, nz_ref = refs[pos : pos + 4]
        pos += 4
        if last:
            mat_refs = refs[pos : pos + 7]
            pos += 7
        occ_in = None
        if shadows and not first:
            occ_in = refs[pos : pos + L]
            pos += L
        out_refs = refs[pos:]

        i = pl.program_id(0)
        cnts = [cnt_ref[0, 0, li] for li in range(L)] if (shadows and Tl) else []
        rox, roy, roz, rdx, rdy, rdz = _mega2_raygen(cam_ref, i, W, H, tiled)
        t = t_ref[:]
        nx, ny, nz = nx_ref[:], ny_ref[:], nz_ref[:]
        hit = t < INF
        ts = jnp.where(hit, t, 0.0)
        px_ = rox + ts * rdx
        py_ = roy + ts * rdy
        pz_ = roz + ts * rdz
        off = float(config.normal_offset)
        ox_ = px_ + nx * off
        oy_ = py_ + ny * off
        oz_ = pz_ + nz * off
        if last:
            mk, mr, mg, mb, m0, m1, m2 = (r[:] for r in mat_refs)
            vx, vy, vz = -rdx, -rdy, -rdz
            cr = jnp.zeros((8, 128), jnp.float32)
            cg = jnp.zeros_like(cr)
            cb = jnp.zeros_like(cr)
            sf = jnp.ones_like(cr)

        for li in range(L):
            lpx, lpy, lpz = li_ref[li, 0], li_ref[li, 1], li_ref[li, 2]
            lint = li_ref[li, 6]
            is_point = li_ref[li, 7] == 0.0
            ldx = lpx - ox_
            ldy = lpy - oy_
            ldz = lpz - oz_
            mag_pt = jnp.sqrt(_msqnorm(ldx, ldy, ldz))
            lx = jnp.where(is_point, ldx / mag_pt, -lpx)
            ly = jnp.where(is_point, ldy / mag_pt, -lpy)
            lz = jnp.where(is_point, ldz / mag_pt, -lpz)
            mag = jnp.where(is_point, mag_pt, 3.4028235e38)

            if shadows:
                # miss lanes start occluded: their shading is masked by `hit`
                # anyway, and it lets the all-occluded early exit fire
                occf = jnp.where(hit, 0.0, 1.0) if first else occ_in[li][:]
                if first:
                    for s in range(S):
                        tc = _sphere_t_reg(sph_ref, s, ox_, oy_, oz_, lx, ly, lz, tmin, mag)
                        occf = jnp.where(tc < INF, 1.0, occf)
                    for p in range(P):
                        tc = _plane_t_reg(pl_ref, p, ox_, oy_, oz_, lx, ly, lz, tmin, mag)
                        occf = jnp.where(tc < INF, 1.0, occf)
                if Tl:
                    def fold_group(base, occf, lx=lx, ly=ly, lz=lz, mag=mag):
                        for kk in range(MEGA2_G):
                            tc = _tri_t_reg(tri_ref, base + kk, ox_, oy_, oz_,
                                            lx, ly, lz, tmin, mag, shadow=True)
                            occf = jnp.where(tc < INF, 1.0, occf)
                        return occf

                    if culled and MEGA2_EARLY_EXIT_K:
                        # all-occluded early exit, AMORTIZED: round 2 found a
                        # per-iteration reduce 8-24% slower (it serializes the
                        # loop), so the while cond reduces occf only once per
                        # K-group chunk.  Entries past the count clamp to the
                        # worklist tail — folding a duplicate or non-passing
                        # group cannot change occlusion (cull=0 guarantees no
                        # segment hit), so no inner masking is needed.
                        K = MEGA2_EARLY_EXIT_K

                        def chunk(state, li=li, fold_group=fold_group):
                            j, occf = state

                            def inner(k, occf, li=li, fold_group=fold_group):
                                g = wl_ref[0, li, jnp.minimum(j + k, ngl - 1)]
                                return fold_group(g * MEGA2_G, occf)

                            return j + K, jax.lax.fori_loop(0, K, inner, occf)

                        def not_done(state, li=li):
                            j, occf = state
                            return (j < cnts[li]) & (jnp.min(occf) < 0.5)

                        _, occf = jax.lax.while_loop(
                            not_done, chunk, (jnp.int32(0), occf))
                    elif culled:
                        def body(j, occf, li=li, fold_group=fold_group):
                            g = wl_ref[0, li, j]
                            return fold_group(g * MEGA2_G, occf)

                        occf = jax.lax.fori_loop(0, cnts[li], body, occf)
                    else:
                        for g in range(ngl):
                            occf = fold_group(g * MEGA2_G, occf)
                if not last:
                    out_refs[li][:] = occf
                else:
                    lit = jnp.logical_not((occf > 0.5) & hit)
                    sf = sf * jnp.where(lit, 1.0, float(config.shadow_dim))
            else:
                lit = jnp.ones((8, 128), jnp.bool_)

            if last:
                wr, wg, wb = _shade_one_light(
                    mode_name, is_point,
                    (lpx, lpy, lpz), (li_ref[li, 3], li_ref[li, 4], li_ref[li, 5]), lint,
                    (px_, py_, pz_), (nx, ny, nz), (lx, ly, lz), (vx, vy, vz),
                    (mk, mr, mg, mb, m0, m1, m2),
                )
                cr = cr + jnp.where(lit, wr, 0.0)
                cg = cg + jnp.where(lit, wg, 0.0)
                cb = cb + jnp.where(lit, wb, 0.0)

        if last:
            cr = jnp.where(hit, cr * sf, 0.0)
            cg = jnp.where(hit, cg * sf, 0.0)
            cb = jnp.where(hit, cb * sf, 0.0)
            cr, cg, cb = _tonemap_rgb(cr, cg, cb)
            out_refs[0][0, :, :] = cr
            out_refs[0][1, :, :] = cg
            out_refs[0][2, :, :] = cb

    return kernel


def _mega2_fold(x, h, w):
    """Row-major (H*W, C) -> mega2 tile order: 32x32 pixel blocks, each laid
    out as (sublane, lane) = (py//4, (py%4)*32+px) within the tile."""
    c = x.shape[-1]
    return (
        x.reshape(h // 32, 8, 4, w // 32, 32, c)
        .transpose(0, 3, 1, 2, 4, 5)
        .reshape(-1, c)
    )


def _mega2_unfold_rows(x, h, w):
    """Inverse of ``_mega2_fold`` for row-major (H*W, C) arrays (pure
    reshape/transpose — no gather)."""
    c = x.shape[-1]
    return (
        x.reshape(h // 32, w // 32, 8, 4, 32, c)
        .transpose(0, 2, 3, 1, 4, 5)
        .reshape(h * w, c)
    )


def _mega2_unfold_colors(cols3, h, w, tiled, R):
    """(3, rows_pad, 128) kernel output -> (H, W, 3) image."""
    if tiled:
        TY, TX = h // 32, w // 32
        x = cols3[:, : TY * TX * 8, :]
        x = x.reshape(3, TY, TX, 8, 4, 32).transpose(0, 1, 3, 4, 2, 5).reshape(3, h, w)
        return jnp.moveaxis(x, 0, -1)
    flat = cols3.reshape(3, -1)[:, :R]
    return jnp.moveaxis(flat.reshape(3, h, w), 0, -1)


def render_image_mega2_f32(scene: Scene, config: RenderConfig,
                           tile0=None, tiles: int | None = None):
    """Whole-frame mega2 render -> (H, W, 3) f32.

    Two Pallas launch chains (closest-hit, then shadow+shade) with all
    per-ray math on (8,128) registers; XLA in between only builds the
    per-(tile, light) cull worklists from the closest-hit depths.

    With ``tile0``/``tiles`` set, renders only the 1024-ray tiles
    [tile0, tile0+tiles) and returns (tiles*1024, 3) colors in mega2 FEED
    order (tile-major; 32x32 pixel blocks when W,H are 32-divisible) — the
    per-chip body of the px-sharded fused path."""
    from raytpu.ops import accel, shading as _shading

    W, H = config.width, config.height
    R = W * H
    L = scene.lights.count
    tmin = float(config.ray_min)
    tiled = (W % 32 == 0) and (H % 32 == 0)
    whole = tiles is None
    nt_frame = _cdiv(R, 1024)
    nt = nt_frame if whole else tiles
    rows_pad = nt * 8
    interpret = _interpret or jax.default_backend() == "cpu"

    cam, sph, pln, tri_blob, li = _mega_pack(scene, config)
    if not whole:
        cam = cam.at[0, 14].set(jnp.asarray(tile0, jnp.float32))
    S, P, T = sph.shape[0], pln.shape[0], tri_blob.shape[0]
    tri_blob = _pad_axis(tri_blob, 0, MEGA2_G, 0.0)  # degenerate pad tris miss
    ng = tri_blob.shape[0] // MEGA2_G
    gpl = max(1, MEGA2_MAX_SMEM_TRIS // MEGA2_G)  # groups per launch
    NL = max(1, _cdiv(ng, gpl))
    ranges = [(k * gpl, min((k + 1) * gpl, ng)) for k in range(NL)]
    culled = T >= 2 * MEGA2_G

    smem = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM)
    # per-TILE SMEM rows (worklists/counts) advance with the grid index
    smem_t = lambda shape: pl.BlockSpec(shape, lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    vtile = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    acc_shape = jax.ShapeDtypeStruct((rows_pad, 128), jnp.float32)
    sph_in = sph if S else jnp.zeros((1, 11), jnp.float32)
    pln_in = pln if P else jnp.zeros((1, 11), jnp.float32)
    li_in = li if L else jnp.zeros((1, 8), jnp.float32)

    # ---- XLA: primary-ray cull worklists (per launch subset) ----
    # per-tile ray bounds come analytically from the camera — O(tiles), no
    # O(rays) direction arrays (probes/probe_wlxla.py: that was ~1.5 ms/frame)
    if culled:
        glo, ghi = accel.chunk_bounds(scene.triangles, MEGA2_G)  # (ng, 3) x2
        rb = accel.camera_tile_bounds(scene.camera, W, H, tiled, tile=1024)
        cullm = accel.cull_matrix(rb, glo, ghi, tmin)  # (nt_frame, ng)
        if MEGA2_FORCE_DENSE:  # probe hook: full worklists, same kernel shape
            cullm = jnp.ones_like(cullm)
        if not whole:
            # this chip's tile rows; rows past the frame (px-padding tiles)
            # are all-False -> zero worklist entries for garbage tiles.
            # (dynamic_slice clamps an out-of-range start, which can only
            # happen for an all-garbage chip — misaligned worklists there
            # waste folds on rays that are dropped anyway, never wrong pixels)
            cullm = jax.lax.dynamic_slice_in_dim(
                jnp.pad(cullm, ((0, nt), (0, 0))), tile0, nt, 0)

    def worklists(cull_sub):
        wl, cnt = chunk_worklist(cull_sub)
        return wl, cnt

    # ---- closest-hit chain ----
    accs = None
    bounds = None
    for k, (ga, gb) in enumerate(ranges):
        ngl = gb - ga
        Tl = ngl * MEGA2_G
        tri_k = tri_blob[ga * MEGA2_G : gb * MEGA2_G]
        if culled:
            wl_k, cnt_k = worklists(cullm[:, ga:gb])
        else:
            wl_k = jnp.zeros((nt, max(ngl, 1)), jnp.int32)
            cnt_k = jnp.full((nt, 1), ngl, jnp.int32)
        first = k == 0
        last = k == len(ranges) - 1
        kern = _make_mega2_closest_kernel(
            config, S if first else 0, P if first else 0, Tl, ngl, W, H, tiled,
            first, culled, last=last,
        )
        in_specs = [
            smem((1, 16)), smem((max(S, 1), 11)), smem((max(P, 1), 11)),
            smem((max(Tl, 1), 20)), smem_t((1, 1, max(ngl, 1))), smem_t((1, 1, 1)),
        ]
        ins = [
            cam, sph_in, pln_in,
            tri_k if Tl else jnp.zeros((1, 20), jnp.float32),
            wl_k[:, None, :], cnt_k[:, :, None],
        ]
        aliases = {}
        if not first:
            in_specs += [vtile] * 11
            ins += list(accs)
            aliases = {6 + j: j for j in range(11)}
        out_specs = [vtile] * 11
        out_shape = [acc_shape] * 11
        if last:
            out_specs.append(pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                                          memory_space=pltpu.SMEM))
            out_shape.append(jax.ShapeDtypeStruct((nt, 1, 8), jnp.float32))
        outs = pl.pallas_call(
            kern,
            grid=(nt,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases=aliases,
            interpret=interpret,
        )(*ins)
        if last:
            accs, bounds = outs[:11], outs[11]
        else:
            accs = outs

    t_acc, nx_a, ny_a, nz_a = accs[0], accs[1], accs[2], accs[3]

    if L == 0:
        return (jnp.zeros((H, W, 3), jnp.float32) if whole
                else jnp.zeros((nt * 1024, 3), jnp.float32))  # no lights -> black (W1)

    # ---- XLA: shadow-ray cull worklists from the kernel-emitted tile
    # AABBs of offset hit points — O(tiles), no per-ray shadow arrays ----
    sh_wl = sh_cnt = None
    if culled and config.shadows:
        bb_lo, bb_hi = bounds[:, 0, 0:3], bounds[:, 0, 3:6]
        wls = []
        for li_i in range(L):
            is_pt = scene.lights.kind[li_i] == LightKind.POINT
            wls.append(accel.light_shadow_cull_from_aabb(
                bb_lo, bb_hi, scene.lights.position[li_i],
                scene.lights.direction[li_i], is_pt, glo, ghi, tmin))
        sh_cull = jnp.stack(wls, axis=1)  # (nt, L, ng)
        if MEGA2_FORCE_DENSE:  # probe hook (see MEGA2_FORCE_DENSE)
            sh_cull = jnp.ones_like(sh_cull)

    # ---- shadow + shade chain ----
    sh_ranges = ranges if (config.shadows and T) else [ranges[-1]]
    occs = None
    colors = None
    for idx, (ga, gb) in enumerate(sh_ranges):
        ngl = gb - ga
        Tl = ngl * MEGA2_G if (config.shadows and T) else 0
        tri_k = tri_blob[ga * MEGA2_G : gb * MEGA2_G]
        first = idx == 0
        last = idx == len(sh_ranges) - 1
        if culled and config.shadows:
            wl3, cnt2 = [], []
            for li_i in range(L):
                w_, c_ = chunk_worklist(sh_cull[:, li_i, ga:gb])
                wl3.append(w_)
                cnt2.append(c_)
            wl_k = jnp.stack(wl3, axis=1)  # (nt, L, ngl)
            cnt_k = jnp.concatenate(cnt2, axis=1)  # (nt, L)
        else:
            wl_k = jnp.zeros((nt, max(L, 1), max(ngl, 1)), jnp.int32)
            cnt_k = jnp.full((nt, max(L, 1)), ngl, jnp.int32)
        kern = _make_mega2_shadow_kernel(
            config, S if first else 0, P if first else 0, Tl, ngl, L, W, H,
            tiled, first, last, culled,
        )
        in_specs = [
            smem((1, 16)), smem((max(S, 1), 11)), smem((max(P, 1), 11)),
            smem((max(Tl, 1), 20)), smem((max(L, 1), 8)),
            smem_t((1, max(L, 1), max(ngl, 1))), smem_t((1, 1, max(L, 1))),
            vtile, vtile, vtile, vtile,
        ]
        ins = [
            cam, sph_in, pln_in,
            tri_k if Tl else jnp.zeros((1, 20), jnp.float32),
            li_in, wl_k, cnt_k[:, None, :],
            t_acc, nx_a, ny_a, nz_a,
        ]
        aliases = {}
        if last:
            in_specs += [vtile] * 7
            ins += list(accs[4:])
        if config.shadows and not first:
            base = len(ins)
            in_specs += [vtile] * L
            ins += list(occs)
            if not last:
                aliases = {base + j: j for j in range(L)}
        if last:
            out_specs = pl.BlockSpec((3, 8, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((3, rows_pad, 128), jnp.float32)
        else:
            out_specs = [vtile] * L
            out_shape = [acc_shape] * L
        res = pl.pallas_call(
            kern,
            grid=(nt,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases=aliases,
            interpret=interpret,
        )(*ins)
        if last:
            colors = res
        else:
            occs = res

    if whole:
        return _mega2_unfold_colors(colors, H, W, tiled, R)
    # feed-order rows for this chip's tiles; the sharded caller concatenates
    # all chips' rows and un-permutes the full frame
    return jnp.moveaxis(colors.reshape(3, rows_pad * 128), 0, 1)


# ---------------------------------------------------------------------------
# Megakernel v3: DMA-streamed triangle worklists (arbitrary mesh size)
# ---------------------------------------------------------------------------
#
# mega2's SMEM-resident triangle blob caps one launch at MEGA2_MAX_SMEM_TRIS
# and forces a LAUNCH CHAIN above it (round-2 optional: 3 closest + 3 shadow
# launches, each paying raygen + 11 accumulator HBM round-trips + pipeline
# drain).  mega3 collapses each chain to ONE launch: the triangle blob lives
# outside SMEM (pl.ANY -> VMEM/HBM) packed as (ng, 256) rows — one 8-triangle
# cull group per row — and the per-tile worklist drives double-buffered
# async DMAs of (8, 256) SUPER-GROUP row-blocks (8 groups / 64 triangles,
# Mosaic's minimum tiled slice) into an SMEM ring.  Folds stay at mega2's
# measured-best G=8 granularity: each packed worklist entry is si*8+gr
# (super-group's rank among this tile's passing super-groups, group row
# within it), the first entry of an sg waits its DMA, the last issues the
# ring's next prefetch.  The reference analog is the arbitrary-N BVH walk
# (source/Utils.h:246-288, builder DataTypes.h:294-308) — same O(log N)
# economics, no SMEM ceiling, no chain.

MEGA3_RING = 8  #: SMEM DMA ring depth (slots of (8, 256) f32 = 8 KB each)
MEGA3_RING_COARSE = 4  #: shallower ring in coarse mode (fewer, bigger folds)
MEGA3_FINE_MAX_G = 4096  #: per-GROUP (fine) worklists up to this many
#   groups.  NOT an SMEM bound: a fine closest pass at 9.3k groups compiled
#   and ran but measured 122 vs coarse's 68 ms on bunny50k (round 4) — the
#   per-entry fori control (SMEM read + bit tests + pl.when) beats the
#   folds saved by 8x-finer culling at that scale
MEGA3_WL_SMEM_ENTRIES = 8192  #: per-tile worklist budget in int32 entries
#   PER ARRAY; each pass allocates two arrays (DMA-issue + packed-entry), so
#   the true SMEM footprint is up to 2x this (64 KB total).  Fine mode needs
#   L*(ng + nsg) entries total; coarse 2*L*nsg; past that COARSE2 lifts
#   entries to super-super-groups (8 sgs = 512 triangles), keeping O(T/512)
MEGA3_MAX_TRIS = 1048576  #: coarse2 ceiling (nssg = 2048 per light at 1M)


def pack_triangles_sg(tri_blob):
    """(T, 20) triangle blob -> (ng, 256) DMA rows: row g = cull group g
    (MEGA2_G=8 triangles x 20 cols each, 160 used of 256 lanes); 8
    consecutive rows = one (8, 256) DMA super-group.  Padded triangles are
    degenerate (all-zero -> every test misses)."""
    # pad to 512 triangles (a full super-super-group) so every DMA any
    # streaming mode can issue — including coarse2's unconditional 8-sg
    # expansion — stays inside the blob
    tb = _pad_axis(tri_blob, 0, 8 * 8 * MEGA2_G, 0.0)
    ng = tb.shape[0] // MEGA2_G
    rows = tb.reshape(ng, MEGA2_G * 20)
    return jnp.pad(rows, ((0, 0), (0, 256 - MEGA2_G * 20)))


def mega3_mode(ng: int, n_lights: int) -> str:
    """Streaming worklist mode for ``ng`` cull groups x ``n_lights``
    worklists sharing the per-tile SMEM budget.  Fine caps at
    MEGA3_FINE_MAX_G groups (past it the per-entry fori control costs more
    than the folds finer culling saves — measured, PERF.md round 4) AND at
    the SMEM-entry budget, which a many-light pass exhausts sooner."""
    L = max(n_lights, 1)
    # budget enforced PER worklist array (ADVICE r4): fine mode allocates a
    # (1, L, ng) g_wl block AND a (1, L, nsg) sg_wl block — a pooled 2x bound
    # admitted L=3, ng=4096 (48 KB g_wl) which only fails at real-TPU
    # lowering.  g_wl (L*ng entries) is the binding array; sg_wl is 8x
    # smaller, so its own bound is implied.
    if ng <= MEGA3_FINE_MAX_G and L * ng <= MEGA3_WL_SMEM_ENTRIES:
        return "fine"
    if L * (ng // 8) <= MEGA3_WL_SMEM_ENTRIES:
        return "coarse"
    return "coarse2"


def mega3_worklists(cull, mode=None):
    """(nt, ng) cull matrix -> streaming worklists with ALL per-entry scalar
    control precomputed in XLA (the kernel's inner loop pays one SMEM read +
    a few bit tests per entry).

    Returns ``(sg_wl (nt, nsg), g_wl (nt, ng), counts (nt, 2))``:
    ``sg_wl`` = passing super-group ids ascending (prologue DMA issues);
    ``g_wl`` = per passing group ascending, packed as
        bits [0:3]  gr     — group row within its (8, 256) super-group block
        bits [3:6]  slot   — ring slot (sg rank % MEGA3_RING)
        bit  [6]    wait   — first entry of its super-group: wait the DMA
        bit  [7]    issue  — last entry: prefetch super-group rank+RING
        bits [8:]   sg     — super-group id to prefetch (when issue is set)
    ``counts`` = [sg_cnt, g_cnt].  Entries past the counts are never read.

    In ``coarse2`` mode the first return is instead the SUPER-super-group
    worklist (nt, nssg) — passing ssg ids ascending, one entry per 512
    triangles, all control derived in-kernel (``_mega3_stream_ssg``) — and
    ``g_wl`` is a (nt, 1) dummy; counts = [ssg_cnt, ssg_cnt]."""
    nt, ng = cull.shape
    nsg = ng // 8
    if mode is None:
        mode = "coarse" if ng > MEGA3_FINE_MAX_G else "fine"
    if mode == "coarse2":
        nssg = nsg // 8
        ssgp = cull.reshape(nt, nssg, 64).max(axis=2)
        ssg_wl, ssg_cnt = chunk_worklist(ssgp)
        return ssg_wl, jnp.zeros((nt, 1), jnp.int32), \
            jnp.concatenate([ssg_cnt, ssg_cnt], axis=1)
    coarse = mode == "coarse"
    D = MEGA3_RING_COARSE if coarse else MEGA3_RING
    sgp = cull.reshape(nt, nsg, 8).max(axis=2)
    sg_wl, sg_cnt = chunk_worklist(sgp)
    if coarse:
        # one entry per passing super-group (folded whole): entry q IS
        # super-group rank q, so every entry waits and prefetches rank q+D
        q = jax.lax.broadcasted_iota(jnp.int32, sg_wl.shape, 1)
        issue = (q + D) < sg_cnt
        issue_sg = jnp.take_along_axis(
            sg_wl, jnp.clip(q + D, 0, nsg - 1), axis=1)
        packed = (
            (q % D) << 3
            | 1 << 6
            | issue.astype(jnp.int32) << 7
            | jnp.where(issue, issue_sg, 0) << 8
        )
        return sg_wl, packed, jnp.concatenate([sg_cnt, sg_cnt], axis=1)
    g_wl, g_cnt = chunk_worklist(cull)
    rank = (jnp.cumsum(sgp > 0.0, axis=1) - 1).astype(jnp.int32)
    si = jnp.take_along_axis(rank, jnp.clip(g_wl // 8, 0, nsg - 1), axis=1)

    q = jax.lax.broadcasted_iota(jnp.int32, si.shape, 1)
    prev_si = jnp.roll(si, 1, axis=1)
    next_si = jnp.roll(si, -1, axis=1)
    wait = (q == 0) | (prev_si < si)
    issue = ((q == g_cnt - 1) | (next_si > si)) & (si + D < sg_cnt)
    issue_sg = jnp.take_along_axis(
        sg_wl, jnp.clip(si + D, 0, nsg - 1), axis=1)
    packed = (
        g_wl % 8
        | (si % D) << 3
        | wait.astype(jnp.int32) << 6
        | issue.astype(jnp.int32) << 7
        | jnp.where(issue, issue_sg, 0) << 8
    )
    return sg_wl, packed, jnp.concatenate([sg_cnt, g_cnt], axis=1)


def _mega3_stream(blob_ref, scratch, sems, sgwl, gwl, sg_cnt, g_cnt,
                  fold_entry, acc):
    """Fold every packed worklist entry, streaming super-group row-blocks
    through the SMEM ring.  ``sgwl(k)`` -> super-group id (prologue);
    ``gwl(q)`` -> packed entry (see mega3_worklists); ``fold_entry(slot, gr,
    acc) -> acc`` does the vector work.  DMA waits/issues ride pl.when (side
    effects only — the fold itself is unconditional so accumulators stay in
    registers)."""
    D = scratch.shape[0]

    def copy(sg, slot):
        return pltpu.make_async_copy(
            blob_ref.at[pl.ds(sg * 8, 8), :], scratch.at[slot], sems.at[slot]
        )

    def prologue(k, c):
        copy(sgwl(k), jax.lax.rem(k, D)).start()
        return c

    jax.lax.fori_loop(0, jnp.minimum(sg_cnt, D), prologue, 0)

    def body(q, acc):
        e = gwl(q)
        gr = e & 7
        slot = (e >> 3) & 7

        @pl.when((e & 64) != 0)
        def _():  # first entry of this super-group: its DMA must have landed
            copy(0, slot).wait()

        acc = fold_entry(slot, gr, acc)

        @pl.when((e & 128) != 0)
        def _():  # last entry of this super-group: its ring slot is free
            copy(e >> 8, slot).start()

        return acc

    return jax.lax.fori_loop(0, g_cnt, body, acc)


def _mega3_stream_ssg(blob_ref, scratch, sems, ssgwl, ssg_cnt, fold_entry, acc):
    """Coarse2 streaming: worklist entries are SUPER-super-groups (8 sgs =
    512 triangles); all 8 sgs of a passing ssg are DMA'd and folded
    unconditionally.  Control needs no packed bits — for global sg rank
    ``r``: sg id = ssgwl(r//8)*8 + r%8, ring slot = r % D."""
    D = scratch.shape[0]
    total = ssg_cnt * 8

    def sg_of(r):
        return ssgwl(r // 8) * 8 + jax.lax.rem(r, 8)

    def copy(sg, slot):
        return pltpu.make_async_copy(
            blob_ref.at[pl.ds(sg * 8, 8), :], scratch.at[slot], sems.at[slot]
        )

    def prologue(k, c):
        copy(sg_of(k), jax.lax.rem(k, D)).start()
        return c

    jax.lax.fori_loop(0, jnp.minimum(total, D), prologue, 0)

    def body(r, acc):
        slot = jax.lax.rem(r, D)
        copy(0, slot).wait()
        acc = fold_entry(slot, 0, acc)  # coarse fold: all 8 group rows

        @pl.when(r + D < total)
        def _():
            copy(sg_of(r + D), slot).start()

        return acc

    return jax.lax.fori_loop(0, total, body, acc)


def _mega3_dispatch(mode, blob_ref, scratch, sems, sgwl, gwl, sg_cnt, g_cnt,
                    fold_entry, acc):
    """Route one worklist stream by mode (fine/coarse share the packed-entry
    streamer; coarse2 derives control in-kernel)."""
    if mode == "coarse2":
        return _mega3_stream_ssg(blob_ref, scratch, sems, sgwl, sg_cnt,
                                 fold_entry, acc)
    return _mega3_stream(blob_ref, scratch, sems, sgwl, gwl, sg_cnt, g_cnt,
                         fold_entry, acc)


def _make_mega3_closest_kernel(config, S, P, W, H, tiled, mode):
    """Single-launch closest hit: sphere/plane unrolls + streamed triangle
    worklist.  Same accumulator payload as the mega2 chain."""
    tmin = float(config.ray_min)
    rows = (None,) if mode == "fine" else range(8)

    def kernel(*refs):
        cam_ref, sph_ref, pl_ref, sgwl_ref, gwl_ref, cnt_ref, blob_ref = refs[:7]
        out_refs = refs[7:18]
        bb_ref = refs[18]
        scratch, sems = refs[19], refs[20]
        i = pl.program_id(0)
        sg_cnt = cnt_ref[0, 0, 0]
        g_cnt = cnt_ref[0, 0, 1]
        rox, roy, roz, rdx, rdy, rdz = _mega2_raygen(cam_ref, i, W, H, tiled)

        t = jnp.full((8, 128), INF, jnp.float32)
        nx = jnp.zeros((8, 128), jnp.float32)
        ny, nz, mk, mr, mg, mb, m0, m1, m2 = (jnp.zeros_like(nx) for _ in range(9))

        def upd(sel, tc, nc3, mat, acc):
            t, nx, ny, nz, mk, mr, mg, mb, m0, m1, m2 = acc
            t = jnp.where(sel, tc, t)
            nx = jnp.where(sel, nc3[0], nx)
            ny = jnp.where(sel, nc3[1], ny)
            nz = jnp.where(sel, nc3[2], nz)
            mk = jnp.where(sel, mat[0], mk)
            mr = jnp.where(sel, mat[1], mr)
            mg = jnp.where(sel, mat[2], mg)
            mb = jnp.where(sel, mat[3], mb)
            m0 = jnp.where(sel, mat[4], m0)
            m1 = jnp.where(sel, mat[5], m1)
            m2 = jnp.where(sel, mat[6], m2)
            return t, nx, ny, nz, mk, mr, mg, mb, m0, m1, m2

        acc = (t, nx, ny, nz, mk, mr, mg, mb, m0, m1, m2)
        for s in range(S):
            tc = _sphere_t_reg(sph_ref, s, rox, roy, roz, rdx, rdy, rdz, tmin, INF)
            px_ = rox + tc * rdx
            py_ = roy + tc * rdy
            pz_ = roz + tc * rdz
            cnx = px_ - sph_ref[s, 0]
            cny = py_ - sph_ref[s, 1]
            cnz = pz_ - sph_ref[s, 2]
            n_len = jnp.sqrt(jnp.maximum(_msqnorm(cnx, cny, cnz), 1e-20))
            acc = upd(tc < acc[0], tc, (cnx / n_len, cny / n_len, cnz / n_len),
                      _mat_of(sph_ref, s, 4), acc)
        for p in range(P):
            tc = _plane_t_reg(pl_ref, p, rox, roy, roz, rdx, rdy, rdz, tmin, INF)
            acc = upd(tc < acc[0], tc, (pl_ref[p, 0], pl_ref[p, 1], pl_ref[p, 2]),
                      _mat_of(pl_ref, p, 4), acc)

        def fold_entry(slot, gr, acc):
            for r in rows:
                g = gr if r is None else r
                for m in range(MEGA2_G):
                    read = lambda c, m=m, g=g: scratch[slot, g, m * 20 + c]
                    tc = _tri_t_read(read, rox, roy, roz, rdx, rdy, rdz,
                                     tmin, INF, shadow=False)
                    acc = upd(tc < acc[0], tc, (read(9), read(10), read(11)),
                              _mat_read(read, 13), acc)
            return acc

        acc = _mega3_dispatch(
            mode, blob_ref, scratch, sems,
            lambda k: sgwl_ref[0, 0, k], lambda q: gwl_ref[0, 0, q],
            sg_cnt, g_cnt, fold_entry, acc,
        )
        for ref, reg in zip(out_refs, acc):
            ref[:] = reg
        _emit_hit_bounds(bb_ref, config, acc, rox, roy, roz, rdx, rdy, rdz)

    return kernel


def _make_mega3_shadow_kernel(config, S, P, L, W, H, tiled, mode, stream):
    """Single-launch shadow + shade: per-light sphere/plane occlusion
    unrolls + streamed triangle worklists, then the whole RenderPixel tail
    (reference: source/Renderer.cpp:120-182) in-kernel."""
    tmin = float(config.ray_min)
    shadows = bool(config.shadows)
    mode_name = config.lighting_mode.name
    rows = (None,) if mode == "fine" else range(8)

    def kernel(*refs):
        cam_ref, sph_ref, pl_ref, li_ref, sgwl_ref, gwl_ref, cnt_ref, blob_ref = refs[:8]
        t_ref, nx_ref, ny_ref, nz_ref = refs[8:12]
        mat_refs = refs[12:19]
        out_ref = refs[19]
        scratch, sems = refs[20], refs[21]

        i = pl.program_id(0)
        cnts = [(cnt_ref[0, li, 0], cnt_ref[0, li, 1]) for li in range(L)] \
            if (shadows and stream) else []
        rox, roy, roz, rdx, rdy, rdz = _mega2_raygen(cam_ref, i, W, H, tiled)
        t = t_ref[:]
        nx, ny, nz = nx_ref[:], ny_ref[:], nz_ref[:]
        hit = t < INF
        ts = jnp.where(hit, t, 0.0)
        px_ = rox + ts * rdx
        py_ = roy + ts * rdy
        pz_ = roz + ts * rdz
        off = float(config.normal_offset)
        ox_ = px_ + nx * off
        oy_ = py_ + ny * off
        oz_ = pz_ + nz * off
        mk, mr, mg, mb, m0, m1, m2 = (r[:] for r in mat_refs)
        vx, vy, vz = -rdx, -rdy, -rdz
        cr = jnp.zeros((8, 128), jnp.float32)
        cg = jnp.zeros_like(cr)
        cb = jnp.zeros_like(cr)
        sf = jnp.ones_like(cr)

        for li in range(L):
            lpx, lpy, lpz = li_ref[li, 0], li_ref[li, 1], li_ref[li, 2]
            lint = li_ref[li, 6]
            is_point = li_ref[li, 7] == 0.0
            ldx = lpx - ox_
            ldy = lpy - oy_
            ldz = lpz - oz_
            mag_pt = jnp.sqrt(_msqnorm(ldx, ldy, ldz))
            lx = jnp.where(is_point, ldx / mag_pt, -lpx)
            ly = jnp.where(is_point, ldy / mag_pt, -lpy)
            lz = jnp.where(is_point, ldz / mag_pt, -lpz)
            mag = jnp.where(is_point, mag_pt, 3.4028235e38)

            if shadows:
                # miss lanes start occluded: their shading is masked by `hit`
                occf = jnp.where(hit, 0.0, 1.0)
                for s in range(S):
                    tc = _sphere_t_reg(sph_ref, s, ox_, oy_, oz_, lx, ly, lz, tmin, mag)
                    occf = jnp.where(tc < INF, 1.0, occf)
                for p in range(P):
                    tc = _plane_t_reg(pl_ref, p, ox_, oy_, oz_, lx, ly, lz, tmin, mag)
                    occf = jnp.where(tc < INF, 1.0, occf)
                if stream:
                    def fold_entry(slot, gr, occf, lx=lx, ly=ly, lz=lz, mag=mag):
                        for r in rows:
                            g = gr if r is None else r
                            for m in range(MEGA2_G):
                                read = lambda c, m=m, g=g: scratch[slot, g, m * 20 + c]
                                tc = _tri_t_read(read, ox_, oy_, oz_, lx, ly, lz,
                                                 tmin, mag, shadow=True)
                                occf = jnp.where(tc < INF, 1.0, occf)
                        return occf

                    occf = _mega3_dispatch(
                        mode, blob_ref, scratch, sems,
                        lambda k, li=li: sgwl_ref[0, li, k],
                        lambda q, li=li: gwl_ref[0, li, q],
                        cnts[li][0], cnts[li][1], fold_entry, occf,
                    )
                lit = jnp.logical_not((occf > 0.5) & hit)
                sf = sf * jnp.where(lit, 1.0, float(config.shadow_dim))
            else:
                lit = jnp.ones((8, 128), jnp.bool_)

            wr, wg, wb = _shade_one_light(
                mode_name, is_point,
                (lpx, lpy, lpz), (li_ref[li, 3], li_ref[li, 4], li_ref[li, 5]), lint,
                (px_, py_, pz_), (nx, ny, nz), (lx, ly, lz), (vx, vy, vz),
                (mk, mr, mg, mb, m0, m1, m2),
            )
            cr = cr + jnp.where(lit, wr, 0.0)
            cg = cg + jnp.where(lit, wg, 0.0)
            cb = cb + jnp.where(lit, wb, 0.0)

        cr = jnp.where(hit, cr * sf, 0.0)
        cg = jnp.where(hit, cg * sf, 0.0)
        cb = jnp.where(hit, cb * sf, 0.0)
        cr, cg, cb = _tonemap_rgb(cr, cg, cb)
        out_ref[0, :, :] = cr
        out_ref[1, :, :] = cg
        out_ref[2, :, :] = cb

    return kernel


def render_image_mega3_f32(scene: Scene, config: RenderConfig,
                           tile0=None, tiles: int | None = None):
    """Whole-frame mega3 render -> (H, W, 3) f32: ONE closest-hit launch +
    ONE shadow/shade launch for any triangle count up to MEGA3_MAX_TRIS.

    With ``tile0``/``tiles`` set, renders only the 1024-ray tiles
    [tile0, tile0+tiles) and returns (tiles*1024, 3) colors in feed order —
    the per-chip body of the px-sharded fused path (same contract as the
    mega/mega2 tile-range variants)."""
    from raytpu.ops import accel, shading as _shading

    W, H = config.width, config.height
    R = W * H
    L = scene.lights.count
    tmin = float(config.ray_min)
    tiled = (W % 32 == 0) and (H % 32 == 0)
    whole = tiles is None
    nt_frame = _cdiv(R, 1024)
    nt = nt_frame if whole else tiles
    rows_pad = nt * 8
    interpret = _interpret or jax.default_backend() == "cpu"

    cam, sph, pln, tri_blob, li = _mega_pack(scene, config)
    if not whole:
        cam = cam.at[0, 14].set(jnp.asarray(tile0, jnp.float32))
    S, P, T = sph.shape[0], pln.shape[0], tri_blob.shape[0]
    if T == 0:  # degenerate all-zero group: every worklist count is 0
        tri_blob = jnp.zeros((1, 20), jnp.float32)
    blob = pack_triangles_sg(tri_blob)  # (ng, 256)
    ng = blob.shape[0]
    nsg = ng // 8

    # per-group SAH-leaf AABBs, padded to ng with never-pass bounds
    glo, ghi = accel.chunk_bounds(scene.triangles, MEGA2_G)
    pad = ng - glo.shape[0]
    glo = jnp.pad(glo, ((0, pad), (0, 0)), constant_values=jnp.inf)
    ghi = jnp.pad(ghi, ((0, pad), (0, 0)), constant_values=-jnp.inf)

    nssg = nsg // 8
    # per-PASS modes: the closest pass has one worklist (fine culling holds
    # to bigger meshes); the shadow pass shares the budget across L lights
    mode_c = mega3_mode(ng, 1)
    mode_s = mega3_mode(ng, L if (config.shadows and T) else 1)

    def _wl_dims(mode):
        nwl1 = nssg if mode == "coarse2" else nsg
        nge = {"fine": ng, "coarse": nsg, "coarse2": 1}[mode]
        D = MEGA3_RING if mode == "fine" else MEGA3_RING_COARSE
        return nwl1, nge, D

    nwl1_c, nge_c, D_c = _wl_dims(mode_c)
    nwl1_s, nge_s, D_s = _wl_dims(mode_s)
    smem = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM)
    smem_t = lambda shape: pl.BlockSpec(shape, lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    vtile = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    acc_shape = jax.ShapeDtypeStruct((rows_pad, 128), jnp.float32)
    ring = lambda D: [
        pltpu.SMEM((D, 8, 256), jnp.float32),
        pltpu.SemaphoreType.DMA((D,)),
    ]
    sph_in = sph if S else jnp.zeros((1, 11), jnp.float32)
    pln_in = pln if P else jnp.zeros((1, 11), jnp.float32)
    li_in = li if L else jnp.zeros((1, 8), jnp.float32)

    # ---- XLA: primary-ray worklists (O(tiles): analytic camera bounds) ----
    rb = accel.camera_tile_bounds(scene.camera, W, H, tiled, tile=1024)
    cullm = accel.cull_matrix(rb, glo, ghi, tmin)  # (nt_frame, ng)
    if not whole:
        # this chip's tile rows (same slicing semantics as mega2's tile-range
        # variant: padded rows past the frame cull everything)
        cullm = jax.lax.dynamic_slice_in_dim(
            jnp.pad(cullm, ((0, nt), (0, 0))), tile0, nt, 0)
    sg_wl, g_wl, cnts = mega3_worklists(cullm, mode_c)

    # ---- closest-hit launch ----
    kern = _make_mega3_closest_kernel(config, S, P, W, H, tiled, mode_c)
    outs = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[
            smem((1, 16)), smem((max(S, 1), 11)), smem((max(P, 1), 11)),
            smem_t((1, 1, nwl1_c)), smem_t((1, 1, nge_c)), smem_t((1, 1, 2)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[vtile] * 11 + [
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM)],
        out_shape=[acc_shape] * 11 + [
            jax.ShapeDtypeStruct((nt, 1, 8), jnp.float32)],
        scratch_shapes=ring(D_c),
        interpret=interpret,
    )(cam, sph_in, pln_in, sg_wl[:, None, :], g_wl[:, None, :],
      cnts[:, None, :], blob)
    accs, bounds = outs[:11], outs[11]

    t_acc, nx_a, ny_a, nz_a = accs[0], accs[1], accs[2], accs[3]

    if L == 0:  # no lights -> black (W1)
        return (jnp.zeros((H, W, 3), jnp.float32) if whole
                else jnp.zeros((nt * 1024, 3), jnp.float32))

    # ---- XLA: per-light shadow worklists from the kernel-emitted tile
    # AABBs of offset hit points (O(tiles)) ----
    stream = bool(config.shadows) and T > 0
    if stream:
        bb_lo, bb_hi = bounds[:, 0, 0:3], bounds[:, 0, 3:6]
        sgl, gl, cl = [], [], []
        for li_i in range(L):
            is_pt = scene.lights.kind[li_i] == LightKind.POINT
            cm = accel.light_shadow_cull_from_aabb(
                bb_lo, bb_hi, scene.lights.position[li_i],
                scene.lights.direction[li_i], is_pt, glo, ghi, tmin)
            s_, g_, c_ = mega3_worklists(cm, mode_s)
            sgl.append(s_)
            gl.append(g_)
            cl.append(c_)
        sh_sg = jnp.stack(sgl, axis=1)  # (nt, L, nwl1)
        sh_g = jnp.stack(gl, axis=1)  # (nt, L, ng)
        sh_c = jnp.stack(cl, axis=1)  # (nt, L, 2)
    else:
        sh_sg = jnp.zeros((nt, max(L, 1), nwl1_s), jnp.int32)
        sh_g = jnp.zeros((nt, max(L, 1), nge_s), jnp.int32)
        sh_c = jnp.zeros((nt, max(L, 1), 2), jnp.int32)

    # ---- shadow + shade launch ----
    kern = _make_mega3_shadow_kernel(config, S, P, L, W, H, tiled, mode_s, stream)
    colors = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[
            smem((1, 16)), smem((max(S, 1), 11)), smem((max(P, 1), 11)),
            smem((max(L, 1), 8)),
            smem_t((1, max(L, 1), nwl1_s)), smem_t((1, max(L, 1), nge_s)),
            smem_t((1, max(L, 1), 2)),
            pl.BlockSpec(memory_space=pl.ANY),
            vtile, vtile, vtile, vtile,
            vtile, vtile, vtile, vtile, vtile, vtile, vtile,
        ],
        out_specs=pl.BlockSpec((3, 8, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, rows_pad, 128), jnp.float32),
        scratch_shapes=ring(D_s),
        interpret=interpret,
    )(cam, sph_in, pln_in, li_in, sh_sg, sh_g, sh_c, blob,
      t_acc, nx_a, ny_a, nz_a, *accs[4:])

    if whole:
        return _mega2_unfold_colors(colors, H, W, tiled, R)
    # feed-order rows for this chip's tiles (sharded caller un-permutes)
    return jnp.moveaxis(colors.reshape(3, rows_pad * 128), 0, 1)


# ---------------------------------------------------------------------------
# Full-frame renderer on the Pallas backend
# ---------------------------------------------------------------------------


def shade_rays(scene: Scene, ro, rd, config: RenderConfig):
    return _renderer.shade_rays(
        scene, ro, rd, config,
        closest_fn=closest_hit_pallas,
        any_fn=any_hit_pallas,
        any_multi_fn=any_hit_lights_pallas,
    )


@functools.lru_cache(maxsize=32)
def _tile_permutation(h: int, w: int, th: int = 16, tw: int = 32):
    """Row-major -> (th x tw)-pixel-tile-major ray permutation, so each
    512-ray (RT) kernel tile is a compact screen rectangle with a tight direction
    cone (makes chunk culling effective).  None if not divisible."""
    if h % th or w % tw:
        return None
    idx = np.arange(h * w).reshape(h // th, th, w // tw, tw)
    perm = idx.transpose(0, 2, 1, 3).reshape(-1)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return perm, inv  # numpy: safe to cache across jit traces


def _tile_fold(x, h, w, th: int = 16, tw: int = 32):
    """Row-major (H*W, C) -> tile-major, as pure reshape/transpose (TPU
    transposes are fast; the equivalent gather by ``perm`` is scalar-slow)."""
    c = x.shape[-1]
    return x.reshape(h // th, th, w // tw, tw, c).transpose(0, 2, 1, 3, 4).reshape(-1, c)


def _tile_unfold(x, h, w, th: int = 16, tw: int = 32):
    """Inverse of _tile_fold: tile-major (H*W, C) -> (H, W, C)."""
    c = x.shape[-1]
    return x.reshape(h // th, w // tw, th, tw, c).transpose(0, 2, 1, 3, 4).reshape(h, w, c)


#: Largest triangle count kept fully VMEM-resident by the fused kernels;
#: beyond this the jnp (HBM-chunked) path takes over.
MAX_VMEM_TRIS = 32768


def route_kind(scene: Scene, config: RenderConfig) -> str:
    """THE routing decision for the fused kernel families — shared by the
    single-chip ``render_image_f32`` and the px-only sharded router
    (raytpu/parallel/sharding.py:_fused_kind), so a budget change can never
    make them silently diverge.  Returns one of
    "mega" | "mega2" | "packed" | "jnp" | "chunked"."""
    if config.soft_shadows:
        return "jnp"
    if (scene.num_primitives <= MEGA_MAX_PRIMS
            and scene.lights.count <= MEGA_MAX_LIGHTS):
        return "mega"
    if (scene.triangles.count <= MEGA2_MAX_LAUNCHES * MEGA2_MAX_SMEM_TRIS
            and scene.spheres.count <= MEGA2_MAX_UNROLL
            and scene.planes.count <= MEGA2_MAX_UNROLL
            and scene.lights.count <= MEGA2_MAX_LIGHTS):
        return "mega2"
    if (scene.triangles.count <= MEGA3_MAX_TRIS
            and scene.spheres.count <= MEGA2_MAX_UNROLL
            and scene.planes.count <= MEGA2_MAX_UNROLL
            and scene.lights.count <= MEGA2_MAX_LIGHTS
            # streamed worklist SMEM: per-light super-super-group entries
            and scene.lights.count * _cdiv(scene.triangles.count, 512)
            <= MEGA3_WL_SMEM_ENTRIES):
        # round 5: the PACKED pipeline (payload-emitting streamed winner
        # search + streamed all-lights any-hit + XLA shade) measured 16%
        # faster than the whole-frame mega3 kernels in this band (bunny50k
        # 60.2 vs 71.8/71.6 ms same-window with a control re-run,
        # probes/probe_packed_vs_mega3.py) — per-ray shadow bounds cull
        # tighter than mega3's tile-AABB worklists, and the XLA shade tail
        # is bit-identical to the jnp path instead of flip-budgeted
        return "packed"
    if scene.triangles.count > MAX_VMEM_TRIS:
        return "jnp"
    return "chunked"


def render_image_packed_f32(scene: Scene, config: RenderConfig):
    """Packed pipeline for the big-mesh band (9.6k..1M triangles): the
    payload-emitting mega2/streamed winner search + the streamed all-lights
    any-hit kernel + the XLA shade tail — the same composition the sharded
    renderer runs per chip, without the merge.  Output is bit-identical to
    the jnp path (chunked-kernel invariant; the whole-frame mega3 kernels
    carry a tiny flip budget instead)."""
    from raytpu.render import pallas_soft as ps

    W, H = config.width, config.height
    ro, rd = _renderer.generate_rays(scene.camera, config)
    tiled = (W % 32 == 0) and (H % 32 == 0)
    if tiled:
        rd = _mega2_fold(rd, H, W)  # tile-order feed: tight per-tile cones
    ro_b = jnp.broadcast_to(ro, rd.shape)
    t, idx, normal, mat = ps.scene_min_t_mega2(
        scene, ro_b, rd, float(config.ray_min), payload=True)
    rec = ps.hit_records_from_payload(ro_b, rd, t, normal, mat)

    def any_multi(s, p, dirs, mags, tmin):
        return ps.any_hit_lights_mega2(s, p, dirs, mags, float(tmin))

    colors = _renderer.shade_from_records(scene, rec, rd, config,
                                          any_multi_fn=any_multi)
    if tiled:
        colors = _mega2_unfold_rows(colors, H, W)
    return colors.reshape(H, W, 3)


@functools.partial(jax.jit, static_argnames=("config",))
def render_image_f32(scene: Scene, config: RenderConfig):
    kind = route_kind(scene, config)
    if kind == "mega":
        return render_image_mega_f32(scene, config)
    if kind == "mega2":
        return render_image_mega2_f32(scene, config)
    if kind == "packed":
        return render_image_packed_f32(scene, config)
    if kind == "jnp":
        return _renderer.render_image_f32(scene, config)
    W, H = config.width, config.height
    ro, rd = _renderer.generate_rays(scene.camera, config)
    tiled = _tile_permutation(H, W) is not None
    if tiled:
        rd = _tile_fold(rd, H, W)
    rec = closest_hit_pallas(scene, jnp.broadcast_to(ro, rd.shape), rd, config.ray_min)
    colors = shadow_shade_pallas(scene, rec, rd, config)
    if tiled:
        return _tile_unfold(colors, H, W)
    return colors.reshape(H, W, 3)


@functools.partial(jax.jit, static_argnames=("config",))
def render_image(scene: Scene, config: RenderConfig):
    return math3d.quantize_u8(render_image_f32(scene, config))
