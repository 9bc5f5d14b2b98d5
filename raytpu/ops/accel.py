"""Acceleration-structure layer: TPU-friendly chunk culling.

The reference rebuilds a recursive SAH BVH per mesh per frame and walks it
per ray (reference: source/DataTypes.h:294-483, source/Utils.h:246-288).
Pointer-chasing BVHs are hostile to the VPU, so the TPU-native equivalent is
**chunked culling** (SURVEY.md §7.8b):

  * triangles are reordered once by Morton code of their centroid (native
    C++ sort when available) so each 128-triangle kernel chunk is spatially
    coherent with a tight AABB;
  * per chunk, an AABB is computed (refreshed per frame in XLA — the analog
    of the reference's per-frame BVH rebuild, but O(T) data-parallel);
  * the Pallas min-t kernel slab-tests each (ray tile, chunk) pair with
    conservative interval arithmetic on the tile's ray bounds and skips the
    whole Möller–Trumbore block when the chunk cannot intersect.

This keeps the divergence-free data-parallel shape while skipping most of
the O(rays x triangles) work for large meshes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from raytpu.core.types import Scene, Triangles

CHUNK = 128  # triangles per cull chunk == Pallas lane count
SAH_LEAF = 8  # builder leaf size == the mega2 cull-group size: every G=8
#             group IS a SAH box (leaf=64 slices straddle boxes).  Measured
#             (v5e, same-window, floor-adjusted): bunny fwd -15%, optional
#             -9% vs leaf=64 (probes/probe_leaf_tpu.py, probe_leaforder.py)


def spatial_permutation(tri_verts: np.ndarray) -> np.ndarray:
    """Spatial-coherence permutation of a (T,3,3) triangle soup for chunking.

    Prefers the native binned-SAH builder's leaf order (measured 2.6x fewer
    passing chunks than Morton on the 3k-triangle scene: leaves follow the
    actual surface-area splits); falls back to Morton (native then numpy).
    """
    try:
        from raytpu.native import runtime as rt

        if rt.available():
            _, _, order = rt.build_bvh(tri_verts, leaf_size=SAH_LEAF, bins=8)
            return order
    except Exception:
        pass
    return morton_permutation(tri_verts)


def morton_permutation(tri_verts: np.ndarray) -> np.ndarray:
    """Morton-order permutation of (T,3,3) triangle soup (native or numpy)."""
    try:
        from raytpu.native import runtime as rt

        if rt.available():
            return rt.morton_order(tri_verts)
    except Exception:
        pass
    return _morton_numpy(tri_verts)


def _expand_bits10(v):
    v &= 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _morton_numpy(tri_verts: np.ndarray) -> np.ndarray:
    tv = np.asarray(tri_verts, np.float32).reshape(-1, 3, 3)
    cent = tv.mean(axis=1)
    lo, hi = cent.min(axis=0), cent.max(axis=0)
    rng = np.where(hi > lo, hi - lo, 1.0)
    q = np.clip(((cent - lo) / rng * 1023.0), 0, 1023).astype(np.uint32)
    code = (
        (_expand_bits10(q[:, 0]) << 2)
        | (_expand_bits10(q[:, 1]) << 1)
        | _expand_bits10(q[:, 2])
    )
    return np.argsort(code, kind="stable").astype(np.int32)


def reorder_scene_triangles(scene: Scene) -> Scene:
    """Reorder the scene's triangle soup (and the mesh face tables that
    generate it) by spatial coherence, so kernel chunks see tight AABBs.

    The permutation is computed PER MESH (each mesh's faces stay contiguous):
    under rigid per-mesh animation a group's spatial coherence is then
    pose-invariant — the per-frame AABB refresh (chunk_bounds) keeps boxes
    tight for any yaw/translation, and no group's box can balloon from
    spanning two independently-moving meshes.  Measured: pass rates are flat
    over a full 2pi yaw on bunny/optional (probes/probe_anim.py).  This is
    the TPU analog of the reference's per-frame BVH rebuild
    (reference: source/DataTypes.h:231-235) at zero per-frame cost.

    NOTE: reordering changes the reference's iteration-order tie-break for
    exactly-coincident surfaces; geometry and shading are otherwise
    unaffected.
    """
    tr = scene.triangles
    if tr.count == 0:
        return scene
    tv = np.stack([np.asarray(tr.v0), np.asarray(tr.v1), np.asarray(tr.v2)], axis=1)
    if scene.meshes.num_faces == tr.count and scene.meshes.num_meshes > 1:
        fm = np.asarray(scene.meshes.face_mesh)
        perm = np.empty(tr.count, np.int32)
        base = 0
        for mid in range(scene.meshes.num_meshes):
            sel = np.flatnonzero(fm == mid).astype(np.int32)
            sub = spatial_permutation(tv[sel])
            perm[base : base + len(sel)] = sel[sub]
            base += len(sel)
    else:
        perm = spatial_permutation(tv)
    perm_j = jnp.asarray(perm)
    tri2 = Triangles(
        v0=tr.v0[perm_j], v1=tr.v1[perm_j], v2=tr.v2[perm_j],
        normal=tr.normal[perm_j], cull=tr.cull[perm_j], material=tr.material[perm_j],
    )
    meshes = scene.meshes
    if meshes.num_faces == tr.count:
        meshes = dataclasses.replace(
            meshes,
            face_vertex=meshes.face_vertex[perm_j],
            face_normal=meshes.face_normal[perm_j],
            face_mesh=meshes.face_mesh[perm_j],
        )
    return dataclasses.replace(scene, triangles=tri2, meshes=meshes)


def chunk_bounds(tris: Triangles, chunk: int = CHUNK):
    """Per-chunk AABBs (nc, 3)+(nc, 3), padding chunks with +/-inf-free
    degenerate bounds.  Pure jnp: recomputed per frame under jit (the
    data-parallel analog of the reference's per-frame BVH rebuild)."""
    T = tris.count
    nc = -(-T // chunk)
    pad = nc * chunk - T

    def padwith(x, v):
        return jnp.pad(x, ((0, pad), (0, 0)), constant_values=v)

    v0 = padwith(tris.v0, jnp.inf).reshape(nc, chunk, 3)
    v1 = padwith(tris.v1, jnp.inf).reshape(nc, chunk, 3)
    v2 = padwith(tris.v2, jnp.inf).reshape(nc, chunk, 3)
    lo = jnp.minimum(jnp.minimum(v0, v1), v2).min(axis=1)
    v0n = padwith(tris.v0, -jnp.inf).reshape(nc, chunk, 3)
    v1n = padwith(tris.v1, -jnp.inf).reshape(nc, chunk, 3)
    v2n = padwith(tris.v2, -jnp.inf).reshape(nc, chunk, 3)
    hi = jnp.maximum(jnp.maximum(v0n, v1n), v2n).max(axis=1)
    return lo, hi


def chunk_soft_slack(tris: Triangles, beta: float, chunk: int = CHUNK,
                     support: float = 20.0):
    """(nc,) world-space AABB expansion covering the soft sigmoid's support.

    A ray passing distance ``d`` outside a triangle of extent ``E`` has
    barycentric margin ~ ``-d/E`` and contributes ``sigmoid(-beta*d/E)`` to
    the soft transmittance (raytpu/ops/intersect.py:345).  Clipping where
    ``beta*margin < -support`` (~2e-9 occlusion) needs chunk AABBs expanded
    by ``support/beta * max_tri_extent``; extent is the per-triangle AABB
    diagonal, maxed per chunk.
    """
    T = tris.count
    nc = -(-T // chunk)
    pad = nc * chunk - T
    lo = jnp.minimum(jnp.minimum(tris.v0, tris.v1), tris.v2)
    hi = jnp.maximum(jnp.maximum(tris.v0, tris.v1), tris.v2)
    diag = jnp.sqrt(jnp.sum((hi - lo) ** 2, axis=1))  # (T,)
    diag = jnp.pad(diag, (0, pad), constant_values=0.0).reshape(nc, chunk)
    return (support / beta) * diag.max(axis=1)


def cull_matrix(rb, chunk_lo, chunk_hi, tmin):
    """(nr, nc) f32 matrix: 1.0 where ray tile i may hit chunk j, else 0.0.

    Computed fully in XLA (vectorized over all tile/chunk pairs) so the
    Pallas kernel's per-step predicate is a single SMEM load.  Combines the
    interval slab test (strong for diverging primary tiles) with the
    segment-union AABB overlap (strong for shadow rays converging on one
    light); both conservative.
    """
    omin, omax = rb[:, None, 0:3], rb[:, None, 3:6]  # (nr,1,3)
    dmin, dmax = rb[:, None, 6:9], rb[:, None, 9:12]
    tmax_t = rb[:, None, 12:13]
    seg_valid = rb[:, None, 13:14] > 0.0
    emin, emax = rb[:, None, 14:17], rb[:, None, 17:20]
    lo, hi = chunk_lo[None, :, :], chunk_hi[None, :, :]  # (1,nc,3)

    sign_safe = (dmin > 0.0) | (dmax < 0.0)
    inv1 = 1.0 / dmin
    inv2 = 1.0 / dmax
    cands = jnp.stack(
        [(b - o) * inv for b in (lo, hi) for o in (omin, omax) for inv in (inv1, inv2)]
    )  # (8, nr, nc, 3)
    ax_lo = jnp.where(sign_safe, cands.min(axis=0), -3.0e38)
    ax_hi = jnp.where(sign_safe, cands.max(axis=0), 3.0e38)
    t_lo = jnp.maximum(ax_lo.max(axis=-1), tmin)  # (nr, nc)
    t_hi = jnp.minimum(ax_hi.min(axis=-1), tmax_t[:, :, 0])
    slab_ok = t_hi >= t_lo

    s_lo = jnp.minimum(omin, emin)
    s_hi = jnp.maximum(omax, emax)
    seg_ok = ((s_lo <= hi) & (s_hi >= lo)).all(axis=-1) | ~seg_valid[:, :, 0]

    return (slab_ok & seg_ok).astype(jnp.float32)


def shadow_cull_matrix(ro, ld, mag, light_pos, is_point, lo, hi, tmin,
                       tile: int = 1024):
    """Per-(tile, group) cull for the shadow rays toward ONE light.

    Combines the forward slab/segment test on the actual rays with — for
    point lights — a **light-anchored reversed slab test**: every shadow
    segment ends at the light, an exact point, so the interval slab on the
    reversed rays {light -> origin box, t in [0, 1]} carries no origin-box
    slack and is much tighter than the forward test, whose origin interval
    and direction interval decorrelate (measured, probes/probe_conecull.py:
    shadow group pass rate bunny 39.8 -> 29.6%, optional 31.1 -> 21.0%;
    a cone-vs-sphere test added almost nothing on top).  Both tests are
    conservative; the reversed one is skipped (all-pass) for directional
    lights, whose forward direction interval is already a single vector.
    """
    rb = ray_tile_bounds(ro, ld, mag, tile=tile)
    cull = cull_matrix(rb, lo, hi, tmin)
    rd_rev = ro - light_pos[None, :]
    rb_rev = ray_tile_bounds(
        jnp.broadcast_to(light_pos, ro.shape), rd_rev,
        jnp.ones_like(jnp.broadcast_to(mag, (ro.shape[0],))), tile=tile,
    )
    rev = cull_matrix(rb_rev, lo, hi, 0.0)
    return cull * jnp.where(is_point, rev, jnp.ones_like(rev))


def camera_tile_bounds(camera, W: int, H: int, tiled: bool, tile: int = 1024):
    """Per-tile PRIMARY ray bounds (nt, 20) computed analytically from the
    camera — O(tiles) math instead of materializing O(rays) direction arrays
    (generate_rays + ray_tile_bounds measured ~1.5 ms/frame at 640x480: every
    op on an (R, 3) array wastes 125/128 lanes; probes/probe_wlxla.py).

    The unnormalized direction ``d = cx*right + cy*up + fwd`` is bilinear in
    the pixel coords, so per-component extrema over a pixel rectangle are at
    its corners; with an orthonormal basis ``|d|^2 = 1 + cx^2 + cy^2``, whose
    extrema over the rectangle are exact.  Normalized-direction intervals
    follow by interval division (conservative), then a 1e-6 relative widen
    for fp safety.  Same (nt, 20) layout as ``ray_tile_bounds``.
    """
    nt = -(-(W * H) // tile)
    i = jnp.arange(nt, dtype=jnp.float32)
    if tiled:
        TX = W // 32
        tx = jnp.mod(i, TX)
        ty = jnp.floor_divide(i, TX)
        px0, px1 = tx * 32.0, tx * 32.0 + 31.0
        py0, py1 = ty * 32.0, ty * 32.0 + 31.0
    else:
        rid0 = i * tile
        rid1 = jnp.minimum(rid0 + tile - 1, float(W * H - 1))
        full_rows = (rid1 - rid0 + 1.0) >= W  # spans >= one full row
        px0 = jnp.where(full_rows, 0.0, jnp.mod(rid0, W))
        px1 = jnp.where(full_rows, float(W - 1), jnp.mod(rid1, W))
        # non-full-row tiles that still wrap a row boundary span all columns
        wraps = (~full_rows) & (px1 < px0)
        px0 = jnp.where(wraps, 0.0, px0)
        px1 = jnp.where(wraps, float(W - 1), px1)
        py0 = jnp.floor_divide(rid0, W)
        py1 = jnp.floor_divide(rid1, W)

    fov = camera.fov_scale
    aspect = jnp.float32(W / H)
    cx0 = (2.0 * (px0 + 0.5) / W - 1.0) * aspect * fov
    cx1 = (2.0 * (px1 + 0.5) / W - 1.0) * aspect * fov
    cy1 = (1.0 - 2.0 * (py0 + 0.5) / H) * fov  # py0 -> larger cy
    cy0 = (1.0 - 2.0 * (py1 + 0.5) / H) * fov
    cx_lo, cx_hi = jnp.minimum(cx0, cx1), jnp.maximum(cx0, cx1)
    cy_lo, cy_hi = jnp.minimum(cy0, cy1), jnp.maximum(cy0, cy1)

    right, up, fwd = camera.onb()

    def axis_interval(r, u, f):
        a_lo = jnp.minimum(cx_lo * r, cx_hi * r) + jnp.minimum(cy_lo * u, cy_hi * u) + f
        a_hi = jnp.maximum(cx_lo * r, cx_hi * r) + jnp.maximum(cy_lo * u, cy_hi * u) + f
        return a_lo, a_hi

    d_lo, d_hi = zip(*(axis_interval(right[k], up[k], fwd[k]) for k in range(3)))
    d_lo = jnp.stack(d_lo, axis=1)  # (nt, 3)
    d_hi = jnp.stack(d_hi, axis=1)

    def minabs(lo, hi):
        return jnp.where((lo <= 0.0) & (hi >= 0.0), 0.0,
                         jnp.minimum(jnp.abs(lo), jnp.abs(hi)))

    n2_lo = 1.0 + minabs(cx_lo, cx_hi) ** 2 + minabs(cy_lo, cy_hi) ** 2
    n2_hi = 1.0 + jnp.maximum(cx_lo**2, cx_hi**2) + jnp.maximum(cy_lo**2, cy_hi**2)
    dmin, dmax = _div_interval(d_lo, d_hi, n2_lo[:, None], n2_hi[:, None])

    o = jnp.broadcast_to(camera.origin[None, :], (nt, 3))
    z3 = jnp.zeros((nt, 3), jnp.float32)
    return jnp.concatenate([
        o, o, dmin, dmax,
        jnp.full((nt, 1), 3.0e38, jnp.float32), jnp.zeros((nt, 1), jnp.float32),
        z3, z3,
    ], axis=1)


def _div_interval(v_lo, v_hi, n2_lo, n2_hi, eps: float = 1e-6):
    """[v_lo, v_hi] / sqrt([n2_lo, n2_hi]) as a conservative interval,
    widened by ``eps`` relative (inputs broadcast; norms positive)."""
    inv_lo = jax.lax.rsqrt(jnp.maximum(n2_hi, 1e-30))
    inv_hi = jax.lax.rsqrt(jnp.maximum(n2_lo, 1e-30))
    lo = jnp.minimum(v_lo * inv_lo, v_lo * inv_hi)
    hi = jnp.maximum(v_hi * inv_lo, v_hi * inv_hi)
    margin = eps * jnp.maximum(jnp.abs(lo), jnp.abs(hi)) + 1e-12
    return lo - margin, hi + margin


def light_shadow_cull_from_aabb(aabb_lo, aabb_hi, light_pos, light_dir,
                                is_point, glo, ghi, tmin):
    """Per-(tile, group) shadow cull from per-TILE shadow-origin AABBs —
    the O(tiles) replacement for building (R, 3) shadow-ray arrays in XLA
    (``shadow_cull_matrix`` over per-ray ``p_off`` measured ~1.5 ms/frame).
    The closest-hit kernel emits the AABBs (min/max of offset hit points,
    masked to hit lanes); bounds here are conservative supersets of the
    per-ray ones, so the render is unchanged — only pass rates can differ.

    Point lights: direction interval ``(L - box)/|L - p|`` by interval
    division; segment union = box ∪ {L}; the light-anchored REVERSED slab
    {L -> box, t in [0, 1]} is exact interval math.  Directional lights:
    the forward direction is a single exact vector.
    """
    nt = aabb_lo.shape[0]
    z3 = jnp.zeros((nt, 3), jnp.float32)
    o_lo, o_hi = aabb_lo, aabb_hi
    empty = ~(o_lo[:, 0] <= o_hi[:, 0])  # all-miss tile
    is_pt = jnp.asarray(is_point)  # traced under jit: select, don't branch

    # point-light branch: direction interval (L - box)/|L - p|
    L = jnp.broadcast_to(light_pos[None, :], (nt, 3))
    diff_lo = light_pos[None, :] - o_hi
    diff_hi = light_pos[None, :] - o_lo
    straddle = (diff_lo <= 0.0) & (diff_hi >= 0.0)
    mina = jnp.where(straddle, 0.0, jnp.minimum(jnp.abs(diff_lo), jnp.abs(diff_hi)))
    maxa = jnp.maximum(jnp.abs(diff_lo), jnp.abs(diff_hi))
    n2_lo = jnp.sum(mina**2, axis=1, keepdims=True)
    n2_hi = jnp.sum(maxa**2, axis=1, keepdims=True)
    p_dmin, p_dmax = _div_interval(diff_lo, diff_hi, n2_lo, n2_hi)
    p_dmin = jnp.clip(p_dmin, -1.0, 1.0)
    p_dmax = jnp.clip(p_dmax, -1.0, 1.0)
    p_tmx = jnp.sqrt(n2_hi) * (1.0 + 1e-6)

    # directional branch: a single exact direction, unbounded segment
    dm = jnp.broadcast_to(-light_dir[None, :], (nt, 3))

    sel = lambda a, b: jnp.where(is_pt, a, b)
    rb = jnp.concatenate([
        o_lo, o_hi, sel(p_dmin, dm), sel(p_dmax, dm),
        sel(p_tmx, jnp.full((nt, 1), 3.0e38, jnp.float32)),
        sel(jnp.ones((nt, 1), jnp.float32), jnp.zeros((nt, 1), jnp.float32)),
        sel(L, z3), sel(L, z3),
    ], axis=1)
    cull = cull_matrix(rb, glo, ghi, tmin)

    # light-anchored reversed slab (point lights only): origins at the light
    # (exact), directions span box - L, t in [0, 1] covers every segment
    rb_rev = jnp.concatenate([
        L, L, -diff_hi, -diff_lo,
        jnp.ones((nt, 1), jnp.float32), jnp.ones((nt, 1), jnp.float32),
        o_lo, o_hi,
    ], axis=1)
    rev = cull_matrix(rb_rev, glo, ghi, 0.0)
    cull = cull * jnp.where(is_pt, rev, jnp.ones_like(rev))
    return jnp.where(empty[:, None], 0.0, cull)


def ray_tile_bounds(ro, rd, tmax, tile: int = 128):
    """Per-ray-tile conservative bounds (nr, 21):
    [omin3, omax3, dmin3, dmax3, tmax_max, seg_valid, emin3, emax3]
    for the kernel's scalar chunk-culling tests.

    Two complementary rejection tests are supported downstream:
      * interval slab test on [omin,omax] x [dmin,dmax] — strong for
        diverging primary rays (tight direction cones per pixel tile);
      * segment-union AABB [min(omin,emin), max(omax,emax)] vs chunk AABB —
        strong for shadow rays, which converge on one light: every segment
        ends at the light, so the union of segments lies inside the AABB of
        origins+endpoints.  ``seg_valid`` is 0 when endpoints are unbounded
        (primary rays / directional lights).
    """
    R = rd.shape[0]
    nr = -(-R // tile)
    pad = nr * tile - R

    def p3(x, v):
        return jnp.pad(x, ((0, pad), (0, 0)), constant_values=v).reshape(nr, tile, 3)

    ro_b = jnp.broadcast_to(ro, rd.shape)
    tmax_b = jnp.broadcast_to(tmax, (R,))
    omin = p3(ro_b, jnp.inf).min(axis=1)
    omax = p3(ro_b, -jnp.inf).max(axis=1)
    dmin = p3(rd, jnp.inf).min(axis=1)
    dmax = p3(rd, -jnp.inf).max(axis=1)
    tmx = jnp.pad(tmax_b, (0, pad), constant_values=0.0).reshape(nr, tile).max(axis=1)
    endpoint = ro_b + rd * jnp.minimum(tmax_b, 3.0e37)[:, None]
    emin = p3(endpoint, jnp.inf).min(axis=1)
    emax = p3(endpoint, -jnp.inf).max(axis=1)
    seg_valid = (
        jnp.isfinite(emin).all(axis=1)
        & jnp.isfinite(emax).all(axis=1)
        & (jnp.abs(emax).max(axis=1) < 1e30)
        & (jnp.abs(emin).max(axis=1) < 1e30)
    ).astype(jnp.float32)
    return jnp.concatenate(
        [omin, omax, dmin, dmax, tmx[:, None], seg_valid[:, None], emin, emax], axis=1
    )
