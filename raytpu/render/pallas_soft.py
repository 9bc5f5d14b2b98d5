"""Fused Pallas TPU kernels for differentiable soft-shadow transmittance.

The differentiable path's dominant cost is ``intersect.soft_transmittance``
— an O(rays x primitives x lights) sigmoid-occlusion product (SURVEY.md
§7.4's soft visibility).  This module runs the same math as the jnp op
(formula-for-formula, see raytpu/ops/intersect.py:297) as a launch chain of
megakernel-v2-style kernels (raytpu/render/pallas_kernel.py "Megakernel
v2"): per-ray math on whole (8, 128) registers, triangles folded from SMEM
scalars through a per-(tile, light) worklist of AABB-culled groups, chained
across launches for meshes past the SMEM budget.  The (ray x prim)-matrix
chunked layout was measured 5x SLOWER than the dense jnp path on the
297-triangle bunny — the mega2 scalar-broadcast layout is the one that wins
(PERF.md round 2).

Soft-aware culling: a triangle outside the ray segment still contributes
``sigmoid(beta * margin)`` with a slightly negative barycentric margin, so
group AABBs are expanded by a per-group slack covering the sigmoid's support
(``accel.chunk_soft_slack``).  Contributions clipped by the slackened cull
are below ``sigmoid(-SOFT_SUPPORT)`` ~ 2e-9 per primitive — invisible next
to f32 round-off of the product.

The custom-VJP pairing that makes this differentiable lives in
``raytpu.grad.soft``; these kernels are forward-only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytpu.core.types import LightKind, Scene
from raytpu.render import pallas_kernel as pk
from raytpu.render.pallas_kernel import FLT_EPSILON, MEGA2_G, _cdiv, _pad_axis

OCC_MAX = 1.0 - 1e-6  # must match intersect._OCC_MAX
SOFT_SUPPORT = 20.0  # sigmoid tail cut: clip where beta*margin < -SOFT_SUPPORT
MAX_TRIS = pk.MEGA2_MAX_SMEM_TRIS * pk.MEGA2_MAX_LAUNCHES  # SMEM-chain ceiling
#: past the SMEM chain the kernels stream triangles mega3-style (DMA ring);
#: this is the differentiable path's hard ceiling (== the forward path's)
STREAM_MAX_TRIS = pk.MEGA3_MAX_TRIS
TRI_COLS = 14  # triangle record: 13 geometry cols + material id
SP_COLS = 5  # sphere/plane record: 4 geometry cols + material id
SOFT_SG_COLS = 15  # streamed record: TRI_COLS + global triangle id


def _occ(margin, gate, beta):
    # 1/(1+exp(-x)) == jax.nn.sigmoid for every gated lane (gated margins are
    # finite; an overflowing exp on ungated lanes yields 0, not NaN)
    occ = jnp.minimum(1.0 / (1.0 + jnp.exp(-beta * margin)), OCC_MAX)
    return jnp.where(gate, occ, 0.0)


def _sphere_soft_reg(sph_ref, s, ox, oy, oz, dx, dy, dz, tmin, tmax, beta):
    """(8,128) soft occlusion of SMEM sphere ``s`` — same math as the jnp
    sphere block (raytpu/ops/intersect.py:311-325)."""
    cx, cy, cz, r2 = sph_ref[s, 0], sph_ref[s, 1], sph_ref[s, 2], sph_ref[s, 3]
    lx = cx - ox
    ly = cy - oy
    lz = cz - oz
    proj = dx * lx + dy * ly + dz * lz
    perp2 = lx * lx + ly * ly + lz * lz - proj * proj
    margin = (r2 - perp2) / r2
    inside = margin > 0.0
    t = proj - jnp.sqrt(jnp.where(inside, r2 - perp2, 1.0))
    gate = inside & (t >= tmin) & (t <= tmax)
    return _occ(margin, gate, beta)


def _plane_soft_reg(pl_ref, p, ox, oy, oz, dx, dy, dz, tmin, tmax, beta):
    """(8,128) soft occlusion of SMEM plane ``p``; the margin is the distance
    (in t units) by which the crossing sits inside [tmin, tmax)
    (raytpu/ops/intersect.py:327-343)."""
    nx, ny, nz, d = pl_ref[p, 0], pl_ref[p, 1], pl_ref[p, 2], pl_ref[p, 3]
    denom = dx * nx + dy * ny + dz * nz
    num = d - (ox * nx + oy * ny + oz * nz)
    denom_nz = jnp.abs(denom) > FLT_EPSILON
    t = num / jnp.where(denom_nz, denom, 1.0)
    margin = jnp.minimum(t - tmin, tmax - t)
    gate = denom_nz & (margin > 0.0)
    return _occ(margin, gate, beta)


def _tri_soft_reg(tri_ref, k, ox, oy, oz, dx, dy, dz, tmin, tmax, beta):
    """(8,128) soft occlusion of SMEM triangle ``k`` (see _tri_soft_read)."""
    return _tri_soft_read(lambda c: tri_ref[k, c], ox, oy, oz, dx, dy, dz,
                          tmin, tmax, beta)


def _tri_soft_read(read, ox, oy, oz, dx, dy, dz, tmin, tmax, beta):
    """(8,128) soft occlusion of the triangle whose 13 scalars come via
    ``read(col)`` (an SMEM blob row for the chain kernels, a DMA ring slot
    for the streamed ones): signed barycentric distance to the boundary,
    shadow-pass culling (raytpu/ops/intersect.py:345-376)."""
    v0x, v0y, v0z = read(0), read(1), read(2)
    e1x, e1y, e1z = read(3), read(4), read(5)
    e2x, e2y, e2z = read(6), read(7), read(8)
    nx, ny, nz = read(9), read(10), read(11)
    cull = read(12)
    cull_dot = nx * dx + ny * dy + nz * dz
    not_par = jnp.abs(cull_dot) >= FLT_EPSILON
    cull_eff = jnp.where(cull == 2.0, 2.0, 1.0 - cull)  # shadow pass inverts
    culled = ((cull_eff == 0.0) & (cull_dot < 0.0)) | ((cull_eff == 1.0) & (cull_dot > 0.0))
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
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
    v = inv_a * (dx * qx + dy * qy + dz * qz)
    t = inv_a * (e2x * qx + e2y * qy + e2z * qz)
    margin = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
    gate = not_par & ~culled & det_ok & (t >= tmin) & (t < tmax)
    return _occ(margin, gate, beta)


# ---------------------------------------------------------------------------
# DMA-streamed variants (mega3 layout): the SMEM launch chain above caps at
# MAX_TRIS; past it every kernel family here streams (8, 256) super-group
# row-blocks of a pl.ANY triangle blob through an SMEM ring, driven by the
# same packed worklists as the forward megakernel v3
# (pallas_kernel.mega3_worklists).  One launch for any T <= STREAM_MAX_TRIS.
# ---------------------------------------------------------------------------


def _pack_soft_sg(tri_blob):
    """(T, TRI_COLS) triangle blob -> (ng, 256) DMA rows of stride-
    SOFT_SG_COLS records: cols [0:13) geometry, col 13 material id, col
    TRI_COLS (= 14) the GLOBAL triangle id (f32 — exact to 2^24, far past
    STREAM_MAX_TRIS).  Padded triangles are degenerate (zero record ->
    every gate fails, id never selected)."""
    T = tri_blob.shape[0]
    ids = jnp.arange(T, dtype=jnp.float32)[:, None]
    tb = jnp.concatenate([tri_blob, ids], axis=1)  # (T, SOFT_SG_COLS)
    # 512-tri pad: every coarse2 ssg DMA stays inside the blob (see
    # pallas_kernel.pack_triangles_sg)
    tb = _pad_axis(tb, 0, 8 * 8 * MEGA2_G, 0.0)
    ng = tb.shape[0] // MEGA2_G
    rows = tb.reshape(ng, MEGA2_G * SOFT_SG_COLS)
    return jnp.pad(rows, ((0, 0), (0, 256 - MEGA2_G * SOFT_SG_COLS)))


def _padded_group_bounds(tris, ng, beta=None):
    """Per-group SAH-leaf AABBs padded to the blob's ng with never-pass
    bounds; ``beta`` adds the soft sigmoid-support slack."""
    from raytpu.ops import accel

    glo, ghi = accel.chunk_bounds(tris, MEGA2_G)
    if beta is not None:
        slack = accel.chunk_soft_slack(tris, beta, MEGA2_G, SOFT_SUPPORT)
        glo = glo - slack[:, None]
        ghi = ghi + slack[:, None]
    pad = ng - glo.shape[0]
    glo = jnp.pad(glo, ((0, pad), (0, 0)), constant_values=jnp.inf)
    ghi = jnp.pad(ghi, ((0, pad), (0, 0)), constant_values=-jnp.inf)
    return glo, ghi


def _stream_shadow_worklists(scene, ro, dirs, mags, tmin, glo, ghi, mode):
    """Per-light packed streaming worklists -> (sg (nt,L,nwl1),
    g (nt,L,nge), cnt (nt,L,2)) in the given mega3 mode."""
    from raytpu.ops import accel

    L = dirs.shape[0]
    sgl, gl, cl = [], [], []
    for li in range(L):
        is_pt = scene.lights.kind[li] == LightKind.POINT
        cm = accel.shadow_cull_matrix(
            ro, dirs[li], mags[li], scene.lights.position[li], is_pt,
            glo, ghi, tmin)
        s_, g_, c_ = pk.mega3_worklists(cm, mode)
        sgl.append(s_)
        gl.append(g_)
        cl.append(c_)
    return jnp.stack(sgl, axis=1), jnp.stack(gl, axis=1), jnp.stack(cl, axis=1)


def _stream_geometry(scene, n_lights=1):
    """Shared streamed-kernel geometry: SMEM sphere/plane blobs + the
    (ng, 256) triangle DMA blob and its ring/mode parameters.  ``nwl1`` is
    the DMA-issue worklist length (nsg, or nssg in coarse2); ``nge`` the
    packed-entry worklist length."""
    sph_blob, pl_blob, tri_blob = _soft_packs(scene)
    blob = _pack_soft_sg(tri_blob)
    ng = blob.shape[0]
    nsg = ng // 8
    mode = pk.mega3_mode(ng, n_lights)
    nwl1 = nsg // 8 if mode == "coarse2" else nsg
    nge = {"fine": ng, "coarse": nsg, "coarse2": 1}[mode]
    D = pk.MEGA3_RING if mode == "fine" else pk.MEGA3_RING_COARSE
    ring = [
        pltpu.SMEM((D, 8, 256), jnp.float32),
        pltpu.SemaphoreType.DMA((D,)),
    ]
    S, P = scene.spheres.count, scene.planes.count
    sph_in = sph_blob if S else jnp.zeros((1, SP_COLS), jnp.float32)
    pln_in = pl_blob if P else jnp.zeros((1, SP_COLS), jnp.float32)
    return sph_in, pln_in, blob, ng, nwl1, nge, mode, ring


_SMEM0 = lambda shape: pl.BlockSpec(
    shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM)
_SMEMT = lambda shape: pl.BlockSpec(
    shape, lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
_VTILE = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _make_soft_stream_kernel(tmin, beta, S, P, L, mode):
    """Streamed soft-transmittance: per light, unrolled sphere/plane folds +
    one `_mega3_stream` pass over that light's packed triangle worklist."""
    rows = (None,) if mode == "fine" else range(8)

    def kernel(*refs):
        sph_ref, pl_ref, sgwl_ref, gwl_ref, cnt_ref, blob_ref = refs[:6]
        pos = 6
        px, py, pz = (r[:] for r in refs[pos : pos + 3])
        pos += 3
        light_cols = []
        for _ in range(L):
            lx, ly, lz, mag = (r[:] for r in refs[pos : pos + 4])
            pos += 4
            light_cols.append((lx, ly, lz, mag))
        out_refs = refs[pos : pos + L]
        scratch, sems = refs[pos + L], refs[pos + L + 1]

        for li in range(L):
            lx, ly, lz, mag = light_cols[li]
            tr = jnp.ones((8, 128), jnp.float32)
            for s in range(S):
                tr = tr * (1.0 - _sphere_soft_reg(
                    sph_ref, s, px, py, pz, lx, ly, lz, tmin, mag, beta))
            for p in range(P):
                tr = tr * (1.0 - _plane_soft_reg(
                    pl_ref, p, px, py, pz, lx, ly, lz, tmin, mag, beta))

            def fold_entry(slot, gr, tr, lx=lx, ly=ly, lz=lz, mag=mag):
                for r in rows:
                    g = gr if r is None else r
                    for m in range(MEGA2_G):
                        read = lambda c, m=m, g=g: scratch[slot, g, m * SOFT_SG_COLS + c]
                        tr = tr * (1.0 - _tri_soft_read(
                            read, px, py, pz, lx, ly, lz, tmin, mag, beta))
                return tr

            tr = pk._mega3_dispatch(
                mode, blob_ref, scratch, sems,
                lambda k, li=li: sgwl_ref[0, li, k],
                lambda q, li=li: gwl_ref[0, li, q],
                cnt_ref[0, li, 0], cnt_ref[0, li, 1], fold_entry, tr,
            )
            out_refs[li][:] = tr

    return kernel


def _soft_trans_stream(scene, ro, dirs, mags, tmin, beta):
    R = ro.shape[0]
    L = dirs.shape[0]
    S, P = scene.spheres.count, scene.planes.count
    nt = _cdiv(R, 1024)
    rows_pad = nt * 8
    interpret = pk._interpret or jax.default_backend() == "cpu"

    sph_in, pln_in, blob, ng, nwl1, nge, mode, ring = _stream_geometry(scene, L)
    glo, ghi = _padded_group_bounds(scene.triangles, ng, beta=beta)
    sh_sg, sh_g, sh_c = _stream_shadow_worklists(
        scene, ro, dirs, mags, tmin, glo, ghi, mode)

    p_tiles = [_vtiles(ro[:, c], rows_pad) for c in range(3)]
    light_tiles = []
    for li in range(L):
        for c in range(3):
            light_tiles.append(_vtiles(dirs[li, :, c], rows_pad))
        light_tiles.append(_vtiles(mags[li], rows_pad))

    kern = _make_soft_stream_kernel(tmin, beta, S, P, L, mode)
    trans = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[
            _SMEM0((max(S, 1), SP_COLS)), _SMEM0((max(P, 1), SP_COLS)),
            _SMEMT((1, L, nwl1)), _SMEMT((1, L, nge)), _SMEMT((1, L, 2)),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + [_VTILE] * (3 + 4 * L),
        out_specs=[_VTILE] * L,
        out_shape=[jax.ShapeDtypeStruct((rows_pad, 128), jnp.float32)] * L,
        scratch_shapes=ring,
        interpret=interpret,
    )(sph_in, pln_in, sh_sg, sh_g, sh_c, blob, *p_tiles, *light_tiles)
    return jnp.stack([t.reshape(-1)[:R] for t in trans])


def _make_anyhit_stream_kernel(tmin, S, P, L, mode):
    rows = (None,) if mode == "fine" else range(8)

    def kernel(*refs):
        sph_ref, pl_ref, sgwl_ref, gwl_ref, cnt_ref, blob_ref = refs[:6]
        pos = 6
        px, py, pz = (r[:] for r in refs[pos : pos + 3])
        pos += 3
        light_cols = []
        for _ in range(L):
            lx, ly, lz, mag = (r[:] for r in refs[pos : pos + 4])
            pos += 4
            light_cols.append((lx, ly, lz, mag))
        out_refs = refs[pos : pos + L]
        scratch, sems = refs[pos + L], refs[pos + L + 1]

        for li in range(L):
            lx, ly, lz, mag = light_cols[li]
            occ = jnp.zeros((8, 128), jnp.float32)
            for s in range(S):
                tc = pk._sphere_t_reg(sph_ref, s, px, py, pz, lx, ly, lz, tmin, mag)
                occ = jnp.where(tc < pk.INF, 1.0, occ)
            for p in range(P):
                tc = pk._plane_t_reg(pl_ref, p, px, py, pz, lx, ly, lz, tmin, mag)
                occ = jnp.where(tc < pk.INF, 1.0, occ)

            def fold_entry(slot, gr, occ, lx=lx, ly=ly, lz=lz, mag=mag):
                for r in rows:
                    g = gr if r is None else r
                    for m in range(MEGA2_G):
                        read = lambda c, m=m, g=g: scratch[slot, g, m * SOFT_SG_COLS + c]
                        tc = pk._tri_t_read(read, px, py, pz, lx, ly, lz,
                                            tmin, mag, shadow=True)
                        occ = jnp.where(tc < pk.INF, 1.0, occ)
                return occ

            occ = pk._mega3_dispatch(
                mode, blob_ref, scratch, sems,
                lambda k, li=li: sgwl_ref[0, li, k],
                lambda q, li=li: gwl_ref[0, li, q],
                cnt_ref[0, li, 0], cnt_ref[0, li, 1], fold_entry, occ,
            )
            out_refs[li][:] = occ

    return kernel


def _anyhit_stream(scene, ro, dirs, mags, tmin):
    R = ro.shape[0]
    L = dirs.shape[0]
    S, P = scene.spheres.count, scene.planes.count
    nt = _cdiv(R, 1024)
    rows_pad = nt * 8
    interpret = pk._interpret or jax.default_backend() == "cpu"

    sph_in, pln_in, blob, ng, nwl1, nge, mode, ring = _stream_geometry(scene, L)
    glo, ghi = _padded_group_bounds(scene.triangles, ng)
    sh_sg, sh_g, sh_c = _stream_shadow_worklists(
        scene, ro, dirs, mags, tmin, glo, ghi, mode)

    p_tiles = [_vtiles(ro[:, c], rows_pad) for c in range(3)]
    light_tiles = []
    for li in range(L):
        for c in range(3):
            light_tiles.append(_vtiles(dirs[li, :, c], rows_pad))
        light_tiles.append(_vtiles(mags[li], rows_pad))

    kern = _make_anyhit_stream_kernel(float(tmin), S, P, L, mode)
    occs = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[
            _SMEM0((max(S, 1), SP_COLS)), _SMEM0((max(P, 1), SP_COLS)),
            _SMEMT((1, L, nwl1)), _SMEMT((1, L, nge)), _SMEMT((1, L, 2)),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + [_VTILE] * (3 + 4 * L),
        out_specs=[_VTILE] * L,
        out_shape=[jax.ShapeDtypeStruct((rows_pad, 128), jnp.float32)] * L,
        scratch_shapes=ring,
        interpret=interpret,
    )(sph_in, pln_in, sh_sg, sh_g, sh_c, blob, *p_tiles, *light_tiles)
    return jnp.stack([o.reshape(-1)[:R] for o in occs]) > 0.5


def _make_mint_stream_kernel(tmin, S, P, mode, payload=False):
    """Streamed winner search: (t, global id) min-fold (+ optional payload
    registers); the triangle's global id comes from the blob's trailing
    column (offset by S+P in XLA-visible space)."""
    rows = (None,) if mode == "fine" else range(8)
    base_id = float(S + P)
    NC = 6 if payload else 2

    def kernel(sph_ref, pl_ref, sgwl_ref, gwl_ref, cnt_ref, blob_ref,
               ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, *rest):
        out_refs = rest[:NC]
        scratch, sems = rest[NC], rest[NC + 1]
        ox, oy, oz = ox_r[:], oy_r[:], oz_r[:]
        dx, dy, dz = dx_r[:], dy_r[:], dz_r[:]
        acc = [jnp.full((8, 128), pk.INF, jnp.float32)] + [
            jnp.zeros((8, 128), jnp.float32) for _ in range(NC - 1)]

        upd = _mint_upd(payload)
        acc = _fold_sp_mint(sph_ref, pl_ref, S, P, ox, oy, oz, dx, dy, dz,
                            tmin, upd, payload, acc)

        def fold_entry(slot, gr, carry):
            acc = list(carry)
            for r in rows:
                g = gr if r is None else r
                for m in range(MEGA2_G):
                    read = lambda c, m=m, g=g: scratch[slot, g, m * SOFT_SG_COLS + c]
                    tc = pk._tri_t_read(read, ox, oy, oz, dx, dy, dz,
                                        tmin, pk.INF, shadow=False)
                    pay = (read(9), read(10), read(11), read(13)) \
                        if payload else None
                    acc = upd(tc, read(TRI_COLS) + base_id, acc, pay)
            return tuple(acc)

        acc = pk._mega3_dispatch(
            mode, blob_ref, scratch, sems,
            lambda k: sgwl_ref[0, 0, k], lambda q: gwl_ref[0, 0, q],
            cnt_ref[0, 0, 0], cnt_ref[0, 0, 1], fold_entry, tuple(acc),
        )
        for r, v in zip(out_refs, acc):
            r[:] = v

    return kernel


def _mint_stream(scene, ro_b, rd, tmin, payload=False):
    from raytpu.ops import accel

    R = rd.shape[0]
    S, P = scene.spheres.count, scene.planes.count
    nt = _cdiv(R, 1024)
    rows_pad = nt * 8
    interpret = pk._interpret or jax.default_backend() == "cpu"

    sph_in, pln_in, blob, ng, nwl1, nge, mode, ring = _stream_geometry(scene)
    glo, ghi = _padded_group_bounds(scene.triangles, ng)
    rb = accel.ray_tile_bounds(ro_b, rd, jnp.inf, tile=1024)
    cullm = accel.cull_matrix(rb, glo, ghi, tmin)  # (nt, ng)
    sg_wl, g_wl, cnts = pk.mega3_worklists(cullm, mode)

    ray_tiles = [_vtiles(ro_b[:, c], rows_pad) for c in range(3)] + [
        _vtiles(rd[:, c], rows_pad) for c in range(3)
    ]

    NC = 6 if payload else 2
    kern = _make_mint_stream_kernel(float(tmin), S, P, mode, payload=payload)
    outs = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[
            _SMEM0((max(S, 1), SP_COLS)), _SMEM0((max(P, 1), SP_COLS)),
            _SMEMT((1, 1, nwl1)), _SMEMT((1, 1, nge)), _SMEMT((1, 1, 2)),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + [_VTILE] * 6,
        out_specs=[_VTILE] * NC,
        out_shape=[jax.ShapeDtypeStruct((rows_pad, 128), jnp.float32)] * NC,
        scratch_shapes=ring,
        interpret=interpret,
    )(sph_in, pln_in, sg_wl[:, None, :], g_wl[:, None, :], cnts[:, None, :],
      blob, *ray_tiles)
    return _mint_outputs(outs, R, payload)


def _make_dray_stream_kernel(tmin, beta, S, P, L, mode):
    """Streamed ray-side backward: one launch accumulates g_p (summed over
    lights) and per-light (g_dir, g_mag) registers over the streamed
    worklists — no carry chain, accumulators live in registers."""
    rows = (None,) if mode == "fine" else range(8)

    def kernel(*refs):
        sph_ref, pl_ref, sgwl_ref, gwl_ref, cnt_ref, blob_ref = refs[:6]
        pos = 6
        px, py, pz = (r[:] for r in refs[pos : pos + 3])
        pos += 3
        light_cols = []
        for _ in range(L):
            lx, ly, lz, mag = (r[:] for r in refs[pos : pos + 4])
            pos += 4
            light_cols.append((lx, ly, lz, mag))
        gs = [refs[pos + 2 * li][:] for li in range(L)]
        trs = [refs[pos + 2 * li + 1][:] for li in range(L)]
        pos += 2 * L
        out_refs = refs[pos : pos + 3 + 4 * L]
        scratch, sems = refs[pos + 3 + 4 * L], refs[pos + 3 + 4 * L + 1]

        gpx = jnp.zeros((8, 128), jnp.float32)
        gpy = jnp.zeros_like(gpx)
        gpz = jnp.zeros_like(gpx)
        for li in range(L):
            lx, ly, lz, mag = light_cols[li]
            g_occ_base = -gs[li] * trs[li]
            glx = jnp.zeros((8, 128), jnp.float32)
            gly = jnp.zeros_like(glx)
            glz = jnp.zeros_like(glx)
            gmag = jnp.zeros_like(glx)

            def add(contrib, gpx, gpy, gpz, glx, gly, glz, gmag):
                (dpx, dpy, dpz), (dlx, dly, dlz), dmag = contrib
                return (gpx + dpx, gpy + dpy, gpz + dpz,
                        glx + dlx, gly + dly, glz + dlz, gmag + dmag)

            for s in range(S):
                gpx, gpy, gpz, glx, gly, glz, gmag = add(
                    _sphere_dray(sph_ref, s, px, py, pz, lx, ly, lz, mag,
                                 g_occ_base, tmin, beta),
                    gpx, gpy, gpz, glx, gly, glz, gmag)
            for p in range(P):
                gpx, gpy, gpz, glx, gly, glz, gmag = add(
                    _plane_dray(pl_ref, p, px, py, pz, lx, ly, lz, mag,
                                g_occ_base, tmin, beta),
                    gpx, gpy, gpz, glx, gly, glz, gmag)

            def fold_entry(slot, gr, acc, lx=lx, ly=ly, lz=lz, mag=mag,
                           g_occ_base=g_occ_base, add=add):
                for r in rows:
                    g = gr if r is None else r
                    for m in range(MEGA2_G):
                        read = lambda c, m=m, g=g: scratch[slot, g, m * SOFT_SG_COLS + c]
                        acc = add(
                            _tri_dray_read(read, px, py, pz, lx, ly, lz, mag,
                                           g_occ_base, tmin, beta),
                            *acc)
                return acc

            acc = pk._mega3_dispatch(
                mode, blob_ref, scratch, sems,
                lambda k, li=li: sgwl_ref[0, li, k],
                lambda q, li=li: gwl_ref[0, li, q],
                cnt_ref[0, li, 0], cnt_ref[0, li, 1], fold_entry,
                (gpx, gpy, gpz, glx, gly, glz, gmag),
            )
            gpx, gpy, gpz, glx, gly, glz, gmag = acc
            out_refs[3 + 4 * li][:] = glx
            out_refs[4 + 4 * li][:] = gly
            out_refs[5 + 4 * li][:] = glz
            out_refs[6 + 4 * li][:] = gmag
        out_refs[0][:] = gpx
        out_refs[1][:] = gpy
        out_refs[2][:] = gpz

    return kernel


def _dray_stream(scene, ro, dirs, mags, g, trans, tmin, beta):
    R = ro.shape[0]
    L = dirs.shape[0]
    S, P = scene.spheres.count, scene.planes.count
    nt = _cdiv(R, 1024)
    rows_pad = nt * 8
    interpret = pk._interpret or jax.default_backend() == "cpu"

    sph_in, pln_in, blob, ng, nwl1, nge, mode, ring = _stream_geometry(scene, L)
    glo, ghi = _padded_group_bounds(scene.triangles, ng, beta=beta)
    sh_sg, sh_g, sh_c = _stream_shadow_worklists(
        scene, ro, dirs, mags, tmin, glo, ghi, mode)

    p_tiles = [_vtiles(ro[:, c], rows_pad) for c in range(3)]
    light_tiles = []
    for li in range(L):
        for c in range(3):
            light_tiles.append(_vtiles(dirs[li, :, c], rows_pad))
        light_tiles.append(_vtiles(mags[li], rows_pad))
    gt_tiles = []
    for li in range(L):
        gt_tiles.append(_vtiles(g[li], rows_pad))
        gt_tiles.append(_vtiles(trans[li], rows_pad))

    NOUT = 3 + 4 * L
    kern = _make_dray_stream_kernel(tmin, beta, S, P, L, mode)
    outs = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[
            _SMEM0((max(S, 1), SP_COLS)), _SMEM0((max(P, 1), SP_COLS)),
            _SMEMT((1, L, nwl1)), _SMEMT((1, L, nge)), _SMEMT((1, L, 2)),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + [_VTILE] * (3 + 4 * L + 2 * L),
        out_specs=[_VTILE] * NOUT,
        out_shape=[jax.ShapeDtypeStruct((rows_pad, 128), jnp.float32)] * NOUT,
        scratch_shapes=ring,
        interpret=interpret,
    )(sph_in, pln_in, sh_sg, sh_g, sh_c, blob, *p_tiles, *light_tiles,
      *gt_tiles)

    flat = [o.reshape(-1)[:R] for o in outs]
    g_p = jnp.stack(flat[:3], axis=1)
    g_dirs = jnp.stack(
        [jnp.stack(flat[3 + 4 * li : 6 + 4 * li], axis=1) for li in range(L)]
    )
    g_mags = jnp.stack([flat[6 + 4 * li] for li in range(L)])
    return g_p, g_dirs, g_mags


def _make_soft_mega_kernel(tmin, beta, S, P, Tl, ngl, L, first, culled):
    """One launch of the soft-transmittance chain: fold this SMEM triangle
    subset's (1 - occ) product per light; the first launch also folds the
    unrolled spheres/planes and initializes the accumulators."""

    def kernel(*refs):
        sph_ref, pl_ref, tri_ref, wl_ref, cnt_ref = refs[:5]
        pos = 5
        px, py, pz = (r[:] for r in refs[pos : pos + 3])
        pos += 3
        light_cols = []
        for _ in range(L):
            lx, ly, lz, mag = (r[:] for r in refs[pos : pos + 4])
            pos += 4
            light_cols.append((lx, ly, lz, mag))
        tr_in = None
        if not first:
            tr_in = refs[pos : pos + L]
            pos += L
        out_refs = refs[pos:]

        cnts = [cnt_ref[0, 0, li] for li in range(L)] if Tl else []
        for li in range(L):
            lx, ly, lz, mag = light_cols[li]
            tr = jnp.ones((8, 128), jnp.float32) if first else tr_in[li][:]
            if first:
                for s in range(S):
                    tr = tr * (1.0 - _sphere_soft_reg(
                        sph_ref, s, px, py, pz, lx, ly, lz, tmin, mag, beta))
                for p in range(P):
                    tr = tr * (1.0 - _plane_soft_reg(
                        pl_ref, p, px, py, pz, lx, ly, lz, tmin, mag, beta))
            if Tl:
                def fold_group(base, tr, lx=lx, ly=ly, lz=lz, mag=mag):
                    for kk in range(MEGA2_G):
                        tr = tr * (1.0 - _tri_soft_reg(
                            tri_ref, base + kk, px, py, pz, lx, ly, lz, tmin, mag, beta))
                    return tr

                if culled:
                    def body(j, tr, li=li, fold_group=fold_group):
                        g = wl_ref[0, li, j]
                        return fold_group(g * MEGA2_G, tr)

                    tr = jax.lax.fori_loop(0, cnts[li], body, tr)
                else:
                    for g in range(ngl):
                        tr = fold_group(g * MEGA2_G, tr)
            out_refs[li][:] = tr

    return kernel


def _soft_packs(scene: Scene):
    """SMEM blobs: spheres (S, SP_COLS), planes (P, SP_COLS), triangles
    (T, TRI_COLS) — geometry cols as before plus a trailing material id (read
    only by the payload-emitting winner search)."""
    sph = scene.spheres
    sph_blob = (
        jnp.stack([sph.center[:, 0], sph.center[:, 1], sph.center[:, 2],
                   sph.radius * sph.radius,
                   sph.material.astype(jnp.float32)], axis=1)
        if sph.count else jnp.zeros((0, SP_COLS), jnp.float32)
    )
    pln = scene.planes
    pl_blob = (
        jnp.stack([pln.normal[:, 0], pln.normal[:, 1], pln.normal[:, 2],
                   jnp.sum(pln.origin * pln.normal, axis=1),
                   pln.material.astype(jnp.float32)], axis=1)
        if pln.count else jnp.zeros((0, SP_COLS), jnp.float32)
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
             tr.cull.astype(jnp.float32),
             tr.material.astype(jnp.float32)],
            axis=1)
    else:
        tri_blob = jnp.zeros((0, TRI_COLS), jnp.float32)
    return sph_blob, pl_blob, tri_blob


def _vtiles(x, rows_pad):
    """(R,) -> (rows_pad, 128) vtile array (zero-padded; pure reshape)."""
    xp = jnp.pad(x, (0, rows_pad * 128 - x.shape[0]))
    return xp.reshape(rows_pad, 128)


def soft_trans_lights_pallas(scene: Scene, ro, dirs, mags, tmin, beta,
                             stream: bool | None = None):
    """Soft transmittance for all L lights: a mega2-style SMEM launch chain
    up to ``MAX_TRIS`` triangles, a mega3-style DMA-streamed single launch
    up to ``STREAM_MAX_TRIS`` beyond.

    ``stream`` is a ROUTING HINT, not a guarantee (here and in the other
    ``stream:``-accepting entry points): a degenerate scene (T == 0, or
    L == 0 where lights are folded) has no triangle stream to drive and
    always takes the chain path regardless of an explicit ``stream=True``
    — tests forcing the streamed kernels must use scenes with triangles.

    ro (R,3) shared shadow origins; dirs (L,R,3); mags (L,R).
    Returns (L, R) f32 transmittance in [0,1].  Matches
    ``intersect.soft_transmittance`` per light up to the culled sigmoid tail
    (< ~2e-9 per clipped primitive) and fp reassociation of the packed
    plane offset.
    """
    from raytpu.ops import accel

    R = ro.shape[0]
    L = dirs.shape[0]
    tmin = float(tmin)
    beta = float(beta)
    S, P, T = scene.spheres.count, scene.planes.count, scene.triangles.count
    assert T <= STREAM_MAX_TRIS, \
        f"soft_trans_lights_pallas supports <= {STREAM_MAX_TRIS} tris"
    assert S <= pk.MEGA2_MAX_UNROLL and P <= pk.MEGA2_MAX_UNROLL, \
        "sphere/plane unroll budget exceeded"
    if stream is None:
        stream = T > MAX_TRIS
    if stream and T and L:
        return _soft_trans_stream(scene, ro, dirs, mags, tmin, beta)
    nt = _cdiv(R, 1024)
    rows_pad = nt * 8
    interpret = pk._interpret or jax.default_backend() == "cpu"

    sph_blob, pl_blob, tri_blob = _soft_packs(scene)
    tri_blob = _pad_axis(tri_blob, 0, MEGA2_G, 0.0)  # degenerate pad tris gate off
    ng = tri_blob.shape[0] // MEGA2_G
    gpl = max(1, pk.MEGA2_MAX_SMEM_TRIS // MEGA2_G)
    NL = max(1, _cdiv(ng, gpl)) if T else 1
    ranges = [(k * gpl, min((k + 1) * gpl, ng)) for k in range(NL)] if T else [(0, 0)]
    culled = T >= 2 * MEGA2_G

    # per-(tile, light) group culling with the soft-support slack
    if culled:
        glo, ghi = accel.chunk_bounds(scene.triangles, MEGA2_G)
        slack = accel.chunk_soft_slack(scene.triangles, beta, MEGA2_G, SOFT_SUPPORT)
        glo = glo - slack[:, None]
        ghi = ghi + slack[:, None]
        culls = []
        for li in range(L):
            is_pt = scene.lights.kind[li] == LightKind.POINT
            culls.append(accel.shadow_cull_matrix(
                ro, dirs[li], mags[li], scene.lights.position[li], is_pt,
                glo, ghi, tmin))
        cullm = jnp.stack(culls, axis=1)  # (nt, L, ng)

    # ray/light data as (rows_pad, 128) vtiles (padded rays gate off: d=0)
    p_tiles = [_vtiles(ro[:, c], rows_pad) for c in range(3)]
    light_tiles = []
    for li in range(L):
        for c in range(3):
            light_tiles.append(_vtiles(dirs[li, :, c], rows_pad))
        light_tiles.append(_vtiles(mags[li], rows_pad))

    smem = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM)
    smem_t = lambda shape: pl.BlockSpec(shape, lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    vtile = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    acc_shape = jax.ShapeDtypeStruct((rows_pad, 128), jnp.float32)
    sph_in = sph_blob if S else jnp.zeros((1, SP_COLS), jnp.float32)
    pln_in = pl_blob if P else jnp.zeros((1, SP_COLS), jnp.float32)

    trans = None
    for k, (ga, gb) in enumerate(ranges):
        ngl = gb - ga
        Tl = ngl * MEGA2_G
        first = k == 0
        if culled:
            wl3, cnt2 = [], []
            for li in range(L):
                w_, c_ = pk.chunk_worklist(cullm[:, li, ga:gb])
                wl3.append(w_)
                cnt2.append(c_)
            wl_k = jnp.stack(wl3, axis=1)  # (nt, L, ngl)
            cnt_k = jnp.concatenate(cnt2, axis=1)  # (nt, L)
        else:
            wl_k = jnp.zeros((nt, max(L, 1), max(ngl, 1)), jnp.int32)
            cnt_k = jnp.full((nt, max(L, 1)), ngl, jnp.int32)
        kern = _make_soft_mega_kernel(
            tmin, beta, S if first else 0, P if first else 0, Tl, ngl, L,
            first, culled,
        )
        in_specs = [
            smem((max(S, 1), SP_COLS)), smem((max(P, 1), SP_COLS)), smem((max(Tl, 1), TRI_COLS)),
            smem_t((1, max(L, 1), max(ngl, 1))), smem_t((1, 1, max(L, 1))),
        ] + [vtile] * (3 + 4 * L)
        ins = [
            sph_in, pln_in,
            tri_blob[ga * MEGA2_G : gb * MEGA2_G] if Tl else jnp.zeros((1, TRI_COLS), jnp.float32),
            wl_k, cnt_k[:, None, :],
        ] + p_tiles + light_tiles
        aliases = {}
        if not first:
            base = len(ins)
            in_specs += [vtile] * L
            ins += list(trans)
            aliases = {base + j: j for j in range(L)}
        trans = pl.pallas_call(
            kern,
            grid=(nt,),
            in_specs=in_specs,
            out_specs=[vtile] * L,
            out_shape=[acc_shape] * L,
            input_output_aliases=aliases,
            interpret=interpret,
        )(*ins)
    return jnp.stack([t.reshape(-1)[:R] for t in trans])


# ---------------------------------------------------------------------------
# Hard (binary) all-lights any-hit in the mega2 layout, for arbitrary shadow
# origins: the per-chip occlusion query of the SHARDED renderer
# (raytpu/parallel/sharding.py) — the fused whole-frame mega2 shadow kernel
# (pallas_kernel._make_mega2_shadow_kernel) covers the single-chip path, but
# it regenerates camera rays in-kernel; this one takes packed ray tiles.
# ---------------------------------------------------------------------------


def _make_anyhit_kernel(tmin, S, P, Tl, ngl, L, first, culled):
    def kernel(*refs):
        sph_ref, pl_ref, tri_ref, wl_ref, cnt_ref = refs[:5]
        pos = 5
        px, py, pz = (r[:] for r in refs[pos : pos + 3])
        pos += 3
        light_cols = []
        for _ in range(L):
            lx, ly, lz, mag = (r[:] for r in refs[pos : pos + 4])
            pos += 4
            light_cols.append((lx, ly, lz, mag))
        occ_in = None
        if not first:
            occ_in = refs[pos : pos + L]
            pos += L
        out_refs = refs[pos:]

        cnts = [cnt_ref[0, 0, li] for li in range(L)] if Tl else []
        for li in range(L):
            lx, ly, lz, mag = light_cols[li]
            occ = jnp.zeros((8, 128), jnp.float32) if first else occ_in[li][:]
            if first:
                for s in range(S):
                    tc = pk._sphere_t_reg(sph_ref, s, px, py, pz, lx, ly, lz, tmin, mag)
                    occ = jnp.where(tc < pk.INF, 1.0, occ)
                for p in range(P):
                    tc = pk._plane_t_reg(pl_ref, p, px, py, pz, lx, ly, lz, tmin, mag)
                    occ = jnp.where(tc < pk.INF, 1.0, occ)
            if Tl:
                def fold_group(base, occ, lx=lx, ly=ly, lz=lz, mag=mag):
                    for kk in range(MEGA2_G):
                        tc = pk._tri_t_reg(tri_ref, base + kk, px, py, pz,
                                           lx, ly, lz, tmin, mag, shadow=True)
                        occ = jnp.where(tc < pk.INF, 1.0, occ)
                    return occ

                if culled:
                    def body(j, occ, li=li, fold_group=fold_group):
                        g = wl_ref[0, li, j]
                        return fold_group(g * MEGA2_G, occ)

                    occ = jax.lax.fori_loop(0, cnts[li], body, occ)
                else:
                    for g in range(ngl):
                        occ = fold_group(g * MEGA2_G, occ)
            out_refs[li][:] = occ

    return kernel


def any_hit_lights_mega2(scene: Scene, ro, dirs, mags, tmin,
                         stream: bool | None = None):
    """(L, R) bool occlusion for all lights, mega2 layout (DMA-streamed past
    ``MAX_TRIS`` triangles).

    ro (R,3) shadow origins; dirs (L,R,3); mags (L,R) segment lengths.
    Shadow rays invert triangle front/back culling (reference:
    source/Utils.h:114-127).  Same budgets as the soft kernels.
    """
    from raytpu.ops import accel

    R = ro.shape[0]
    L = dirs.shape[0]
    tmin = float(tmin)
    S, P, T = scene.spheres.count, scene.planes.count, scene.triangles.count
    assert T <= STREAM_MAX_TRIS and S <= pk.MEGA2_MAX_UNROLL and P <= pk.MEGA2_MAX_UNROLL
    if stream is None:
        stream = T > MAX_TRIS
    if stream and T and L:
        return _anyhit_stream(scene, ro, dirs, mags, tmin)
    nt = _cdiv(R, 1024)
    rows_pad = nt * 8
    interpret = pk._interpret or jax.default_backend() == "cpu"

    sph_blob, pl_blob, tri_blob = _soft_packs(scene)
    tri_blob = _pad_axis(tri_blob, 0, MEGA2_G, 0.0)
    ng = tri_blob.shape[0] // MEGA2_G
    gpl = max(1, pk.MEGA2_MAX_SMEM_TRIS // MEGA2_G)
    NL = max(1, _cdiv(ng, gpl)) if T else 1
    ranges = [(k * gpl, min((k + 1) * gpl, ng)) for k in range(NL)] if T else [(0, 0)]
    culled = T >= 2 * MEGA2_G

    if culled:
        glo, ghi = accel.chunk_bounds(scene.triangles, MEGA2_G)
        culls = []
        for li in range(L):
            is_pt = scene.lights.kind[li] == LightKind.POINT
            culls.append(accel.shadow_cull_matrix(
                ro, dirs[li], mags[li], scene.lights.position[li], is_pt,
                glo, ghi, tmin))
        cullm = jnp.stack(culls, axis=1)  # (nt, L, ng)

    p_tiles = [_vtiles(ro[:, c], rows_pad) for c in range(3)]
    light_tiles = []
    for li in range(L):
        for c in range(3):
            light_tiles.append(_vtiles(dirs[li, :, c], rows_pad))
        light_tiles.append(_vtiles(mags[li], rows_pad))

    smem = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM)
    smem_t = lambda shape: pl.BlockSpec(shape, lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    vtile = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    acc_shape = jax.ShapeDtypeStruct((rows_pad, 128), jnp.float32)
    sph_in = sph_blob if S else jnp.zeros((1, SP_COLS), jnp.float32)
    pln_in = pl_blob if P else jnp.zeros((1, SP_COLS), jnp.float32)

    occs = None
    for k, (ga, gb) in enumerate(ranges):
        ngl = gb - ga
        Tl = ngl * MEGA2_G
        first = k == 0
        if culled:
            wl3, cnt2 = [], []
            for li in range(L):
                w_, c_ = pk.chunk_worklist(cullm[:, li, ga:gb])
                wl3.append(w_)
                cnt2.append(c_)
            wl_k = jnp.stack(wl3, axis=1)
            cnt_k = jnp.concatenate(cnt2, axis=1)
        else:
            wl_k = jnp.zeros((nt, max(L, 1), max(ngl, 1)), jnp.int32)
            cnt_k = jnp.full((nt, max(L, 1)), ngl, jnp.int32)
        kern = _make_anyhit_kernel(
            tmin, S if first else 0, P if first else 0, Tl, ngl, L, first, culled,
        )
        in_specs = [
            smem((max(S, 1), SP_COLS)), smem((max(P, 1), SP_COLS)), smem((max(Tl, 1), TRI_COLS)),
            smem_t((1, max(L, 1), max(ngl, 1))), smem_t((1, 1, max(L, 1))),
        ] + [vtile] * (3 + 4 * L)
        ins = [
            sph_in, pln_in,
            tri_blob[ga * MEGA2_G : gb * MEGA2_G] if Tl else jnp.zeros((1, TRI_COLS), jnp.float32),
            wl_k, cnt_k[:, None, :],
        ] + p_tiles + light_tiles
        aliases = {}
        if not first:
            base = len(ins)
            in_specs += [vtile] * L
            ins += list(occs)
            aliases = {base + j: j for j in range(L)}
        occs = pl.pallas_call(
            kern,
            grid=(nt,),
            in_specs=in_specs,
            out_specs=[vtile] * L,
            out_shape=[acc_shape] * L,
            input_output_aliases=aliases,
            interpret=interpret,
        )(*ins)
    return jnp.stack([o.reshape(-1)[:R] for o in occs]) > 0.5


# ---------------------------------------------------------------------------
# Detached winner search: mega2-style (t, index) closest-hit fold for
# arbitrary rays.  The detached differentiable path only needs WHICH
# primitive wins per ray (raytpu/grad/fast.py re-derives the payload
# differentiably), so this kernel folds just two (8, 128) registers — min-t
# and the winning primitive id — over unrolled spheres/planes and the culled
# SMEM triangle worklist.  Replaces the (RT, CT) chunked ``scene_min_t``,
# which measured no faster than the dense jnp argmin on 300-tri scenes
# (PERF.md round 2: the mega2 scalar-broadcast layout is the one that wins).
# ---------------------------------------------------------------------------


def _fid(k, base_id):
    """f32 primitive id for unroll index ``k`` (python int or i32 scalar)."""
    if isinstance(k, int):
        return jnp.float32(k + base_id)
    return (k + base_id).astype(jnp.float32)


def _mint_upd(payload):
    """Winner-search min-fold update, shared by the chain and streamed
    kernels: strict < keeps the first-in-fold-order winner on ties; with
    ``payload`` the winner's (normal, material) registers ride along."""

    def upd(tc, fid, acc, pay=None):
        sel = tc < acc[0]
        new = [jnp.where(sel, tc, acc[0]), jnp.where(sel, fid, acc[1])]
        if payload:
            new += [jnp.where(sel, pv, av) for pv, av in zip(pay, acc[2:])]
        return new

    return upd


def _fold_sp_mint(sph_ref, pl_ref, S, P, ox, oy, oz, dx, dy, dz, tmin,
                  upd, payload, acc):
    """Unrolled sphere/plane winner folds (+ optional payload emission),
    shared by the chain and streamed mint kernels.  The sphere normal uses
    the same post-selection normalize formula as assemble_hit_records
    (reference: source/Scene.cpp:40)."""
    for s in range(S):
        tc = pk._sphere_t_reg(sph_ref, s, ox, oy, oz, dx, dy, dz, tmin, pk.INF)
        pay = None
        if payload:
            cnx = ox + tc * dx - sph_ref[s, 0]
            cny = oy + tc * dy - sph_ref[s, 1]
            cnz = oz + tc * dz - sph_ref[s, 2]
            n_len = jnp.sqrt(jnp.maximum(
                cnx * cnx + cny * cny + cnz * cnz, 1e-20))
            pay = (cnx / n_len, cny / n_len, cnz / n_len, sph_ref[s, 4])
        acc = upd(tc, _fid(s, 0), acc, pay)
    for p in range(P):
        tc = pk._plane_t_reg(pl_ref, p, ox, oy, oz, dx, dy, dz, tmin, pk.INF)
        pay = (pl_ref[p, 0], pl_ref[p, 1], pl_ref[p, 2], pl_ref[p, 4]) \
            if payload else None
        acc = upd(tc, _fid(p, S), acc, pay)
    return acc


def _make_mint_kernel(tmin, S, P, Tl, ngl, base_id, first, culled,
                      payload=False):
    """One launch of the winner-search chain over its SMEM triangle subset;
    ``base_id`` is the global id of this launch's first triangle row.
    ``payload`` additionally carries the winner's (normal, material id)
    registers — emitted from the same SMEM records the fold already reads,
    making the XLA payload-assembly matmuls unnecessary downstream."""
    NC = 6 if payload else 2

    def kernel(sph_ref, pl_ref, tri_ref, wl_ref, cnt_ref,
               ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, *rest):
        cnt = cnt_ref[0, 0, 0]
        ox, oy, oz = ox_r[:], oy_r[:], oz_r[:]
        dx, dy, dz = dx_r[:], dy_r[:], dz_r[:]
        if first:
            acc = [jnp.full((8, 128), pk.INF, jnp.float32)] + [
                jnp.zeros((8, 128), jnp.float32) for _ in range(NC - 1)]
            out_refs = rest
        else:
            acc = [r[:] for r in rest[:NC]]
            out_refs = rest[NC:]

        upd = _mint_upd(payload)
        if first:
            acc = _fold_sp_mint(sph_ref, pl_ref, S, P, ox, oy, oz, dx, dy, dz,
                                tmin, upd, payload, acc)
        if Tl:
            def fold_group(base, acc):
                for kk in range(MEGA2_G):
                    k = base + kk
                    tc = pk._tri_t_reg(tri_ref, k, ox, oy, oz, dx, dy, dz,
                                       tmin, pk.INF, shadow=False)
                    pay = (tri_ref[k, 9], tri_ref[k, 10], tri_ref[k, 11],
                           tri_ref[k, 13]) if payload else None
                    acc = upd(tc, _fid(k, base_id), acc, pay)
                return acc

            if culled:
                def body(j, acc):
                    g = wl_ref[0, 0, j]
                    return tuple(fold_group(g * MEGA2_G, list(acc)))

                acc = list(jax.lax.fori_loop(0, cnt, body, tuple(acc)))
            else:
                for g in range(ngl):
                    acc = fold_group(g * MEGA2_G, acc)
        for r, v in zip(out_refs, acc):
            r[:] = v

    return kernel


def _mint_outputs(outs, R, payload):
    t = outs[0].reshape(-1)[:R]
    idx = outs[1].reshape(-1)[:R].astype(jnp.int32)
    if not payload:
        return t, idx
    normal = jnp.stack([outs[2 + c].reshape(-1)[:R] for c in range(3)], axis=1)
    mat = outs[5].reshape(-1)[:R].astype(jnp.int32)
    return t, idx, normal, mat


def hit_records_from_payload(ro_b, rd, t, normal, mat):
    """HitRecords from a payload-emitting winner search — the single source
    of the payload->records assembly (bit-identical to
    ``intersect.assemble_hit_records``; used by the sharded closest hit and
    the detached-payload differentiable path)."""
    from raytpu.ops import intersect

    hit = jnp.isfinite(t)
    t_safe = jnp.where(hit, t, 0.0)
    return intersect.HitRecords(
        hit=hit, t=jnp.where(hit, t, jnp.inf),
        point=ro_b + t_safe[:, None] * rd, normal=normal, material=mat,
    )


def scene_min_t_mega2(scene: Scene, ro, rd, tmin, stream: bool | None = None,
                      payload: bool = False):
    """Mega2-layout closest-hit winner search for arbitrary rays.

    Returns ``(t (R,), idx (R,) i32)`` — the winning hit distance (INF on
    miss) and the winner's global primitive id in reference iteration order
    (spheres, planes, triangles; reference: source/Scene.cpp:29-66).  Ties
    between triangles in different cull groups may resolve to either (the
    worklist visits groups in cull-quality order, not scene order).  Built
    for ``detached_closest_hit(min_t_fn=...)``: forward-only, no VJP.
    DMA-streamed in one launch past ``MAX_TRIS`` triangles.
    """
    from raytpu.ops import accel

    R = rd.shape[0]
    tmin = float(tmin)
    ro_b = jnp.broadcast_to(ro, rd.shape)
    S, P, T = scene.spheres.count, scene.planes.count, scene.triangles.count
    assert T <= STREAM_MAX_TRIS and S <= pk.MEGA2_MAX_UNROLL and P <= pk.MEGA2_MAX_UNROLL
    if stream is None:
        stream = T > MAX_TRIS
    if stream and T:
        return _mint_stream(scene, ro_b, rd, tmin, payload=payload)
    NC = 6 if payload else 2
    nt = _cdiv(R, 1024)
    rows_pad = nt * 8
    interpret = pk._interpret or jax.default_backend() == "cpu"

    sph_blob, pl_blob, tri_blob = _soft_packs(scene)
    tri_blob = _pad_axis(tri_blob, 0, MEGA2_G, 0.0)  # degenerate pad tris miss
    ng = tri_blob.shape[0] // MEGA2_G
    gpl = max(1, pk.MEGA2_MAX_SMEM_TRIS // MEGA2_G)
    NL = max(1, _cdiv(ng, gpl)) if T else 1
    ranges = [(k * gpl, min((k + 1) * gpl, ng)) for k in range(NL)] if T else [(0, 0)]
    culled = T >= 2 * MEGA2_G

    if culled:
        glo, ghi = accel.chunk_bounds(scene.triangles, MEGA2_G)
        rb = accel.ray_tile_bounds(ro_b, rd, jnp.inf, tile=1024)
        cullm = accel.cull_matrix(rb, glo, ghi, tmin)  # (nt, ng)

    ray_tiles = [_vtiles(ro_b[:, c], rows_pad) for c in range(3)] + [
        _vtiles(rd[:, c], rows_pad) for c in range(3)
    ]  # padded rays have d=0 -> every test misses

    smem = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM)
    smem_t = lambda shape: pl.BlockSpec(shape, lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    vtile = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    acc_shape = jax.ShapeDtypeStruct((rows_pad, 128), jnp.float32)
    sph_in = sph_blob if S else jnp.zeros((1, SP_COLS), jnp.float32)
    pln_in = pl_blob if P else jnp.zeros((1, SP_COLS), jnp.float32)

    outs = None
    for k, (ga, gb) in enumerate(ranges):
        ngl = gb - ga
        Tl = ngl * MEGA2_G
        first = k == 0
        if culled:
            wl_k, cnt_k = pk.chunk_worklist(cullm[:, ga:gb])
        else:
            wl_k = jnp.zeros((nt, max(ngl, 1)), jnp.int32)
            cnt_k = jnp.full((nt, 1), ngl, jnp.int32)
        kern = _make_mint_kernel(
            tmin, S if first else 0, P if first else 0, Tl, ngl,
            S + P + ga * MEGA2_G, first, culled, payload=payload,
        )
        in_specs = [
            smem((max(S, 1), SP_COLS)), smem((max(P, 1), SP_COLS)), smem((max(Tl, 1), TRI_COLS)),
            smem_t((1, 1, max(ngl, 1))), smem_t((1, 1, 1)),
        ] + [vtile] * 6
        ins = [
            sph_in, pln_in,
            tri_blob[ga * MEGA2_G : gb * MEGA2_G] if Tl else jnp.zeros((1, TRI_COLS), jnp.float32),
            wl_k[:, None, :], cnt_k[:, :, None],
        ] + ray_tiles
        aliases = {}
        if not first:
            base = len(ins)
            in_specs += [vtile] * NC
            ins += list(outs)
            aliases = {base + j: j for j in range(NC)}
        outs = pl.pallas_call(
            kern,
            grid=(nt,),
            in_specs=in_specs,
            out_specs=[vtile] * NC,
            out_shape=[acc_shape] * NC,
            input_output_aliases=aliases,
            interpret=interpret,
        )(*ins)
    return _mint_outputs(outs, R, payload)


# ---------------------------------------------------------------------------
# Ray-side backward kernel (the "dgrad" of the dgrad/wgrad split): cotangents
# for the shadow origins, light directions, and light distances, accumulated
# per ray over the same culled worklists as the forward.  Per-primitive
# (geometry) cotangents need a cross-ray reduction and live in a separate
# prim-parallel kernel; callers fall back to the jnp VJP for those
# (raytpu/grad/soft.py), which XLA prunes unless geometry is optimized.
#
# Chain rule per class (g_m = dL/d margin, recomputed forward in-register):
#   occ    = min(sigmoid(beta*margin), OCC_MAX) * gate
#   g_occ  = -g * trans_total / (1 - occ)          (prod VJP, factors >= 1e-6)
#   g_m    = g_occ * gate * [sig < OCC_MAX] * beta * sig * (1 - sig)
#   sphere: margin=(r2-perp2)/r2 -> g_perp2=-g_m/r2;
#           g_p += 2 g_perp2 (L - proj l) [dL/dp=-I], g_l += -2 g_perp2 proj L
#   plane:  margin=min(t-tmin, mag-t), t=num/denom ->
#           g_t = +-g_m, g_mag += g_m [far side], g_p += -(g_t/denom) n,
#           g_l += (-g_t t/denom) n
#   tri:    margin=min(u,v,1-u-v); u=det(s,l,e2)/a, v=det(l,s,e1)/a,
#           a=det(e1,l,e2) -> triple-product partials:
#           g_s = g_Nu (l x e2) + g_Nv (e1 x l);  g_p += g_s
#           g_l += g_Nu (e2 x s) + g_Nv (s x e1) + g_a (e2 x e1)
# ---------------------------------------------------------------------------


def _dsig(margin, gate, beta):
    """d occ / d margin for gated lanes (0 where clipped by OCC_MAX)."""
    sig = 1.0 / (1.0 + jnp.exp(-beta * margin))
    live = gate & (sig < OCC_MAX)
    return jnp.where(live, beta * sig * (1.0 - sig), 0.0), jnp.where(
        gate, jnp.minimum(sig, OCC_MAX), 0.0
    )


def _sphere_dray(sph_ref, s, px, py, pz, lx, ly, lz, mag, g_occ_base, tmin, beta):
    cx, cy, cz, r2 = sph_ref[s, 0], sph_ref[s, 1], sph_ref[s, 2], sph_ref[s, 3]
    Lx = cx - px
    Ly = cy - py
    Lz = cz - pz
    proj = lx * Lx + ly * Ly + lz * Lz
    perp2 = Lx * Lx + Ly * Ly + Lz * Lz - proj * proj
    margin = (r2 - perp2) / r2
    inside = margin > 0.0
    t = proj - jnp.sqrt(jnp.where(inside, r2 - perp2, 1.0))
    gate = inside & (t >= tmin) & (t <= mag)
    docc, occ = _dsig(margin, gate, beta)
    g_m = g_occ_base / (1.0 - occ) * docc
    g_perp2 = -g_m / r2
    c2 = 2.0 * g_perp2
    g_px = -c2 * (Lx - proj * lx)
    g_py = -c2 * (Ly - proj * ly)
    g_pz = -c2 * (Lz - proj * lz)
    g_lx = -c2 * proj * Lx
    g_ly = -c2 * proj * Ly
    g_lz = -c2 * proj * Lz
    zero = jnp.zeros_like(g_px)
    return (g_px, g_py, g_pz), (g_lx, g_ly, g_lz), zero


def _plane_dray(pl_ref, p, px, py, pz, lx, ly, lz, mag, g_occ_base, tmin, beta):
    nx, ny, nz, d = pl_ref[p, 0], pl_ref[p, 1], pl_ref[p, 2], pl_ref[p, 3]
    denom = lx * nx + ly * ny + lz * nz
    denom_nz = jnp.abs(denom) > FLT_EPSILON
    denom_s = jnp.where(denom_nz, denom, 1.0)
    num = d - (px * nx + py * ny + pz * nz)
    t = num / denom_s
    near = (t - tmin) <= (mag - t)
    margin = jnp.minimum(t - tmin, mag - t)
    gate = denom_nz & (margin > 0.0)
    docc, occ = _dsig(margin, gate, beta)
    g_m = g_occ_base / (1.0 - occ) * docc
    g_t = jnp.where(near, g_m, -g_m)
    g_mag = jnp.where(near, 0.0, g_m)
    g_num = g_t / denom_s
    g_den = -g_t * t / denom_s
    return (
        (-g_num * nx, -g_num * ny, -g_num * nz),
        (g_den * nx, g_den * ny, g_den * nz),
        g_mag,
    )


def _tri_dray(tri_ref, k, px, py, pz, lx, ly, lz, mag, g_occ_base, tmin, beta):
    return _tri_dray_read(lambda c: tri_ref[k, c], px, py, pz, lx, ly, lz,
                          mag, g_occ_base, tmin, beta)


def _tri_dray_read(read, px, py, pz, lx, ly, lz, mag, g_occ_base, tmin, beta):
    v0x, v0y, v0z = read(0), read(1), read(2)
    e1x, e1y, e1z = read(3), read(4), read(5)
    e2x, e2y, e2z = read(6), read(7), read(8)
    nx, ny, nz = read(9), read(10), read(11)
    cull = read(12)
    cull_dot = nx * lx + ny * ly + nz * lz
    not_par = jnp.abs(cull_dot) >= FLT_EPSILON
    cull_eff = jnp.where(cull == 2.0, 2.0, 1.0 - cull)
    culled = ((cull_eff == 0.0) & (cull_dot < 0.0)) | ((cull_eff == 1.0) & (cull_dot > 0.0))
    hx = ly * e2z - lz * e2y
    hy = lz * e2x - lx * e2z
    hz = lx * e2y - ly * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    det_ok = jnp.abs(a) >= FLT_EPSILON
    inv_a = 1.0 / jnp.where(det_ok, a, 1.0)
    sx = px - v0x
    sy = py - v0y
    sz = pz - v0z
    u = inv_a * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = inv_a * (lx * qx + ly * qy + lz * qz)
    t = inv_a * (e2x * qx + e2y * qy + e2z * qz)
    w = 1.0 - u - v
    margin = jnp.minimum(jnp.minimum(u, v), w)
    gate = not_par & ~culled & det_ok & (t >= tmin) & (t < mag)
    docc, occ = _dsig(margin, gate, beta)
    g_m = g_occ_base / (1.0 - occ) * docc
    su = (u <= v) & (u <= w)
    sv = jnp.logical_not(su) & (v <= w)
    sw = jnp.logical_not(su) & jnp.logical_not(sv)
    su_f = jnp.where(su, 1.0, 0.0)
    sv_f = jnp.where(sv, 1.0, 0.0)
    sw_f = jnp.where(sw, 1.0, 0.0)
    g_u = g_m * (su_f - sw_f)
    g_v = g_m * (sv_f - sw_f)
    g_Nu = g_u * inv_a
    g_Nv = g_v * inv_a
    g_a = -(g_u * u + g_v * v) * inv_a
    # g_s = g_Nu * (l x e2) + g_Nv * (e1 x l)
    ex_lx = e1y * lz - e1z * ly  # e1 x l
    ex_ly = e1z * lx - e1x * lz
    ex_lz = e1x * ly - e1y * lx
    g_sx = g_Nu * hx + g_Nv * ex_lx
    g_sy = g_Nu * hy + g_Nv * ex_ly
    g_sz = g_Nu * hz + g_Nv * ex_lz
    # g_l = g_Nu * (e2 x s) + g_Nv * (s x e1) + g_a * (e2 x e1)
    e2s_x = e2y * sz - e2z * sy
    e2s_y = e2z * sx - e2x * sz
    e2s_z = e2x * sy - e2y * sx
    e21_x = e2y * e1z - e2z * e1y
    e21_y = e2z * e1x - e2x * e1z
    e21_z = e2x * e1y - e2y * e1x
    g_lx = g_Nu * e2s_x + g_Nv * qx + g_a * e21_x
    g_ly = g_Nu * e2s_y + g_Nv * qy + g_a * e21_y
    g_lz = g_Nu * e2s_z + g_Nv * qz + g_a * e21_z
    zero = jnp.zeros_like(g_sx)
    return (g_sx, g_sy, g_sz), (g_lx, g_ly, g_lz), zero


def _make_soft_dray_kernel(tmin, beta, S, P, Tl, ngl, L, first, culled):
    """One launch of the ray-side backward chain: accumulates g_p (summed
    over lights) and per-light (g_dir, g_mag) registers over this SMEM
    triangle subset (+ unrolled spheres/planes on the first launch)."""

    def kernel(*refs):
        sph_ref, pl_ref, tri_ref, wl_ref, cnt_ref = refs[:5]
        pos = 5
        px, py, pz = (r[:] for r in refs[pos : pos + 3])
        pos += 3
        light_cols = []
        for _ in range(L):
            lx, ly, lz, mag = (r[:] for r in refs[pos : pos + 4])
            pos += 4
            light_cols.append((lx, ly, lz, mag))
        gs = [refs[pos + 2 * li][:] for li in range(L)]
        trs = [refs[pos + 2 * li + 1][:] for li in range(L)]
        pos += 2 * L
        carry_in = None
        if not first:
            carry_in = refs[pos : pos + 3 + 4 * L]
            pos += 3 + 4 * L
        out_refs = refs[pos:]

        cnts = [cnt_ref[0, 0, li] for li in range(L)] if Tl else []
        if first:
            gpx = jnp.zeros((8, 128), jnp.float32)
            gpy = jnp.zeros_like(gpx)
            gpz = jnp.zeros_like(gpx)
        else:
            gpx, gpy, gpz = (r[:] for r in carry_in[:3])

        for li in range(L):
            lx, ly, lz, mag = light_cols[li]
            # dL/d occ_j = -g * trans / (1 - occ_j): fold the constant part
            g_occ_base = -gs[li] * trs[li]
            if first:
                glx = jnp.zeros((8, 128), jnp.float32)
                gly = jnp.zeros_like(glx)
                glz = jnp.zeros_like(glx)
                gmag = jnp.zeros_like(glx)
            else:
                glx, gly, glz, gmag = (r[:] for r in carry_in[3 + 4 * li : 7 + 4 * li])

            def add(contrib, gpx, gpy, gpz, glx, gly, glz, gmag):
                (dpx, dpy, dpz), (dlx, dly, dlz), dmag = contrib
                return (gpx + dpx, gpy + dpy, gpz + dpz,
                        glx + dlx, gly + dly, glz + dlz, gmag + dmag)

            if first:
                for s in range(S):
                    gpx, gpy, gpz, glx, gly, glz, gmag = add(
                        _sphere_dray(sph_ref, s, px, py, pz, lx, ly, lz, mag,
                                     g_occ_base, tmin, beta),
                        gpx, gpy, gpz, glx, gly, glz, gmag)
                for p in range(P):
                    gpx, gpy, gpz, glx, gly, glz, gmag = add(
                        _plane_dray(pl_ref, p, px, py, pz, lx, ly, lz, mag,
                                    g_occ_base, tmin, beta),
                        gpx, gpy, gpz, glx, gly, glz, gmag)
            if Tl:
                def fold_group(base, acc, lx=lx, ly=ly, lz=lz, mag=mag,
                               g_occ_base=g_occ_base):
                    for kk in range(MEGA2_G):
                        acc = add(
                            _tri_dray(tri_ref, base + kk, px, py, pz,
                                      lx, ly, lz, mag, g_occ_base, tmin, beta),
                            *acc)
                    return acc

                acc = (gpx, gpy, gpz, glx, gly, glz, gmag)
                if culled:
                    def body(j, acc, li=li, fold_group=fold_group):
                        g = wl_ref[0, li, j]
                        return fold_group(g * MEGA2_G, acc)

                    acc = jax.lax.fori_loop(0, cnts[li], body, acc)
                else:
                    for g in range(ngl):
                        acc = fold_group(g * MEGA2_G, acc)
                gpx, gpy, gpz, glx, gly, glz, gmag = acc

            out_refs[3 + 4 * li][:] = glx
            out_refs[4 + 4 * li][:] = gly
            out_refs[5 + 4 * li][:] = glz
            out_refs[6 + 4 * li][:] = gmag
        out_refs[0][:] = gpx
        out_refs[1][:] = gpy
        out_refs[2][:] = gpz

    return kernel


def soft_dray_pallas(scene: Scene, ro, dirs, mags, g, trans, tmin, beta,
                     stream: bool | None = None):
    """Ray-side VJP of ``soft_trans_lights_pallas``: cotangents for the
    shadow origins, light directions, and light distances.

    g, trans: (L, R) upstream cotangent and saved forward transmittance.
    Returns ``(g_p (R,3), g_dirs (L,R,3), g_mags (L,R))``.
    DMA-streamed in one launch past ``MAX_TRIS`` triangles.
    """
    from raytpu.ops import accel

    R = ro.shape[0]
    L = dirs.shape[0]
    tmin = float(tmin)
    beta = float(beta)
    S, P, T = scene.spheres.count, scene.planes.count, scene.triangles.count
    assert T <= STREAM_MAX_TRIS and S <= pk.MEGA2_MAX_UNROLL and P <= pk.MEGA2_MAX_UNROLL
    if stream is None:
        stream = T > MAX_TRIS
    if stream and T and L:
        return _dray_stream(scene, ro, dirs, mags, g, trans, tmin, beta)
    nt = _cdiv(R, 1024)
    rows_pad = nt * 8
    interpret = pk._interpret or jax.default_backend() == "cpu"

    sph_blob, pl_blob, tri_blob = _soft_packs(scene)
    tri_blob = _pad_axis(tri_blob, 0, MEGA2_G, 0.0)
    ng = tri_blob.shape[0] // MEGA2_G
    gpl = max(1, pk.MEGA2_MAX_SMEM_TRIS // MEGA2_G)
    NL = max(1, _cdiv(ng, gpl)) if T else 1
    ranges = [(k * gpl, min((k + 1) * gpl, ng)) for k in range(NL)] if T else [(0, 0)]
    culled = T >= 2 * MEGA2_G

    if culled:
        glo, ghi = accel.chunk_bounds(scene.triangles, MEGA2_G)
        slack = accel.chunk_soft_slack(scene.triangles, beta, MEGA2_G, SOFT_SUPPORT)
        glo = glo - slack[:, None]
        ghi = ghi + slack[:, None]
        culls = []
        for li in range(L):
            is_pt = scene.lights.kind[li] == LightKind.POINT
            culls.append(accel.shadow_cull_matrix(
                ro, dirs[li], mags[li], scene.lights.position[li], is_pt,
                glo, ghi, tmin))
        cullm = jnp.stack(culls, axis=1)

    p_tiles = [_vtiles(ro[:, c], rows_pad) for c in range(3)]
    light_tiles = []
    for li in range(L):
        for c in range(3):
            light_tiles.append(_vtiles(dirs[li, :, c], rows_pad))
        light_tiles.append(_vtiles(mags[li], rows_pad))
    gt_tiles = []
    for li in range(L):
        gt_tiles.append(_vtiles(g[li], rows_pad))
        gt_tiles.append(_vtiles(trans[li], rows_pad))

    smem = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.SMEM)
    smem_t = lambda shape: pl.BlockSpec(shape, lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    vtile = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    acc_shape = jax.ShapeDtypeStruct((rows_pad, 128), jnp.float32)
    sph_in = sph_blob if S else jnp.zeros((1, SP_COLS), jnp.float32)
    pln_in = pl_blob if P else jnp.zeros((1, SP_COLS), jnp.float32)
    NOUT = 3 + 4 * L

    outs = None
    for k, (ga, gb) in enumerate(ranges):
        ngl = gb - ga
        Tl = ngl * MEGA2_G
        first = k == 0
        if culled:
            wl3, cnt2 = [], []
            for li in range(L):
                w_, c_ = pk.chunk_worklist(cullm[:, li, ga:gb])
                wl3.append(w_)
                cnt2.append(c_)
            wl_k = jnp.stack(wl3, axis=1)
            cnt_k = jnp.concatenate(cnt2, axis=1)
        else:
            wl_k = jnp.zeros((nt, max(L, 1), max(ngl, 1)), jnp.int32)
            cnt_k = jnp.full((nt, max(L, 1)), ngl, jnp.int32)
        kern = _make_soft_dray_kernel(
            tmin, beta, S if first else 0, P if first else 0, Tl, ngl, L,
            first, culled,
        )
        in_specs = [
            smem((max(S, 1), SP_COLS)), smem((max(P, 1), SP_COLS)), smem((max(Tl, 1), TRI_COLS)),
            smem_t((1, max(L, 1), max(ngl, 1))), smem_t((1, 1, max(L, 1))),
        ] + [vtile] * (3 + 4 * L + 2 * L)
        ins = [
            sph_in, pln_in,
            tri_blob[ga * MEGA2_G : gb * MEGA2_G] if Tl else jnp.zeros((1, TRI_COLS), jnp.float32),
            wl_k, cnt_k[:, None, :],
        ] + p_tiles + light_tiles + gt_tiles
        aliases = {}
        if not first:
            base = len(ins)
            in_specs += [vtile] * NOUT
            ins += list(outs)
            aliases = {base + j: j for j in range(NOUT)}
        outs = pl.pallas_call(
            kern,
            grid=(nt,),
            in_specs=in_specs,
            out_specs=[vtile] * NOUT,
            out_shape=[acc_shape] * NOUT,
            input_output_aliases=aliases,
            interpret=interpret,
        )(*ins)

    flat = [o.reshape(-1)[:R] for o in outs]
    g_p = jnp.stack(flat[:3], axis=1)  # (R,3)
    g_dirs = jnp.stack(
        [jnp.stack(flat[3 + 4 * li : 6 + 4 * li], axis=1) for li in range(L)]
    )  # (L,R,3)
    g_mags = jnp.stack([flat[6 + 4 * li] for li in range(L)])  # (L,R)
    return g_p, g_dirs, g_mags


# ---------------------------------------------------------------------------
# Prim-side backward kernel (the "wgrad"): triangle-vertex cotangents,
# accumulated across rays.  Layout flip: a worklist GROUP is MEGA2_G = 8
# triangles — exactly one sublane axis — so each (8, 128) block is (8 tris x
# 128 rays), triangle attributes are (8, 1) column slices of a VMEM-resident
# blob, and per-group grad accumulators stay in registers until one
# lane-reduction + read-modify-write per group.  The output block is
# revisited across the sequential ray-tile grid (zeroed at tile 0), so the
# cross-ray reduction needs no scatters and no host-side segment sums.
#
# Triple-product partials (s = p - v0, h = l x e2, q = s x e1):
#   g_s   = g_Nu h + g_Nv (e1 x l)        -> g_v0 (holding e1, e2) = -g_s
#   g_e1  = g_Nv (l x s) + g_a h
#   g_e2  = g_Nu (s x l) + g_a (e1 x l)
# and dL/dv1 = g_e1, dL/dv2 = g_e2, dL/dv0 = -g_s - g_e1 - g_e2 (the blob
# stores v0/e1/e2); the conversion to v0/v1/v2 happens in XLA.
# Sphere/plane geometry cotangents are cheap (<= 16 unrolled primitives) and
# come from a surgical jnp VJP on a triangle-free scene (raytpu/grad/soft.py).
# ---------------------------------------------------------------------------


def _make_soft_dprim_kernel(tmin, beta, Tl, ngl, L, culled, coarse=False):
    def kernel(*refs):
        tri_ref, wl_ref, cnt_ref = refs[:3]
        pos = 3
        px_r, py_r, pz_r = refs[pos : pos + 3]
        pos += 3
        light_refs = [refs[pos + 4 * li : pos + 4 * li + 4] for li in range(L)]
        pos += 4 * L
        gt_refs = [refs[pos + 2 * li : pos + 2 * li + 2] for li in range(L)]
        pos += 2 * L
        out_ref = refs[pos]

        i = pl.program_id(0)
        cnts = [cnt_ref[0, 0, li] for li in range(L)]

        @pl.when(i == 0)
        def _init():
            out_ref[:] = jnp.zeros((Tl, 9), jnp.float32)

        px, py, pz = px_r[:], py_r[:], pz_r[:]

        for li in range(L):
            lxr, lyr, lzr, magr = (r[:] for r in light_refs[li])
            g_t, tr_t = gt_refs[li][0][:], gt_refs[li][1][:]

            def group_grads(base, lxr=lxr, lyr=lyr, lzr=lzr, magr=magr,
                            g_t=g_t, tr_t=tr_t):
                ds = pl.ds(base, 8)
                v0x, v0y, v0z = tri_ref[ds, 0:1], tri_ref[ds, 1:2], tri_ref[ds, 2:3]
                e1x, e1y, e1z = tri_ref[ds, 3:4], tri_ref[ds, 4:5], tri_ref[ds, 5:6]
                e2x, e2y, e2z = tri_ref[ds, 6:7], tri_ref[ds, 7:8], tri_ref[ds, 8:9]
                nx, ny, nz = tri_ref[ds, 9:10], tri_ref[ds, 10:11], tri_ref[ds, 11:12]
                cull = tri_ref[ds, 12:13]
                cull_eff = jnp.where(cull == 2.0, 2.0, 1.0 - cull)
                acc = [jnp.zeros((8, 128), jnp.float32) for _ in range(9)]
                for r in range(8):
                    ox = px[r : r + 1, :]  # (1,128) ray row vs (8,1) tri cols
                    oy = py[r : r + 1, :]
                    oz = pz[r : r + 1, :]
                    lx = lxr[r : r + 1, :]
                    ly = lyr[r : r + 1, :]
                    lz = lzr[r : r + 1, :]
                    mag = magr[r : r + 1, :]
                    g_occ_base = -g_t[r : r + 1, :] * tr_t[r : r + 1, :]
                    cull_dot = nx * lx + ny * ly + nz * lz
                    not_par = jnp.abs(cull_dot) >= FLT_EPSILON
                    culled_m = ((cull_eff == 0.0) & (cull_dot < 0.0)) | (
                        (cull_eff == 1.0) & (cull_dot > 0.0))
                    hx = ly * e2z - lz * e2y
                    hy = lz * e2x - lx * e2z
                    hz = lx * e2y - ly * e2x
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
                    v = inv_a * (lx * qx + ly * qy + lz * qz)
                    t = inv_a * (e2x * qx + e2y * qy + e2z * qz)
                    w = 1.0 - u - v
                    margin = jnp.minimum(jnp.minimum(u, v), w)
                    gate = not_par & ~culled_m & det_ok & (t >= tmin) & (t < mag)
                    sig = 1.0 / (1.0 + jnp.exp(-beta * margin))
                    occ = jnp.where(gate, jnp.minimum(sig, OCC_MAX), 0.0)
                    live = gate & (sig < OCC_MAX)
                    docc = jnp.where(live, beta * sig * (1.0 - sig), 0.0)
                    g_m = g_occ_base / (1.0 - occ) * docc
                    su = (u <= v) & (u <= w)
                    sv = jnp.logical_not(su) & (v <= w)
                    sw = jnp.logical_not(su) & jnp.logical_not(sv)
                    g_u = g_m * (jnp.where(su, 1.0, 0.0) - jnp.where(sw, 1.0, 0.0))
                    g_v = g_m * (jnp.where(sv, 1.0, 0.0) - jnp.where(sw, 1.0, 0.0))
                    g_Nu = g_u * inv_a
                    g_Nv = g_v * inv_a
                    g_a = -(g_u * u + g_v * v) * inv_a
                    e1l_x = e1y * lz - e1z * ly  # e1 x l
                    e1l_y = e1z * lx - e1x * lz
                    e1l_z = e1x * ly - e1y * lx
                    ls_x = ly * sz - lz * sy  # l x s
                    ls_y = lz * sx - lx * sz
                    ls_z = lx * sy - ly * sx
                    # g_s
                    acc[0] += g_Nu * hx + g_Nv * e1l_x
                    acc[1] += g_Nu * hy + g_Nv * e1l_y
                    acc[2] += g_Nu * hz + g_Nv * e1l_z
                    # g_e1 = g_Nv (l x s) + g_a h
                    acc[3] += g_Nv * ls_x + g_a * hx
                    acc[4] += g_Nv * ls_y + g_a * hy
                    acc[5] += g_Nv * ls_z + g_a * hz
                    # g_e2 = g_Nu (s x l) + g_a (e1 x l)
                    acc[6] += -g_Nu * ls_x + g_a * e1l_x
                    acc[7] += -g_Nu * ls_y + g_a * e1l_y
                    acc[8] += -g_Nu * ls_z + g_a * e1l_z
                for c in range(9):
                    red = jnp.sum(acc[c], axis=1, keepdims=True)  # (8,1)
                    out_ref[ds, c : c + 1] += red

            if culled and coarse:
                # entries are SUPER-GROUP ids (8 groups / 64 tris): the
                # worklist SMEM stays O(T/64) per tile at any mesh size
                def body(j, carry, li=li, group_grads=group_grads):
                    sg = wl_ref[0, li, j]
                    base = pl.multiple_of(sg * (8 * MEGA2_G), 8 * MEGA2_G)
                    for r in range(8):
                        group_grads(base + r * MEGA2_G)
                    return carry

                jax.lax.fori_loop(0, cnts[li], body, 0)
            elif culled:
                def body(j, carry, li=li, group_grads=group_grads):
                    g = wl_ref[0, li, j]
                    group_grads(pl.multiple_of(g * MEGA2_G, MEGA2_G))
                    return carry

                jax.lax.fori_loop(0, cnts[li], body, 0)
            else:
                for g in range(ngl):
                    group_grads(g * MEGA2_G)

    return kernel


#: triangles per dprim launch in big-T (stream) mode.  VMEM pads the last
#: dim of the (Tl, 13) blob and (Tl, 9) output to 128 lanes, so each costs
#: Tl*512 bytes: 1024 groups = 8,192 tris -> ~4.2 MB each, inside the 16 MB
#: scoped-VMEM limit (4096 groups OOM'd at lowering: the padded output alone
#: was 16.8 MB)
DPRIM_STREAM_GPL = 1024


def soft_dprim_pallas(scene: Scene, ro, dirs, mags, g, trans, tmin, beta,
                      stream: bool | None = None):
    """Triangle-vertex VJP of ``soft_trans_lights_pallas``: returns
    ``(g_v0, g_v1, g_v2)`` each (T, 3), summed over all rays and lights.

    The per-launch output is accumulated in a revisited (Tl, 9) block across
    the sequential ray-tile grid; SMEM-chained launches cover disjoint
    triangle subsets, so their outputs concatenate.
    """
    from raytpu.ops import accel

    R = ro.shape[0]
    L = dirs.shape[0]
    tmin = float(tmin)
    beta = float(beta)
    T = scene.triangles.count
    assert 0 < T <= STREAM_MAX_TRIS
    if stream is None:
        stream = T > MAX_TRIS
    nt = _cdiv(R, 1024)
    rows_pad = nt * 8
    interpret = pk._interpret or jax.default_backend() == "cpu"

    _, _, tri_blob = _soft_packs(scene)
    if stream:
        # big-T mode: the blob is VMEM (vector reads — no SMEM ceiling), so
        # launches can carry DPRIM_STREAM_GPL groups each; worklists drop to
        # super-group granularity (O(T/64) SMEM per tile at any mesh size)
        tri_blob = _pad_axis(tri_blob, 0, 8 * MEGA2_G, 0.0)
        gpl = DPRIM_STREAM_GPL
    else:
        tri_blob = _pad_axis(tri_blob, 0, MEGA2_G, 0.0)
        gpl = max(1, pk.MEGA2_MAX_SMEM_TRIS // MEGA2_G)
    ng = tri_blob.shape[0] // MEGA2_G
    NL = max(1, _cdiv(ng, gpl))
    ranges = [(k * gpl, min((k + 1) * gpl, ng)) for k in range(NL)]
    culled = stream or T >= 2 * MEGA2_G

    if culled:
        # pad group bounds to the (possibly super-group-padded) blob's ng
        # with never-pass bounds so padded groups are never worklisted
        glo, ghi = _padded_group_bounds(scene.triangles, ng, beta=beta)
        culls = []
        for li in range(L):
            is_pt = scene.lights.kind[li] == LightKind.POINT
            culls.append(accel.shadow_cull_matrix(
                ro, dirs[li], mags[li], scene.lights.position[li], is_pt,
                glo, ghi, tmin))
        cullm = jnp.stack(culls, axis=1)

    p_tiles = [_vtiles(ro[:, c], rows_pad) for c in range(3)]
    light_tiles = []
    for li in range(L):
        for c in range(3):
            light_tiles.append(_vtiles(dirs[li, :, c], rows_pad))
        light_tiles.append(_vtiles(mags[li], rows_pad))
    gt_tiles = []
    for li in range(L):
        gt_tiles.append(_vtiles(g[li], rows_pad))
        gt_tiles.append(_vtiles(trans[li], rows_pad))

    smem_t = lambda shape: pl.BlockSpec(shape, lambda i: (i, 0, 0), memory_space=pltpu.SMEM)
    vtile = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)

    outs = []
    for ga, gb in ranges:
        ngl = gb - ga
        Tl = ngl * MEGA2_G
        if culled:
            wl3, cnt2 = [], []
            for li in range(L):
                cm_l = cullm[:, li, ga:gb]
                if stream:  # reduce to super-group entries
                    cm_l = cm_l.reshape(nt, ngl // 8, 8).max(axis=2)
                w_, c_ = pk.chunk_worklist(cm_l)
                wl3.append(w_)
                cnt2.append(c_)
            wl_k = jnp.stack(wl3, axis=1)
            cnt_k = jnp.concatenate(cnt2, axis=1)
        else:
            wl_k = jnp.zeros((nt, max(L, 1), max(ngl, 1)), jnp.int32)
            cnt_k = jnp.full((nt, max(L, 1)), ngl, jnp.int32)
        kern = _make_soft_dprim_kernel(tmin, beta, Tl, ngl, L, culled,
                                       coarse=stream)
        nwl = ngl // 8 if stream else ngl
        in_specs = [
            pl.BlockSpec((Tl, TRI_COLS), lambda i: (0, 0), memory_space=pltpu.VMEM),
            smem_t((1, max(L, 1), max(nwl, 1))), smem_t((1, 1, max(L, 1))),
        ] + [vtile] * (3 + 4 * L + 2 * L)
        ins = [
            tri_blob[ga * MEGA2_G : gb * MEGA2_G], wl_k, cnt_k[:, None, :],
        ] + p_tiles + light_tiles + gt_tiles
        out = pl.pallas_call(
            kern,
            grid=(nt,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((Tl, 9), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Tl, 9), jnp.float32),
            interpret=interpret,
        )(*ins)
        outs.append(out)

    full = jnp.concatenate(outs, axis=0)[:T]  # (T, 9): [g_s, g_e1, g_e2]
    g_s, g_e1, g_e2 = full[:, 0:3], full[:, 3:6], full[:, 6:9]
    return -g_s - g_e1 - g_e2, g_e1, g_e2
