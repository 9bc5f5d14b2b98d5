"""Pallas soft-transmittance kernels + custom-VJP pairing (raytpu.grad.soft).

Runs in interpret mode on CPU (conftest).  The kernel must match the jnp
``intersect.soft_transmittance`` up to the culled sigmoid tail (< ~2e-9 per
clipped primitive); gradients are the jnp VJP by construction but are
re-checked end to end through the renderer.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.core import scenes
from raytpu.core.types import RenderConfig
from raytpu.grad import diff_render
from raytpu.grad.soft import _jnp_ref, soft_trans_lights
from raytpu.ops import intersect, shading
from raytpu.render import renderer


def _shadow_inputs(name, w, h):
    scene = scenes.get(name).build()
    cfg = RenderConfig(width=w, height=h, soft_shadows=True)
    ro, rd = renderer.generate_rays(scene.camera, cfg)
    ro = jnp.broadcast_to(ro, rd.shape)
    rec = intersect.closest_hit(scene, ro, rd, cfg.ray_min)
    p = rec.point + rec.normal * jnp.float32(cfg.normal_offset)
    lds = [shading.direction_to_light(scene.lights, li, p)
           for li in range(scene.lights.count)]
    dirs = jnp.stack([l for l, _ in lds])
    mags = jnp.stack([m for _, m in lds])
    return scene, cfg, p, dirs, mags


@pytest.mark.parametrize("name", ["reference", "bunny"])
def test_soft_kernel_matches_jnp(name):
    scene, cfg, p, dirs, mags = _shadow_inputs(name, 64, 48)
    ref = _jnp_ref(cfg.ray_min, cfg.soft_beta, scene, p, dirs, mags)
    out = soft_trans_lights(True, cfg.ray_min, cfg.soft_beta, scene, p, dirs, mags)
    # atol: the pack's precomputed plane d = dot(o, n) and the kernel sigmoid
    # reassociate fp ops; beta=300 amplifies ulp-level margin differences on
    # rays grazing a shadow edge (observed max ~2e-4 on isolated elements)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=5e-4)


def test_soft_kernel_grads_are_jnp_grads():
    """The custom VJP must equal jax.grad of the jnp reference exactly
    (same function, same residuals)."""
    scene, cfg, p, dirs, mags = _shadow_inputs("reference", 32, 24)

    def loss_k(p_, d_, m_, s_):
        return jnp.sum(soft_trans_lights(True, cfg.ray_min, cfg.soft_beta, s_, p_, d_, m_) ** 2)

    def loss_j(p_, d_, m_, s_):
        return jnp.sum(_jnp_ref(cfg.ray_min, cfg.soft_beta, s_, p_, d_, m_) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(p, dirs, mags, scene)
    gj = jax.grad(loss_j, argnums=(0, 1, 2))(p, dirs, mags, scene)
    for a, b in zip(gk, gj):
        # the only difference is the forward value entering the squared loss
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_soft_kernel_directional_light_matches_jnp():
    """Directional lights shadow with mag=FLT_MAX through the kernels
    (reference's directional branch is dead code; ours is live)."""
    from raytpu.core import obj
    from raytpu.core.types import CullMode, SceneBuilder

    b = SceneBuilder()
    m = b.add_lambert((0.8, 0.2, 0.2), 1.0)
    b.add_plane((0.0, 0.0, 0.0), (0.0, 1.0, 0.0), m)
    pos, nrm, idx = obj.parse_obj("lowpoly_bunny2.obj")
    mesh = b.add_triangle_mesh(CullMode.NONE, m)
    mesh.set_geometry(pos, idx, nrm)
    mesh.scale((2.0, 2.0, 2.0))
    b.add_directional_light((0.3, -0.8, 0.5), 2.0, (1.0, 1.0, 1.0))
    b.add_point_light((0.0, 5.0, 5.0), 50.0, (1.0, 0.8, 0.5))
    b.set_camera((0.0, 3.0, -9.0), fov_degrees=45.0)
    scene = b.build()
    cfg = RenderConfig(width=48, height=32, soft_shadows=True)
    ro, rd = renderer.generate_rays(scene.camera, cfg)
    ro = jnp.broadcast_to(ro, rd.shape)
    rec = intersect.closest_hit(scene, ro, rd, cfg.ray_min)
    p = rec.point + rec.normal * jnp.float32(cfg.normal_offset)
    lds = [shading.direction_to_light(scene.lights, li, p)
           for li in range(scene.lights.count)]
    dirs = jnp.stack([l for l, _ in lds])
    mags = jnp.stack([m_ for _, m_ in lds])
    ref = _jnp_ref(cfg.ray_min, cfg.soft_beta, scene, p, dirs, mags)
    out = soft_trans_lights(True, cfg.ray_min, cfg.soft_beta, scene, p, dirs, mags)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=5e-4)


@pytest.mark.parametrize("name", ["reference", "bunny"])
def test_mint_kernel_matches_jnp_argmin(name):
    """Mega2 winner-search kernel vs the dense jnp t-matrix argmin: same
    winners and hit mask; t matches to fp reassociation."""
    from raytpu.ops import soa
    from raytpu.render import pallas_soft

    scene = scenes.get(name).build()
    cfg = RenderConfig(width=64, height=48)
    ro, rd = renderer.generate_rays(scene.camera, cfg)
    ro = jnp.broadcast_to(ro, rd.shape)
    tmat = intersect._scene_t_matrix_T(
        scene, soa.comps(ro), soa.comps(rd), cfg.ray_min, intersect.INF,
        shadow_pass=False,
    )
    t_ref = jnp.min(tmat, axis=0)
    idx_ref = jnp.argmin(tmat, axis=0)
    t_k, idx_k = pallas_soft.scene_min_t_mega2(scene, ro, rd, cfg.ray_min)
    hit_ref = np.asarray(jnp.isfinite(t_ref))
    assert (np.asarray(jnp.isfinite(t_k)) == hit_ref).all()
    assert (np.asarray(idx_k)[hit_ref] == np.asarray(idx_ref)[hit_ref]).all()
    np.testing.assert_allclose(
        np.asarray(t_k)[hit_ref], np.asarray(t_ref)[hit_ref], rtol=2e-5
    )


@pytest.mark.parametrize("name", ["reference", "bunny"])
def test_anyhit_mega2_matches_jnp(name):
    """Hard all-lights any-hit (mega2 layout) vs the jnp op, including the
    shadow-pass cull inversion."""
    from raytpu.render import pallas_soft

    scene, cfg, p, dirs, mags = _shadow_inputs(name, 64, 48)
    occ_k = np.asarray(
        pallas_soft.any_hit_lights_mega2(scene, p, dirs, mags, cfg.ray_min)
    )
    occ_j = np.stack(
        [
            np.asarray(
                intersect.any_hit(scene, p, dirs[li], jnp.float32(cfg.ray_min), mags[li])
            )
            for li in range(scene.lights.count)
        ]
    )
    # fp reassociation can flip grazing shadow rays on isolated pixels
    assert (occ_k != occ_j).mean() < 0.002, f"flip fraction {(occ_k != occ_j).mean()}"


@pytest.mark.parametrize("name", ["reference", "bunny"])
def test_dray_kernel_matches_jnp_vjp(name):
    """Hand-written ray-side backward kernel vs jax.vjp of the jnp op."""
    from raytpu.render import pallas_soft

    scene, cfg, p, dirs, mags = _shadow_inputs(name, 48, 32)
    trans = _jnp_ref(cfg.ray_min, cfg.soft_beta, scene, p, dirs, mags)
    key = jax.random.PRNGKey(0)
    g = jax.random.uniform(key, trans.shape, jnp.float32, -1.0, 1.0)
    g_p, g_dirs, g_mags = pallas_soft.soft_dray_pallas(
        scene, p, dirs, mags, g, trans, cfg.ray_min, cfg.soft_beta
    )
    _, vjp = jax.vjp(
        lambda pp, dd, mm: _jnp_ref(cfg.ray_min, cfg.soft_beta, scene, pp, dd, mm),
        p, dirs, mags,
    )
    r_p, r_dirs, r_mags = vjp(g)
    # beta=300 chain factors amplify ulp-level margin differences on shadow-
    # edge rays (packed plane d = dot(o, n) reassociates; observed ~2.5e-4 on
    # isolated elements); compare with a scale-relative tolerance per array
    for a, b in ((g_p, r_p), (g_dirs, r_dirs), (g_mags, r_mags)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-3)


def test_dprim_kernel_matches_jnp_vjp():
    """Prim-parallel triangle-vertex backward kernel vs jax.vjp of the jnp op."""
    from raytpu.render import pallas_soft

    scene, cfg, p, dirs, mags = _shadow_inputs("bunny", 48, 32)
    trans = _jnp_ref(cfg.ray_min, cfg.soft_beta, scene, p, dirs, mags)
    g = jax.random.uniform(jax.random.PRNGKey(1), trans.shape, jnp.float32, -1.0, 1.0)
    g_v0, g_v1, g_v2 = pallas_soft.soft_dprim_pallas(
        scene, p, dirs, mags, g, trans, cfg.ray_min, cfg.soft_beta
    )
    import dataclasses

    def f(v0, v1, v2):
        tr = dataclasses.replace(scene.triangles, v0=v0, v1=v1, v2=v2)
        s = dataclasses.replace(scene, triangles=tr)
        return _jnp_ref(cfg.ray_min, cfg.soft_beta, s, p, dirs, mags)

    _, vjp = jax.vjp(f, scene.triangles.v0, scene.triangles.v1, scene.triangles.v2)
    r_v0, r_v1, r_v2 = vjp(g)
    for a, b in ((g_v0, r_v0), (g_v1, r_v1), (g_v2, r_v2)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-3)


def test_render_soft_kernels_mesh_vertex_grads_close():
    """End-to-end: mesh-vertex gradients with kernels on vs off (exercises
    the dprim kernel + surgical sphere/plane cotangent split)."""
    scene = scenes.get("bunny").build()
    cfg = RenderConfig(width=48, height=32)

    def loss(v0, k):
        tr = dataclasses.replace(scene.triangles, v0=v0)
        s = dataclasses.replace(scene, triangles=tr)
        return jnp.mean(diff_render.render_soft_f32(s, cfg, kernels=k))

    g_j = np.asarray(jax.grad(lambda v: loss(v, False))(scene.triangles.v0))
    g_k = np.asarray(jax.grad(lambda v: loss(v, True))(scene.triangles.v0))
    scale = max(np.abs(g_j).max(), 1e-8)
    np.testing.assert_allclose(g_k / scale, g_j / scale, atol=2e-3)
    assert np.abs(g_k).sum() > 0


def test_render_soft_kernels_image_close():
    """Full differentiable render with kernels on vs off: images match up to
    isolated closest-hit winner flips (fp reassociation, CLAUDE.md)."""
    scene = scenes.get("bunny").build()
    cfg = RenderConfig(width=48, height=32)
    img_j = np.asarray(diff_render.render_soft_f32(scene, cfg, kernels=False))
    img_k = np.asarray(diff_render.render_soft_f32(scene, cfg, kernels=True))
    diff = np.abs(img_j - img_k).max(axis=-1)
    assert (diff > 1e-3).mean() < 0.01, f"flip fraction {(diff > 1e-3).mean()}"
    assert np.median(diff) < 1e-5


def test_render_soft_kernels_grads_close():
    scene = scenes.get("bunny").build()
    cfg = RenderConfig(width=48, height=32)

    def mat_loss(c, k):
        s = dataclasses.replace(
            scene, materials=dataclasses.replace(scene.materials, color=c)
        )
        return jnp.mean(diff_render.render_soft_f32(s, cfg, kernels=k))

    g_j = np.asarray(jax.grad(lambda c: mat_loss(c, False))(scene.materials.color))
    g_k = np.asarray(jax.grad(lambda c: mat_loss(c, True))(scene.materials.color))
    np.testing.assert_allclose(g_k, g_j, rtol=5e-3, atol=1e-6)

    def light_loss(pos, k):
        s = dataclasses.replace(
            scene, lights=dataclasses.replace(scene.lights, position=pos)
        )
        return jnp.mean(diff_render.render_soft_f32(s, cfg, kernels=k))

    gl_j = np.asarray(jax.grad(lambda x: light_loss(x, False))(scene.lights.position))
    gl_k = np.asarray(jax.grad(lambda x: light_loss(x, True))(scene.lights.position))
    np.testing.assert_allclose(gl_k, gl_j, rtol=2e-2, atol=1e-6)
    assert np.isfinite(gl_k).all() and np.abs(gl_k).sum() > 0


def test_render_soft_kernels_tiled_image_close():
    """32-divisible resolutions take the mega2 tile-order fold inside
    render_soft_f32 (tight per-1024-ray cull cones); the unfold must restore
    row-major pixel order exactly, so kernels on/off still match up to
    isolated winner flips."""
    scene = scenes.get("bunny").build()
    cfg = RenderConfig(width=64, height=32)
    img_j = np.asarray(diff_render.render_soft_f32(scene, cfg, kernels=False))
    img_k = np.asarray(diff_render.render_soft_f32(scene, cfg, kernels=True))
    diff = np.abs(img_j - img_k).max(axis=-1)
    assert (diff > 1e-3).mean() < 0.01, f"flip fraction {(diff > 1e-3).mean()}"
    assert np.median(diff) < 1e-5

    def loss(v0, k):
        tr = dataclasses.replace(scene.triangles, v0=v0)
        s = dataclasses.replace(scene, triangles=tr)
        return jnp.mean(diff_render.render_soft_f32(s, cfg, kernels=k))

    g_j = np.asarray(jax.grad(lambda v: loss(v, False))(scene.triangles.v0))
    g_k = np.asarray(jax.grad(lambda v: loss(v, True))(scene.triangles.v0))
    scale = max(np.abs(g_j).max(), 1e-8)
    np.testing.assert_allclose(g_k / scale, g_j / scale, atol=2e-3)


# ---------------------------------------------------------------------------
# DMA-streamed variants (round 4): past MAX_TRIS every soft kernel family
# streams its triangle worklist mega3-style.  Forced on small scenes via
# stream=True; coarse worklists forced by shrinking pk.MEGA3_FINE_MAX_G.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def chain_reference():
    """stream=False outputs for every soft kernel family, computed ONCE:
    the chain path never reads the MEGA3_* knobs the mode cases patch, so
    the three streamed modes can all diff against this (interpret-mode
    chain renders dominate the suite's runtime otherwise)."""
    from raytpu.render import pallas_soft as ps

    scene, cfg, p, dirs, mags = _shadow_inputs("bunny", 64, 32)
    tmin, beta = float(cfg.ray_min), float(cfg.soft_beta)
    a = np.asarray(ps.soft_trans_lights_pallas(scene, p, dirs, mags, tmin, beta, stream=False))
    oa = np.asarray(ps.any_hit_lights_mega2(scene, p, dirs, mags, tmin, stream=False))
    ta, ia = ps.scene_min_t_mega2(scene, p, dirs[0], tmin, stream=False)
    g = jnp.full_like(jnp.asarray(a), 0.5)
    ga = ps.soft_dray_pallas(scene, p, dirs, mags, g, jnp.asarray(a), tmin, beta, stream=False)
    da = ps.soft_dprim_pallas(scene, p, dirs, mags, g, jnp.asarray(a), tmin, beta, stream=False)
    return dict(scene=scene, cfg=cfg, p=p, dirs=dirs, mags=mags, tmin=tmin,
                beta=beta, a=a, oa=oa, ta=ta, ia=ia, g=g, ga=ga, da=da)


@pytest.mark.parametrize("mode", ["fine", "coarse", "coarse2"])
def test_streamed_kernels_match_chain(monkeypatch, mode, chain_reference):
    from raytpu.render import pallas_kernel as pk
    from raytpu.render import pallas_soft as ps

    if mode != "fine":
        monkeypatch.setattr(pk, "MEGA3_FINE_MAX_G", 8)
    if mode == "coarse2":
        monkeypatch.setattr(pk, "MEGA3_WL_SMEM_ENTRIES", 1)
    r = chain_reference
    scene, p, dirs, mags = r["scene"], r["p"], r["dirs"], r["mags"]
    tmin, beta, a, g = r["tmin"], r["beta"], r["a"], r["g"]

    b = np.asarray(ps.soft_trans_lights_pallas(scene, p, dirs, mags, tmin, beta, stream=True))
    # coarse folds the sigmoid-tail triangles the fine cull clips (~2e-9
    # each) and reassociates the product
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)

    ob = np.asarray(ps.any_hit_lights_mega2(scene, p, dirs, mags, tmin, stream=True))
    np.testing.assert_array_equal(ob, r["oa"])

    tb, ib = ps.scene_min_t_mega2(scene, p, dirs[0], tmin, stream=True)
    np.testing.assert_array_equal(np.asarray(ib), np.asarray(r["ia"]))
    fin = np.isfinite(np.asarray(r["ta"]))
    np.testing.assert_allclose(np.asarray(tb)[fin], np.asarray(r["ta"])[fin], rtol=1e-6)

    gb = ps.soft_dray_pallas(scene, p, dirs, mags, g, jnp.asarray(a), tmin, beta, stream=True)
    for x, y in zip(r["ga"], gb):
        sc = max(np.abs(np.asarray(x)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(y) / sc, np.asarray(x) / sc, atol=1e-5)

    db = ps.soft_dprim_pallas(scene, p, dirs, mags, g, jnp.asarray(a), tmin, beta, stream=True)
    for x, y in zip(r["da"], db):
        sc = max(np.abs(np.asarray(x)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(y) / sc, np.asarray(x) / sc, atol=1e-5)


def test_render_soft_streamed_end_to_end(monkeypatch):
    """Full differentiable render + grads with streaming FORCED (MAX_TRIS=0
    routes every kernel through the DMA path) vs the jnp path."""
    from raytpu.render import pallas_soft as ps

    monkeypatch.setattr(ps, "MAX_TRIS", 0)
    scene = scenes.get("bunny").build()
    cfg = RenderConfig(width=96, height=32)
    img_j = np.asarray(diff_render.render_soft_f32(scene, cfg, kernels=False))
    img_k = np.asarray(diff_render.render_soft_f32(scene, cfg, kernels=True))
    diff = np.abs(img_j - img_k).max(axis=-1)
    assert (diff > 1e-3).mean() < 0.01, f"flip fraction {(diff > 1e-3).mean()}"
    assert np.median(diff) < 1e-5

    def loss(v0, k):
        tr = dataclasses.replace(scene.triangles, v0=v0)
        s = dataclasses.replace(scene, triangles=tr)
        return jnp.mean(diff_render.render_soft_f32(s, cfg, kernels=k))

    g_j = np.asarray(jax.grad(lambda v: loss(v, False))(scene.triangles.v0))
    g_k = np.asarray(jax.grad(lambda v: loss(v, True))(scene.triangles.v0))
    scale = max(np.abs(g_j).max(), 1e-8)
    np.testing.assert_allclose(g_k / scale, g_j / scale, atol=2e-3)
    assert np.abs(g_k).sum() > 0


@pytest.mark.parametrize("stream", [False, True])
def test_mint_payload_matches_assemble(stream):
    """Payload-emitting winner search == winner search + XLA payload
    assembly, bit for bit (same records, same formulas)."""
    from raytpu.render import pallas_soft as ps

    scene = scenes.get("bunny").build()
    cfg = RenderConfig(width=64, height=32)
    ro, rd = renderer.generate_rays(scene.camera, cfg)
    ro_b = jnp.broadcast_to(ro, rd.shape)
    tmin = float(cfg.ray_min)
    t, idx, normal, mat = ps.scene_min_t_mega2(
        scene, ro_b, rd, tmin, stream=stream, payload=True)
    t2, idx2 = ps.scene_min_t_mega2(scene, ro_b, rd, tmin, stream=stream)
    rec = intersect.assemble_hit_records(scene, ro_b, rd, t2, idx2)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))
    np.testing.assert_array_equal(np.asarray(normal), np.asarray(rec.normal))
    np.testing.assert_array_equal(np.asarray(mat), np.asarray(rec.material))


def test_render_soft_payload_grad_off_matches():
    """payload_grad=False: image within fp noise of the full path and
    material gradients identical (they never flow through the payload)."""
    scene = scenes.get("bunny").build()
    cfg = RenderConfig(width=64, height=32)
    img_full = np.asarray(diff_render.render_soft_f32(scene, cfg, kernels=True))
    img_pay = np.asarray(diff_render.render_soft_f32(scene, cfg, kernels=True,
                                                     payload_grad=False))
    assert np.abs(img_full - img_pay).max() < 1e-3

    def mat_loss(c, pg):
        s = dataclasses.replace(
            scene, materials=dataclasses.replace(scene.materials, color=c))
        return jnp.mean(diff_render.render_soft_f32(s, cfg, kernels=True,
                                                    payload_grad=pg))

    g_full = np.asarray(jax.grad(lambda c: mat_loss(c, True))(scene.materials.color))
    g_pay = np.asarray(jax.grad(lambda c: mat_loss(c, False))(scene.materials.color))
    np.testing.assert_allclose(g_pay, g_full, rtol=1e-4, atol=1e-7)

    # occluder-geometry grads still flow (the soft transmittance is intact)
    def v0_loss(v0):
        tr = dataclasses.replace(scene.triangles, v0=v0)
        s = dataclasses.replace(scene, triangles=tr)
        return jnp.mean(diff_render.render_soft_f32(s, cfg, kernels=True,
                                                    payload_grad=False))

    g_v0 = np.asarray(jax.grad(v0_loss)(scene.triangles.v0))
    assert np.isfinite(g_v0).all() and np.abs(g_v0).sum() > 0


def test_streamed_grads_finite_difference(monkeypatch):
    """FD spot-check THROUGH the streamed kernels (stream forced): the
    analytic gradient of a pixel-loss w.r.t. a light position and a vertex
    coordinate must match central differences."""
    from raytpu.render import pallas_soft as ps

    monkeypatch.setattr(ps, "MAX_TRIS", 0)  # force DMA streaming
    scene = scenes.get("bunny").build()
    # beta=40 + eps=4e-3: the same smoothness/step regime as test_grad.py's
    # FD suite (beta=300's near-hard sigmoid undersamples at any fp32 step)
    cfg = RenderConfig(width=32, height=32, soft_beta=40.0)
    eps = 4e-3

    def fd_check(loss, tol_rel=0.12, tol_abs=1e-4):
        g = float(jax.grad(loss)(jnp.float32(0.0)))
        fd = (float(loss(jnp.float32(eps)))
              - float(loss(jnp.float32(-eps)))) / (2 * eps)
        assert abs(g - fd) <= tol_rel * abs(fd) + tol_abs, (g, fd)

    def loss_light(x):
        pos = scene.lights.position.at[0, 0].add(x)
        s = dataclasses.replace(
            scene, lights=dataclasses.replace(scene.lights, position=pos))
        return jnp.mean(diff_render.render_soft_f32(s, cfg, kernels=True))

    fd_check(loss_light)

    def loss_v0(x):
        v0 = scene.triangles.v0.at[10, 1].add(x)
        tr = dataclasses.replace(scene.triangles, v0=v0)
        s = dataclasses.replace(scene, triangles=tr)
        return jnp.mean(diff_render.render_soft_f32(s, cfg, kernels=True))

    fd_check(loss_v0)
