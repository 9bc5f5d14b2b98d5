"""Pallas kernel paths vs the jnp renderer (interpret mode on CPU; the same
kernels compile via Mosaic on TPU).

Two regimes:
  * chunked per-class min-t kernels (big scenes, e.g. bunny) — bit-exact
    (payload/shading is the shared XLA code);
  * whole-frame megakernel (small scenes) — matches up to a tiny budget of
    boundary pixels (3-element dot/sum reduction order differs between
    Mosaic and XLA, flipping near-tie decisions).
"""

import numpy as np
import pytest

from raytpu.core import scenes
from raytpu.core.types import LightingMode, RenderConfig
from raytpu.render import pallas_kernel as pk
from raytpu.render import render_image

SMALL = RenderConfig(width=32, height=24)  # interpret mode is slow: keep tiny

_BUILT = {}


def _scene(name):
    if name not in _BUILT:
        _BUILT[name] = scenes.get(name).build()
    return _BUILT[name]


def _close(a, b, budget=0.01):
    d = np.abs(a.astype(int) - b.astype(int))
    flipped = (d > 1).any(axis=-1).mean()
    assert flipped <= budget, f"{flipped:.3%} pixels flipped (max {d.max()})"
    assert d.mean() <= 0.5


def test_mega_reference_scene():
    a = np.asarray(render_image(_scene("reference"), SMALL))
    b = np.asarray(pk.render_image(_scene("reference"), SMALL))
    _close(a, b)


def test_mega_solid_colors_and_single_light():
    a = np.asarray(render_image(_scene("w2"), SMALL))
    b = np.asarray(pk.render_image(_scene("w2"), SMALL))
    _close(a, b)


def test_mega_modes_and_toggles():
    for cfg in [
        RenderConfig(width=32, height=24, lighting_mode=LightingMode.BRDF),
        RenderConfig(width=32, height=24, lighting_mode=LightingMode.OBSERVED_AREA),
        RenderConfig(width=32, height=24, shadows=False),
    ]:
        a = np.asarray(render_image(_scene("reference"), cfg))
        b = np.asarray(pk.render_image(_scene("reference"), cfg))
        _close(a, b)


def test_mega_non_multiple_ray_count():
    # 50x37 = 1850 rays: not a multiple of the 1024-ray tile
    cfg = RenderConfig(width=50, height=37)
    a = np.asarray(render_image(_scene("reference"), cfg))
    b = np.asarray(pk.render_image(_scene("reference"), cfg))
    _close(a, b)


def test_chunked_kernels_match_on_bunny():
    # bunny (292 tris) exceeds MEGA_MAX_PRIMS -> chunked kernels + the fused
    # shadow+shade kernel (in-kernel shading: tiny flip budget, like the
    # megakernel — Mosaic and XLA reduce 3-element dots in different orders)
    assert _scene("bunny").num_primitives > pk.MEGA_MAX_PRIMS
    cfg = RenderConfig(width=64, height=48)
    a = np.asarray(render_image(_scene("bunny"), cfg))
    b = np.asarray(pk.render_image(_scene("bunny"), cfg))
    _close(a, b)


def test_mega_full_bench_resolution():
    """Pin the flagship megakernel at the bench resolution (640x480): eager
    interpret-mode render vs the jitted jnp path."""
    from raytpu.core import math3d

    cfg = RenderConfig(width=640, height=480)
    a = np.asarray(render_image(_scene("reference"), cfg))
    b = np.asarray(math3d.quantize_u8(pk.render_image_mega_f32(_scene("reference"), cfg)))
    _close(a, b, budget=0.005)


def test_chunked_midres_tile_permutation():
    """Chunked kernels at a resolution where the 16x32 pixel-tile fold is
    active (128 % 32 == 0, 96 % 16 == 0) match jnp within the flip budget."""
    cfg = RenderConfig(width=128, height=96)
    assert pk._tile_permutation(cfg.height, cfg.width) is not None
    a = np.asarray(render_image(_scene("bunny"), cfg))
    b = np.asarray(pk.render_image(_scene("bunny"), cfg))
    _close(a, b)


def test_chunked_closest_hit_records_match():
    import jax.numpy as jnp

    from raytpu.ops import intersect
    from raytpu.render.renderer import generate_rays

    scene = _scene("bunny")
    ro, rd = generate_rays(scene.camera, SMALL)
    ro_b = jnp.broadcast_to(ro, rd.shape)
    a = intersect.closest_hit(scene, ro_b, rd, 1e-4)
    b = pk.closest_hit_pallas(scene, ro_b, rd, 1e-4)
    np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
    np.testing.assert_array_equal(np.asarray(a.material), np.asarray(b.material))
    # t agrees to a couple f32 ulps (XLA's dot reduction order differs)
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), rtol=1e-5)


def test_huge_mesh_falls_back_to_jnp():
    # a synthetic mesh past the VMEM-resident cap must still render (fallback)
    import jax.numpy as jnp

    from raytpu.core.types import CullMode, SceneBuilder

    rng = np.random.default_rng(0)
    n = pk.MAX_VMEM_TRIS + 256
    base = rng.uniform(-3, 3, (n, 1, 3))
    tris = (base + rng.uniform(-0.05, 0.05, (n, 3, 3))).astype(np.float32)
    b = SceneBuilder()
    white = b.add_lambert((1.0, 1.0, 1.0), 1.0)
    m = b.add_triangle_mesh(CullMode.NONE, white)
    m.set_geometry(tris.reshape(-1, 3), np.arange(3 * n, dtype=np.int32))
    b.add_point_light((0.0, 0.0, -5.0), 50.0, (1, 1, 1))
    b.set_camera((0, 0, -8), fov_degrees=60.0)
    scene = b.build()
    img = np.asarray(pk.render_image(scene, RenderConfig(width=16, height=12)))
    assert img.shape == (12, 16, 3) and img.any()


def test_bundled_icosphere_asset_renders():
    from raytpu.core import obj
    from raytpu.core.types import CullMode, SceneBuilder

    pos, nrm, idx = obj.parse_obj("icosphere.obj")
    b = SceneBuilder()
    white = b.add_lambert((0.9, 0.9, 0.9), 1.0)
    m = b.add_triangle_mesh(CullMode.BACK_FACE, white)
    m.set_geometry(pos, idx, nrm)
    b.add_point_light((2.0, 2.0, -4.0), 30.0, (1, 1, 1))
    b.set_camera((0, 0, -4), fov_degrees=45.0)
    scene = b.build()
    img = np.asarray(pk.render_image(scene, SMALL))
    assert img.any()


# ---------------------------------------------------------------------------
# Megakernel v2 (SMEM worklist kernels)
# ---------------------------------------------------------------------------


def _mega2_u8(scene, cfg):
    from raytpu.core import math3d

    return np.asarray(math3d.quantize_u8(pk.render_image_mega2_f32(scene, cfg)))


def test_mega2_bunny_untiled_and_tiled():
    scene = _scene("bunny")
    # 64x48: H%32 != 0 -> row-major 1024-ray tiles; 64x32: 32x32 pixel tiles
    # (2x1 tile grid exercises the tx/ty tile indexing at interpret-mode cost)
    for cfg in [RenderConfig(width=64, height=48), RenderConfig(width=64, height=32)]:
        a = np.asarray(render_image(scene, cfg))
        b = _mega2_u8(scene, cfg)
        _close(a, b)


def test_mega2_launch_chain_on_optional():
    # optional (3087 tris) needs a 3-launch chain through aliased accumulators
    scene = _scene("optional")
    assert scene.triangles.count > pk.MEGA2_MAX_SMEM_TRIS
    cfg = RenderConfig(width=32, height=24)  # chain length is resolution-independent
    a = np.asarray(render_image(scene, cfg))
    b = _mega2_u8(scene, cfg)
    _close(a, b)


def test_mega2_modes_and_toggles():
    scene = _scene("bunny")
    for cfg in [
        RenderConfig(width=32, height=24, lighting_mode=LightingMode.BRDF),
        RenderConfig(width=32, height=24, lighting_mode=LightingMode.OBSERVED_AREA),
        RenderConfig(width=32, height=24, shadows=False),
    ]:
        a = np.asarray(render_image(scene, cfg))
        b = _mega2_u8(scene, cfg)
        _close(a, b)


def test_mega2_no_lights_is_black():
    # W1 has geometry but no lights: mega2 short-circuits to a black frame
    img = _mega2_u8(_scene("w1"), SMALL)
    assert img.shape == (24, 32, 3) and not img.any()


def test_mega3_dispatch_band_past_smem_ceiling():
    """Scenes past the mega2 SMEM chain cap (9600 tris) now dispatch to the
    DMA-streamed mega3 kernels: pin that band's dispatch + output."""
    from raytpu.core.types import CullMode, SceneBuilder

    rng = np.random.default_rng(1)
    n = pk.MEGA2_MAX_LAUNCHES * pk.MEGA2_MAX_SMEM_TRIS + 64
    assert n <= pk.MEGA3_MAX_TRIS
    base = rng.uniform(-3, 3, (n, 1, 3))
    tris = (base + rng.uniform(-0.08, 0.08, (n, 3, 3))).astype(np.float32)
    b = SceneBuilder()
    white = b.add_lambert((1.0, 1.0, 1.0), 1.0)
    m = b.add_triangle_mesh(CullMode.NONE, white)
    m.set_geometry(tris.reshape(-1, 3), np.arange(3 * n, dtype=np.int32))
    b.add_point_light((0.0, 0.0, -5.0), 50.0, (1, 1, 1))
    b.set_camera((0, 0, -8), fov_degrees=60.0)
    scene = b.build()
    cfg = RenderConfig(width=16, height=12)
    a = np.asarray(render_image(scene, cfg))
    out = np.asarray(pk.render_image(scene, cfg))
    _close(a, out)


# ---------------------------------------------------------------------------
# Megakernel v3 (DMA-streamed worklists)
# ---------------------------------------------------------------------------


def _mega3_u8(scene, cfg):
    from raytpu.core import math3d

    return np.asarray(math3d.quantize_u8(pk.render_image_mega3_f32(scene, cfg)))


def test_mega3_matches_mega2_on_optional():
    """Fine mode (per-group worklist entries): bit-exact vs mega2 on both the
    tiled and row-major raygen paths (same fold order, same fp ops)."""
    scene = _scene("optional")
    for cfg in [RenderConfig(width=64, height=32), RenderConfig(width=48, height=24)]:
        a = np.asarray(pk.render_image_mega2_f32(scene, cfg))
        b = np.asarray(pk.render_image_mega3_f32(scene, cfg))
        np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def optional_mega2_64x32():
    """mega2 reference image for the mega3 mode tests, rendered ONCE (the
    mode tests only patch mega3 routing knobs mega2 never reads)."""
    return np.asarray(
        pk.render_image_mega2_f32(_scene("optional"), RenderConfig(width=64, height=32)))


def test_mega3_coarse_mode(monkeypatch, optional_mega2_64x32):
    """Coarse mode (one worklist entry per 64-tri super-group, folded whole)
    must produce the same closest hits/occlusion: min-folds are order-safe."""
    monkeypatch.setattr(pk, "MEGA3_FINE_MAX_G", 8)  # force coarse on optional
    scene = _scene("optional")
    cfg = RenderConfig(width=64, height=32)
    b = np.asarray(pk.render_image_mega3_f32(scene, cfg))
    np.testing.assert_array_equal(optional_mega2_64x32, b)


def test_mega3_coarse2_mode(monkeypatch, optional_mega2_64x32):
    """Coarse2 (one worklist entry per 512-tri super-super-group, 8 sg DMAs
    expanded in-kernel) lifts the worklist-SMEM ceiling to ~1M triangles;
    same image as mega2."""
    monkeypatch.setattr(pk, "MEGA3_FINE_MAX_G", 8)
    monkeypatch.setattr(pk, "MEGA3_WL_SMEM_ENTRIES", 1)
    scene = _scene("optional")
    cfg = RenderConfig(width=64, height=32)
    b = np.asarray(pk.render_image_mega3_f32(scene, cfg))
    np.testing.assert_array_equal(optional_mega2_64x32, b)


def test_mega3_modes_and_no_lights(monkeypatch):
    scene = _scene("optional")
    for cfg in [
        RenderConfig(width=32, height=24, shadows=False),
        RenderConfig(width=32, height=24, lighting_mode=LightingMode.OBSERVED_AREA),
    ]:
        a = np.asarray(render_image(scene, cfg))
        b = _mega3_u8(scene, cfg)
        _close(a, b)
    img = _mega3_u8(_scene("w1"), SMALL)
    assert not img.any()  # no lights -> black


def test_mega2_parity_through_full_rotation():
    """The SAH grouping is computed from the t=0 pose; group AABBs refresh
    per frame.  Pin parity (not just pass rates) at quarter-rotation poses
    through a full 2pi yaw (VERDICT r2: animate through 2pi)."""
    spec = scenes.get("bunny")
    scene0 = spec.build()
    cfg = RenderConfig(width=32, height=24)
    for t in (np.pi / 2, np.pi, 1.75 * np.pi):
        s = spec.animate(scene0, float(t))
        a = np.asarray(render_image(s, cfg))
        b = _mega2_u8(s, cfg)
        _close(a, b)


def test_reorder_keeps_meshes_contiguous():
    """Per-mesh spatial permutation: no cull group's AABB can balloon from
    spanning two independently-animated meshes (probes/probe_anim.py)."""
    from raytpu.core import obj
    from raytpu.core.types import CullMode, SceneBuilder

    pos, nrm, idx = obj.parse_obj("lowpoly_bunny2.obj")
    b = SceneBuilder()
    white = b.add_lambert((1.0, 1.0, 1.0), 1.0)
    for dx in (-2.0, 2.0):
        m = b.add_triangle_mesh(CullMode.BACK_FACE, white)
        m.set_geometry(pos, idx, nrm)
        m.translate((dx, 0.0, 0.0))
    b.add_point_light((0.0, 5.0, -5.0), 50.0, (1, 1, 1))
    b.set_camera((0.0, 1.0, -8.0), fov_degrees=60.0)
    scene = b.build()
    assert scene.meshes.num_faces > 256  # reorder kicked in
    fm = np.asarray(scene.meshes.face_mesh)
    assert (np.diff(fm) >= 0).all(), "mesh faces interleaved after reorder"


def test_bunny50k_scene_builds_and_routes():
    """The subdivided stress scene exceeds every SMEM ceiling and routes to
    mega3; its surface is identical to `bunny` (midpoint subdivision)."""
    from raytpu.core.scenes import _subdivide

    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    p2, i2 = _subdivide(pos, idx, 2)
    assert i2.shape == (16, 3)
    # subdivided triangles tile the parent exactly: total area preserved
    v = p2[i2]
    area = 0.5 * np.linalg.norm(
        np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=1).sum()
    np.testing.assert_allclose(area, 0.5, rtol=1e-6)


def test_mega3_mode_respects_worklist_smem_budget():
    """The fine branch must honor BOTH the group cap and the per-tile
    worklist SMEM budget: a many-light pass exhausts entries sooner (a fine
    8-light 3,840-group pass would allocate ~140 KB of worklist SMEM and
    fail only at real-TPU lowering — code-review round 4)."""
    assert pk.mega3_mode(448, 3) == "fine"
    assert pk.mega3_mode(4096, 1) == "fine"  # single-light: full group cap
    # round-5 (ADVICE r4): the budget binds PER worklist array — L*ng must
    # fit MEGA3_WL_SMEM_ENTRIES on its own (a pooled 2x bound admitted
    # L=3, ng=4096: a 48 KB g_wl block that only fails at real lowering)
    assert pk.mega3_mode(2730, 3) == "fine"  # 3*2730 = 8190 <= 8192
    assert pk.mega3_mode(4096, 3) == "coarse"  # 3*4096 > 8192: budget-bound
    assert pk.mega3_mode(3840, 8) == "coarse"  # budget-bound, not group-bound
    assert pk.mega3_mode(9352, 1) == "coarse"  # past FINE_MAX_G (measured)
    assert pk.mega3_mode(37376, 3) == "coarse2"


def test_packed_pipeline_band_bit_identical_to_jnp(monkeypatch):
    """The big-mesh band (round 5) routes the PACKED pipeline — payload
    winner search + streamed any-hit + XLA shade — whose output is
    bit-identical to the jnp path (unlike mega3's in-kernel shade, which
    carries the megakernel flip budget).  Band forced by shrinking the
    mega2 chain budget so bunny exercises it; both raygen feeds covered."""
    from raytpu.core.types import RenderConfig as RC
    import raytpu.core.math3d as m3
    from raytpu.render import renderer as rn

    monkeypatch.setattr(pk, "MEGA2_MAX_LAUNCHES", 0)
    scene = _scene("bunny")
    for cfg in [RC(width=64, height=32), RC(width=48, height=24)]:
        assert pk.route_kind(scene, cfg) == "packed"
        a = np.asarray(m3.quantize_u8(rn.render_image_f32(scene, cfg)))
        b = np.asarray(m3.quantize_u8(pk.render_image_f32(scene, cfg)))
        np.testing.assert_array_equal(a, b)
