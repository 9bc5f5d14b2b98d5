"""Unit tests for app/support components: fly camera, image IO, timer,
benchmark format, debug audits, OBJ parser, CLI arg handling."""

import numpy as np
import pytest

from raytpu.core import obj, scenes
from raytpu.core.camera import CameraInput, FlyCamera
from raytpu.core.types import Camera, CullMode, SceneBuilder
from raytpu.utils import image as image_io
from raytpu.utils.debug import validate_scene
from raytpu.utils.profiling import Benchmark, FrameTimer, RayStats


# -- fly camera (reference: source/Camera.h:68-106) -------------------------


def test_fly_camera_moves_forward():
    fly = FlyCamera(origin=(0, 0, 0))
    fly2 = fly.update(CameraInput(forward=True), dt=1.0)
    np.testing.assert_allclose(fly2.origin, (0, 0, 4.0), atol=1e-6)  # 4 m/s


def test_fly_camera_shift_quadruples_speed():
    fly = FlyCamera(origin=(0, 0, 0))
    fly2 = fly.update(CameraInput(forward=True, shift=True), dt=1.0)
    np.testing.assert_allclose(fly2.origin, (0, 0, 16.0), atol=1e-5)


def test_fly_camera_strafe_uses_right_vector():
    fly = FlyCamera(origin=(0, 0, 0), yaw=np.pi / 2)  # facing +X
    fly2 = fly.update(CameraInput(right=True), dt=0.5)
    # facing +X, right = -Z
    np.testing.assert_allclose(fly2.origin, (0, 0, -2.0), atol=1e-5)


def test_fly_camera_rmb_pitch_yaw():
    fly = FlyCamera()
    fly2 = fly.update(CameraInput(mouse_dx=10, mouse_dy=5, rmb=True), dt=0.1)
    assert fly2.yaw > 0 and fly2.pitch < 0
    cam = fly2.camera()
    assert abs(float(np.linalg.norm(np.asarray(cam.forward))) - 1.0) < 1e-5


def test_fly_camera_both_buttons_elevates_and_yaws():
    # reference: source/Camera.h:99-102 — on an LMB+RMB drag, dy elevates
    # along world Y and dx STILL yaws (yaw is masked by LMB|RMB, not an
    # exclusive state); pitch must not change.
    fly = FlyCamera(origin=(0, 0, 0))
    fly2 = fly.update(CameraInput(mouse_dx=10, mouse_dy=5, lmb=True, rmb=True), dt=0.1)
    assert fly2.origin[1] > 0 and fly2.origin[0] == 0 and fly2.origin[2] == 0
    assert fly2.yaw > 0
    assert fly2.pitch == 0


# -- image IO ----------------------------------------------------------------


def test_bmp_roundtrip(tmp_path):
    img = np.random.default_rng(1).integers(0, 256, (37, 53, 3)).astype(np.uint8)
    p = str(tmp_path / "x.bmp")
    image_io.write_bmp(p, img)
    np.testing.assert_array_equal(image_io.read_bmp(p), img)


def test_png_write(tmp_path):
    img = np.zeros((8, 8, 3), np.uint8)
    image_io.write_image(str(tmp_path / "x.png"), img)
    assert (tmp_path / "x.png").exists()


# -- timer / benchmark -------------------------------------------------------


def test_benchmark_report_format():
    b = Benchmark(3)
    b.start()
    assert not b.record(10.0)
    assert not b.record(12.0)
    assert b.record(11.0)
    rep = b.report()
    lines = rep.strip().split("\n")
    assert lines[0] == "FPS BENCHMARK of 3 frames"
    assert lines[1].startswith("HIGH: 12.0")
    assert lines[2].startswith("LOW: 10.0")
    assert lines[3].startswith("AVERAGE: 11.0")


def test_frame_timer_ticks():
    t = FrameTimer(fps_window=0.0)  # every tick closes a window
    t.tick()
    assert t.total >= 0.0 and t.elapsed >= 0.0


def test_frame_timer_elapsed_upper_bound():
    # per-frame dt clamp (reference: source/Timer.cpp:83-89)
    import time

    t = FrameTimer(elapsed_upper_bound=0.001)
    time.sleep(0.01)
    t.tick()
    assert t.elapsed == 0.001


def test_ray_stats():
    s = RayStats()
    s.add_frame(640, 480, 3, 0.5)
    assert s.primary_rays == 640 * 480
    assert s.shadow_rays == 3 * 640 * 480
    assert s.primary_rays_per_s == pytest.approx(640 * 480 / 0.5)


# -- debug audits ------------------------------------------------------------


def test_validate_scene_clean():
    assert validate_scene(scenes.get("reference").build()) == []


def test_validate_scene_catches_bad_material_index():
    b = SceneBuilder()
    b.add_sphere((0, 0, 5), 1.0, 7)  # material 7 doesn't exist
    problems = validate_scene(b.build())
    assert any("material index" in p for p in problems)


# -- OBJ parser --------------------------------------------------------------


def test_obj_parser_quad():
    pos, nrm, idx = obj.parse_obj("simple_quad.obj")
    assert pos.shape[1] == 3 and idx.size % 3 == 0
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-5)


def test_obj_parser_slash_indices(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1/1/1 2/2/2 3/3/3\n")
    pos, nrm, idx = obj._parse_obj_py(str(p))
    np.testing.assert_array_equal(idx, [0, 1, 2])
    np.testing.assert_allclose(nrm[0], [0, 0, 1], atol=1e-6)


# -- builder semantics -------------------------------------------------------


def test_builder_default_material_is_red():
    b = SceneBuilder()
    s = b.build()
    np.testing.assert_allclose(np.asarray(s.materials.color[0]), [1, 0, 0])


def test_mesh_animation_changes_triangles():
    spec = scenes.get("reference")
    s = spec.build()
    s2 = spec.animate(s, 1.0)
    assert not np.allclose(np.asarray(s.triangles.v0), np.asarray(s2.triangles.v0))
    # planes/spheres untouched
    np.testing.assert_array_equal(np.asarray(s.spheres.center), np.asarray(s2.spheres.center))


def test_large_mesh_is_morton_ordered():
    # builder reorders meshes > 256 faces; permutation preserves the soup
    s = scenes.get("bunny").build()
    pos, nrm, idx = obj.parse_obj("lowpoly_bunny2.obj")
    assert s.triangles.count == idx.size // 3
    # same multiset of v0 vertices (scaled by 2)
    a = np.sort(np.asarray(s.triangles.v0), axis=0)
    raw = pos[idx.reshape(-1, 3)[:, 0]] * 2.0
    b = np.sort(raw, axis=0)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_ssaa_reduces_edge_aliasing():
    import jax

    from raytpu.core.types import RenderConfig
    from raytpu.render.renderer import render_image, render_image_ssaa

    scene = scenes.get("w2").build()
    cfg = RenderConfig(width=32, height=24)
    plain = np.asarray(render_image(scene, cfg)).astype(int)
    ssaa = np.asarray(render_image_ssaa(scene, cfg, samples=2)).astype(int)
    assert ssaa.shape == plain.shape
    # supersampling smooths edges: images differ but agree in the mean
    assert (np.abs(ssaa - plain) > 0).any()
    assert abs(ssaa.mean() - plain.mean()) < 8.0
