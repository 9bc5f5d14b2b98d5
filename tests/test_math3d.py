"""Math-core unit tests: row-vector matrix conventions, tone map, camera ONB."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytpu.core import math3d
from raytpu.core.types import Camera


def test_rotation_y_row_vector():
    # Row-vector RotateY: UnitX @ Ry(90deg) -> -UnitZ (reference: source/Matrix.cpp:124-134)
    m = math3d.mat_rotation_y(jnp.float32(np.pi / 2))
    v = math3d.transform_vector(m, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [0.0, 0.0, -1.0], atol=1e-6)


def test_srt_order_applies_scale_first():
    s = math3d.mat_scale((2.0, 2.0, 2.0))
    r = math3d.mat_rotation_y(jnp.float32(np.pi / 2))
    t = math3d.mat_translation((0.0, 0.0, 5.0))
    m = math3d.srt(s, r, t)
    # p=(1,0,0): scale -> (2,0,0); rotate Y 90 -> (0,0,-2); translate -> (0,0,3)
    p = math3d.transform_point(m, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(p), [0.0, 0.0, 3.0], atol=1e-5)


def test_transform_point_vs_vector():
    t = math3d.mat_translation((1.0, 2.0, 3.0))
    v = jnp.array([1.0, 1.0, 1.0])
    np.testing.assert_allclose(np.asarray(math3d.transform_vector(t, v)), [1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(math3d.transform_point(t, v)), [2, 3, 4], atol=1e-6)


def test_max_to_one():
    c = jnp.array([[2.0, 1.0, 0.5], [0.5, 0.25, 0.1]])
    out = np.asarray(math3d.max_to_one(c))
    np.testing.assert_allclose(out[0], [1.0, 0.5, 0.25], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.5, 0.25, 0.1], atol=1e-6)


def test_camera_onb_matches_reference_construction():
    # right = normalize(cross(UnitY, fwd)), up = normalize(cross(fwd, right))
    # (reference: source/Camera.h:43-53)
    cam = Camera.create(origin=(0, 0, 0), forward=(0.6, 0.0, 0.8), fov_degrees=45.0)
    right, up, fwd = cam.onb()
    r, u, f = map(np.asarray, (right, up, fwd))
    np.testing.assert_allclose(np.dot(r, u), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.dot(r, f), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(r), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.cross(np.array([0.0, 1.0, 0.0]), f) / np.linalg.norm(np.cross(np.array([0.0, 1.0, 0.0]), f)), r, atol=1e-6)


def test_fov_scale_is_tan_half_angle():
    cam = Camera.create(fov_degrees=45.0)
    np.testing.assert_allclose(float(cam.fov_scale), np.tan(np.deg2rad(45.0) / 2), rtol=1e-6)


def test_fov_clamped():
    assert float(Camera.create(fov_degrees=5.0).fov_scale) == pytest.approx(np.tan(np.deg2rad(10.0) / 2), rel=1e-6)
    assert float(Camera.create(fov_degrees=179.0).fov_scale) == pytest.approx(np.tan(np.deg2rad(175.0) / 2), rel=1e-5)
