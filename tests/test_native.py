"""Native C++ runtime tests: OBJ parser parity, Morton ordering, SAH BVH
correctness vs brute force, BMP roundtrip, timer."""

import numpy as np
import pytest

from raytpu.core import obj as obj_py
from raytpu.native import runtime as rt


pytestmark = pytest.mark.skipif(not rt.available(), reason="native toolchain unavailable")


def test_native_obj_matches_python_parser():
    path = obj_py.resolve_asset("lowpoly_bunny2.obj")
    p1, n1, i1 = obj_py._parse_obj_py(path)
    p2, n2, i2 = rt.parse_obj(path)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(p1, p2, rtol=1e-6)
    np.testing.assert_allclose(n1, n2, rtol=1e-5, atol=1e-6)


def _random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-10, 10, (n, 1, 3))
    return (base + rng.uniform(-0.5, 0.5, (n, 3, 3))).astype(np.float32)


def test_morton_order_is_permutation_and_localizes():
    tris = _random_tris(512)
    perm = rt.morton_order(tris)
    assert sorted(perm.tolist()) == list(range(512))
    # chunk AABB volumes should shrink vs random order
    def chunk_surface(order):
        t = tris[order].reshape(-1, 128, 9)
        lo = t.reshape(t.shape[0], 128, 3, 3).min(axis=(1, 2))
        hi = t.reshape(t.shape[0], 128, 3, 3).max(axis=(1, 2))
        e = hi - lo
        return (e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2] + e[:, 2] * e[:, 0]).sum()

    assert chunk_surface(perm) < 0.8 * chunk_surface(np.arange(512))


def test_bvh_structure_and_traversal_matches_brute_force():
    tris = _random_tris(300, seed=1)
    nb, nm, order = rt.build_bvh(tris)
    assert sorted(order.tolist()) == list(range(300))
    # every leaf's primitives fit inside its bounds
    for i in range(nm.shape[0]):
        first, count, left = nm[i]
        if count > 0:
            prims = tris[order[first : first + count]]
            assert (prims.reshape(-1, 3) >= nb[i, :3] - 1e-4).all()
            assert (prims.reshape(-1, 3) <= nb[i, 3:] + 1e-4).all()

    # traversal result == brute force Moller-Trumbore over all triangles
    rng = np.random.default_rng(2)
    for _ in range(50):
        ro = rng.uniform(-15, 15, 3).astype(np.float32)
        rd = rng.normal(size=3).astype(np.float32)
        rd /= np.linalg.norm(rd)
        tid, t = rt.bvh_closest_hit(tris, nb, nm, order, ro, rd)
        bid, bt = _brute_closest(tris, ro, rd)
        assert tid == bid, (tid, bid, t, bt)
        if tid >= 0:
            np.testing.assert_allclose(t, bt, rtol=1e-5)


def _brute_closest(tris, ro, rd, tmin=1e-4):
    best_t, best_i = np.inf, -1
    for i, tri in enumerate(tris):
        v0, v1, v2 = tri
        e1, e2 = v1 - v0, v2 - v0
        h = np.cross(rd, e2)
        a = e1 @ h
        if abs(a) < 1.1920929e-07:
            continue
        f = 1.0 / a
        s = ro - v0
        u = f * (s @ h)
        if u < 0 or u > 1:
            continue
        q = np.cross(s, e1)
        v = f * (rd @ q)
        if v < 0 or u + v > 1:
            continue
        t = f * (e2 @ q)
        if tmin <= t < best_t:
            best_t, best_i = t, i
    return best_i, best_t


def test_native_bmp_roundtrip(tmp_path):
    from raytpu.utils.image import read_bmp

    img = (np.random.default_rng(0).uniform(0, 255, (33, 47, 3))).astype(np.uint8)
    p = str(tmp_path / "t.bmp")
    rt.write_bmp(p, img)
    np.testing.assert_array_equal(read_bmp(p), img)


def test_native_timer_monotonic():
    a = rt.monotonic()
    b = rt.monotonic()
    assert b >= a
