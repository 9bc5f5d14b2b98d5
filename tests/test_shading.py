"""Hand-computed BRDF unit tests pinning the reference's formula quirks
(reference: source/BRDFs.h, source/Material.h)."""

import jax.numpy as jnp
import numpy as np

from raytpu.ops import shading

PI = np.float32(np.pi)


def _v(*xs):
    return jnp.asarray([xs], jnp.float32)


def test_lambert():
    # cd*kd/pi (reference: BRDFs.h:14-17)
    out = np.asarray(shading.lambert(jnp.asarray([0.5]), _v(0.2, 0.4, 0.8)))
    np.testing.assert_allclose(out[0], np.array([0.2, 0.4, 0.8]) * 0.5 / PI, rtol=1e-6)


def test_phong_clamped_reflect_quirk():
    """The reference reflect clamps dot(n,l) at 0 INSIDE the reflection
    formula (reference: BRDFs.h:35) — for light below the horizon the
    'reflection' equals l itself rather than the true mirror direction."""
    n = _v(0.0, 1.0, 0.0)
    l_below = _v(0.0, -1.0, 0.0)  # dot(n,l) = -1 -> clamp to 0 -> reflect == l
    v = _v(0.0, -1.0, 0.0)
    out = np.asarray(shading.phong(jnp.asarray([1.0]), jnp.asarray([1.0]), l_below, v, n))
    # cosa = dot(l, v) = 1 -> full specular — the quirk's observable effect
    np.testing.assert_allclose(out[0], [1.0, 1.0, 1.0], rtol=1e-6)


def test_phong_standard_case():
    n = _v(0.0, 1.0, 0.0)
    l = _v(0.0, 1.0, 0.0)  # straight down onto the surface from above
    refl_expected = np.array([0.0, -1.0, 0.0])  # l - 2*dot(n,l)*n
    v = jnp.asarray([refl_expected], jnp.float32)
    out = np.asarray(shading.phong(jnp.asarray([0.5]), jnp.asarray([3.0]), l, v, n))
    np.testing.assert_allclose(out[0], [0.5, 0.5, 0.5], rtol=1e-6)  # 0.5 * 1^3


def test_fresnel_schlick():
    h = _v(0.0, 0.0, 1.0)
    v = _v(0.0, 0.0, 1.0)  # dot = 1 -> F = f0
    f0 = _v(0.04, 0.04, 0.04)
    np.testing.assert_allclose(np.asarray(shading.fresnel_schlick(h, v, f0))[0], [0.04] * 3, rtol=1e-6)
    v_graze = _v(1.0, 0.0, 0.0)  # dot = 0 -> F = 1
    np.testing.assert_allclose(np.asarray(shading.fresnel_schlick(h, v_graze, f0))[0], [1.0] * 3, rtol=1e-6)


def test_ggx_distribution_quirk_alpha_squared():
    """UE4-style GGX with alpha = roughness^2 (reference: BRDFs.h:62-68):
    D(ndh=1) = rough^4 / (pi * rough^8)."""
    n = _v(0.0, 0.0, 1.0)
    h = _v(0.0, 0.0, 1.0)
    rough = 0.5
    a = rough * rough
    expected = (a * a) / (PI * (a * a) ** 2)
    out = float(np.asarray(shading.ggx_distribution(n, h, jnp.asarray([rough])))[0])
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_schlick_ggx_k_quirk():
    """k = (alpha+1)^2/8 with alpha = roughness^2 — the reference's deviation
    from UE4's (roughness+1)^2/8 (reference: BRDFs.h:81)."""
    n = _v(0.0, 0.0, 1.0)
    x = _v(0.0, 0.0, 1.0)  # cd = 1
    rough = 0.5
    a = rough * rough
    k = (a + 1.0) ** 2 / 8.0
    expected = 1.0 / (1.0 * (1.0 - k) + k)  # = 1
    out = float(np.asarray(shading.schlick_ggx_geometry(n, x, jnp.asarray([rough])))[0])
    np.testing.assert_allclose(out, expected, rtol=1e-6)
    # grazing: cd = 0 -> geometry = 0
    out0 = float(np.asarray(shading.schlick_ggx_geometry(n, _v(1.0, 0.0, 0.0), jnp.asarray([rough])))[0])
    assert out0 == 0.0


def test_cook_torrance_dielectric_f0():
    """metalness == 0 -> f0 = 0.04 gray, diffuse = (1-F)*albedo/pi
    (reference: Material.h:110,117)."""
    n = _v(0.0, 0.0, -1.0)
    l = _v(0.0, 0.0, -1.0)
    v = _v(0.0, 0.0, -1.0)
    albedo = _v(1.0, 0.0, 0.0)
    out = np.asarray(
        shading.cook_torrance(albedo, jnp.asarray([0.0]), jnp.asarray([1.0]), n, l, v)
    )[0]
    # diffuse red channel ~ (1-0.04)/pi plus specular; green/blue only specular
    assert out[0] > out[1] == out[2] > 0


def test_radiance_inverse_square():
    from raytpu.core.types import SceneBuilder

    b = SceneBuilder()
    b.add_point_light((0.0, 0.0, 10.0), 100.0, (1.0, 0.5, 0.25))
    lights = b.build().lights
    target = jnp.zeros((1, 3), jnp.float32)
    out = np.asarray(shading.radiance(lights, 0, target))[0]
    np.testing.assert_allclose(out, np.array([1.0, 0.5, 0.25]), rtol=1e-6)  # 100/100 = 1


def test_mesh_srt_transform_semantics():
    """S.R.T order: scale, then rotate, then translate; normals through the
    3x3 then renormalized (reference: DataTypes.h:210-236)."""
    from raytpu.core.types import CullMode, SceneBuilder

    b = SceneBuilder()
    m = b.add_triangle_mesh(CullMode.NONE, 0)
    m.append_triangle((1, 0, 0), (1, 1, 0), (1, 0, 1))  # x=1 plane, normal +x... cross((0,1,0),(0,0,1)) = (1,0,0)
    m.scale((2.0, 1.0, 1.0))
    m.rotate_y(np.pi / 2)
    m.translate((0.0, 0.0, 5.0))
    scene = b.build()
    tr = scene.triangles
    # v0 = (1,0,0): scale -> (2,0,0); rotateY(90) row-vector -> (0,0,-2); translate -> (0,0,3)
    np.testing.assert_allclose(np.asarray(tr.v0)[0], [0, 0, 3], atol=1e-5)
    # normal (1,0,0) scaled -> (2,0,0), rotated -> (0,0,-2), normalized -> (0,0,-1)
    np.testing.assert_allclose(np.asarray(tr.normal)[0], [0, 0, -1], atol=1e-5)
