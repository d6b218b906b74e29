"""Per-primitive intersection tests against analytic values, plus the
linear-scan tie-break and pad-row behavior."""

import numpy as np
import jax.numpy as jnp

from rt_tpu.scene.types import SceneDef, build_tables
from rt_tpu.ops.intersect import (
    intersect, PTYPE_SPHERE, PTYPE_RECT, PTYPE_CYLINDER, PTYPE_TRIANGLE,
)


def _scene_with(add):
    s = SceneDef()
    m = s.add_lambertian_color((0.5, 0.5, 0.5))
    add(s, m)
    s.set_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 90, 1.0)
    return build_tables(s)


def _shoot(tables, ro, rd):
    ro = jnp.asarray(np.atleast_2d(np.asarray(ro, np.float32)))
    rd = jnp.asarray(np.atleast_2d(np.asarray(rd, np.float32)))
    return intersect(tables, ro, rd)


def test_sphere_analytic():
    t = _scene_with(lambda s, m: s.add_sphere((0, 0, -3), 1.0, m))
    h = _shoot(t, (0, 0, 0), (0, 0, -1))
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h.p[0]), [0, 0, -2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-6)
    assert bool(h.front_face[0])
    assert int(h.ptype[0]) == PTYPE_SPHERE


def test_sphere_uv():
    """UV per get_sphere_uv (object.cuh:87-93): theta=acos(-y),
    phi=atan2(-z,x)+pi."""
    t = _scene_with(lambda s, m: s.add_sphere((0, 0, 0), 1.0, m))
    # hit at +x: normal (1,0,0) -> phi=atan2(0,1)+pi=pi -> u=0.5;
    # theta=acos(0)=pi/2 -> v=0.5
    h = _shoot(t, (3, 0, 0), (-1, 0, 0))
    np.testing.assert_allclose(float(h.u[0]), 0.5, atol=1e-6)
    np.testing.assert_allclose(float(h.v[0]), 0.5, atol=1e-6)
    # hit at +y (from above): normal (0,1,0) -> theta=acos(-1)=pi -> v=1
    h = _shoot(t, (0, 3, 0), (0, -1, 0))
    np.testing.assert_allclose(float(h.v[0]), 1.0, atol=1e-4)


def test_negative_radius_hollow_sphere():
    """radius<0 flips the normal inward — the hollow-glass trick
    (main.cu:140-141, sample_scene.json radius -0.45)."""
    t = _scene_with(lambda s, m: s.add_sphere((0, 0, -3), -1.0, m))
    h = _shoot(t, (0, 0, 0), (0, 0, -1))
    assert bool(h.hit[0])
    # outward = (p-c)/r with r=-1 -> (0,0,-1); dot(rd,outward)<0 false
    # -> front_face False, normal flipped to (0,0,1)
    assert not bool(h.front_face[0])
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-6)


def test_rects_all_orientations():
    def add(s, m):
        s.add_rect("xy_rect", -1, 1, -1, 1, -2, m)  # z=-2 plane
        s.add_rect("xz_rect", -1, 1, -1, 1, -2, m)  # y=-2 plane
        s.add_rect("yz_rect", -1, 1, -1, 1, -2, m)  # x=-2 plane

    t = _scene_with(add)
    h = _shoot(t, (0.5, 0.25, 0), (0, 0, -1))
    assert bool(h.hit[0]) and int(h.ptype[0]) == PTYPE_RECT
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-6)
    # u=(x-x0)/(x1-x0) = (0.5+1)/2 = 0.75 ; v=(y+1)/2=0.625
    np.testing.assert_allclose(float(h.u[0]), 0.75, atol=1e-6)
    np.testing.assert_allclose(float(h.v[0]), 0.625, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-6)

    h = _shoot(t, (0, 0, 0), (0, -1, 0))
    assert bool(h.hit[0])
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 1, 0], atol=1e-6)
    h = _shoot(t, (0, 0, 0), (-1, 0, 0))
    assert bool(h.hit[0])
    np.testing.assert_allclose(np.asarray(h.normal[0]), [1, 0, 0], atol=1e-6)


def test_rect_miss_outside_bounds():
    t = _scene_with(lambda s, m: s.add_rect("xy_rect", -1, 1, -1, 1, -2, m))
    h = _shoot(t, (2.5, 0, 0), (0, 0, -1))
    assert not bool(h.hit[0])


def test_cylinder_axis_aligned():
    """Unit-radius z-axis cylinder, ray along x: hits at x=r."""
    t = _scene_with(lambda s, m: s.add_cylinder(1.0, -1, 1, m))
    h = _shoot(t, (3, 0, 0), (-1, 0, 0))
    assert bool(h.hit[0]) and int(h.ptype[0]) == PTYPE_CYLINDER
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [1, 0, 0], atol=1e-5)
    # v = (z-zmin)/(zmax-zmin) = 0.5 at z=0
    np.testing.assert_allclose(float(h.v[0]), 0.5, atol=1e-5)
    # phi = atan2(0,1)+2pi = 2pi -> u = 0.5 (the /4pi quirk, object.cuh:283-287)
    np.testing.assert_allclose(float(h.u[0]), 0.5, atol=1e-5)


def test_cylinder_z_clip_promotes_to_far_root():
    """Ray enters above zmax through the open top region: near root is
    clipped, far root (the back wall) must be taken (object.cuh:262-272)."""
    t = _scene_with(lambda s, m: s.add_cylinder(1.0, -1, 0.2, m))
    # ray starts high on +x side pointing down-left; first wall hit has
    # z>zmax, second is inside the clip
    h = _shoot(t, (3, 0, 1.0), (-1, 0, -0.3))
    if bool(h.hit[0]):
        pz = float(h.p[0][2])
        assert -1 - 1e-5 <= pz <= 0.2 + 1e-5


def test_cylinder_rotated_translated():
    """90deg rotation about y maps the object z-axis to world x — the
    sample_scene.json cylinder (rotate then translate, parser.hpp:423-440)."""
    t = _scene_with(
        lambda s, m: s.add_cylinder(0.25, -1, 1, m, rotate=((0, 1, 0), 90),
                                    translate=(0, 0, -1)))
    # world-space: cylinder axis along x, centered at (0,0,-1)
    h = _shoot(t, (0, 3, -1), (0, -1, 0))
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 2.75, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 1, 0], atol=1e-4)


def test_triangle_hit_and_barycentric_uv():
    def add(s, m):
        s.add_triangle((0, 0, -2), (2, 0, -2), (0, 2, -2), m,
                       uv1=(0, 0), uv2=(1, 0), uv3=(0, 1))

    t = _scene_with(add)
    h = _shoot(t, (0.5, 0.5, 0), (0, 0, -1))
    assert bool(h.hit[0]) and int(h.ptype[0]) == PTYPE_TRIANGLE
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(h.u[0]), 0.25, atol=1e-5)
    np.testing.assert_allclose(float(h.v[0]), 0.25, atol=1e-5)
    # double-sided: approach from behind also hits
    h = _shoot(t, (0.5, 0.5, -4), (0, 0, 1))
    assert bool(h.hit[0])


def test_triangle_taichi_uv_quirk():
    """Opt-in Taichi quirk: UVs interpolated with the v1/v3 barycentric
    weights swapped (taichi-version/hittable.py:57-60 computes
    w1 = |cross(p-v1, p-v2)| / |cross(v3-v1, v3-v2)| — the weight
    opposite v3 — and hittable.py:233 applies it to u1). Pin our
    quirk-mode UV against that exact formula evaluated by hand."""
    v1 = np.array([0, 0, -2], np.float64)
    v2 = np.array([2, 0, -2], np.float64)
    v3 = np.array([0, 2, -2], np.float64)
    uv = {1: np.array([0.1, 0.2]), 2: np.array([0.9, 0.1]),
          3: np.array([0.3, 0.8])}

    def add(s, m):
        s.add_triangle(v1, v2, v3, m, uv1=tuple(uv[1]), uv2=tuple(uv[2]),
                       uv3=tuple(uv[3]))

    # hit point p=(0.5, 0.5, -2): reference weights
    p = np.array([0.5, 0.5, -2], np.float64)
    w1 = (np.linalg.norm(np.cross(p - v1, p - v2))
          / np.linalg.norm(np.cross(v3 - v1, v3 - v2)))
    w2 = (np.linalg.norm(np.cross(p - v1, p - v3))
          / np.linalg.norm(np.cross(v2 - v1, v2 - v3)))
    w3 = (np.linalg.norm(np.cross(p - v3, p - v2))
          / np.linalg.norm(np.cross(v1 - v3, v1 - v2)))
    expect = uv[1] * w1 + uv[2] * w2 + uv[3] * w3

    s = SceneDef(taichi_tri_uv=True)
    m = s.add_lambertian_color((0.5, 0.5, 0.5))
    add(s, m)
    s.set_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 90, 1.0)
    h = _shoot(build_tables(s), (0.5, 0.5, 0), (0, 0, -1))
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.u[0]), expect[0], atol=1e-5)
    np.testing.assert_allclose(float(h.v[0]), expect[1], atol=1e-5)

    # default mode: standard barycentrics (weights NOT swapped) differ
    h0 = _shoot(_scene_with(add), (0.5, 0.5, 0), (0, 0, -1))
    std = uv[1] * w3 + uv[2] * w2 + uv[3] * w1
    np.testing.assert_allclose(float(h0.u[0]), std[0], atol=1e-5)
    assert abs(float(h0.u[0]) - expect[0]) > 0.02


def test_triangle_miss_outside():
    t = _scene_with(
        lambda s, m: s.add_triangle((0, 0, -2), (2, 0, -2), (0, 2, -2), m))
    h = _shoot(t, (1.5, 1.5, 0), (0, 0, -1))
    assert not bool(h.hit[0])


def test_closest_hit_across_types():
    def add(s, m):
        s.add_sphere((0, 0, -5), 1.0, m)        # t=4
        s.add_rect("xy_rect", -2, 2, -2, 2, -3, m)  # t=3 (closer)

    t = _scene_with(add)
    h = _shoot(t, (0, 0, 0), (0, 0, -1))
    assert int(h.ptype[0]) == PTYPE_RECT
    np.testing.assert_allclose(float(h.t[0]), 3.0, rtol=1e-6)


def test_tie_break_later_object_wins():
    """Two coincident spheres: the scan semantics accept t<=closest, so
    the later object index wins (object.cuh:23-37)."""
    s = SceneDef()
    m1 = s.add_lambertian_color((1, 0, 0))
    m2 = s.add_lambertian_color((0, 1, 0))
    s.add_sphere((0, 0, -3), 1.0, m1)
    s.add_sphere((0, 0, -3), 1.0, m2)
    s.set_camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 90, 1.0)
    t = build_tables(s)
    h = _shoot(t, (0, 0, 0), (0, 0, -1))
    assert int(h.obj[0]) == 1
    assert int(h.mat[0]) == m2


def test_t_min_epsilon():
    """Hits closer than t_min=1e-3 are rejected (shadow acne epsilon,
    main.cu:45)."""
    t = _scene_with(lambda s, m: s.add_sphere((0, 0, 0), 1.0, m))
    # origin on the surface: near root ~0 rejected, far root = 2 accepted
    h = _shoot(t, (0, 0, 1), (0, 0, -1))
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-5)


def test_pad_rows_never_hit():
    t = _scene_with(lambda s, m: s.add_sphere((0, 0, -3), 1.0, m))
    # shoot rays in many directions; only the real sphere can be hit
    rs = np.random.RandomState(0)
    rd = rs.randn(64, 3).astype(np.float32)
    ro = np.zeros((64, 3), np.float32)
    h = intersect(t, jnp.asarray(ro), jnp.asarray(rd))
    assert np.all(np.asarray(h.obj[np.asarray(h.hit)]) == 0)


def test_occluded_shadow_query():
    """Any-hit shadow classifier (the naive tracer's hit_shadow)."""
    import jax.numpy as jnp

    from rt_tpu.ops.intersect import occluded
    from rt_tpu.scene.types import SceneDef, build_tables

    s = SceneDef()
    m = s.add_lambertian_color((0.5, 0.5, 0.5))
    s.add_sphere((0, 0, -2), 0.5, m)
    s.set_camera(lookfrom=(0, 0, 1), lookat=(0, 0, -1), vup=(0, 1, 0),
                 vfov_deg=45.0, aperture=0.0)
    tables = build_tables(s)

    ro = jnp.zeros((3, 3))
    rd = jnp.asarray([[0.0, 0.0, -1.0],   # toward the sphere
                      [0.0, 0.0, -1.0],   # toward, but light closer
                      [0.0, 1.0, 0.0]])   # away
    occ = occluded(tables, ro, rd, t_max=jnp.asarray([10.0, 1.0, 10.0]))
    assert bool(occ[0])       # sphere at t=1.5 < 10
    assert not bool(occ[1])   # light at t=1.0 before the sphere
    assert not bool(occ[2])   # nothing that way
