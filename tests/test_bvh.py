"""BVH build + traversal: structural invariants and image equality with
the brute-force linear scan (the reference's correctness criterion —
identical images with and without acceleration, SURVEY.md §7 step 4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rt_tpu.accel.bvh import (
    _python_build, build_bvh, sphere_aabbs, traverse)
from rt_tpu.config import RenderConfig
from rt_tpu.ops.intersect import intersect
from rt_tpu.render.renderer import render
from rt_tpu.scene.builders import cover_scene, mesh_scene
from rt_tpu.scene.types import build_tables


def _random_aabbs(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.normal(0, 5, (n, 3)).astype(np.float32)
    r = (0.1 + rng.random(n)).astype(np.float32)[:, None]
    return c - r, c + r


@pytest.mark.parametrize("n", [1, 2, 3, 7, 64, 100])
def test_bvh_structure(n):
    lo, hi = _random_aabbs(n)
    bvh = build_bvh(lo, hi)
    m = 2 * n - 1
    assert bvh.obj_id.shape == (m,)
    leaves = bvh.obj_id[bvh.obj_id >= 0]
    assert sorted(leaves.tolist()) == list(range(n))
    # every node AABB contains its primitives
    root_lo, root_hi = bvh.bmin[0], bvh.bmax[0]
    assert (root_lo <= lo.min(0) + 1e-6).all()
    assert (root_hi >= hi.max(0) - 1e-6).all()
    # escape links: root escapes to -1
    assert bvh.next_id[0] == -1


@pytest.mark.parametrize("n", [2, 5, 33])
def test_native_matches_python_builder(n):
    from rt_tpu.io.native import native_build_bvh

    lo, hi = _random_aabbs(n, seed=3)
    nat = native_build_bvh(lo, hi)
    if nat is None:
        pytest.skip("native library unavailable")
    py = _python_build(lo, hi)
    for k in ("obj_id", "left_id", "next_id"):
        np.testing.assert_array_equal(nat[k], py[k])
    np.testing.assert_allclose(nat["bmin"], py["bmin"], rtol=1e-6)
    np.testing.assert_allclose(nat["bmax"], py["bmax"], rtol=1e-6)


def test_sphere_bvh_intersect_matches_linear():
    sdef, _ = cover_scene(spp=1, grid=5)
    tables = build_tables(sdef, bvh_types=("sphere",))
    assert tables.bvh_for == ("sphere",)
    rng = np.random.default_rng(1)
    ro = jnp.asarray(rng.normal(0, 4, (512, 3)).astype(np.float32))
    rd = jnp.asarray(rng.normal(0, 1, (512, 3)).astype(np.float32))
    ha = intersect(tables, ro, rd, traversal="linear")
    hb = intersect(tables, ro, rd, traversal="bvh")
    np.testing.assert_array_equal(np.asarray(ha.hit), np.asarray(hb.hit))
    # the radius-1000 ground sphere loses ~4 digits to f32 cancellation;
    # the two formulations (einsum-expanded vs oc-form) differ there
    np.testing.assert_allclose(
        np.asarray(jnp.where(ha.hit, ha.t, 0.0)),
        np.asarray(jnp.where(hb.hit, hb.t, 0.0)), rtol=1e-3, atol=5e-3)
    agree = (np.asarray(ha.pid) == np.asarray(hb.pid)).mean()
    assert agree > 0.995, agree  # exact-tie order may differ (documented)


def test_mesh_render_bvh_matches_linear(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "f 1 2 3\nf 2 4 3\n")
    sdef, cfg = mesh_scene(str(obj), width=32, height=18, spp=2, max_depth=4)
    t_lin = build_tables(sdef)
    t_bvh = build_tables(sdef, bvh_types=("triangle", "sphere"))
    a = render(t_lin, cfg)
    b = render(t_bvh, cfg.replace(traversal="bvh"))
    diff = np.abs(a - b).max() / cfg.samples_per_pixel
    assert diff < 2e-3, diff


def test_traverse_single_box():
    lo, hi = _random_aabbs(1)
    bvh = build_bvh(lo, hi)
    arrays = {"obj_id": jnp.asarray(bvh.obj_id),
              "left_id": jnp.asarray(bvh.left_id),
              "next_id": jnp.asarray(bvh.next_id),
              "bmin": jnp.asarray(bvh.bmin),
              "bmax": jnp.asarray(bvh.bmax)}
    center = jnp.asarray((lo[0] + hi[0]) / 2.0)
    ro = jnp.stack([center + jnp.asarray([0.0, 0.0, 10.0]),
                    center + jnp.asarray([100.0, 0.0, 10.0])])
    rd = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (2, 3))

    def leaf(pid, ro_, rd_, t_min):
        # plane z = center.z as a stand-in primitive
        t = (center[2] - ro_[:, 2]) / rd_[:, 2]
        return jnp.where(t >= t_min, t, np.float32(np.inf))

    t, pid = traverse(arrays, ro, rd, 1e-3, leaf)
    assert np.isfinite(float(t[0]))      # through the box
    assert not np.isfinite(float(t[1]))  # misses the box


def test_zero_direction_on_node_plane_not_culled():
    """A ray with a zero direction component whose origin lies exactly on
    a node's bounding plane for that axis must still traverse the subtree
    (the naive slab form computes 0 * inf = NaN and wrongly culls it —
    ADVICE round 1). Uses a deliberately loose box so the interior hit is
    unambiguous."""
    import jax.numpy as jnp

    bvh_arrays = {
        "obj_id": jnp.asarray([0], jnp.int32),       # single leaf node
        "left_id": jnp.asarray([-1], jnp.int32),
        "next_id": jnp.asarray([-1], jnp.int32),
        "bmin": jnp.asarray([[0.0, -2.0, 0.0]], jnp.float32),
        "bmax": jnp.asarray([[4.0, 2.0, 10.0]], jnp.float32),
    }
    # origin x == bmin.x == 0 with dx == 0; sphere interior hit at t=4
    ro = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    rd = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    center = jnp.asarray([0.0, 0.0, 5.0])

    def leaf_test(pid, ro_, rd_, t_min):
        oc = ro_ - center
        b_half = (oc * rd_).sum(-1)
        c = (oc * oc).sum(-1) - 1.0
        disc = b_half * b_half - c
        t = -b_half - jnp.sqrt(jnp.maximum(disc, 0.0))
        return jnp.where((disc >= 0) & (t >= t_min), t, jnp.inf)

    t_best, pid = traverse(bvh_arrays, ro, rd, 1e-3, leaf_test)
    assert np.isfinite(float(t_best[0]))
    assert float(t_best[0]) == pytest.approx(4.0, rel=1e-5)


def test_rect_cylinder_bvh_matches_linear():
    """BVH traversal over rects + cylinders (round 2: BVH covers every
    primitive family, not just spheres/triangles) renders the dna scene
    identically to the linear scan."""
    from rt_tpu.scene.builders import dna_scene

    sdef, cfg = dna_scene(width=48, height=27, spp=2, max_depth=4)
    lin = render(build_tables(sdef), cfg.replace(engine="xla"))
    tb = build_tables(sdef, bvh_types=("sphere", "rect", "cylinder",
                                       "triangle"))
    assert "cylinder" in tb.bvh_for
    bvh = render(tb, cfg.replace(engine="xla", traversal="bvh"))
    np.testing.assert_allclose(np.asarray(bvh), np.asarray(lin),
                               rtol=1e-5, atol=1e-5)


def test_rect_bvh_matches_linear():
    from rt_tpu.scene.builders import cornell_spheres_scene

    sdef, cfg = cornell_spheres_scene(width=32, height=32, spp=2,
                                      max_depth=4)
    has_rect = any(o["type"].endswith("_rect") for o in sdef.objects)
    lin = render(build_tables(sdef), cfg.replace(engine="xla"))
    tb = build_tables(sdef, bvh_types=("sphere", "rect", "cylinder",
                                       "triangle"))
    bvh = render(tb, cfg.replace(engine="xla", traversal="bvh"))
    np.testing.assert_allclose(np.asarray(bvh), np.asarray(lin),
                               rtol=1e-5, atol=1e-5)
