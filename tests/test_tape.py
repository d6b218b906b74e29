"""Winner-tape reverse-mode estimator (diff/tape.py).

The tape replay must (a) reproduce the forward radiance of the wavefront
integrator exactly — it is the same bounce loop with the closest hit
recomputed against the recorded winner — and (b) produce gradients equal
to plain scan reverse-mode (method="ad"), which differentiates the FULL
intersect: the tape freezes exactly the decisions AD detaches
(comparisons), so the interior chains must agree.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_tpu.config import RenderConfig
from rt_tpu.ops.camera import generate_rays
from rt_tpu.render.integrator import trace
from rt_tpu.scene.types import SceneDef, build_tables
from rt_tpu.diff.tape import (
    TAPE_FIELDS, capture_tape, make_tape_loss_fn, make_tape_render,
    replay_tape)


def _mixed_scene(max_depth=4, background_mode="gradient", p_rr=0.0,
                 exhaust_mode="black"):
    """One of every material family + a checker ground, gradient sky —
    every interior gradient chain (albedo, fuzz lobe, Schlick/refraction,
    hit-point/normal -> sky) is live."""
    s = SceneDef(width=24, height=16, samples_per_pixel=2,
                 max_depth=max_depth, background=(0.7, 0.8, 1.0))
    lam = s.add_lambertian_color((0.5, 0.3, 0.2))
    met = s.add_metal((0.8, 0.7, 0.6), 0.3)
    die = s.add_dielectric(1.5)
    chk = s.add_lambertian(s.add_checker((0.2, 0.3, 0.1), (0.9, 0.9, 0.9)))
    s.add_sphere((0, 0, -1), 0.5, lam)
    s.add_sphere((-1.0, 0, -1), 0.5, met)
    s.add_sphere((1.0, 0, -1), 0.5, die)
    s.add_sphere((0, -100.5, -1), 100, chk)
    s.set_camera(lookfrom=(0, 0, 1), lookat=(0, 0, -1), vup=(0, 1, 0),
                 vfov_deg=45.0, aperture=0.0)
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=2,
                       max_depth=max_depth, loop="scan",
                       background_mode=background_mode, p_rr=p_rr,
                       exhaust_mode=exhaust_mode)
    return s, cfg


def _all_families_scene():
    """Sphere + rect + cylinder + triangle, emissive light, image
    texture: exercises every leaf test and the atlas chain."""
    tex = np.zeros((8, 8, 3), np.float32)
    tex[::2, ::2] = (1.0, 0.5, 0.0)
    tex[1::2, 1::2] = (0.0, 0.5, 1.0)
    s = SceneDef(width=24, height=16, samples_per_pixel=2, max_depth=5,
                 background=(0.3, 0.35, 0.4))
    s.add_sphere((0, 0.2, -2), 0.5, s.add_lambertian_color((0.6, 0.3, 0.2)))
    s.add_rect("xy_rect", -1.5, 0.5, -1, 1, -3.2,
               s.add_lambertian(s.add_image_texture(tex)))
    s.add_cylinder(0.3, -0.5, 0.5, s.add_metal((0.8, 0.8, 0.7), 0.2),
                   rotate=((0, 1, 0), 30.0), translate=(1.2, 0, -2.2))
    s.add_triangle((-1.8, -0.5, -1.5), (-0.8, -0.5, -1.8), (-1.3, 0.7, -1.6),
                   s.add_lambertian_color((0.2, 0.5, 0.7)))
    s.add_rect("xz_rect", -0.6, 0.6, -2.6, -1.6, 1.6,
               s.add_diffuse_light_color((4.0, 4.0, 4.0)))
    s.add_sphere((0, -100.6, -2), 100,
                 s.add_lambertian_color((0.5, 0.5, 0.5)))
    s.set_camera(lookfrom=(0, 0.3, 1.5), lookat=(0, 0, -2), vup=(0, 1, 0),
                 vfov_deg=55.0, aperture=0.0)
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=2,
                       max_depth=5, loop="scan")
    return s, cfg


def _rays_of(tables, cfg, s=0):
    n = cfg.width * cfg.height
    pix = np.arange(n, dtype=np.int32)
    px = jnp.asarray(pix % cfg.width)
    py = jnp.asarray(pix // cfg.width)
    pixel = (py * cfg.width + px).astype(jnp.uint32)
    sample = jnp.full((n,), s, jnp.uint32)
    seed = jnp.uint32(cfg.seed)
    ro, rd = generate_rays(tables.camera, cfg.width, cfg.height, px, py,
                           sample, seed, cfg.enable_defocus)
    return px, py, pixel, sample, seed, ro, rd


@pytest.mark.parametrize("scene_fn,kw", [
    (_mixed_scene, {}),
    (_mixed_scene, {"p_rr": 0.9}),
    (_mixed_scene, {"exhaust_mode": "background", "max_depth": 3}),
    (_all_families_scene, {}),
])
def test_tape_replay_matches_trace(scene_fn, kw):
    sdef, cfg = scene_fn(**kw)
    tables = jax.tree_util.tree_map(jnp.asarray, build_tables(sdef))
    px, py, pixel, sample, seed, ro, rd = _rays_of(tables, cfg)
    ref = np.asarray(trace(tables, cfg, ro, rd, pixel, sample, seed))
    codes = capture_tape(tables, cfg, ro, rd, pixel, sample, seed)
    got = np.asarray(replay_tape(tables, cfg, ro, rd, codes, pixel,
                                 sample, seed))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def _ad_img(tables, cfg, px, py, spp):
    n = px.shape[0]
    pixel = (py * cfg.width + px).astype(jnp.uint32)
    seed = jnp.uint32(cfg.seed)

    def img(p):
        tbl = dataclasses.replace(tables, **p)

        def body(acc, sidx):
            sample = jnp.full((n,), sidx, jnp.uint32)
            ro, rd = generate_rays(tbl.camera, cfg.width, cfg.height,
                                   px, py, sample, seed,
                                   cfg.enable_defocus)
            return acc + trace(tbl, cfg, ro, rd, pixel, sample, seed), None

        acc, _ = jax.lax.scan(body, jnp.zeros((n, 3), jnp.float32),
                              jnp.arange(spp, dtype=jnp.uint32))
        return acc / jnp.float32(spp)

    return img


def test_tape_gradients_match_scan_ad():
    """Reverse-mode through the tape == reverse-mode through the full
    intersect, for EVERY field class at once: radiometric (albedo,
    emission textures), material chains (fuzz, IOR) and geometry
    (sphere centers/radii) — the capability the forward-mode tangent
    replay could only reach one component at a time."""
    sdef, cfg = _mixed_scene()
    tables = jax.tree_util.tree_map(jnp.asarray, build_tables(sdef))
    px, py, *_ = _rays_of(tables, cfg)
    fields = ("mat_albedo", "mat_fuzz", "mat_ior", "tex_color",
              "tex_color2", "sph_center", "sph_radius")
    p0 = {f: jnp.asarray(getattr(tables, f), jnp.float32) for f in fields}

    img_fn = make_tape_render(tables, cfg, 2, px, py)
    tgt = jax.lax.stop_gradient(img_fn(p0)) * 0.9
    g_tape = jax.grad(lambda p: jnp.mean((img_fn(p) - tgt) ** 2))(p0)
    ad = _ad_img(tables, cfg, px, py, 2)
    g_ad = jax.grad(lambda p: jnp.mean((ad(p) - tgt) ** 2))(p0)

    checked = 0
    for f in fields:
        a, b = np.asarray(g_tape[f]), np.asarray(g_ad[f])
        scale = np.abs(b).max()
        assert scale > 0.0, f"{f}: scan-AD gradient unexpectedly zero"
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-4 * scale,
                                   err_msg=f)
        checked += 1
    assert checked == len(fields)


def test_tape_gradients_extended_geometry():
    """Rect extents / cylinder caps / triangle vertices — geometry the
    tangent replay never covered — against scan-AD."""
    sdef, cfg = _all_families_scene()
    cfg = cfg.replace(background_mode="gradient")
    tables = jax.tree_util.tree_map(jnp.asarray, build_tables(sdef))
    px, py, *_ = _rays_of(tables, cfg)
    fields = ("rect_k", "rect_lo", "rect_hi", "cyl_radius", "cyl_zmin",
              "cyl_zmax", "tri_v1", "tri_v2", "tri_v3", "images")
    p0 = {f: jnp.asarray(getattr(tables, f), jnp.float32) for f in fields}

    img_fn = make_tape_render(tables, cfg, 2, px, py)
    tgt = jax.lax.stop_gradient(img_fn(p0)) * 0.9
    g_tape = jax.grad(lambda p: jnp.mean((img_fn(p) - tgt) ** 2))(p0)
    ad = _ad_img(tables, cfg, px, py, 2)
    g_ad = jax.grad(lambda p: jnp.mean((ad(p) - tgt) ** 2))(p0)

    nonzero = set()
    for f in fields:
        a, b = np.asarray(g_tape[f]), np.asarray(g_ad[f])
        scale = np.abs(b).max()
        if scale > 0.0:
            nonzero.add(f)
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-4 * scale,
                                       err_msg=f)
        else:
            # rect_lo/hi, cyl_zmin/zmax, tri_v2/v3 act ONLY through hit
            # UVs, and every UV consumer is nearest-neighbor (image) or
            # p-based (checker) — piecewise-constant, so their interior
            # gradient is zero a.e.; tape must agree with AD's zero
            assert np.abs(a).max() == 0.0, f
    assert nonzero >= {"rect_k", "cyl_radius", "tri_v1", "images"}, nonzero


def test_tape_segmentation_invariant():
    """The two-level remat chunking must not change the gradient — only
    the residual footprint."""
    sdef, cfg = _mixed_scene(max_depth=6)
    tables = jax.tree_util.tree_map(jnp.asarray, build_tables(sdef))
    px, py, *_ = _rays_of(tables, cfg)
    p0 = {"sph_center": jnp.asarray(tables.sph_center),
          "mat_albedo": jnp.asarray(tables.mat_albedo)}
    tgt = np.zeros((px.shape[0], 3), np.float32)

    grads = []
    for seg in (1, 3, 4, 6, None):
        loss = make_tape_loss_fn(tables, cfg, 2, px, py, tgt, segment=seg)
        grads.append(jax.grad(loss)(p0))
    for g in grads[1:]:
        for f in p0:
            np.testing.assert_allclose(np.asarray(g[f]),
                                       np.asarray(grads[0][f]),
                                       rtol=0, atol=1e-7)


def test_tape_gradient_matches_finite_difference():
    """End-to-end FD check through the full tape loss (capture + remat
    replay + sample mean) on radiometric chains. Geometry components are
    NOT FD-checked: central differences see the silhouette term (moving
    a center by eps changes WHICH pixels hit it) that every
    detached-sampling estimator here — scan-AD included — deliberately
    excludes; geometry correctness is pinned against scan-AD above."""
    sdef, cfg = _mixed_scene()
    tables = jax.tree_util.tree_map(jnp.asarray, build_tables(sdef))
    px, py, *_ = _rays_of(tables, cfg)
    p0 = {"tex_color": jnp.asarray(tables.tex_color)}
    img0 = make_tape_render(tables, cfg, 2, px, py)(p0)
    tgt = np.asarray(img0) * 0.8

    loss = make_tape_loss_fn(tables, cfg, 2, px, py, tgt)
    g = jax.grad(loss)(p0)

    eps = 1e-3
    for (i, c) in [(0, 0), (0, 2), (1, 1)]:
        tp = {"tex_color": p0["tex_color"].at[i, c].add(eps)}
        tm = {"tex_color": p0["tex_color"].at[i, c].add(-eps)}
        fd = (float(loss(tp)) - float(loss(tm))) / (2 * eps)
        got = float(g["tex_color"][i, c])
        assert abs(got - fd) <= max(2e-5, 0.05 * abs(fd)), (
            f"tex_color[{i},{c}]={got:.6g} vs fd={fd:.6g}")


def test_tape_rejects_unknown_fields():
    sdef, cfg = _mixed_scene()
    tables = build_tables(sdef)
    px, py, *_ = _rays_of(jax.tree_util.tree_map(jnp.asarray, tables), cfg)
    loss = make_tape_loss_fn(tables, cfg, 1, px, py,
                             np.zeros((px.shape[0], 3), np.float32))
    with pytest.raises(ValueError, match="tape gradients cover"):
        loss({"cyl_w2o": jnp.zeros((1, 4, 4))})
    assert "cyl_w2o" not in TAPE_FIELDS


def test_fit_tape_recovers_fuzz_and_ior():
    """Inverse rendering through the tape: recover metal fuzz AND glass
    IOR in one reverse-mode optimizer — the parameters the replay VJP
    can only reach via forward-mode geom_spec enumeration. Same scene
    shape as examples/inverse_render.py --material-geom (two balls
    against the gradient sky, where the interior chain IS the whole
    gradient)."""
    import dataclasses

    from rt_tpu.diff.inverse import fit
    from rt_tpu.render.renderer import render

    s = SceneDef(width=64, height=36, samples_per_pixel=4, max_depth=8,
                 background=(0.7, 0.8, 1.0))
    s.add_sphere((-0.9, 0, -2), 0.8, s.add_dielectric(1.5))
    s.add_sphere((0.9, 0, -2), 0.8, s.add_metal((0.8, 0.7, 0.6), 0.15))
    s.set_camera(lookfrom=(0, 0, 1), lookat=(0, 0, -2), vup=(0, 1, 0),
                 vfov_deg=50.0, aperture=0.0)
    cfg = RenderConfig(width=64, height=36, samples_per_pixel=4,
                       max_depth=8, background_mode="gradient",
                       loop="scan", engine="xla")
    tables = build_tables(s)
    target = np.asarray(render(tables, cfg)) / 4.0

    wrong = dataclasses.replace(
        jax.tree_util.tree_map(jnp.asarray, tables),
        mat_fuzz=jnp.asarray(tables.mat_fuzz, jnp.float32).at[1].set(0.4),
        mat_ior=jnp.asarray(tables.mat_ior, jnp.float32).at[0].set(1.1))
    rec, hist = fit(wrong, cfg, target, fields=("mat_fuzz", "mat_ior"),
                    spp=4, steps=50, learning_rate=3e-2, method="tape")
    assert hist[-1] < hist[0] * 0.25
    assert abs(float(rec["mat_fuzz"][1]) - 0.15) < 0.08
    assert abs(float(rec["mat_ior"][0]) - 1.5) < 0.12


def test_tape_camera_gradient_matches_scan_ad():
    """The camera frame is a differentiable input: primary rays are
    generated inside the tape's differentiable region, so pose
    cotangents flow through every bounce's hit-point chain. Must equal
    scan-AD leaf for leaf."""
    sdef, cfg = _mixed_scene()
    tables = jax.tree_util.tree_map(jnp.asarray, build_tables(sdef))
    px, py, *_ = _rays_of(tables, cfg)
    p0 = {"camera": tables.camera}

    img_fn = make_tape_render(tables, cfg, 2, px, py)
    tgt = jax.lax.stop_gradient(img_fn(p0)) * 0.9
    g_tape = jax.grad(lambda p: jnp.mean((img_fn(p) - tgt) ** 2))(p0)
    ad = _ad_img(tables, cfg, px, py, 2)
    g_ad = jax.grad(lambda p: jnp.mean((ad(p) - tgt) ** 2))(p0)

    leaves_t, treedef_t = jax.tree_util.tree_flatten(g_tape["camera"])
    leaves_a, treedef_a = jax.tree_util.tree_flatten(g_ad["camera"])
    assert treedef_t == treedef_a
    nonzero = 0
    for lt, la in zip(leaves_t, leaves_a):
        scale = float(jnp.abs(la).max())
        if scale > 0.0:
            nonzero += 1
        np.testing.assert_allclose(np.asarray(lt), np.asarray(la),
                                   rtol=0, atol=max(scale, 1e-12) * 1e-4)
    assert nonzero >= 4  # origin/lower_left/horizontal/vertical at least


def test_fit_camera_recovers_lookfrom():
    """Camera pose recovery: CRN finite differences see the image-shift
    (winner-flip) term that interior estimators drop — the supported
    estimator for pose, exactly as for sphere positions (fit_fd). The
    probes are forward-only renders, batched in one lax.map."""
    from rt_tpu.diff.inverse import fit_camera
    from rt_tpu.render.renderer import render

    s = SceneDef(width=48, height=27, samples_per_pixel=8, max_depth=4,
                 background=(0.7, 0.8, 1.0))
    s.add_sphere((0, 0, -1), 0.5, s.add_lambertian_color((0.5, 0.3, 0.2)))
    s.add_sphere((-1.1, 0, -1.4), 0.5, s.add_metal((0.8, 0.7, 0.6), 0.2))
    s.add_sphere((0, -100.5, -1), 100,
                 s.add_lambertian_color((0.6, 0.6, 0.6)))
    s.set_camera(lookfrom=(0, 0, 1), lookat=(0, 0, -1), vup=(0, 1, 0),
                 vfov_deg=45.0, aperture=0.0)
    cfg = RenderConfig(width=48, height=27, samples_per_pixel=8,
                       max_depth=4, loop="while",
                       background_mode="gradient", engine="xla")
    tables = build_tables(s)
    target = np.asarray(render(tables, cfg)) / 8.0

    init = {"lookfrom": np.asarray([0.04, -0.03, 1.05], np.float32),
            "lookat": (0, 0, -1), "vup": (0, 1, 0), "vfov_deg": 45.0,
            "aperture": 0.0}
    rec, hist = fit_camera(tables, cfg, target, init,
                           recover=("lookfrom",), spp=8, steps=80,
                           learning_rate=4e-3)
    assert hist[-1] < hist[0] * 0.05
    assert np.abs(rec["lookfrom"] - np.array([0, 0, 1.0])).max() < 0.01


def test_fit_camera_rejects_unknown_param():
    from rt_tpu.diff.inverse import fit_camera

    sdef, cfg = _mixed_scene()
    tables = build_tables(sdef)
    with pytest.raises(ValueError, match="recover must be among"):
        fit_camera(tables, cfg,
                   np.zeros((cfg.height, cfg.width, 3), np.float32),
                   {"lookfrom": (0, 0, 1), "lookat": (0, 0, -1),
                    "vup": (0, 1, 0), "vfov_deg": 45.0, "aperture": 0.0},
                   recover=("vup",), steps=1)


# ---------------------------------------------------------------------------
# round 3: in-kernel capture + death-sorted shrinking replay
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("scene_fn", [_mixed_scene, _all_families_scene])
def test_mega_capture_matches_host_capture(scene_fn):
    """The capture megakernel (ops/pallas_mega.mega_capture) records the
    same winner codes as the hybrid per-bounce capture on every lane
    that is still alive, and its death counts equal the integrator's
    alive chain. (Post-death lanes legitimately differ: the kernel
    records -1, the host the stale winner — both masked by the replay.)"""
    from rt_tpu.ops.pallas_mega import mega_capture
    from rt_tpu.render.integrator import RayState, _bounce

    sdef, cfg = scene_fn()
    tables = jax.tree_util.tree_map(jnp.asarray, build_tables(sdef))
    px, py, pixel, sample, seed, ro, rd = _rays_of(tables, cfg)
    b = ro.shape[0]

    codes_host = np.asarray(capture_tape(tables, cfg, ro, rd, pixel,
                                         sample, seed, engine="xla"))
    codes_mega, death = mega_capture(tables, cfg, ro, rd,
                                     pixel.astype(jnp.int32),
                                     jnp.uint32(0), seed)
    codes_mega = np.asarray(codes_mega)
    death = np.asarray(death)

    st = RayState(o=ro, d=rd,
                  throughput=jnp.ones((b, 3), jnp.float32),
                  rgb=jnp.zeros((b, 3), jnp.float32),
                  alive=jnp.ones((b,), bool))
    alive_ent = [np.ones(b, bool)]
    d_sim = np.zeros(b, np.int32)
    for i in range(cfg.max_depth):
        st = _bounce(tables, cfg, st, pixel, sample, seed, jnp.uint32(i))
        a = np.asarray(st.alive)
        d_sim += a.astype(np.int32)
        alive_ent.append(a)
    alive_ent = np.stack(alive_ent[:-1])  # [depth, B]: alive entering b

    live_mismatch = (codes_host != codes_mega) & alive_ent
    assert live_mismatch.sum() == 0
    np.testing.assert_array_equal(death, d_sim)


def test_make_tape_vg_matches_tape_loss():
    """The death-sorted shrinking replay (make_tape_vg) computes the
    same loss and gradients as the full-width replay over the SAME
    in-kernel capture — sorting, static-width slicing, and the
    frozen-suffix concatenation are exact restructurings."""
    from rt_tpu.diff.tape import make_tape_vg

    sdef, cfg = _mixed_scene(max_depth=6)
    tables = build_tables(sdef)
    w, h = cfg.width, cfg.height
    pix = np.arange(w * h, dtype=np.int32)
    rs = np.random.RandomState(0)
    target = rs.rand(w * h, 3).astype(np.float32)
    params = {
        "sph_center": jnp.asarray(tables.sph_center),
        "sph_radius": jnp.asarray(tables.sph_radius),
        "mat_albedo": jnp.asarray(tables.mat_albedo),
        "mat_fuzz": jnp.asarray(tables.mat_fuzz),
        "mat_ior": jnp.asarray(tables.mat_ior),
        "tex_color": jnp.asarray(tables.tex_color),
    }

    ref = jax.jit(jax.value_and_grad(make_tape_loss_fn(
        tables, cfg, 1, pix % w, pix // w, target, tape_engine="mega")))
    rl, rg = ref(params)

    step = make_tape_vg(tables, cfg, pix % w, pix // w, target,
                        min_width=64)  # force real shrinking
    vl, vg = step(params)

    np.testing.assert_allclose(float(vl), float(rl), rtol=2e-4)
    for k in params:
        a = np.asarray(rg[k])
        g = np.asarray(vg[k])
        assert np.isfinite(g).all()
        np.testing.assert_allclose(g, a, rtol=2e-3,
                                   atol=2e-4 * (np.abs(a).max() + 1e-12),
                                   err_msg=k)


def test_make_tape_vg_multi_sample():
    """spp > 1: samples share one max-death sorted layout and
    accumulate into one image — matches the full-width multi-sample
    tape loss over the same captures."""
    from rt_tpu.diff.tape import make_tape_vg

    sdef, cfg = _mixed_scene(max_depth=6)
    tables = build_tables(sdef)
    w, h = cfg.width, cfg.height
    pix = np.arange(w * h, dtype=np.int32)
    rs = np.random.RandomState(1)
    target = rs.rand(w * h, 3).astype(np.float32)
    params = {"sph_center": jnp.asarray(tables.sph_center),
              "mat_albedo": jnp.asarray(tables.mat_albedo),
              "tex_color": jnp.asarray(tables.tex_color)}

    ref = jax.jit(jax.value_and_grad(make_tape_loss_fn(
        tables, cfg, 3, pix % w, pix // w, target, tape_engine="mega")))
    rl, rg = ref(params)

    step = make_tape_vg(tables, cfg, pix % w, pix // w, target,
                        min_width=64, spp=3)
    vl, vg = step(params)
    np.testing.assert_allclose(float(vl), float(rl), rtol=2e-4)
    for k in params:
        a = np.asarray(rg[k])
        np.testing.assert_allclose(
            np.asarray(vg[k]), a, rtol=2e-3,
            atol=2e-4 * (np.abs(a).max() + 1e-12), err_msg=k)


def _nee_scene(max_depth=6):
    """Emissive rect light + lambertian geometry: the NEE direct term
    carries gradient through the light's emission (tex_color), the
    winner's albedo, AND the light's own geometry (rect extents are
    fixed here; the sphere light variant pins center/radius flow)."""
    s = SceneDef(width=24, height=16, samples_per_pixel=2,
                 max_depth=max_depth, background=(0.05, 0.05, 0.08))
    s.add_sphere((0, 0, -1.5), 0.5, s.add_lambertian_color((0.7, 0.2, 0.2)))
    s.add_sphere((0, -100.5, -1.5), 100,
                 s.add_lambertian_color((0.4, 0.4, 0.4)))
    s.add_sphere((0.9, 0.8, -1.0), 0.3,
                 s.add_diffuse_light_color((5.0, 4.0, 3.0)))
    s.set_camera(lookfrom=(0, 0.3, 1.2), lookat=(0, 0, -1.5),
                 vup=(0, 1, 0), vfov_deg=55.0, aperture=0.0)
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=2,
                       max_depth=max_depth, loop="scan", nee=True)
    return s, cfg


def test_tape_replay_nee_matches_trace():
    """Round 4: the tape replay adds the NEE direct term draw-for-draw
    (capture runs nee=False — winner codes are NEE-invariant)."""
    sdef, cfg = _nee_scene()
    tables = jax.tree_util.tree_map(jnp.asarray, build_tables(sdef))
    px, py, pixel, sample, seed, ro, rd = _rays_of(tables, cfg)
    ref = np.asarray(trace(tables, cfg, ro, rd, pixel, sample, seed))
    codes = capture_tape(tables, cfg, ro, rd, pixel, sample, seed)
    got = np.asarray(replay_tape(tables, cfg, ro, rd, codes, pixel,
                                 sample, seed))
    # 2e-5: the direct term re-fuses differently than trace's (3/1152
    # lanes land at ~1.06e-5 on CPU)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


def test_tape_gradients_nee_match_scan_ad():
    """Tape reverse-mode under NEE == scan-AD through the full
    intersect: light emission (tex_color), surface albedo, and the
    LIGHT's own geometry (sph_center/sph_radius of the emitter — the
    direct term's sample point, area, and cosines differentiate)."""
    sdef, cfg = _nee_scene()
    tables = jax.tree_util.tree_map(jnp.asarray, build_tables(sdef))
    px, py, *_ = _rays_of(tables, cfg)
    # every material here is texture-backed, so tex_color carries both
    # the albedos and the light's emission
    fields = ("tex_color", "sph_center", "sph_radius")
    p0 = {f: jnp.asarray(getattr(tables, f), jnp.float32) for f in fields}

    img_fn = make_tape_render(tables, cfg, 2, px, py)
    tgt = jax.lax.stop_gradient(img_fn(p0)) * 0.9
    g_tape = jax.grad(lambda p: jnp.mean((img_fn(p) - tgt) ** 2))(p0)
    ad = _ad_img(tables, cfg, px, py, 2)
    g_ad = jax.grad(lambda p: jnp.mean((ad(p) - tgt) ** 2))(p0)

    for f in fields:
        a, b = np.asarray(g_tape[f]), np.asarray(g_ad[f])
        scale = np.abs(b).max()
        assert scale > 0.0, f"{f}: scan-AD gradient unexpectedly zero"
        # 1e-3*scale: the direct term's light-geometry chain (sample
        # point/area/cosines) adds f32 depth; observed drift 7.5e-4
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-3 * scale,
                                   err_msg=f)


def test_make_tape_vg_nee():
    """The death-sorted shrinking replay under NEE matches the
    full-width tape loss over the same (nee-invariant) capture."""
    from rt_tpu.diff.tape import make_tape_vg

    sdef, cfg = _nee_scene()
    tables = build_tables(sdef)
    w, h = cfg.width, cfg.height
    pix = np.arange(w * h, dtype=np.int32)
    rs = np.random.RandomState(0)
    target = rs.rand(w * h, 3).astype(np.float32)
    params = {
        "sph_center": jnp.asarray(tables.sph_center),
        "mat_albedo": jnp.asarray(tables.mat_albedo),
        "tex_color": jnp.asarray(tables.tex_color),
    }
    ref = jax.jit(jax.value_and_grad(make_tape_loss_fn(
        tables, cfg, 1, pix % w, pix // w, target)))
    rl, rg = ref(params)
    step = make_tape_vg(tables, cfg, pix % w, pix // w, target,
                        min_width=64)
    vl, vg = step(params)
    np.testing.assert_allclose(float(vl), float(rl), rtol=2e-4)
    for k in params:
        a, g = np.asarray(rg[k]), np.asarray(vg[k])
        assert np.isfinite(g).all()
        np.testing.assert_allclose(g, a, rtol=2e-3,
                                   atol=2e-4 * (np.abs(a).max() + 1e-12),
                                   err_msg=k)
