"""Differentiable rendering: finite-difference gradient checks and
inverse-rendering recovery (BASELINE.json configs #5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_tpu.config import RenderConfig
from rt_tpu.render.renderer import render
from rt_tpu.scene.builders import three_sphere_scene
from rt_tpu.scene.types import SceneDef, build_tables
from rt_tpu.diff.inverse import (
    apply_params, extract_params, fit, make_loss_fn)
from rt_tpu.parallel.mesh import make_mesh


def _tiny_scene(albedo=(0.5, 0.3, 0.2)):
    s = SceneDef(width=24, height=16, samples_per_pixel=2, max_depth=3,
                 background=(0.7, 0.8, 1.0))
    m = s.add_lambertian_color(albedo)
    s.add_sphere((0, 0, -1), 0.5, m)
    s.add_sphere((0, -100.5, -1), 100, s.add_lambertian_color((0.6, 0.6, 0.6)))
    s.set_camera(lookfrom=(0, 0, 1), lookat=(0, 0, -1), vup=(0, 1, 0),
                 vfov_deg=45.0, aperture=0.0)
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=2, max_depth=3,
                       loop="scan")
    return s, cfg


def _pixel_list(cfg):
    pix = np.arange(cfg.width * cfg.height, dtype=np.int32)
    return (jnp.asarray(pix % cfg.width), jnp.asarray(pix // cfg.width))


def test_albedo_gradient_matches_finite_difference():
    sdef, cfg = _tiny_scene()
    tables = build_tables(sdef)
    px, py = _pixel_list(cfg)
    target = jnp.zeros((px.shape[0], 3), jnp.float32)

    loss_fn = make_loss_fn(tables, cfg, spp=2)
    params = {"tex_color": jnp.asarray(tables.tex_color)}
    grad = jax.grad(loss_fn)(params, px, py, target)["tex_color"]

    # central differences on the sphere albedo's red channel
    eps = 1e-3
    for (i, c) in [(0, 0), (0, 2), (1, 1)]:
        tp = jnp.asarray(tables.tex_color).at[i, c].add(eps)
        tm = jnp.asarray(tables.tex_color).at[i, c].add(-eps)
        lp = loss_fn({"tex_color": tp}, px, py, target)
        lm = loss_fn({"tex_color": tm}, px, py, target)
        fd = (float(lp) - float(lm)) / (2 * eps)
        assert abs(float(grad[i, c]) - fd) <= max(2e-3, 0.05 * abs(fd)), (
            f"grad[{i},{c}]={float(grad[i, c]):.6f} vs fd={fd:.6f}")


def test_sphere_center_gradient_is_finite_and_nonzero():
    # With flat albedos and a constant background the radiance is
    # piecewise-constant in geometry (zero gradient a.e. — detached
    # sampling has no edge term). The gradient sky makes radiance depend
    # continuously on the scattered direction, hence on the normal and
    # the sphere center.
    sdef, cfg = _tiny_scene()
    cfg = cfg.replace(background_mode="gradient")
    tables = build_tables(sdef)
    px, py = _pixel_list(cfg)
    target = jnp.zeros((px.shape[0], 3), jnp.float32)

    loss_fn = make_loss_fn(tables, cfg, spp=2)
    params = {"sph_center": jnp.asarray(tables.sph_center)}
    grad = jax.grad(loss_fn)(params, px, py, target)["sph_center"]
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad[0]).sum()) > 0.0


def test_inverse_render_recovers_albedo():
    true_albedo = (0.7, 0.2, 0.4)
    sdef, cfg = _tiny_scene(albedo=true_albedo)
    tables = build_tables(sdef)
    target = render(tables, cfg) / cfg.samples_per_pixel

    # start from a wrong albedo; optimize tex_color only
    wrong_sdef, _ = _tiny_scene(albedo=(0.3, 0.5, 0.1))
    wrong_tables = build_tables(wrong_sdef)

    recovered, history = fit(
        wrong_tables, cfg, target, fields=("tex_color",), spp=2,
        steps=60, learning_rate=5e-2)
    assert history[-1] < history[0] * 0.1
    got = recovered["tex_color"][0]
    assert np.allclose(got, true_albedo, atol=0.08), got


def test_inverse_render_sharded_matches_single():
    """One SPMD train step == one single-device train step (same data)."""
    import optax
    from rt_tpu.diff.inverse import (
        make_train_step, pixel_sharding, _padded_pixel_list)

    sdef, cfg = _tiny_scene()
    tables = build_tables(sdef)
    mesh = make_mesh((4, 2), jax.devices())
    opt = optax.sgd(1e-2)
    params0 = extract_params(tables, ("tex_color",))
    params0 = {k: jnp.asarray(v) for k, v in params0.items()}

    px, py, n_pix = _padded_pixel_list(cfg.width, cfg.height, 8)
    target = np.full((px.shape[0], 3), 0.25, np.float32)

    step_1 = make_train_step(tables, cfg, 2, opt, mesh=None)
    p1, _, loss1 = step_1(params0, opt.init(params0), jnp.asarray(px),
                          jnp.asarray(py), jnp.asarray(target))

    sh = pixel_sharding(mesh)
    step_n = make_train_step(tables, cfg, 2, opt, mesh=mesh)
    p_n, _, loss_n = step_n(
        params0, opt.init(params0),
        jax.device_put(jnp.asarray(px), sh),
        jax.device_put(jnp.asarray(py), sh),
        jax.device_put(jnp.asarray(target), sh))

    assert abs(float(loss1) - float(loss_n)) < 1e-5
    np.testing.assert_allclose(np.asarray(p1["tex_color"]),
                               np.asarray(p_n["tex_color"]),
                               rtol=1e-4, atol=1e-6)


def test_fd_position_recovery():
    """Sphere-position recovery via central differences with common
    random numbers (detached-sampling AD cannot see the silhouette
    term; the counter RNG makes FD noise-free — diff/inverse.fit_fd)."""
    from rt_tpu.diff.inverse import fit_fd

    def make(center_x):
        s = SceneDef(width=48, height=27, samples_per_pixel=8, max_depth=3,
                     background=(0.7, 0.8, 1.0))
        m = s.add_lambertian_color((0.7, 0.2, 0.2))
        s.add_sphere((center_x, 0, -1), 0.5, m)
        s.add_sphere((0, -100.5, -1), 100,
                     s.add_lambertian_color((0.6, 0.6, 0.6)))
        s.set_camera((0, 0.3, 1), (0, 0, -1), (0, 1, 0), 50, 0.0)
        cfg = RenderConfig(width=48, height=27, samples_per_pixel=8,
                           max_depth=3, background_mode="gradient")
        return s, cfg

    true_x = 0.15
    sdef_t, cfg = make(true_x)
    target = render(build_tables(sdef_t), cfg) / cfg.samples_per_pixel
    sdef_w, _ = make(-0.1)
    rec, hist = fit_fd(build_tables(sdef_w), cfg, target,
                       fd_params={"sph_center": [(0, 0)]},
                       spp=8, steps=50, learning_rate=3e-2)
    assert hist[-1] < hist[0] * 0.05
    assert abs(rec["sph_center"][0, 0] - true_x) < 0.03


def test_fit_hybrid_recovers_albedo_and_position_jointly():
    """BASELINE.json config #5 verbatim — "recover albedo + sphere
    positions from target image" — in ONE optimization loop: the
    path-replay VJP drives the albedo while common-random-numbers
    central differences (the only estimator that sees the silhouette
    boundary term) drive the sphere center, both inside a single jitted
    Adam step (diff/inverse.fit_hybrid)."""
    from rt_tpu.diff.inverse import fit_hybrid

    def make(center_x, albedo):
        s = SceneDef(width=48, height=27, samples_per_pixel=8, max_depth=3,
                     background=(0.7, 0.8, 1.0))
        m = s.add_lambertian_color(albedo)
        s.add_sphere((center_x, 0, -1), 0.5, m)
        s.add_sphere((0, -100.5, -1), 100,
                     s.add_lambertian_color((0.6, 0.6, 0.6)))
        s.set_camera((0, 0.3, 1), (0, 0, -1), (0, 1, 0), 50, 0.0)
        cfg = RenderConfig(width=48, height=27, samples_per_pixel=8,
                           max_depth=3, background_mode="gradient",
                           loop="while")
        return s, cfg

    true_x, true_albedo = 0.15, (0.7, 0.2, 0.2)
    sdef_t, cfg = make(true_x, true_albedo)
    target = render(build_tables(sdef_t), cfg) / cfg.samples_per_pixel
    sdef_w, _ = make(-0.1, (0.3, 0.5, 0.4))
    rec, hist = fit_hybrid(build_tables(sdef_w), cfg, target,
                           replay_fields=("tex_color",),
                           fd_params={"sph_center": [(0, 0)]},
                           spp=8, steps=60, learning_rate=3e-2)
    assert hist[-1] < hist[0] * 0.05
    assert abs(rec["sph_center"][0, 0] - true_x) < 0.03
    assert np.abs(rec["tex_color"][0] - np.asarray(true_albedo)).max() < 0.08

    # sharded run: GSPMD shards the pixel batch through BOTH estimators
    # (replay loops + lax.map'd FD probes); 48*27 = 1296 pixels divide
    # the 8-device mesh exactly, so results must match the
    # single-device run up to reduction order
    mesh = make_mesh()
    rec_m, hist_m = fit_hybrid(build_tables(sdef_w), cfg, target,
                               replay_fields=("tex_color",),
                               fd_params={"sph_center": [(0, 0)]},
                               spp=8, steps=8, learning_rate=3e-2,
                               mesh=mesh)
    rec_1, hist_1 = fit_hybrid(build_tables(sdef_w), cfg, target,
                               replay_fields=("tex_color",),
                               fd_params={"sph_center": [(0, 0)]},
                               spp=8, steps=8, learning_rate=3e-2)
    np.testing.assert_allclose(hist_m, hist_1, rtol=1e-4)
    np.testing.assert_allclose(rec_m["sph_center"], rec_1["sph_center"],
                               atol=1e-4)
    np.testing.assert_allclose(rec_m["tex_color"], rec_1["tex_color"],
                               atol=1e-4)


def _emissive_scene():
    s = SceneDef(width=24, height=16, samples_per_pixel=2, max_depth=4,
                 background=(0.2, 0.25, 0.3))
    m = s.add_lambertian_color((0.5, 0.3, 0.2))
    s.add_sphere((0, 0, -1), 0.5, m)
    s.add_sphere((0, -100.5, -1), 100,
                 s.add_lambertian_color((0.6, 0.6, 0.6)))
    light = s.add_diffuse_light_color((3.0, 2.5, 2.0))
    s.add_sphere((0.8, 0.6, -1), 0.25, light)
    s.set_camera(lookfrom=(0, 0, 1), lookat=(0, 0, -1), vup=(0, 1, 0),
                 vfov_deg=45.0, aperture=0.0)
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=2, max_depth=4)
    return s, cfg


@pytest.mark.parametrize("mode", ["constant", "gradient"])
def test_replay_gradient_matches_scan_ad(mode):
    """Path-replay VJP == plain reverse-mode through the scan loop for
    the radiometric chain (albedo / emission / background), at O(B)
    memory instead of O(B*depth)."""
    from rt_tpu.diff.replay import make_replay_loss_fn

    sdef, cfg = _emissive_scene()
    cfg = cfg.replace(background_mode=mode)
    tables = build_tables(sdef)
    px, py = _pixel_list(cfg)
    target = jnp.full((px.shape[0], 3), 0.1, jnp.float32)

    params = {"tex_color": jnp.asarray(tables.tex_color),
              "background": jnp.asarray(tables.background)}

    scan_loss = make_loss_fn(tables, cfg.replace(loop="scan"), spp=2)
    g_scan = jax.grad(scan_loss)(params, px, py, target)

    replay_loss = make_replay_loss_fn(tables, cfg, spp=2, px=px, py=py,
                                      target=target)
    g_replay = jax.grad(replay_loss)(params)

    for k in params:
        np.testing.assert_allclose(np.asarray(g_replay[k]),
                                   np.asarray(g_scan[k]),
                                   rtol=2e-4, atol=2e-6)

    # bwd_early_exit only changes WHEN the replay loop stops (dead
    # lanes contribute zero adjoint), never what it computes: gradients
    # must be bitwise identical to the fixed-trip default
    early_loss = make_replay_loss_fn(tables, cfg, spp=2, px=px, py=py,
                                     target=target, bwd_early_exit=True)
    g_early = jax.grad(early_loss)(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(g_early[k]),
                                      np.asarray(g_replay[k]))


def test_replay_gradient_matches_finite_difference():
    """FD validation of the replay VJP (VERDICT r1 item 2's done
    criterion), mirroring the scan-path FD test."""
    from rt_tpu.diff.replay import make_replay_loss_fn

    sdef, cfg = _emissive_scene()
    tables = build_tables(sdef)
    px, py = _pixel_list(cfg)
    target = jnp.zeros((px.shape[0], 3), jnp.float32)

    loss_fn = make_replay_loss_fn(tables, cfg, spp=2, px=px, py=py,
                                  target=target)
    params = {"tex_color": jnp.asarray(tables.tex_color)}
    grad = jax.grad(loss_fn)(params)["tex_color"]

    eps = 1e-3
    for (i, c) in [(0, 0), (0, 2), (1, 1), (2, 0)]:
        tp = jnp.asarray(tables.tex_color).at[i, c].add(eps)
        tm = jnp.asarray(tables.tex_color).at[i, c].add(-eps)
        lp = loss_fn({"tex_color": tp})
        lm = loss_fn({"tex_color": tm})
        fd = (float(lp) - float(lm)) / (2 * eps)
        assert abs(float(grad[i, c]) - fd) <= max(2e-3, 0.05 * abs(fd)), (
            f"grad[{i},{c}]={float(grad[i, c]):.6f} vs fd={fd:.6f}")


def test_replay_rejects_geometry_fields():
    from rt_tpu.diff.replay import make_replay_loss_fn

    sdef, cfg = _emissive_scene()
    tables = build_tables(sdef)
    px, py = _pixel_list(cfg)
    loss_fn = make_replay_loss_fn(tables, cfg, spp=1, px=px, py=py,
                                  target=jnp.zeros((px.shape[0], 3)))
    with pytest.raises(ValueError, match="replay gradients cover"):
        loss_fn({"sph_center": jnp.asarray(tables.sph_center)})


def test_inverse_render_recovers_albedo_replay():
    """fit(method='replay'): same recovery as the scan path, via the
    O(B)-memory path-replay VJP."""
    true_albedo = (0.7, 0.2, 0.4)
    sdef, cfg = _tiny_scene(albedo=true_albedo)
    tables = build_tables(sdef)
    target = render(tables, cfg) / cfg.samples_per_pixel

    wrong_sdef, _ = _tiny_scene(albedo=(0.3, 0.5, 0.1))
    wrong_tables = build_tables(wrong_sdef)

    recovered, history = fit(
        wrong_tables, cfg.replace(loop="while"), target,
        fields=("tex_color",), spp=2, steps=60, learning_rate=5e-2,
        method="replay")
    assert history[-1] < history[0] * 0.1
    got = recovered["tex_color"][0]
    assert np.allclose(got, true_albedo, atol=0.08), got


def test_replay_geom_tangent_matches_scan_ad():
    """Forward-mode tangent replay (geom_spec) == reverse-mode through
    the scan loop for sphere center/radius, metal fuzz, and dielectric
    IOR components — the GEOM_FIELDS interior chains the analytic
    suffix adjoint cannot express — at O(B) memory."""
    from rt_tpu.scene.builders import cover_scene
    from rt_tpu.scene.types import MAT_DIELECTRIC, MAT_METAL
    from rt_tpu.diff.inverse import _device_tables
    from rt_tpu.diff.replay import make_replay_loss_fn
    from rt_tpu.render.renderer import render_block

    sdef, cfg = cover_scene(width=32, height=24, spp=1, max_depth=8,
                            grid=3)
    tables = _device_tables(build_tables(sdef))
    spp = 2
    px, py = _pixel_list(cfg)
    tgt = render_block(tables, cfg.replace(engine="xla", loop="scan"),
                       px, py, jnp.uint32(0), spp, jnp.uint32(cfg.seed),
                       cfg.width, cfg.height) / spp

    # the big metal/glass spheres (last material rows) are in-frame
    met = int(np.nonzero(np.asarray(tables.mat_type) == MAT_METAL)[0][-1])
    die = int(np.nonzero(
        np.asarray(tables.mat_type) == MAT_DIELECTRIC)[0][-1])
    # perturb away from the target so gradients are nonzero
    params = {"sph_center": tables.sph_center.at[0, 1].add(0.05),
              "sph_radius": tables.sph_radius.at[0].add(0.02),
              "mat_fuzz": jnp.asarray(tables.mat_fuzz),
              "mat_ior": tables.mat_ior.at[die].add(0.1),
              "tex_color": jnp.asarray(tables.tex_color)}
    spec = {"sph_center": [(0, 0), (0, 1)], "sph_radius": [(0,)],
            "mat_fuzz": [(met,)], "mat_ior": [(die,)]}

    scan_loss = make_loss_fn(tables, cfg, spp)
    g_scan = jax.grad(lambda p: scan_loss(p, px, py, tgt))(params)

    rep_loss = make_replay_loss_fn(
        tables, cfg.replace(engine="xla"), spp,
        np.asarray(px), np.asarray(py), np.asarray(tgt), geom_spec=spec)
    g_rep = jax.grad(rep_loss)(params)

    checked = nonzero = 0
    for f, idxs in spec.items():
        for idx in idxs:
            a = float(g_scan[f][idx])
            b = float(g_rep[f][idx])
            assert abs(a - b) <= 1e-8 + 1e-2 * abs(a), (f, idx, a, b)
            checked += 1
            nonzero += a != 0.0
    assert checked == 5 and nonzero >= 3  # the chains actually fire
    # radiometric field rides along through the same custom VJP
    np.testing.assert_allclose(np.asarray(g_rep["tex_color"]),
                               np.asarray(g_scan["tex_color"]),
                               rtol=2e-4, atol=2e-6)
    # non-selected geometry components stay zero (like fit_fd)
    assert float(jnp.abs(g_rep["sph_center"][1:]).max()) == 0.0


def test_replay_vjp_sharded_matches_single_device():
    """The replay custom VJP (both the suffix adjoint and the geom_spec
    tangent part) under a pixel batch sharded over the full 8-device
    mesh produces the same gradients as single-device: GSPMD propagates
    the sharding through the replay loops and inserts the parameter
    all-reduce itself."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rt_tpu.scene.builders import cover_scene
    from rt_tpu.diff.inverse import _device_tables
    from rt_tpu.diff.replay import make_replay_loss_fn
    from rt_tpu.render.renderer import render_block
    from rt_tpu.parallel.mesh import make_mesh, SAMPLE_AXIS, TILE_AXIS

    mesh = make_mesh()
    sdef, cfg = cover_scene(width=32, height=24, spp=1, max_depth=6,
                            grid=3)
    tables = _device_tables(build_tables(sdef))
    spp = 2
    px, py = _pixel_list(cfg)
    tgt = np.asarray(
        render_block(tables, cfg.replace(engine="xla", loop="scan"),
                     px, py, jnp.uint32(0), spp, jnp.uint32(cfg.seed),
                     cfg.width, cfg.height) / spp)

    params = {"tex_color": jnp.asarray(tables.tex_color),
              "sph_center": tables.sph_center.at[0, 1].add(0.05)}
    spec = {"sph_center": [(0, 0), (0, 1)]}

    loss1 = make_replay_loss_fn(tables, cfg.replace(engine="xla"), spp,
                                np.asarray(px), np.asarray(py), tgt,
                                geom_spec=spec)
    g1 = jax.jit(jax.grad(loss1))(params)

    sh = NamedSharding(mesh, P((TILE_AXIS, SAMPLE_AXIS)))
    loss8 = make_replay_loss_fn(
        tables, cfg.replace(engine="xla"), spp,
        jax.device_put(px, sh), jax.device_put(py, sh),
        jax.device_put(jnp.asarray(tgt), sh), geom_spec=spec)
    g8 = jax.jit(jax.grad(loss8))(params)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g8[k]), np.asarray(g1[k]),
                                   rtol=1e-5, atol=1e-8)


def test_fit_replay_mesh_pads_nondivisible_pixels():
    """fit(method='replay', mesh=...) pads a pixel count that does not
    divide the device count (like the 'ad' branch) instead of raising."""
    from rt_tpu.parallel.mesh import make_mesh
    from rt_tpu.render.renderer import render

    sdef, cfg = _tiny_scene(albedo=(0.7, 0.2, 0.4))
    cfg = cfg.replace(width=25, height=15, loop="while")  # 375 % 8 != 0
    sdef.resize(25, 15)
    tables = build_tables(sdef)
    target = render(tables, cfg) / cfg.samples_per_pixel

    wrong_sdef, _ = _tiny_scene(albedo=(0.3, 0.5, 0.1))
    wrong_sdef.resize(25, 15)
    recovered, history = fit(
        build_tables(wrong_sdef), cfg, target, fields=("tex_color",),
        spp=2, steps=25, learning_rate=8e-2, method="replay",
        mesh=make_mesh())
    assert history[-1] < history[0]
    assert np.allclose(recovered["tex_color"][0], (0.7, 0.2, 0.4),
                       atol=0.15)


def test_replay_bwd_depth_truncation_is_small_bias():
    """bwd_depth truncates the replays only: gradients stay within a
    small relative distance of the exact full-depth replay (adjoint
    mass decays with the throughput product), and the forward value is
    bit-identical."""
    from rt_tpu.scene.builders import cover_scene
    from rt_tpu.diff.inverse import _device_tables
    from rt_tpu.diff.replay import make_replay_loss_fn

    sdef, cfg = cover_scene(width=48, height=32, spp=1, max_depth=24,
                            grid=3)
    tables = _device_tables(build_tables(sdef))
    px, py = _pixel_list(cfg)
    tgt = np.zeros((px.shape[0], 3), np.float32)
    params = {"tex_color": jnp.asarray(tables.tex_color),
              "sph_center": jnp.asarray(tables.sph_center)}
    spec = {"sph_center": [(0, 1)]}

    exact_fn = make_replay_loss_fn(tables, cfg, 2, np.asarray(px),
                                   np.asarray(py), tgt, geom_spec=spec)
    trunc_fn = make_replay_loss_fn(tables, cfg, 2, np.asarray(px),
                                   np.asarray(py), tgt, geom_spec=spec,
                                   bwd_depth=8)
    (l_e, g_e) = jax.value_and_grad(exact_fn)(params)
    (l_t, g_t) = jax.value_and_grad(trunc_fn)(params)
    assert float(l_e) == float(l_t)  # forward untouched
    a = np.asarray(g_e["tex_color"]).ravel()
    b = np.asarray(g_t["tex_color"]).ravel()
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-12)
    assert rel < 0.02, rel
    ga = float(g_e["sph_center"][0, 1])
    gb = float(g_t["sph_center"][0, 1])
    assert abs(ga - gb) <= 1e-8 + 0.05 * abs(ga), (ga, gb)


def test_replay_recovers_image_texture():
    """TEXTURE RECOVERY: the image-texture texel fetch is an integer
    gather, so its VJP scatter-adds the per-bounce attenuation adjoint
    into the sampled texels — 'images' is a REPLAY_FIELD like any other.
    Recover an 8x8 texture on a rect from a target render; only texels
    some path actually sampled receive gradient (unseen ones keep their
    init), so the check masks by where gradient flowed."""
    from rt_tpu.diff.inverse import fit

    rs = np.random.RandomState(3)
    true_img = rs.rand(8, 8, 3).astype(np.float32)

    def make(img):
        s = SceneDef(width=48, height=27, samples_per_pixel=4, max_depth=3,
                     background=(0.8, 0.8, 0.9))
        m = s.add_lambertian(s.add_image_texture(img))
        s.add_rect("xy_rect", -1.2, 1.2, -0.7, 0.7, -1.0, m)
        s.set_camera((0, 0, 1.2), (0, 0, -1), (0, 1, 0), 60, 0.0)
        cfg = RenderConfig(width=48, height=27, samples_per_pixel=4,
                           max_depth=3, loop="while")
        return s, cfg

    sdef_t, cfg = make(true_img)
    target = render(build_tables(sdef_t), cfg) / cfg.samples_per_pixel

    init = np.full_like(true_img, 0.5)
    sdef_w, _ = make(init)
    rec, hist = fit(build_tables(sdef_w), cfg, target,
                    fields=("images",), spp=4, steps=80,
                    learning_rate=5e-2, method="replay")
    assert hist[-1] < hist[0] * 0.1
    got = rec["images"][0, :8, :8]  # atlas may be padded
    moved = np.abs(got - init).max(axis=-1) > 1e-3  # texels that trained
    assert moved.sum() >= 20  # most of the 8x8 face is visible
    err = np.abs(got - true_img).max(axis=-1)
    assert np.median(err[moved]) < 0.1


def test_adjoint_megakernel_matches_xla_replay():
    """The BACKWARD megakernel (pallas_mega._adjoint_kernel via
    bwd_kernel=True, interpret mode on CPU): the radiometric replay
    runs inside the forward's own Pallas bounce loop — segmented
    compaction included — accumulating parameter adjoints in-kernel by
    one-hot contraction over gradient slots. Must match the XLA
    per-bounce replay on every REPLAY_FIELD across materials, checker,
    emissive lights, compaction, truncation, and exhaust variants."""
    from rt_tpu.diff.replay import make_replay_loss_fn

    s = SceneDef(width=32, height=24, samples_per_pixel=2, max_depth=6,
                 background=(0.4, 0.5, 0.6))
    s.add_sphere((0, 0, -1.5), 0.5, s.add_lambertian_color((0.7, 0.2, 0.2)))
    s.add_sphere((-1.1, 0, -1.5), 0.5, s.add_metal((0.8, 0.7, 0.6), 0.2))
    s.add_sphere((1.1, 0, -1.5), 0.5, s.add_dielectric(1.5))
    ck = s.add_checker((0.9, 0.9, 0.9), (0.1, 0.2, 0.1))
    s.add_sphere((0, -100.5, -1.5), 100, s.add_lambertian(ck))
    s.add_rect("xy_rect", -0.5, 0.5, 0.8, 1.4, -2.5,
               s.add_diffuse_light_color((4.0, 3.5, 3.0)))
    s.set_camera((0, 0.3, 1.2), (0, 0, -1.5), (0, 1, 0), 55, 0.0)
    cfg = RenderConfig(width=32, height=24, samples_per_pixel=2,
                       max_depth=6, loop="while", engine="mega")
    tables = build_tables(s)
    px, py = _pixel_list(cfg)
    tgt = jnp.full((px.shape[0], 3), 0.2, jnp.float32)
    params = {"tex_color": jnp.asarray(tables.tex_color, jnp.float32),
              "tex_color2": jnp.asarray(tables.tex_color2, jnp.float32),
              "mat_albedo": jnp.asarray(tables.mat_albedo, jnp.float32),
              "background": jnp.asarray(tables.background, jnp.float32)}

    variants = [
        ("compact2", cfg.replace(compact_every=2), {}),
        ("trunc3", cfg, {"bwd_depth": 3}),
        ("exhaust", cfg.replace(exhaust_mode="background", max_depth=3),
         {}),
    ]
    for name, c, kwv in variants:
        g_x = jax.grad(make_replay_loss_fn(
            tables, c, 2, px, py, tgt, bwd_kernel=False, **kwv))(params)
        g_k = jax.grad(make_replay_loss_fn(
            tables, c, 2, px, py, tgt, bwd_kernel=True, **kwv))(params)
        for k in params:
            a, b = np.asarray(g_x[k]), np.asarray(g_k[k])
            mag = max(np.abs(a).max(), 1e-12)
            assert np.abs(a - b).max() <= 1e-5 + 1e-3 * mag, (name, k)

    # image-texture scene: texel cotangents scatter into the ATLAS
    # accumulators (the transpose of the double-one-hot sampler), and
    # the textured winner's rows must NOT leak into tex_color
    rs = np.random.RandomState(7)
    s2 = SceneDef(width=32, height=24, samples_per_pixel=2, max_depth=4,
                  background=(0.6, 0.7, 0.8))
    s2.add_rect("xy_rect", -1.0, 1.0, -0.6, 0.6, -1.2,
                s2.add_lambertian(s2.add_image_texture(
                    rs.rand(8, 8, 3).astype(np.float32))))
    s2.add_sphere((0.6, 0.1, -0.8), 0.25,
                  s2.add_lambertian_color((0.2, 0.6, 0.3)))
    s2.set_camera((0, 0, 1.0), (0, 0, -1.2), (0, 1, 0), 60, 0.0)
    c2 = RenderConfig(width=32, height=24, samples_per_pixel=2,
                      max_depth=4, loop="while", engine="mega",
                      compact_every=2)
    t2 = build_tables(s2)
    p2 = {"tex_color": jnp.asarray(t2.tex_color, jnp.float32),
          "images": jnp.asarray(t2.images, jnp.float32)}
    g_x = jax.grad(make_replay_loss_fn(
        t2, c2, 2, px, py, tgt, bwd_kernel=False))(p2)
    g_k = jax.grad(make_replay_loss_fn(
        t2, c2, 2, px, py, tgt, bwd_kernel=True))(p2)
    for k in p2:
        a, b = np.asarray(g_x[k]), np.asarray(g_k[k])
        mag = max(np.abs(a).max(), 1e-12)
        assert np.abs(a - b).max() <= 1e-5 + 1e-3 * mag, ("image", k)


def test_inverse_render_recovers_light_emission():
    """North-star clause "differentiable w.r.t. ... light emission":
    recover a diffuse light's emission color from a target image via
    the replay VJP (emission rides the same tex_color rows — the
    dL/dc_b = P adjoint)."""
    true_em = (3.0, 2.5, 2.0)
    sdef, cfg = _emissive_scene()
    cfg = cfg.replace(loop="while")
    tables = build_tables(sdef)
    target = render(tables, cfg) / cfg.samples_per_pixel

    # start from a wrong emission (the light is the LAST texture row
    # added by _emissive_scene)
    import dataclasses

    li = 2  # texture rows in add order: sphere albedo, ground, light
    wrong = dataclasses.replace(
        jax.tree_util.tree_map(jnp.asarray, tables),
        tex_color=jnp.asarray(tables.tex_color, jnp.float32)
        .at[li].set(jnp.asarray([1.0, 1.0, 1.0])))
    rec, hist = fit(wrong, cfg, target, fields=("tex_color",), spp=4,
                    steps=60, learning_rate=8e-2, method="replay")
    assert hist[-1] < hist[0] * 0.1
    got = rec["tex_color"][li]
    assert np.abs(got - np.asarray(true_em)).max() < 0.25, got


def test_replay_geom_tape_matches_full_intersect():
    """geom_tape=True (VERDICT r2 #7): the tangent replay with its
    per-bounce intersection replaced by the taped-winner recompute
    (capture once, O(1)-per-ray leaf tests) produces the same geometry
    tangents as the full-intersect form — the tape freezes exactly the
    comparisons the estimator detaches anyway."""
    from rt_tpu.scene.builders import cover_scene
    from rt_tpu.scene.types import MAT_DIELECTRIC, MAT_METAL
    from rt_tpu.diff.inverse import _device_tables
    from rt_tpu.diff.replay import make_replay_loss_fn
    from rt_tpu.render.renderer import render_block

    sdef, cfg = cover_scene(width=32, height=24, spp=1, max_depth=8,
                            grid=3)
    tables = _device_tables(build_tables(sdef))
    spp = 2
    px, py = _pixel_list(cfg)
    tgt = render_block(tables, cfg.replace(engine="xla", loop="scan"),
                       px, py, jnp.uint32(0), spp, jnp.uint32(cfg.seed),
                       cfg.width, cfg.height) / spp

    met = int(np.nonzero(np.asarray(tables.mat_type) == MAT_METAL)[0][-1])
    die = int(np.nonzero(
        np.asarray(tables.mat_type) == MAT_DIELECTRIC)[0][-1])
    params = {"sph_center": tables.sph_center.at[0, 1].add(0.05),
              "sph_radius": tables.sph_radius.at[0].add(0.02),
              "mat_fuzz": jnp.asarray(tables.mat_fuzz),
              "mat_ior": tables.mat_ior.at[die].add(0.1),
              "tex_color": jnp.asarray(tables.tex_color)}
    spec = {"sph_center": [(0, 0), (0, 1)], "sph_radius": [(0,)],
            "mat_fuzz": [(met,)], "mat_ior": [(die,)]}

    g = {}
    for tape in (False, True):
        loss = make_replay_loss_fn(
            tables, cfg.replace(engine="xla"), spp,
            np.asarray(px), np.asarray(py), np.asarray(tgt),
            geom_spec=spec, geom_tape=tape)
        g[tape] = jax.grad(loss)(params)

    checked = nonzero = 0
    for f, idxs in spec.items():
        for idx in idxs:
            a = float(g[False][f][idx])
            b_ = float(g[True][f][idx])
            # the known-winner leaf recompute is a different fp
            # formulation of the same chain (tape.py module docstring);
            # components agree to a few percent, not ulps
            assert abs(a - b_) <= 1e-6 + 4e-2 * abs(a), (f, idx, a, b_)
            checked += 1
            nonzero += a != 0.0
    assert checked == 5 and nonzero >= 3


def test_fit_hybrid_sharded_mega_forward():
    """BASELINE.json config #5's sharded composition in CI: fit_hybrid
    with the PRODUCTION megakernel forward under a full 8-device mesh
    (pixel rows sharded, GSPMD all-reduces) recovers albedo + a sphere
    position — the combination VERDICT r2 flagged as never executed."""
    import jax

    from rt_tpu.parallel.mesh import make_mesh
    from rt_tpu.diff.inverse import fit_hybrid
    from rt_tpu.scene.types import SceneDef

    w, h = 96, 54
    true_albedo = (0.7, 0.15, 0.35)

    def make(cx, albedo):
        s = SceneDef(width=w, height=h, samples_per_pixel=4, max_depth=4,
                     background=(0.7, 0.8, 1.0))
        s.add_sphere((cx, 0.0, -1.2), 0.5, s.add_lambertian_color(albedo))
        s.add_sphere((0, -100.5, -1), 100,
                     s.add_lambertian_color((0.55, 0.6, 0.5)))
        s.set_camera((0, 0.35, 1), (0, 0, -1.2), (0, 1, 0), 50, 0.0)
        cfg = RenderConfig(width=w, height=h, samples_per_pixel=4,
                           max_depth=4, background_mode="gradient",
                           loop="while", engine="mega")
        return s, cfg

    sdef_t, cfg = make(0.15, true_albedo)
    target = render(build_tables(sdef_t), cfg) / cfg.samples_per_pixel

    sdef_w, _ = make(-0.05, (0.3, 0.5, 0.4))
    mesh = make_mesh((len(jax.devices()), 1))
    rec, hist = fit_hybrid(build_tables(sdef_w), cfg, np.asarray(target),
                           replay_fields=("tex_color",),
                           fd_params={"sph_center": [(0, 0)]},
                           spp=2, fd_spp=2, steps=25,
                           learning_rate=5e-2, mesh=mesh)
    assert hist[-1] < hist[0] * 0.35
    assert abs(float(rec["sph_center"][0, 0]) - 0.15) < 0.08
    assert np.abs(rec["tex_color"][0] - true_albedo).max() < 0.15


def test_adjoint_megakernel_nee_matches_xla_replay():
    """Round 4 (VERDICT r3 #3): the adjoint megakernel replays the NEE
    direct-light term. Its two radiometric factors — the winner's
    albedo and the sampled LIGHT's emission (light-table slot row) —
    must both accumulate, with checker-parity -> color2 and image ->
    atlas routing, matching the XLA per-bounce replay on every field
    across light families."""
    from rt_tpu.diff.replay import make_replay_loss_fn

    tex = np.zeros((8, 8, 3), np.float32)
    tex[:, :4] = 5.0
    tex[:, 4:] = 0.5

    def scenes():
        # solid rect light + checker ground
        s = SceneDef(width=32, height=24, samples_per_pixel=2,
                     max_depth=6, background=(0.1, 0.1, 0.15))
        s.add_sphere((0, 0, -1.5), 0.5,
                     s.add_lambertian_color((0.7, 0.2, 0.2)))
        ck = s.add_checker((0.9, 0.9, 0.9), (0.1, 0.2, 0.1))
        s.add_sphere((0, -100.5, -1.5), 100, s.add_lambertian(ck))
        s.add_rect("xz_rect", -0.8, 0.8, -2.3, -0.7, 1.6,
                   s.add_diffuse_light_color((4.0, 3.5, 3.0)))
        s.set_camera((0, 0.3, 1.2), (0, 0, -1.5), (0, 1, 0), 55, 0.0)
        yield "solid_light", s
        # checker-emission sphere light
        s = SceneDef(width=32, height=24, samples_per_pixel=2,
                     max_depth=6, background=(0.1, 0.1, 0.15))
        s.add_sphere((0, 0, -1.5), 0.5,
                     s.add_lambertian_color((0.6, 0.5, 0.4)))
        s.add_sphere((0, -100.5, -1.5), 100,
                     s.add_lambertian_color((0.4, 0.4, 0.4)))
        lck = s.add_checker((6.0, 5.0, 4.0), (0.5, 0.5, 1.0))
        s.add_sphere((0.9, 0.7, -1.2), 0.3, s.add_diffuse_light(lck))
        s.set_camera((0, 0.3, 1.2), (0, 0, -1.5), (0, 1, 0), 55, 0.0)
        yield "checker_light", s
        # image-textured triangle light (atlas routing + triangle area
        # sampling under the adjoint)
        s = SceneDef(width=32, height=24, samples_per_pixel=2,
                     max_depth=6, background=(0.1, 0.1, 0.15))
        s.add_sphere((0, 0, -1.5), 0.5,
                     s.add_lambertian_color((0.6, 0.5, 0.4)))
        s.add_sphere((0, -100.5, -1.5), 100,
                     s.add_lambertian_color((0.4, 0.4, 0.4)))
        s.add_triangle((-0.9, 0.4, -1.0), (-0.3, 0.4, -1.4),
                       (-0.6, 1.1, -1.2),
                       s.add_diffuse_light(s.add_image_texture(tex)),
                       uv1=(0.0, 0.0), uv2=(1.0, 0.0), uv3=(0.5, 1.0))
        s.set_camera((0, 0.3, 1.2), (0, 0, -1.5), (0, 1, 0), 55, 0.0)
        yield "image_tri_light", s

    for name, s in scenes():
        cfg = RenderConfig(width=32, height=24, samples_per_pixel=2,
                           max_depth=6, loop="while", engine="mega",
                           nee=True, compact_every=3)
        tables = build_tables(s)
        px, py = _pixel_list(cfg)
        tgt = jnp.full((px.shape[0], 3), 0.2, jnp.float32)
        params = {
            "tex_color": jnp.asarray(tables.tex_color, jnp.float32),
            "tex_color2": jnp.asarray(tables.tex_color2, jnp.float32),
            "mat_albedo": jnp.asarray(tables.mat_albedo, jnp.float32),
            "background": jnp.asarray(tables.background, jnp.float32)}
        if name == "image_tri_light":
            params["images"] = jnp.asarray(tables.images, jnp.float32)
        g_x = jax.grad(make_replay_loss_fn(
            tables, cfg, 2, px, py, tgt, bwd_kernel=False))(params)
        g_k = jax.grad(make_replay_loss_fn(
            tables, cfg, 2, px, py, tgt, bwd_kernel=True))(params)
        for k in params:
            a, b = np.asarray(g_x[k]), np.asarray(g_k[k])
            mag = max(np.abs(a).max(), 1e-12)
            assert np.abs(a - b).max() <= 1e-5 + 1e-3 * mag, (name, k)
        # the light's emission slot must actually receive gradient
        assert np.abs(np.asarray(g_k["tex_color"])).max() > 0


def test_replay_queue_forward_matches_xla():
    """fit --engine queue (round 5): the replay-VJP forward runs the
    persistent-queue kernel (per-lane bit-exact vs the XLA integrator,
    test_queue), so loss AND radiometric replay gradients must match
    the engine="xla" build — the backward picks its own per-bounce
    intersector either way (replay.py bwd_engine promotion)."""
    from rt_tpu.diff.replay import make_replay_loss_fn

    sdef, cfg = _tiny_scene()
    tables = build_tables(sdef)
    px, py = _pixel_list(cfg)
    cfg = cfg.replace(loop="while")
    rs = np.random.RandomState(3)
    tgt = jnp.asarray(rs.rand(px.shape[0], 3).astype(np.float32))
    params = {"tex_color": jnp.asarray(tables.tex_color),
              "mat_albedo": jnp.asarray(tables.mat_albedo),
              "background": jnp.asarray(tables.background)}
    lx, gx = jax.value_and_grad(make_replay_loss_fn(
        tables, cfg.replace(engine="xla"), 2, px, py, tgt))(params)
    lq, gq = jax.value_and_grad(make_replay_loss_fn(
        tables, cfg.replace(engine="queue"), 2, px, py, tgt))(params)
    np.testing.assert_allclose(float(lq), float(lx), rtol=1e-6)
    for k in params:
        np.testing.assert_allclose(np.asarray(gq[k]), np.asarray(gx[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_fit_replay_queue_engine_smoke():
    """fit(method="replay") with cfg.engine="queue" end-to-end: a few
    optimizer steps shrink the loss (the CLI's fit --engine queue
    surface, cli.py)."""
    sdef, cfg = _tiny_scene(albedo=(0.8, 0.2, 0.2))
    tables = build_tables(sdef)
    cfg = cfg.replace(loop="while", engine="queue")
    tgt_sdef, _ = _tiny_scene(albedo=(0.2, 0.7, 0.3))
    tgt = np.asarray(render(build_tables(tgt_sdef),
                            cfg.replace(engine="xla", loop="scan")))
    res, hist = fit(tables, cfg, tgt, fields=("tex_color",),
                    spp=1, steps=4, learning_rate=0.3, method="replay")
    assert np.isfinite(np.asarray(res["tex_color"])).all()
    assert hist[-1] < hist[0]


def test_queue_adjoint_matches_xla_replay():
    """The queue-ADJOINT backward (round 5, pallas_queue.
    queue_trace_adjoint via engine='queue' + bwd_kernel=True): the
    radiometric replay runs in the persistent-queue loop — no
    completion ring, no assembly sort, gradient slabs/atlas planes
    accumulated across steps — and must match the XLA per-bounce
    replay on every REPLAY_FIELD (the mega adjoint's own parity
    contract)."""
    from rt_tpu.diff.replay import make_replay_loss_fn

    s = SceneDef(width=32, height=24, samples_per_pixel=2, max_depth=6,
                 background=(0.4, 0.5, 0.6))
    s.add_sphere((0, 0, -1.5), 0.5,
                 s.add_lambertian_color((0.7, 0.2, 0.2)))
    s.add_sphere((-1.1, 0, -1.5), 0.5, s.add_metal((0.8, 0.7, 0.6), 0.2))
    s.add_sphere((1.1, 0, -1.5), 0.5, s.add_dielectric(1.5))
    ck = s.add_checker((0.9, 0.9, 0.9), (0.1, 0.2, 0.1))
    s.add_sphere((0, -100.5, -1.5), 100, s.add_lambertian(ck))
    s.add_rect("xy_rect", -0.5, 0.5, 0.8, 1.4, -2.5,
               s.add_diffuse_light_color((4.0, 3.5, 3.0)))
    s.set_camera((0, 0.3, 1.2), (0, 0, -1.5), (0, 1, 0), 55, 0.0)
    cfg = RenderConfig(width=32, height=24, samples_per_pixel=2,
                       max_depth=6, loop="while", engine="queue")
    tables = build_tables(s)
    px, py = _pixel_list(cfg)
    tgt = jnp.full((px.shape[0], 3), 0.2, jnp.float32)
    params = {"tex_color": jnp.asarray(tables.tex_color, jnp.float32),
              "tex_color2": jnp.asarray(tables.tex_color2, jnp.float32),
              "mat_albedo": jnp.asarray(tables.mat_albedo, jnp.float32),
              "background": jnp.asarray(tables.background, jnp.float32)}

    variants = [
        ("plain", cfg, {}),
        ("trunc3", cfg, {"bwd_depth": 3}),
        ("exhaust", cfg.replace(exhaust_mode="background", max_depth=3),
         {}),
        ("nee", cfg.replace(nee=True), {}),
    ]
    for name, c, kwv in variants:
        g_x = jax.grad(make_replay_loss_fn(
            tables, c.replace(engine="xla"), 2, px, py, tgt,
            bwd_kernel=False, **kwv))(params)
        g_q = jax.grad(make_replay_loss_fn(
            tables, c, 2, px, py, tgt, bwd_kernel=True, **kwv))(params)
        for k in params:
            a, b = np.asarray(g_x[k]), np.asarray(g_q[k])
            mag = max(np.abs(a).max(), 1e-12)
            assert np.abs(a - b).max() <= 1e-5 + 1e-3 * mag, (name, k)
