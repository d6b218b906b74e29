"""Next-event estimation (cfg.nee) — the opt-in direct-light sampler.

An extension BEYOND the reference (which has no light sampling): each
lambertian bounce area-samples one emissive primitive and casts a
shadow ray; emission reached through a diffuse bounce is suppressed so
nothing double-counts. The estimator must (a) agree with the plain
path tracer in expectation, (b) beat it in variance on hard (small
light) scenes, and (c) leave scenes without lights bit-identical.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_tpu.config import RenderConfig
from rt_tpu.render.renderer import render
from rt_tpu.scene.types import SceneDef, build_tables


def _light_scene(light_r=0.25, all_families=True):
    s = SceneDef(width=48, height=32, samples_per_pixel=4, max_depth=6,
                 background=(0.0, 0.0, 0.0))
    s.add_sphere((0, 0, -2), 0.5, s.add_lambertian_color((0.6, 0.4, 0.3)))
    s.add_sphere((0, -100.5, -2), 100,
                 s.add_lambertian_color((0.5, 0.5, 0.55)))
    s.add_sphere((1.6, 0.4, -1.4), light_r,
                 s.add_diffuse_light_color((8.0, 3.0, 3.0)))
    if all_families:
        s.add_rect("xz_rect", -0.8, 0.8, -2.8, -1.2, 2.0,
                   s.add_diffuse_light_color((6.0, 5.5, 5.0)))
        s.add_cylinder(0.2, -0.3, 0.3,
                       s.add_diffuse_light_color((2.0, 4.0, 8.0)),
                       rotate=((1, 0, 0), 90.0), translate=(-1.5, 0.6, -2.0))
        s.add_triangle((-2.2, 0.1, -2.6), (-1.4, 0.1, -3.0),
                       (-1.8, 1.0, -2.8),
                       s.add_diffuse_light_color((7.0, 2.0, 6.0)))
    s.set_camera((0, 0.4, 1.2), (0, 0, -2), (0, 1, 0), 55, 0.0)
    cfg = RenderConfig(width=48, height=32, samples_per_pixel=4,
                       max_depth=6, background_mode="constant",
                       engine="xla", loop="while")
    return s, cfg


def _mse(a, b):
    return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))


def test_nee_matches_plain_in_expectation():
    """All three light families sampled: the NEE estimator's converged
    mean equals the plain path tracer's (area pdfs, the (2/pi)cos^3
    scatter density, two-sided emitters, and the double-count
    suppression must all be exactly right for this to hold)."""
    sdef, cfg = _light_scene()
    tables = build_tables(sdef)
    assert tables.n_lights == 4
    spp = 2048
    plain = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp))) / spp
    nee = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp, nee=True))) / spp
    # per-pixel agreement within joint MC noise; mean much tighter
    assert abs(plain.mean() - nee.mean()) < 0.01
    assert _mse(plain, nee) < 3e-3


def test_nee_reduces_variance_on_small_light():
    """A small sphere light the plain estimator rarely hits: at equal
    spp the NEE render is an order of magnitude closer to the
    converged image."""
    sdef, cfg = _light_scene(light_r=0.08, all_families=False)
    tables = build_tables(sdef)
    spp_ref, spp = 4096, 32
    ref = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp_ref, nee=True))) / spp_ref
    plain = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp))) / spp
    nee = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp, nee=True))) / spp
    # compare the LIGHTING estimate: the emitter's own few pixels carry
    # identical camera-edge aliasing in both estimators and would
    # dominate a whole-image MSE
    mask = (ref.max(axis=-1) < 0.5)[..., None]
    e_nee = _mse(nee * mask, ref * mask)
    e_plain = _mse(plain * mask, ref * mask)
    assert e_nee * 5.0 < e_plain, (e_nee, e_plain)


def test_nee_without_lights_is_identical():
    """cfg.nee on a scene with no emitters compiles to the plain
    estimator (n_lights == 0): bit-identical image."""
    s = SceneDef(width=32, height=24, samples_per_pixel=4, max_depth=4,
                 background=(0.6, 0.7, 0.9))
    s.add_sphere((0, 0, -1), 0.5, s.add_lambertian_color((0.5, 0.3, 0.2)))
    s.add_sphere((0, -100.5, -1), 100,
                 s.add_lambertian_color((0.6, 0.6, 0.6)))
    s.set_camera((0, 0, 1), (0, 0, -1), (0, 1, 0), 45, 0.0)
    cfg = RenderConfig(width=32, height=24, samples_per_pixel=4,
                       max_depth=4, engine="xla")
    tables = build_tables(s)
    assert tables.n_lights == 0
    a = np.asarray(render(tables, cfg))
    b = np.asarray(render(tables, cfg.replace(nee=True)))
    np.testing.assert_array_equal(a, b)


def test_nee_mega_engine_matches_xla():
    """engine='mega' + nee runs the IN-KERNEL light sampler + shadow
    chunk pass (bit-identical RNG to the host estimator): images match
    the xla NEE estimator up to the usual ulp-flip outlier lanes."""
    sdef, cfg = _light_scene()
    tables = build_tables(sdef)
    spp = 16
    a = np.asarray(render(tables, cfg.replace(
        samples_per_pixel=spp, nee=True, engine="xla"))) / spp
    b = np.asarray(render(tables, cfg.replace(
        samples_per_pixel=spp, nee=True, engine="mega"))) / spp
    assert np.isfinite(b).all()
    # same RNG streams, same estimator — images agree up to ulp-flip
    # outlier lanes like every engine-pair comparison
    diff = np.abs(a - b).max(axis=-1)
    assert float((diff > 1e-3).mean()) < 0.01


def _tri_light_scene():
    """A mesh-style emitter: two triangles forming an emissive quad —
    the Taichi-mesh scene class (taichi-version/hittable.py:38-71) that
    round 3 statically excluded from NEE."""
    s = SceneDef(width=40, height=28, samples_per_pixel=4, max_depth=5,
                 background=(0.0, 0.0, 0.0))
    s.add_sphere((0, 0, -2), 0.5, s.add_lambertian_color((0.6, 0.4, 0.3)))
    s.add_sphere((0, -100.5, -2), 100,
                 s.add_lambertian_color((0.5, 0.5, 0.55)))
    m = s.add_diffuse_light_color((5.0, 4.0, 3.0))
    s.add_triangle((-0.9, 1.2, -2.6), (0.9, 1.2, -2.6), (0.9, 1.2, -1.0), m)
    s.add_triangle((-0.9, 1.2, -2.6), (0.9, 1.2, -1.0), (-0.9, 1.2, -1.0), m)
    s.set_camera((0, 0.4, 1.2), (0, 0, -2), (0, 1, 0), 55, 0.0)
    cfg = RenderConfig(width=40, height=28, samples_per_pixel=4,
                       max_depth=5, background_mode="constant",
                       engine="xla", loop="while")
    return s, cfg


def test_triangle_lights_are_nee_sampled():
    """Triangle emitters are area-sampled like every other family
    (round 4; round 3 disabled NEE scene-wide on any triangle light).
    The converged NEE mean must equal the plain path tracer's on a
    two-triangle emissive quad."""
    sdef, cfg = _tri_light_scene()
    tables = build_tables(sdef)
    assert tables.n_lights == 2
    assert tables.nee_kernel_ok
    spp = 2048
    plain = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp))) / spp
    nee = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp, nee=True))) / spp
    assert abs(plain.mean() - nee.mean()) < 0.01
    assert _mse(plain, nee) < 3e-3


def test_triangle_light_nee_variance_win():
    """The point of mesh-light NEE: at equal spp the NEE render of the
    emissive-quad scene is far closer to the converged image."""
    sdef, cfg = _tri_light_scene()
    tables = build_tables(sdef)
    spp_ref, spp = 4096, 16
    ref = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp_ref, nee=True))) / spp_ref
    plain = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp))) / spp
    nee = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp, nee=True))) / spp
    mask = (ref.max(axis=-1) < 0.5)[..., None]
    e_nee = _mse(nee * mask, ref * mask)
    e_plain = _mse(plain * mask, ref * mask)
    assert e_nee * 3.0 < e_plain, (e_nee, e_plain)


def test_triangle_light_nee_matches_oracle(images_close):
    """Per-ray exact: the vectorized triangle light sampler consumes
    the same RNG coordinates and sqrt-barycentric warp as the scalar
    oracle twin."""
    from rt_tpu.render.oracle import render_oracle

    sdef, cfg = _tri_light_scene()
    cfg = cfg.replace(width=24, height=16, samples_per_pixel=2,
                      max_depth=4, nee=True)
    sdef.width, sdef.height = 24, 16
    tables = build_tables(sdef)
    got = np.asarray(render(tables, cfg))
    ref = render_oracle(sdef, cfg)
    images_close(got, ref, cfg.samples_per_pixel)


def test_triangle_light_nee_mega_matches_xla():
    """The in-kernel light table bakes triangle rows (v1/e1/e2/normal)
    and the kernel's sqrt-warp sample matches the XLA estimator."""
    sdef, cfg = _tri_light_scene()
    tables = build_tables(sdef)
    spp = 16
    a = np.asarray(render(tables, cfg.replace(
        samples_per_pixel=spp, nee=True, engine="xla"))) / spp
    b = np.asarray(render(tables, cfg.replace(
        samples_per_pixel=spp, nee=True, engine="mega"))) / spp
    assert np.isfinite(b).all()
    diff = np.abs(a - b).max(axis=-1)
    assert float((diff > 1e-3).mean()) < 0.01


def test_nee_mega_with_compaction_and_shrink():
    """NEE in-kernel composed with the production segmented compaction
    (the 0.5 alive encoding must survive group packing and the prefix
    shrink): matches the single-segment NEE mega render exactly."""
    sdef, cfg = _light_scene()
    tables = build_tables(sdef)
    spp = 8
    base = cfg.replace(samples_per_pixel=spp, nee=True, engine="mega")
    a = np.asarray(render(tables, base))
    b = np.asarray(render(tables, base.replace(
        compact_schedule=(2, 2), compact_group=16)))
    np.testing.assert_array_equal(a, b)


def _img_light_scene():
    """An emissive rect whose brightness comes from a NON-uniform image
    texture (bright half / dim half) — any UV mistake in the light
    sampler shows up as a wrong illumination gradient."""
    tex = np.zeros((8, 8, 3), np.float32)
    tex[:, :4] = 6.0   # v < 0.5 bright
    tex[:, 4:] = 0.5   # v >= 0.5 dim
    s = SceneDef(width=32, height=24, samples_per_pixel=4, max_depth=4,
                 background=(0, 0, 0))
    s.add_sphere((0, 0, -2), 0.5, s.add_lambertian_color((0.5, 0.4, 0.3)))
    s.add_sphere((0, -100.5, -2), 100,
                 s.add_lambertian_color((0.5, 0.5, 0.5)))
    s.add_rect("xz_rect", -1, 1, -3, -1, 2.0,
               s.add_diffuse_light(s.add_image_texture(tex)))
    s.set_camera((0, 0, 1), (0, 0, -2), (0, 1, 0), 50, 0.0)
    cfg = RenderConfig(width=32, height=24, samples_per_pixel=4,
                       max_depth=4, engine="xla", loop="while")
    return s, cfg


def test_image_textured_light_nee_unbiased():
    """Round 4: image emission is evaluated at the SAMPLED light point's
    UV (round 3 evaluated texel (0,0) on the hybrid path and refused the
    kernel). The NEE mean must match plain path tracing, which samples
    the same texture through BSDF hits."""
    sdef, cfg = _img_light_scene()
    tables = build_tables(sdef)
    assert tables.n_lights == 1 and tables.nee_kernel_ok
    spp = 2048
    plain = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp))) / spp
    nee = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp, nee=True))) / spp
    assert abs(plain.mean() - nee.mean()) < 0.01
    assert _mse(plain, nee) < 3e-3


def test_image_textured_light_nee_matches_oracle(images_close):
    sdef, cfg = _img_light_scene()
    cfg = cfg.replace(samples_per_pixel=2, nee=True)
    tables = build_tables(sdef)
    from rt_tpu.render.oracle import render_oracle

    got = np.asarray(render(tables, cfg))
    ref = render_oracle(sdef, cfg)
    images_close(got, ref, cfg.samples_per_pixel)


def test_image_textured_light_nee_mega_in_kernel():
    """The megakernel no longer falls back: the light table carries the
    atlas id and the kernel samples Le at the light-point UV via the
    double one-hot contraction. Must match the XLA estimator."""
    sdef, cfg = _img_light_scene()
    tables = build_tables(sdef)
    spp = 16
    a = np.asarray(render(tables, cfg.replace(
        samples_per_pixel=spp, nee=True, engine="xla"))) / spp
    b = np.asarray(render(tables, cfg.replace(
        samples_per_pixel=spp, nee=True, engine="mega"))) / spp
    assert np.isfinite(b).all()
    diff = np.abs(a - b).max(axis=-1)
    assert float((diff > 1e-3).mean()) < 0.01


def test_nee_matches_scalar_oracle(images_close):
    """Per-ray EXACT check: the vectorized NEE estimator (XLA engine)
    consumes the same RNG stream coordinates and light parameterization
    as the scalar NumPy oracle twin, so images agree ray-for-ray up to
    the usual ulp-flip outliers — the same bar every other engine pair
    is held to."""
    from rt_tpu.render.oracle import render_oracle

    sdef, cfg = _light_scene()
    cfg = cfg.replace(width=24, height=16, samples_per_pixel=2,
                      max_depth=4, nee=True)
    sdef.width, sdef.height = 24, 16
    tables = build_tables(sdef)
    got = np.asarray(render(tables, cfg))
    ref = render_oracle(sdef, cfg)
    images_close(got, ref, cfg.samples_per_pixel)


def _pixel_list(cfg):
    pix = np.arange(cfg.width * cfg.height, dtype=np.int32)
    return (jnp.asarray(pix % cfg.width), jnp.asarray(pix // cfg.width))


def test_replay_gradient_matches_scan_ad_nee():
    """Differentiable NEE, radiometric chain: the path-replay VJP
    reproduces the direct-light term (same counter-RNG draws, same
    diffuse-emission suppression), so its albedo / emission /
    background gradients equal plain reverse-mode through the scan
    loop with cfg.nee — at O(B) memory."""
    from rt_tpu.diff.inverse import make_loss_fn
    from rt_tpu.diff.replay import make_replay_loss_fn

    sdef, cfg = _light_scene(all_families=False)
    cfg = cfg.replace(width=24, height=16, samples_per_pixel=2,
                      max_depth=4, nee=True)
    sdef.width, sdef.height = 24, 16
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

    # the light's emission row must actually receive NEE-path gradient
    assert float(np.abs(np.asarray(g_scan["tex_color"])).max()) > 0
    for k in params:
        np.testing.assert_allclose(np.asarray(g_replay[k]),
                                   np.asarray(g_scan[k]),
                                   rtol=2e-4, atol=2e-6)


def test_replay_geom_tangent_matches_scan_ad_nee():
    """Differentiable NEE, geometry chain: moving the LIGHT sphere (or
    any hit geometry) changes the direct-light term through the sampled
    point / cos / area factors — the forward-mode tangent replay with
    cfg.nee matches scan-loop reverse mode on those components."""
    from rt_tpu.diff.inverse import make_loss_fn
    from rt_tpu.diff.replay import make_replay_loss_fn

    sdef, cfg = _light_scene(all_families=False)
    cfg = cfg.replace(width=24, height=16, samples_per_pixel=2,
                      max_depth=4, nee=True)
    sdef.width, sdef.height = 24, 16
    tables = build_tables(sdef)
    px, py = _pixel_list(cfg)
    target = jnp.full((px.shape[0], 3), 0.1, jnp.float32)

    # sphere 2 is the light (see _light_scene); perturb it and sphere 0
    params = {"sph_center": jnp.asarray(tables.sph_center).at[2, 0].add(0.05),
              "sph_radius": jnp.asarray(tables.sph_radius),
              "tex_color": jnp.asarray(tables.tex_color)}
    spec = {"sph_center": [(2, 0), (0, 1)], "sph_radius": [(2,)]}

    scan_loss = make_loss_fn(tables, cfg.replace(loop="scan"), spp=2)
    g_scan = jax.grad(scan_loss)(params, px, py, target)

    rep_loss = make_replay_loss_fn(tables, cfg, spp=2,
                                   px=np.asarray(px), py=np.asarray(py),
                                   target=np.asarray(target),
                                   geom_spec=spec)
    g_rep = jax.grad(rep_loss)(params)

    checked = nonzero = 0
    for f, idxs in spec.items():
        for idx in idxs:
            a = float(g_scan[f][idx])
            b = float(g_rep[f][idx])
            assert abs(a - b) <= 1e-7 + 2e-2 * abs(a), (f, idx, a, b)
            checked += 1
            nonzero += a != 0.0
    assert checked == 3 and nonzero >= 2
    np.testing.assert_allclose(np.asarray(g_rep["tex_color"]),
                               np.asarray(g_scan["tex_color"]),
                               rtol=2e-4, atol=2e-6)


def test_nee_gradient_guards():
    """Every gradient estimator now accepts NEE configs: the adjoint
    megakernel accumulates the direct-light term's albedo +
    light-emission credits in-kernel
    (test_diff.test_adjoint_megakernel_nee_matches_xla_replay pins the
    values), and since 36c739d the winner tape replays NEE too
    (capture is nee-invariant; test_tape.test_make_tape_vg_nee pins
    gradient values). This guard asserts construction succeeds — no
    path refuses NEE anymore."""
    from rt_tpu.diff.replay import make_replay_render
    from rt_tpu.diff.tape import make_tape_vg

    sdef, cfg = _light_scene(all_families=False)
    cfg = cfg.replace(width=24, height=16, nee=True)
    sdef.width, sdef.height = 24, 16
    tables = build_tables(sdef)
    px, py = _pixel_list(cfg)

    img_fn = make_replay_render(tables, cfg, 1, px, py, bwd_kernel=True)
    assert callable(img_fn)
    step = make_tape_vg(tables, cfg, px, py,
                        np.zeros((px.shape[0], 3), np.float32))
    assert callable(step)
