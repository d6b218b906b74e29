"""Glossy (fuzzy-metal) NEE/MIS — cfg.nee_glossy (round 5).

The fuzzy metal's direction density is the chord integral of the
reference's reflect + fuzz*ball draw: p(w) = s(3cos^2+s^2)/(2 pi f^3),
s = sqrt(f^2 - sin^2), inside sin < f. The estimator must (a) reduce
to the lambertian law at f=1 about the normal, (b) agree with the
plain path tracer in expectation on fuzzy-metal + light scenes,
(c) beat it in variance when paired with MIS, (d) leave scenes without
fuzzy metals unchanged, and (e) refuse the replay identity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_tpu.config import RenderConfig
from rt_tpu.render.renderer import render
from rt_tpu.scene.types import SceneDef, build_tables


def _mse(a, b):
    return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))


def _glossy_scene(fuzz=0.35, light_r=0.3):
    """A fuzzy-metal floor lit by a sphere light: most radiance
    arrives via the glossy lobe, the regime plain NEE (lambertian-only)
    cannot touch."""
    s = SceneDef(width=48, height=32, samples_per_pixel=4, max_depth=5,
                 background=(0.0, 0.0, 0.0))
    s.add_sphere((0, -100.5, -2), 100, s.add_metal((0.8, 0.75, 0.7), fuzz))
    s.add_sphere((-0.9, 0, -2), 0.45,
                 s.add_lambertian_color((0.5, 0.3, 0.3)))
    s.add_sphere((1.2, 0.8, -1.6), light_r,
                 s.add_diffuse_light_color((14.0, 12.0, 10.0)))
    s.set_camera((0, 0.5, 1.2), (0, 0, -2), (0, 1, 0), 55, 0.0)
    cfg = RenderConfig(width=48, height=32, samples_per_pixel=4,
                       max_depth=5, background_mode="constant",
                       engine="xla", loop="while")
    return s, cfg


def test_glossy_pdf_reduces_to_lambertian_law():
    """_glossy_pdf with fz=1 about the axis IS (2/pi)cos^3 — the two
    samplers share one chord integral."""
    from rt_tpu.render.integrator import _glossy_pdf

    cos = jnp.asarray(np.linspace(0.01, 1.0, 64).astype(np.float32))
    p = np.asarray(_glossy_pdf(cos, jnp.ones_like(cos)))
    # rtol bounded by the f32 cancellation in s^2 = f^2-(1-cos^2) at
    # small cos (the implementation keeps the general-fz form)
    np.testing.assert_allclose(
        p, (2.0 / np.pi) * np.asarray(cos) ** 3, rtol=5e-4, atol=1e-9)


def test_glossy_pdf_integrates_to_one():
    """The fuzz-ball density integrates to 1 over the sphere (any
    fuzz): numeric check on a theta grid about the axis."""
    from rt_tpu.render.integrator import _glossy_pdf

    for fz in (0.15, 0.4, 0.8):
        th = np.linspace(0.0, np.pi, 20001).astype(np.float32)
        p = np.asarray(_glossy_pdf(jnp.asarray(np.cos(th)),
                                   jnp.full_like(jnp.asarray(th), fz)))
        total = float(np.trapezoid(p * np.sin(th) * 2.0 * np.pi, th))
        assert abs(total - 1.0) < 2e-3, (fz, total)


def test_glossy_nee_matches_plain_in_expectation():
    sdef, cfg = _glossy_scene()
    tables = build_tables(sdef)
    spp = 4096
    plain = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp))) / spp
    gl = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp, nee=True,
                            nee_glossy=True, mis=True))) / spp
    assert abs(plain.mean() - gl.mean()) < 0.015, (
        plain.mean(), gl.mean())
    assert _mse(plain, gl) < 5e-3


def test_glossy_mis_reduces_variance():
    """Equal-spp MSE vs a converged reference on the glossy-lit scene:
    NEE+MIS with glossy sampling must beat the plain estimator (which
    only rarely lands the fuzzy lobe on the light)."""
    sdef, cfg = _glossy_scene(fuzz=0.3, light_r=0.2)
    tables = build_tables(sdef)
    spp_ref, spp = 8192, 32
    ref = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp_ref, nee=True,
                            nee_glossy=True, mis=True))) / spp_ref
    plain = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp))) / spp
    gl = np.asarray(render(
        tables, cfg.replace(samples_per_pixel=spp, nee=True,
                            nee_glossy=True, mis=True))) / spp
    mask = (ref.max(axis=-1) < 0.5 * ref.max())[..., None]
    e_gl = _mse(gl * mask, ref * mask)
    e_plain = _mse(plain * mask, ref * mask)
    assert e_gl * 1.5 < e_plain, (e_gl, e_plain)


def test_glossy_flag_no_fuzzy_metals_identical():
    """Scenes with no fuzzy metal: nee_glossy must match the plain-NEE
    MIS render to compiler-fusion ulps (the glossy branch selects
    nothing; the extra masked arithmetic can reassociate fusions, so
    bit-identity across the two jit graphs is not guaranteed)."""
    s = SceneDef(width=32, height=24, samples_per_pixel=16, max_depth=4,
                 background=(0.0, 0.0, 0.0))
    s.add_sphere((0, 0, -2), 0.5, s.add_lambertian_color((0.6, 0.4, 0.3)))
    s.add_sphere((0, -100.5, -2), 100,
                 s.add_lambertian_color((0.5, 0.5, 0.55)))
    s.add_sphere((1.2, 0.5, -1.5), 0.25,
                 s.add_diffuse_light_color((8.0, 6.0, 5.0)))
    # fuzz=0 metal: excluded from glossy sampling by the fz > 0 gate
    s.add_sphere((-1.2, 0, -2), 0.5, s.add_metal((0.9, 0.9, 0.9), 0.0))
    s.set_camera((0, 0.4, 1.2), (0, 0, -2), (0, 1, 0), 55, 0.0)
    cfg = RenderConfig(width=32, height=24, samples_per_pixel=16,
                       max_depth=4, engine="xla", loop="while",
                       nee=True, mis=True)
    tables = build_tables(s)
    a = np.asarray(render(tables, cfg))
    b = np.asarray(render(tables, cfg.replace(nee_glossy=True)))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_glossy_engine_fallback_matches_xla():
    """Glossy NEE/MIS runs IN-KERNEL on mega and queue (the fuzz-ball
    density + mirror-direction test ride the NEE block; the carried
    density generalizes the alive encoding); per-lane radiance matches
    the XLA build (winner-tie ulps aside)."""
    sdef, cfg = _glossy_scene()
    tables = build_tables(sdef)
    kw = dict(nee=True, nee_glossy=True, mis=True)
    x = np.asarray(render(tables, cfg.replace(**kw)))
    for eng in ("mega", "queue"):
        e = np.asarray(render(tables, cfg.replace(engine=eng, **kw)))
        close = np.isclose(e, x, rtol=2e-5, atol=2e-5)
        assert close.mean() > 0.999, (eng, close.mean())


def test_glossy_tape_gradient_matches_scan_ad():
    """Tape gradients under glossy NEE+MIS == reverse-mode through the
    scan integrator (the tape mirrors the same densities)."""
    from rt_tpu.diff.inverse import make_loss_fn
    from rt_tpu.diff.tape import make_tape_loss_fn

    sdef, cfg = _glossy_scene(fuzz=0.4)
    cfg = cfg.replace(width=24, height=16, samples_per_pixel=1,
                      nee=True, nee_glossy=True, mis=True)
    sdef.width, sdef.height = 24, 16
    tables = build_tables(sdef)
    n = cfg.width * cfg.height
    pix = np.arange(n, dtype=np.int32)
    px, py = pix % cfg.width, pix // cfg.width
    rs = np.random.RandomState(0)
    tgt = rs.rand(n, 3).astype(np.float32)
    params = {"tex_color": jnp.asarray(tables.tex_color, jnp.float32),
              "mat_albedo": jnp.asarray(tables.mat_albedo, jnp.float32)}

    ref_loss = make_loss_fn(tables, cfg.replace(loop="scan"), spp=2)
    g_ad = jax.grad(lambda p: ref_loss(p, jnp.asarray(px),
                                       jnp.asarray(py),
                                       jnp.asarray(tgt)))(params)
    g_tp = jax.grad(make_tape_loss_fn(tables, cfg, 2, px, py, tgt))(params)
    for k in params:
        a, b = np.asarray(g_ad[k]), np.asarray(g_tp[k])
        mag = max(np.abs(a).max(), 1e-10)
        assert np.abs(a - b).max() <= 1e-5 + 2e-3 * mag, k


def test_glossy_replay_refuses():
    from rt_tpu.diff.replay import make_replay_render

    sdef, cfg = _glossy_scene()
    cfg = cfg.replace(width=24, height=16, nee=True, nee_glossy=True)
    sdef.width, sdef.height = 24, 16
    tables = build_tables(sdef)
    pix = np.arange(cfg.width * cfg.height, dtype=np.int32)
    with pytest.raises(ValueError, match="glossy"):
        make_replay_render(tables, cfg, 1, pix % cfg.width,
                           pix // cfg.width)
