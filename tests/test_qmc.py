"""Owen-scrambled Sobol' sampler (ops/qmc.py): net properties, stream
contract, engine plumbing, and the error-vs-spp win over pseudo-random.

The reference has no QMC (curand / rand() / ti.random() everywhere);
these tests pin the properties that make the extension correct:
  - every power-of-2 prefix of a site's draws is stratified (the Owen
    index shuffle maps prefixes to aligned Sobol' blocks),
  - 2D sites form (0, m, 2)-nets across ALL elementary intervals,
  - draws stay a pure function of (seed, pixel, sample, bounce, purpose)
    bit-identical between numpy and jax.numpy (oracle twin contract),
  - a real render at fixed spp has lower error than the rng sampler.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rt_tpu.ops import qmc, rng


def test_numpy_jnp_streams_identical():
    pix = np.arange(977, dtype=np.uint32)
    for purpose in (rng.PIXEL_U, rng.SCAT_U2, rng.NEE_U2, rng.RR):
        a = qmc.uniform(np, 7, pix, 13, 2, purpose)
        b = np.asarray(qmc.uniform(jnp, 7, jnp.asarray(pix), 13, 2, purpose))
        np.testing.assert_array_equal(a, b)


def test_uniform_range_and_mean():
    pix = np.arange(64, dtype=np.uint32)
    draws = np.stack([
        qmc.uniform(np, 0, pix, s, 1, rng.SCAT_U1) for s in range(256)])
    assert draws.min() >= 0.0 and draws.max() < 1.0
    # per-pixel means of a scrambled (0,1)-sequence converge ~N^-1:
    # far tighter than the MC 1/sqrt(256) ~ 0.018
    assert np.abs(draws.mean(axis=0) - 0.5).max() < 5e-3


@pytest.mark.parametrize("k", [2, 4, 6])
@pytest.mark.parametrize("purpose",
                         [rng.PIXEL_U, rng.PIXEL_V, rng.SCAT_U3, rng.RR])
def test_prefix_stratification_1d(k, purpose):
    """First 2^k draws of any site/dim land one per stratum of width
    2^-k — for every power-of-2 prefix (progressive property)."""
    n = 1 << k
    for pixel in (0, 1, 31337):
        u = np.array([float(qmc.uniform(np, 9, np.uint32(pixel),
                                        np.uint32(s), 3, purpose))
                      for s in range(n)])
        strata = np.floor(u * n).astype(int)
        assert sorted(strata) == list(range(n)), (pixel, purpose, strata)


def test_2d_net_all_elementary_intervals():
    """(PIXEL_U, PIXEL_V) over 16 samples is a (0,4,2)-net: every
    elementary interval of volume 1/16 (shapes 16x1, 8x2, 4x4, 2x8,
    1x16) contains exactly one point."""
    m = 4
    n = 1 << m
    for pixel in (0, 123456):
        pts = np.array([
            [float(qmc.uniform(np, 5, np.uint32(pixel), np.uint32(s), 0,
                               rng.PIXEL_U)),
             float(qmc.uniform(np, 5, np.uint32(pixel), np.uint32(s), 0,
                               rng.PIXEL_V))] for s in range(n)])
        for a in range(m + 1):
            b = m - a
            cells = (np.floor(pts[:, 0] * (1 << a)).astype(int) * (1 << b)
                     + np.floor(pts[:, 1] * (1 << b)).astype(int))
            assert sorted(cells) == list(range(n)), (pixel, a, b)


def test_sites_and_pixels_decorrelated():
    """Different pixels / bounces / sites see different scrambles (no
    shared structure that would alias into the image)."""
    s = np.arange(64, dtype=np.uint32)
    base = qmc.uniform(np, 0, np.uint32(0), s, 0, rng.SCAT_U1)
    other_pix = qmc.uniform(np, 0, np.uint32(1), s, 0, rng.SCAT_U1)
    other_bounce = qmc.uniform(np, 0, np.uint32(0), s, 1, rng.SCAT_U1)
    other_site = qmc.uniform(np, 0, np.uint32(0), s, 0, rng.DIEL_REFL)
    for o in (other_pix, other_bounce, other_site):
        assert np.abs(np.corrcoef(base, o)[0, 1]) < 0.35


def test_unit_ball_and_disk_shapes():
    pix = np.arange(512, dtype=np.uint32)
    ball = qmc.in_unit_ball(np, 3, pix, 7, 2)
    disk = qmc.in_unit_disk(np, 3, pix, 7, 0)
    assert (np.linalg.norm(ball, axis=-1) <= 1.0 + 1e-6).all()
    assert (np.linalg.norm(disk, axis=-1) <= 1.0 + 1e-6).all()
    assert np.abs(ball.mean(axis=0)).max() < 0.08
    assert np.allclose(disk[:, 2], 0.0)


def _rmse(img, ref):
    return float(np.sqrt(np.mean((img - ref) ** 2)))


def test_render_error_beats_rng():
    """The actual payoff: at equal spp, the QMC render is closer to the
    converged image than the rng render — on a scene exercising pixel
    jitter, defocus, diffuse + dielectric scatter, and RR."""
    from rt_tpu.render.renderer import render
    from rt_tpu.scene.builders import three_sphere_scene
    from rt_tpu.scene.types import build_tables
    from rt_tpu.config import RenderConfig

    sdef, _ = three_sphere_scene(width=64, height=36)
    tables = build_tables(sdef)
    spp = 16
    base = RenderConfig(width=64, height=36, samples_per_pixel=spp,
                        max_depth=8, enable_defocus=True,
                        background_mode="gradient", engine="xla",
                        loop="scan")
    truth_cfg = base.replace(samples_per_pixel=1024, seed=99)
    truth = render(tables, truth_cfg) / 1024.0

    img_rng = render(tables, base.replace(sampler="rng")) / spp
    img_qmc = render(tables, base.replace(sampler="qmc")) / spp
    e_rng = _rmse(img_rng, truth)
    e_qmc = _rmse(img_qmc, truth)
    # typical measured ratio ~0.5; require a solid margin, not parity
    assert e_qmc < 0.8 * e_rng, (e_qmc, e_rng)


def test_engines_agree_under_qmc():
    """xla and the PRODUCTION megakernel consume identical QMC streams
    (the in-kernel i32 scrambled-Sobol' twin)."""
    from rt_tpu.render.renderer import render
    from rt_tpu.scene.builders import three_sphere_scene
    from rt_tpu.scene.types import build_tables
    from rt_tpu.config import RenderConfig

    sdef, _ = three_sphere_scene(width=32, height=18)
    tables = build_tables(sdef)
    cfg = RenderConfig(width=32, height=18, samples_per_pixel=4,
                       max_depth=6, background_mode="gradient",
                       sampler="qmc", engine="xla", loop="scan")
    a = render(tables, cfg)
    b = render(tables, cfg.replace(engine="mega"))  # in-kernel twin
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_oracle_matches_jax_render_qmc():
    """The scalar NumPy oracle consumes the same scrambled-Sobol'
    streams as the jitted renderer — the fixed-seed cross-version
    comparison discipline (SURVEY.md §4) extended to QMC."""
    from rt_tpu.render.oracle import render_oracle
    from rt_tpu.render.renderer import render
    from rt_tpu.scene.builders import three_sphere_scene
    from rt_tpu.scene.types import build_tables
    from rt_tpu.config import RenderConfig
    from tests.conftest import assert_images_close

    sdef, _ = three_sphere_scene(width=24, height=14)
    tables = build_tables(sdef)
    cfg = RenderConfig(width=24, height=14, samples_per_pixel=4,
                       max_depth=5, background_mode="gradient",
                       sampler="qmc", engine="xla", loop="scan")
    img = render(tables, cfg)
    oracle = render_oracle(sdef, cfg)
    assert_images_close(img, oracle, cfg.samples_per_pixel)


def test_replay_grads_qmc():
    """Gradient replay re-derives the same QMC draws: a replay-VJP
    albedo gradient at sampler='qmc' matches finite differences."""
    from rt_tpu.diff.inverse import extract_params, apply_params
    from rt_tpu.diff.replay import make_replay_render
    from rt_tpu.render.renderer import render_block
    from rt_tpu.scene.builders import three_sphere_scene
    from rt_tpu.scene.types import build_tables
    from rt_tpu.config import RenderConfig
    import jax

    sdef, _ = three_sphere_scene(width=16, height=9)
    tables = build_tables(sdef)
    cfg = RenderConfig(width=16, height=9, samples_per_pixel=2,
                       max_depth=4, background_mode="gradient",
                       sampler="qmc", engine="xla", loop="scan")
    n = 16 * 9
    pix = np.arange(n, dtype=np.int32)
    px = jnp.asarray(pix % 16)
    py = jnp.asarray(pix // 16)
    params = extract_params(tables, ("mat_albedo",))
    f = make_replay_render(tables, cfg, spp=2, px=px, py=py)

    def loss(p):
        img = f(p, jnp.uint32(0))
        return jnp.mean(img ** 2)

    g = jax.grad(loss)(params)["mat_albedo"]

    eps = 3e-3
    import jax as _jax
    base_tbl = _jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tables)
    i, c = 1, 0
    for delta in (eps, -eps):
        albedo = np.asarray(tables.mat_albedo).copy()
        albedo[i, c] += delta
        t2 = apply_params(base_tbl, {"mat_albedo": jnp.asarray(albedo)})
        img = render_block(t2, cfg, px, py, jnp.uint32(0), 2,
                           jnp.uint32(cfg.seed), 16, 9) / 2.0
        if delta > 0:
            lp = float(np.mean(np.asarray(img) ** 2))
        else:
            lm = float(np.mean(np.asarray(img) ** 2))
    fd = (lp - lm) / (2 * eps)
    assert np.isfinite(fd) and np.isfinite(float(g[i, c]))
    np.testing.assert_allclose(float(g[i, c]), fd, rtol=0.12, atol=1e-4)


def test_mega_qmc_matches_host_qmc():
    """In-kernel i32 scrambled-Sobol' == ops/qmc.py u32 stream, bitwise
    (for every site family, multiple bounces/samples)."""
    from rt_tpu.ops.pallas_mega import _uniform as mega_uniform

    pix_np = np.arange(128, dtype=np.uint32).reshape(8, 16)
    pix = jnp.asarray(pix_np.astype(np.int32))
    for purpose in (rng.PIXEL_U, rng.LENS_U2, rng.SCAT_U1, rng.SCAT_U2,
                    rng.SCAT_U3, rng.DIEL_REFL, rng.RR, rng.NEE_U2):
        for sample, bounce in ((0, 0), (3, 2), (255, 7)):
            host = qmc.uniform(np, 7, pix_np, np.uint32(sample),
                               np.uint32(bounce), purpose)
            dev = mega_uniform(jnp.int32(7), pix,
                               jnp.full_like(pix, sample),
                               jnp.full_like(pix, bounce),
                               purpose, qmc=True)
            np.testing.assert_array_equal(
                np.asarray(dev), host.astype(np.float32),
                err_msg=f"purpose={purpose} s={sample} b={bounce}")


def test_mega_qmc_full_scene_vs_oracle():
    """End-to-end: the megakernel under QMC against the scalar oracle
    on a mixed-material scene (same scrambled-Sobol' streams)."""
    from rt_tpu.render.oracle import render_oracle
    from rt_tpu.render.renderer import render
    from rt_tpu.scene.builders import three_sphere_scene
    from rt_tpu.scene.types import build_tables
    from rt_tpu.config import RenderConfig
    from tests.conftest import assert_images_close

    sdef, _ = three_sphere_scene(width=24, height=14)
    tables = build_tables(sdef)
    cfg = RenderConfig(width=24, height=14, samples_per_pixel=4,
                       max_depth=5, sampler="qmc", engine="mega")
    img = render(tables, cfg)
    oracle = render_oracle(sdef, cfg)
    assert_images_close(img, oracle, cfg.samples_per_pixel)


def test_mega_qmc_regen_and_compaction_invisible():
    """QMC rides the full production machinery unchanged: segmented
    compaction and in-kernel sample regeneration reproduce the plain
    megakernel trace bit-for-bit under sampler='qmc'."""
    from rt_tpu.render.renderer import render
    from rt_tpu.scene.builders import cover_scene
    from rt_tpu.scene.types import build_tables

    sdef, cfg = cover_scene(width=48, height=27, spp=2, max_depth=6,
                            grid=3)
    tables = build_tables(sdef)
    cfg = cfg.replace(engine="mega", sampler="qmc")
    a = render(tables, cfg)
    b = render(tables, cfg.replace(compact_every=2, compact_group=32))
    np.testing.assert_array_equal(a, b)
    # regen generates camera rays in-kernel; like the rng sampler
    # (test_mega.py test_regen_statistically_matches_mega) its f32
    # expression order differs ulp-level from the host camera, so the
    # comparison is statistical, not bitwise
    spp = cfg.samples_per_pixel
    c = render(tables, cfg.replace(regen=True))
    diff = np.abs(np.asarray(a) / spp - np.asarray(c) / spp).max(axis=-1)
    assert float((diff > 2e-3).mean()) <= 0.01, diff.max()


def test_adjoint_kernel_and_capture_qmc():
    """The backward megakernel and the in-kernel tape capture replay
    the SAME scrambled-Sobol' streams: under sampler='qmc' the adjoint
    kernel's gradients match the XLA per-bounce replay, and
    mega_capture's winner codes match the hybrid capture."""
    import jax
    from rt_tpu.diff.replay import make_replay_loss_fn
    from rt_tpu.diff.tape import capture_tape
    from rt_tpu.ops.camera import generate_rays
    from rt_tpu.scene.types import SceneDef, build_tables
    from rt_tpu.config import RenderConfig

    s = SceneDef(width=24, height=16, samples_per_pixel=2, max_depth=5,
                 background=(0.4, 0.5, 0.6))
    s.add_sphere((0, 0, -1.5), 0.5, s.add_lambertian_color((0.7, 0.2, 0.2)))
    s.add_sphere((1.1, 0, -1.5), 0.5, s.add_dielectric(1.5))
    ck = s.add_checker((0.9, 0.9, 0.9), (0.1, 0.2, 0.1))
    s.add_sphere((0, -100.5, -1.5), 100, s.add_lambertian(ck))
    s.set_camera((0, 0.3, 1.2), (0, 0, -1.5), (0, 1, 0), 55, 0.0)
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=2,
                       max_depth=5, loop="while", engine="mega",
                       sampler="qmc")
    tables = build_tables(s)
    n = 24 * 16
    pix = np.arange(n, dtype=np.int32)
    px = jnp.asarray(pix % 24)
    py = jnp.asarray(pix // 24)
    tgt = jnp.full((n, 3), 0.2, jnp.float32)
    params = {"mat_albedo": jnp.asarray(tables.mat_albedo, jnp.float32)}

    g_x = jax.grad(make_replay_loss_fn(
        tables, cfg, 2, px, py, tgt, bwd_kernel=False))(params)
    g_k = jax.grad(make_replay_loss_fn(
        tables, cfg, 2, px, py, tgt, bwd_kernel=True))(params)
    a, b = np.asarray(g_x["mat_albedo"]), np.asarray(g_k["mat_albedo"])
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)

    # capture parity: in-kernel (mega) vs hybrid winner codes under qmc
    import jax.tree_util as jtu
    tbl = jtu.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
        tables)
    sample = jnp.full((n,), 0, jnp.uint32)
    ro, rd = generate_rays(tbl.camera, 24, 16, px, py, sample,
                           jnp.uint32(cfg.seed), False, "qmc")
    codes_mega = capture_tape(tbl, cfg, ro, rd, pix, sample,
                              jnp.uint32(cfg.seed), engine="mega")
    codes_hyb = capture_tape(tbl, cfg, ro, rd, pix, sample,
                             jnp.uint32(cfg.seed), engine="xla")
    cm = np.asarray(codes_mega)
    ch = np.asarray(codes_hyb)
    # post-death bounces: mega records -1, hybrid records the stale
    # winner — mask by the hybrid's own alive chain (first -1 onward)
    live = np.ones_like(ch, dtype=bool)
    dead = np.zeros(ch.shape[1], dtype=bool)
    for bidx in range(ch.shape[0]):
        live[bidx] = ~dead
        dead |= ch[bidx] < 0
    match = (cm == ch) | ~live
    assert match.mean() > 0.995, match.mean()
