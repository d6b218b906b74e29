"""Golden-image tests: the vectorized TPU-path renderer vs the independent
scalar NumPy oracle, at fixed seed on tiny frames. This automates the
reference's manual fixed-seed cross-version comparison (SURVEY.md §4)."""

import numpy as np
import pytest

from rt_tpu.config import RenderConfig
from rt_tpu.render.oracle import render_oracle
from rt_tpu.render.renderer import render
from rt_tpu.scene.builders import (
    cornell_spheres_scene,
    cover_scene,
    three_sphere_scene,
)
from rt_tpu.scene.types import SceneDef, build_tables


def _small(cfg: RenderConfig, w=24, h=14, spp=4, depth=6, **kw):
    return cfg.replace(width=w, height=h, samples_per_pixel=spp,
                       max_depth=depth, **kw)


def _rescale_camera(sdef: SceneDef, cfg: RenderConfig):
    # camera aspect must match the shrunken test frame
    return sdef, cfg


def _run_both(sdef, cfg):
    # rebuild the camera for the test aspect ratio
    tables = build_tables(sdef)
    img = render(tables, cfg)
    ref = render_oracle(sdef, cfg)
    return img, ref


def test_three_sphere_scene_matches_oracle(images_close):
    sdef, cfg = three_sphere_scene(width=24, height=14, spp=4, max_depth=6)
    img, ref = _run_both(sdef, cfg)
    images_close(img, ref, cfg.samples_per_pixel)


def test_cover_scene_gradient_sky(images_close):
    sdef, cfg = cover_scene(width=20, height=12, spp=3, max_depth=5, grid=2)
    img, ref = _run_both(sdef, cfg)
    images_close(img, ref, cfg.samples_per_pixel)


def test_cover_scene_with_lights_rect_cylinder(images_close):
    sdef, cfg = cover_scene(width=20, height=12, spp=3, max_depth=5, grid=2,
                            lights=True)
    img, ref = _run_both(sdef, cfg)
    images_close(img, ref, cfg.samples_per_pixel)


def test_cornell_russian_roulette(images_close):
    sdef, cfg = cornell_spheres_scene(width=16, height=16, spp=4, max_depth=6)
    assert cfg.p_rr == 0.9
    img, ref = _run_both(sdef, cfg)
    images_close(img, ref, cfg.samples_per_pixel)


def test_defocus_matches_oracle(images_close):
    sdef, cfg = cover_scene(width=16, height=10, spp=3, max_depth=4, grid=1)
    cfg = cfg.replace(enable_defocus=True)
    img, ref = _run_both(sdef, cfg)
    images_close(img, ref, cfg.samples_per_pixel)


def test_exhaust_background_mode(images_close):
    sdef, cfg = three_sphere_scene(width=16, height=10, spp=3, max_depth=2)
    cfg = cfg.replace(exhaust_mode="background")
    img, ref = _run_both(sdef, cfg)
    images_close(img, ref, cfg.samples_per_pixel)


def test_scan_and_while_loops_identical():
    sdef, cfg = three_sphere_scene(width=16, height=10, spp=2, max_depth=5)
    tables = build_tables(sdef)
    a = render(tables, cfg.replace(loop="while"))
    b = render(tables, cfg.replace(loop="scan"))
    np.testing.assert_array_equal(a, b)


def test_render_deterministic_across_batch_sizes():
    """Tiling must not change the image (counter-based RNG is keyed on
    absolute pixel/sample ids, not batch layout)."""
    sdef, cfg = three_sphere_scene(width=16, height=10, spp=4, max_depth=4)
    tables = build_tables(sdef)
    a = render(tables, cfg.replace(rays_per_batch=1 << 16))
    b = render(tables, cfg.replace(rays_per_batch=64))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)


def test_triangle_mesh_scene_matches_oracle(images_close):
    s = SceneDef(width=18, height=12, samples_per_pixel=3, max_depth=4,
                 background=(0.7, 0.8, 1.0))
    m = s.add_lambertian_color((0.6, 0.3, 0.2))
    g = s.add_lambertian_color((0.5, 0.5, 0.5))
    s.add_sphere((0, -100.5, -1), 100, g)
    s.add_triangle((-1, 0, -2), (1, 0, -2), (0, 1.5, -2), m,
                   uv1=(0, 0), uv2=(1, 0), uv3=(0.5, 1))
    s.set_camera((0, 0.5, 2), (0, 0.5, -1), (0, 1, 0), 45, 0.0)
    cfg = RenderConfig(width=18, height=12, samples_per_pixel=3, max_depth=4)
    img, ref = _run_both(s, cfg)
    images_close(img, ref, cfg.samples_per_pixel)


def test_checker_and_image_textures_match_oracle(images_close):
    rs = np.random.RandomState(0)
    teximg = rs.rand(8, 8, 3).astype(np.float32)
    s = SceneDef(width=18, height=12, samples_per_pixel=3, max_depth=4,
                 background=(0.7, 0.8, 1.0))
    checker = s.add_checker((0.2, 0.3, 0.1), (0.9, 0.9, 0.9))
    mc = s.add_lambertian(checker)
    ti = s.add_image_texture(teximg)
    mi = s.add_lambertian(ti)
    s.add_sphere((0, -100.5, -1), 100, mc)
    s.add_sphere((0, 0, -1), 0.5, mi)
    s.set_camera((0, 0, 1), (0, 0, -1), (0, 1, 0), 45, 0.0)
    cfg = RenderConfig(width=18, height=12, samples_per_pixel=3, max_depth=4)
    img, ref = _run_both(s, cfg)
    images_close(img, ref, cfg.samples_per_pixel)


def test_emissive_termination_semantics():
    """A ray that hits a light must terminate with T*emit and never pick up
    background (main.cu:56-59); pure-light scene pins this."""
    s = SceneDef(width=4, height=4, samples_per_pixel=2, max_depth=3,
                 background=(100.0, 0.0, 0.0))
    light = s.add_diffuse_light_color((2, 3, 4))
    s.add_rect("xy_rect", -50, 50, -50, 50, -1, light)
    s.set_camera((0, 0, 1), (0, 0, -1), (0, 1, 0), 90, 0.0)
    cfg = RenderConfig(width=4, height=4, samples_per_pixel=2, max_depth=3)
    img = render(build_tables(s), cfg)
    per_sample = img / cfg.samples_per_pixel
    np.testing.assert_allclose(per_sample,
                               np.broadcast_to([2, 3, 4], per_sample.shape),
                               rtol=1e-5)
