"""Persistent ray-queue megakernel (ops/pallas_queue.py, round 4).

The queue engine is the crossing mechanism for the 2.59x group-packing
floor BASELINE.md round-3 measured (the reference's analogue is the
persistent per-thread ray loop, gpu-version/main.cu:17-105): rays live
in a VMEM staging pool, every kernel step consumes one full 2048-lane
tile, and survivors repack at LANE granularity via one-hot MXU matmuls.
These tests pin the engine's radiance against the XLA integrator per
lane — the queue reorders WORK, never streams: per-lane RNG coordinates
(pix, samp, bounce) are carried through the pool, so per-lane radiance
must match exactly up to compiler-fusion ulps.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_tpu.config import RenderConfig
from rt_tpu.scene.types import SceneDef, build_tables
from rt_tpu.render.renderer import render


def _scene_all_families():
    """Every primitive family + checker/image textures + an emissive
    rect (so nee has a light to sample)."""
    tex = np.zeros((8, 8, 3), np.float32)
    tex[:, :4] = 3.0
    tex[:, 4:] = 0.3
    s = SceneDef(width=32, height=24, samples_per_pixel=4, max_depth=8,
                 background=(0.2, 0.25, 0.3))
    s.add_sphere((0, 0, -2), 0.5, s.add_lambertian_color((0.5, 0.4, 0.3)))
    s.add_sphere((0, -100.5, -2), 100,
                 s.add_lambertian(
                     s.add_checker((0.2, 0.3, 0.1), (0.9, 0.9, 0.9))))
    s.add_sphere((-1.1, 0, -2), 0.5, s.add_dielectric(1.5))
    s.add_rect("xz_rect", -1, 1, -3, -1, 2.0,
               s.add_diffuse_light(s.add_image_texture(tex)))
    s.add_cylinder(0.25, -0.3, 0.3, s.add_metal((0.9, 0.7, 0.4), 0.1))
    s.add_triangle((0.4, -0.5, -1.2), (0.9, -0.5, -1.4), (0.6, 0.2, -1.3),
                   s.add_lambertian_color((0.8, 0.2, 0.2)))
    s.set_camera((0, 0.3, 1.2), (0, 0, -2), (0, 1, 0), 55, 0.0)
    return s


@pytest.fixture(scope="module")
def all_fam():
    s = _scene_all_families()
    return s, build_tables(s)


BASE = RenderConfig(width=32, height=24, samples_per_pixel=4, max_depth=8)


@pytest.mark.parametrize("name,kw", [
    ("plain", {}),
    ("nee", dict(nee=True)),
    ("qmc", dict(sampler="qmc")),
    ("rr", dict(p_rr=0.1)),
    ("exhaust_bg", dict(exhaust_mode="background")),
], ids=lambda v: v if isinstance(v, str) else "")
def test_queue_matches_xla(all_fam, name, kw):
    _, tables = all_fam
    cfg = BASE.replace(**kw)
    a = np.asarray(render(tables, cfg.replace(engine="xla", loop="while")))
    b = np.asarray(render(tables, cfg.replace(engine="queue")))
    assert np.isfinite(b).all()
    np.testing.assert_allclose(b, a, atol=1e-4)


def test_queue_relaunch_exact(all_fam):
    """A tiny queue_steps budget forces many while-loop relaunches;
    staging/cursor/ring resume must be exact — bit-identical images for
    ANY launch granularity."""
    _, tables = all_fam
    cfg = BASE.replace(max_depth=20, engine="queue")
    a = np.asarray(render(tables, cfg))
    b = np.asarray(render(tables, cfg.replace(queue_steps=17)))
    np.testing.assert_array_equal(a, b)


def test_queue_multiblock_gradient_bg():
    """Several 2048-lane primary blocks + drain tail + gradient sky."""
    s = SceneDef(width=80, height=60, samples_per_pixel=2, max_depth=12,
                 background=(0.7, 0.8, 1.0))
    s.add_sphere((0, 0, -2), 0.5, s.add_lambertian_color((0.5, 0.4, 0.3)))
    s.add_sphere((0, -100.5, -2), 100,
                 s.add_lambertian_color((0.3, 0.6, 0.2)))
    s.add_sphere((1.1, 0, -2), 0.5, s.add_dielectric(1.5))
    s.set_camera((0, 0, 1), (0, 0, -2), (0, 1, 0), 60, 0.0)
    tables = build_tables(s)
    cfg = RenderConfig(width=80, height=60, samples_per_pixel=2,
                       max_depth=12, background_mode="gradient")
    a = np.asarray(render(tables, cfg.replace(engine="xla", loop="while")))
    b = np.asarray(render(tables, cfg.replace(engine="queue")))
    np.testing.assert_allclose(b, a, atol=1e-4)


def test_queue_per_lane_sample_starts(all_fam):
    """Adaptive sampling's continuation contract: per-lane sample
    indices flow through the pool's pack unchanged."""
    from rt_tpu.ops.camera import generate_rays
    from rt_tpu.render.integrator import trace

    sdef, tables = all_fam
    tables = jax.tree_util.tree_map(jnp.asarray, tables)
    rng = np.random.RandomState(0)
    n = 3000
    px = jnp.asarray(rng.randint(0, 32, n).astype(np.int32))
    py = jnp.asarray(rng.randint(0, 24, n).astype(np.int32))
    sample = jnp.asarray(rng.randint(0, 7, n).astype(np.uint32))
    ro, rd = generate_rays(tables.camera, 32, 24, px, py, sample, 7,
                           False, "rng")
    tr = jax.jit(trace, static_argnames=("cfg",))
    outs = {}
    for eng, kw in (("xla", dict(loop="while")), ("queue", {})):
        cfg = BASE.replace(engine=eng, **kw)
        outs[eng] = np.asarray(tr(tables, cfg, ro, rd,
                                  (py * 32 + px).astype(jnp.uint32),
                                  sample, 7))
    np.testing.assert_allclose(outs["queue"], outs["xla"], atol=1e-4)


def test_queue_unsupported_scene_falls_back():
    """Empty scenes (no megakernel support) fall through to the hybrid
    engine exactly like engine='mega' does."""
    s = SceneDef(width=16, height=8, samples_per_pixel=2, max_depth=2,
                 background=(0.5, 0.6, 0.7))
    s.set_camera((0, 0, 1), (0, 0, -2), (0, 1, 0), 50, 0.0)
    tables = build_tables(s)
    cfg = RenderConfig(width=16, height=8, samples_per_pixel=2,
                       max_depth=2, engine="queue")
    img = np.asarray(render(tables, cfg))
    assert np.isfinite(img).all()
    np.testing.assert_allclose(
        img / 2.0, np.broadcast_to([0.5, 0.6, 0.7], img.shape), atol=1e-6)
