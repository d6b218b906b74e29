"""Sharded rendering on the virtual 8-device CPU mesh.

The counter-based RNG keys every draw on absolute (pixel, sample)
coordinates, so sharding must be invisible: any mesh shape produces the
same sums (up to float association in the psum) as the single-device
renderer. This is the multi-device correctness test the reference never
had (its multi-GPU story is independent processes, blue.py:24-35)."""

import numpy as np
import jax
import pytest

from rt_tpu.config import RenderConfig
from rt_tpu.render.renderer import render
from rt_tpu.scene.builders import three_sphere_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.parallel.mesh import make_mesh
from rt_tpu.parallel.sharded import render_sharded_ex


@pytest.fixture(scope="module")
def small_scene():
    sdef, cfg = three_sphere_scene(width=64, height=36, spp=4, max_depth=4)
    return build_tables(sdef), cfg


@pytest.mark.parametrize("shape", [(1, 1), (8, 1), (4, 2), (2, 4)])
@pytest.mark.parametrize("engine", ["xla", "mega", "queue"])
def test_sharded_matches_single_device(small_scene, shape, engine):
    """Every mesh shape x engine: the PRODUCTION engines ("queue", the
    CLI default since round 4, and the segmented "mega") must shard
    exactly like the slow one — the composition a real multi-chip user
    hits first (Pallas megakernel traced inside shard_map;
    interpret-mode on the CPU mesh)."""
    tables, cfg = small_scene
    cfg = cfg.replace(engine=engine)
    ref = render(tables, cfg)
    mesh = make_mesh(shape, jax.devices()[: shape[0] * shape[1]])
    img, spp = render_sharded_ex(tables, cfg, mesh)
    assert spp == cfg.samples_per_pixel
    np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-5)


def test_sharded_mega_with_compaction(small_scene):
    """The full production configuration — megakernel + segmented
    live-ray group compaction — under shard_map: the in-segment group
    permutation must stay shard-local and invert correctly."""
    tables, cfg = small_scene
    cfg = cfg.replace(engine="mega", compact_schedule=(2,),
                      compact_group=16)
    ref = render(tables, cfg.replace(compact_schedule=()))
    mesh = make_mesh((4, 2), jax.devices())
    img, spp = render_sharded_ex(tables, cfg, mesh)
    assert spp == cfg.samples_per_pixel
    np.testing.assert_allclose(img, ref, rtol=1e-5, atol=1e-5)


def test_sample_axis_rounds_up(small_scene):
    tables, cfg = small_scene
    cfg = cfg.replace(samples_per_pixel=3)
    mesh = make_mesh((4, 2), jax.devices())
    img, spp = render_sharded_ex(tables, cfg, mesh)
    assert spp == 4  # rounded to a multiple of the sample axis
    assert np.isfinite(img).all()


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (args[1].shape[0], 3)
    assert np.isfinite(out).all()


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
