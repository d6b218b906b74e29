"""Checkpoint/resume: a resumed render is bit-identical to an
uninterrupted one (counter-based RNG -> exact resume, SURVEY.md §5.4)."""

import numpy as np
import pytest

from rt_tpu.render.progressive import Checkpoint, render_progressive
from rt_tpu.render.renderer import render
from rt_tpu.scene.builders import three_sphere_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.utils.metrics import Metrics, RenderStats


@pytest.fixture(scope="module")
def scene():
    sdef, cfg = three_sphere_scene(width=32, height=18, spp=8, max_depth=4)
    return build_tables(sdef), cfg


def test_progressive_equals_oneshot(scene):
    tables, cfg = scene
    ref = render(tables, cfg)
    acc, done = render_progressive(tables, cfg, samples_per_pass=3)
    assert done == cfg.samples_per_pixel
    np.testing.assert_allclose(acc, ref, rtol=1e-6, atol=1e-6)


def test_resume_from_checkpoint_is_exact(scene, tmp_path):
    tables, cfg = scene
    ck = str(tmp_path / "ck.npz")
    ref = render(tables, cfg)

    # "crash" after 4 samples
    render_progressive(tables, cfg.replace(samples_per_pixel=4),
                       checkpoint_path=ck, checkpoint_every=2)
    saved = Checkpoint.load(ck)
    assert saved.samples_done == 4

    # resume to the full spp; fingerprint must match and result be exact
    acc, done = render_progressive(tables, cfg, checkpoint_path=ck,
                                   checkpoint_every=4)
    assert done == cfg.samples_per_pixel
    np.testing.assert_allclose(acc, ref, rtol=1e-6, atol=1e-6)


def test_checkpoint_rejects_mismatched_config(scene, tmp_path):
    tables, cfg = scene
    ck = str(tmp_path / "ck.npz")
    render_progressive(tables, cfg.replace(samples_per_pixel=2),
                       checkpoint_path=ck, checkpoint_every=2)
    with pytest.raises(ValueError):
        render_progressive(tables, cfg.replace(seed=123),
                           checkpoint_path=ck)


def test_callback_fires_per_pass(scene):
    tables, cfg = scene
    seen = []
    render_progressive(tables, cfg, samples_per_pass=2,
                       callback=lambda img, s: seen.append(s))
    assert seen == [2, 4, 6, 8]


def test_metrics_and_stats():
    m = Metrics()
    with m.phase("parse"):
        pass
    with m.phase("render"):
        pass
    m.add("launches", 3)
    s = m.summary()
    assert "phase.parse.s" in s and s["count.launches"] == 3

    st = RenderStats(width=100, height=50, spp=4, max_depth=8, seconds=2.0,
                     engine="mega")
    assert st.paths == 100 * 50 * 4
    assert st.paths_per_s == st.paths / 2.0
    assert "engine mega" in st.log_line()


def test_checkpoint_save_ignores_stale_tmp(scene, tmp_path):
    """A stale `path + '.tmp'` leftover (from any crashed writer) must
    never be promoted over fresh checkpoint data."""
    from rt_tpu.render.progressive import Checkpoint

    path = str(tmp_path / "ck.npz")
    # poison: a stale file at the OLD ambiguous temp name
    with open(path + ".tmp", "w") as f:
        f.write("stale garbage from a crashed writer")
    fresh = np.full((2, 2, 3), 7.0, np.float32)
    Checkpoint(fresh, 5, "fp").save(path)
    loaded = Checkpoint.load(path)
    assert loaded.samples_done == 5
    np.testing.assert_array_equal(loaded.pixel_sum, fresh)


def test_device_out_matches_host_path(scene):
    """render(device_out=True) keeps the image on device (the bench's
    timing boundary, BASELINE.md tunnel-artifact note); the device-side
    unpermute gather must reproduce the host scatter exactly — including
    with multiple tiles (forced via a tiny rays_per_batch)."""
    tables, cfg = scene
    ref = render(tables, cfg)
    dev = render(tables, cfg, device_out=True)
    assert not isinstance(dev, np.ndarray)
    np.testing.assert_array_equal(np.asarray(dev), ref)

    multi = cfg.replace(rays_per_batch=128)  # several tiles per frame
    ref_m = render(tables, multi)
    dev_m = render(tables, multi, device_out=True)
    np.testing.assert_array_equal(np.asarray(dev_m), ref_m)


def test_resume_exact_on_queue_engine(scene, tmp_path):
    """The queue engine's per-lane (pixel, sample) stream coordinates
    make checkpoint/resume exact there too — a resumed render is
    bit-identical to the uninterrupted one."""
    tables, cfg = scene
    cfg = cfg.replace(engine="queue")
    ck = str(tmp_path / "ckq.npz")
    ref = np.asarray(render(tables, cfg))
    render_progressive(tables, cfg.replace(samples_per_pixel=4),
                       checkpoint_path=ck, checkpoint_every=2)
    acc, done = render_progressive(tables, cfg, checkpoint_path=ck,
                                   checkpoint_every=4)
    assert done == cfg.samples_per_pixel
    np.testing.assert_array_equal(np.asarray(acc), ref)
