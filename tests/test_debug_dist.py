"""Debug tooling + distributed helpers + new animation modes."""

import os

import numpy as np
import pytest

from rt_tpu.parallel.distributed import frame_range
from rt_tpu.utils.debug import assert_finite, replay_check
from rt_tpu.render.renderer import render
from rt_tpu.scene.builders import three_sphere_scene
from rt_tpu.scene.types import build_tables


def test_frame_range_partitions_completely():
    covered = []
    for h in range(3):
        lo, hi = frame_range(10, 3, h, start=5)
        covered.extend(range(lo, hi))
    assert covered == list(range(5, 15))


def test_frame_range_rejects_bad_host():
    with pytest.raises(ValueError):
        frame_range(10, 3, 3)


def test_assert_finite_flags_nan():
    assert_finite({"a": np.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_finite({"a": np.array([1.0, np.nan])})


def test_replay_determinism():
    sdef, cfg = three_sphere_scene(width=16, height=9, spp=2, max_depth=3)
    tables = build_tables(sdef)
    assert replay_check(render, tables, cfg)


def test_checked_intersect_reports_clean():
    import jax.numpy as jnp

    from rt_tpu.utils.debug import checked_intersect

    sdef, _ = three_sphere_scene(spp=1)
    tables = build_tables(sdef)
    ro = jnp.zeros((8, 3)) + jnp.asarray([0.0, 0.0, 1.0])
    rd = jnp.zeros((8, 3)) + jnp.asarray([0.0, 0.0, -1.0])
    err, hit = checked_intersect(tables, ro, rd)
    err.throw()  # no error expected
    assert bool(hit.hit[0])


def test_animate_dolly(tmp_path):
    from rt_tpu.cli import main

    outdir = str(tmp_path / "frames")
    rc = main(["animate", "--kind", "dolly", "--frames", "2",
               "--outdir", outdir, "-w", "16", "--height", "16",
               "-spp", "1", "-d", "2"])
    assert rc == 0
    assert os.path.exists(os.path.join(outdir, "dolly_0000.png"))


def test_animate_host_partition(tmp_path):
    from rt_tpu.cli import main

    outdir = str(tmp_path / "frames")
    # host 1 of 2 with 4 frames renders frames 2..3 only
    rc = main(["animate", "--kind", "dna", "--frames", "4",
               "--num-hosts", "2", "--host-index", "1",
               "--outdir", outdir, "-w", "16", "--height", "9",
               "-spp", "1", "-d", "2"])
    assert rc == 0
    assert not os.path.exists(os.path.join(outdir, "frame_0000.png"))
    assert os.path.exists(os.path.join(outdir, "frame_0002.png"))
    assert os.path.exists(os.path.join(outdir, "frame_0003.png"))
