"""RNG: numpy/jnp stream identity, range, and distribution sanity."""

import numpy as np
import jax.numpy as jnp

from rt_tpu.ops import rng


def test_numpy_jnp_streams_identical():
    pixels = np.arange(1000, dtype=np.uint32)
    for purpose in (rng.PIXEL_U, rng.SCAT_U1, rng.DIEL_REFL):
        a = rng.uniform(np, 42, pixels, 3, 5, purpose)
        b = rng.uniform(jnp, 42, jnp.asarray(pixels), 3, 5, purpose)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_uniform_range_and_mean():
    pixels = np.arange(200000, dtype=np.uint32)
    u = np.asarray(rng.uniform(np, 0, pixels, 0, 0, rng.PIXEL_U))
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 2e-3
    assert abs(np.var(u) - 1 / 12) < 1e-3


def test_streams_decorrelated_across_coordinates():
    pixels = np.arange(100000, dtype=np.uint32)
    u1 = np.asarray(rng.uniform(np, 0, pixels, 0, 0, rng.PIXEL_U))
    u2 = np.asarray(rng.uniform(np, 0, pixels, 0, 0, rng.PIXEL_V))
    u3 = np.asarray(rng.uniform(np, 0, pixels, 1, 0, rng.PIXEL_U))
    u4 = np.asarray(rng.uniform(np, 0, pixels, 0, 1, rng.PIXEL_U))
    u5 = np.asarray(rng.uniform(np, 1, pixels, 0, 0, rng.PIXEL_U))
    for other in (u2, u3, u4, u5):
        corr = np.corrcoef(u1, other)[0, 1]
        assert abs(corr) < 0.01
        assert not np.array_equal(u1, other)


def test_unit_ball_uniform():
    pixels = np.arange(200000, dtype=np.uint32)
    p = np.asarray(rng.in_unit_ball(np, 0, pixels, 0, 0))
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0 + 1e-6
    # mean radius of a uniform ball = 3/4
    assert abs(r.mean() - 0.75) < 5e-3
    assert np.abs(p.mean(axis=0)).max() < 5e-3


def test_unit_disk_uniform():
    pixels = np.arange(100000, dtype=np.uint32)
    p = np.asarray(rng.in_unit_disk(np, 0, pixels, 0, 0))
    r = np.linalg.norm(p[:, :2], axis=-1)
    assert np.all(p[:, 2] == 0)
    assert r.max() <= 1.0 + 1e-6
    # mean radius of a uniform disk = 2/3
    assert abs(r.mean() - 2 / 3) < 5e-3


def test_deterministic_replay():
    """Any draw is a pure function of its coordinates — the property that
    makes checkpoint/resume and gradient replay exact."""
    a = rng.uniform(np, 9, np.uint32(12345), 7, 3, rng.SCAT_U2)
    b = rng.uniform(np, 9, np.uint32(12345), 7, 3, rng.SCAT_U2)
    assert a == b
