"""Pallas closest-hit kernel vs the XLA reference formulation.

Runs in interpreter mode on the CPU mesh; the same code compiles for TPU
(conftest forces cpu, so interpret=True is selected inside intersect)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt_tpu.config import RenderConfig
from rt_tpu.ops.intersect import intersect
from rt_tpu.render.renderer import render
from rt_tpu.scene.builders import cover_scene, three_sphere_scene
from rt_tpu.scene.types import build_tables


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    ro = rng.normal(0, 3, (n, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_pallas_matches_xla_closest_hit():
    sdef, _ = cover_scene(spp=1, grid=4)
    tables = build_tables(sdef)
    ro, rd = _rays(1024)

    hx = intersect(tables, ro, rd, engine="xla")
    hp = intersect(tables, ro, rd, engine="pallas")

    np.testing.assert_array_equal(np.asarray(hx.hit), np.asarray(hp.hit))
    # same math up to mul-by-reciprocal vs divide + op order; grazing
    # hits amplify the ulp differences through cancellation (~1e-4 rel)
    np.testing.assert_allclose(
        np.asarray(jnp.where(hx.hit, hx.t, 0.0)),
        np.asarray(jnp.where(hp.hit, hp.t, 0.0)), rtol=2e-4, atol=1e-4)
    agree = np.mean(np.asarray(hx.pid) == np.asarray(hp.pid))
    assert agree > 0.999, agree  # grazing ties may flip on ulp diffs


def test_pallas_render_matches_xla_render():
    sdef, cfg = three_sphere_scene(width=48, height=32, spp=4, max_depth=6)
    tables = build_tables(sdef)
    img_x = render(tables, cfg.replace(engine="xla"))
    img_p = render(tables, cfg.replace(engine="pallas"))
    diff = np.abs(img_x / 4 - img_p / 4).max(axis=-1)
    # bitwise-equal except where an ulp flips a discrete decision
    assert (diff > 1e-3).mean() < 0.01, diff.max()


def test_pallas_nonmultiple_batch_padding():
    sdef, _ = three_sphere_scene(spp=1)
    tables = build_tables(sdef)
    ro, rd = _rays(300)  # not a multiple of RAY_TILE
    hx = intersect(tables, ro, rd, engine="xla")
    hp = intersect(tables, ro, rd, engine="pallas")
    np.testing.assert_array_equal(np.asarray(hx.hit), np.asarray(hp.hit))
    np.testing.assert_allclose(
        np.asarray(jnp.where(hx.hit, hx.t, 0.0)),
        np.asarray(jnp.where(hp.hit, hp.t, 0.0)), rtol=2e-4, atol=1e-4)
