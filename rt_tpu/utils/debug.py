"""Debug / sanitizer tooling.

The reference's entire memory-safety story is checkCudaErrors around API
calls (gpu-version/rtweekend.cuh:41-53) plus comments marking the dodgy
spots (device `new`, abandoned frees, stack bumps — SURVEY.md §5.2).
JAX's functional purity deletes that bug class; what remains worth
checking here:

  - NaN/Inf escapes from the radiometric math (masked-lane gradient
    poisoning is the classic source — ops/geometry.py safe_* ops exist
    precisely for it): `nan_debug()` scope + `assert_finite`.
  - Out-of-bounds indices feeding gathers (BVH node ids, table pids):
    `checked_traverse` wraps the BVH walk in jax.experimental.checkify
    bounds checks.
  - Determinism as the race detector: the counter-based RNG makes every
    render a pure function of (scene, config); `replay_check` renders
    twice and asserts bit-equality — any nondeterminism (unexpected
    collective orders, donation bugs) trips it.
"""

from __future__ import annotations

import contextlib

import numpy as np
import jax


@contextlib.contextmanager
def nan_debug():
    """Raise on any NaN produced inside the scope (jax_debug_nans)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree, name: str = "value") -> None:
    """Host-side finite check over a pytree (post-render sanity; the
    negative-radiance analogue of color.cuh:49-52's sentinel)."""
    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}: leaf {i} has {bad} non-finite elements")


def checked_intersect(tables, ro, rd, t_min=1e-3, traversal="linear"):
    """intersect() under checkify: OOB gathers and div-by-zero become
    reported errors instead of silent clamps. Debug-only (slow)."""
    import jax.numpy as jnp
    from jax.experimental import checkify

    from rt_tpu.ops.intersect import intersect

    tables = jax.tree_util.tree_map(jnp.asarray, tables)

    def f(ro, rd):
        return intersect(tables, ro, rd, t_min=t_min, traversal=traversal)

    checked = checkify.checkify(
        f, errors=checkify.index_checks | checkify.float_checks)
    err, hit = checked(ro, rd)
    return err, hit


def replay_check(render_fn, *args, **kwargs) -> bool:
    """Render twice; bit-equality is the determinism/race detector
    (counter-based RNG -> any difference is a real nondeterminism bug)."""
    a = np.asarray(render_fn(*args, **kwargs))
    b = np.asarray(render_fn(*args, **kwargs))
    return bool(np.array_equal(a, b))
