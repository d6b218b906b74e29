"""Counter-based RNG keyed on (pixel, sample, bounce, purpose).

Replaces the reference's stateful per-lane RNG:
  - curand XORWOW, one state per pixel, seeded with the pixel index
    (gpu-version/main.cu:120-125, rtweekend.cuh:23-29)
  - rand()/srand(7) on CPU (cpu-version/cpu-version/main.cpp:180)
  - ti.random() in the Taichi versions

A counter-based generator is the TPU-native choice: it is stateless (pure
function of its key — no RNG-state arrays to thread through jit), gives
exact checkpoint/resume and gradient replay (re-deriving any draw needs
only its coordinates), and vectorizes trivially.

The mixer is the public-domain "triple32" integer hash (a full-avalanche
32-bit finalizer). Every function here runs identically under numpy and
jax.numpy (pass `xp`), so the NumPy oracle renderer and the TPU renderer
consume bit-identical random streams — which is what makes the oracle
`allclose` tests meaningful (the reference's analogue is its fixed-seed
cross-version image comparison discipline, SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Draw "purposes" — one stream per use-site per bounce. Static draw counts
# per purpose mean no counter collisions.
PIXEL_U = 1
PIXEL_V = 2
LENS_U1 = 3
LENS_U2 = 4
SCAT_U1 = 5
SCAT_U2 = 6
SCAT_U3 = 7
DIEL_REFL = 8
RR = 9
SCENE_GEN = 10
NEE_PICK = 11
NEE_U1 = 12
NEE_U2 = 13

_GOLD = 0x9E3779B9  # 2**32 / golden ratio; Weyl increment for key words


def resolve(sampler: str):
    """Resolve a RenderConfig.sampler name to its draw module — this
    module ("rng", pseudo-random triple32) or ops.qmc ("qmc",
    Owen-scrambled Sobol'). Both expose the same pure-function draw
    surface: uniform / in_unit_ball / in_unit_disk."""
    if sampler == "qmc":
        from rt_tpu.ops import qmc

        return qmc
    if sampler != "rng":
        raise ValueError(f"unknown sampler {sampler!r} (want 'rng' or 'qmc')")
    import sys

    return sys.modules[__name__]

_U32 = {np: np.uint32, jnp: jnp.uint32}


def _u32(xp, x):
    return xp.asarray(x).astype(_U32[xp])


def triple32(xp, x):
    """Full-avalanche 32-bit mixer (public domain 'triple32' constants).
    u32 overflow is the point — silence numpy's scalar-overflow warning."""
    if xp is np:
        with np.errstate(over="ignore"):
            return _triple32_body(xp, x)
    return _triple32_body(xp, x)


def _triple32_body(xp, x):
    x = _u32(xp, x)
    x = x ^ (x >> 17)
    x = x * _U32[xp](0xED5AD4BB)
    x = x ^ (x >> 11)
    x = x * _U32[xp](0xAC4C1B51)
    x = x ^ (x >> 15)
    x = x * _U32[xp](0x31848BAB)
    x = x ^ (x >> 14)
    return x


def fold(xp, state, word):
    """Absorb one 32-bit word into the hash state."""
    state = _u32(xp, state)
    word = _u32(xp, word)
    if xp is np:
        with np.errstate(over="ignore"):
            mixed = state + word * _U32[xp](_GOLD)
    else:
        mixed = state + word * _U32[xp](_GOLD)
    return triple32(xp, mixed)


def key(xp, seed, pixel, sample, bounce, purpose):
    """Derive the u32 hash for one draw coordinate. All args broadcast."""
    s = fold(xp, _u32(xp, seed), pixel)
    s = fold(xp, s, sample)
    s = fold(xp, s, bounce)
    s = fold(xp, s, purpose)
    return s


def uniform(xp, seed, pixel, sample, bounce, purpose):
    """U[0,1) float32 draw at the given stream coordinate."""
    bits = key(xp, seed, pixel, sample, bounce, purpose)
    # 24 high bits -> [0,1) exactly representable in f32.
    return (bits >> 8).astype(xp.float32) * xp.float32(1.0 / (1 << 24))


def in_unit_ball(xp, seed, pixel, sample, bounce):
    """Uniform point in the unit ball (analytic, rejection-free).

    The CUDA reference rejects from a cube but (quirk) draws components in
    [0,1) so only covers the positive octant (gpu-version/vec3.cuh:133-141);
    the CPU versions sample the full ball. We implement the intended
    distribution — uniform over the full ball — analytically, which is the
    vector-machine-friendly form (no data-dependent rejection loop).
    """
    u1 = uniform(xp, seed, pixel, sample, bounce, SCAT_U1)
    u2 = uniform(xp, seed, pixel, sample, bounce, SCAT_U2)
    u3 = uniform(xp, seed, pixel, sample, bounce, SCAT_U3)
    r = xp.cbrt(u1)
    cos_t = 1.0 - 2.0 * u2
    sin_t = xp.sqrt(xp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * np.pi * u3
    x = r * sin_t * xp.cos(phi)
    y = r * sin_t * xp.sin(phi)
    z = r * cos_t
    return xp.stack([x, y, z], axis=-1).astype(xp.float32)


def in_unit_disk(xp, seed, pixel, sample, bounce):
    """Uniform point in the unit disk (z=0), for thin-lens defocus
    (cmake-cpu-version/camera.h:34; disabled on GPU, camera.cuh:33-34)."""
    u1 = uniform(xp, seed, pixel, sample, bounce, LENS_U1)
    u2 = uniform(xp, seed, pixel, sample, bounce, LENS_U2)
    r = xp.sqrt(u1)
    phi = 2.0 * np.pi * u2
    return xp.stack(
        [r * xp.cos(phi), r * xp.sin(phi), xp.zeros_like(r)], axis=-1
    ).astype(xp.float32)
