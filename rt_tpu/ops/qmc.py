"""Owen-scrambled Sobol' sampler (QMC) — a drop-in alternative to ops/rng.py.

The reference renders with pure pseudo-random draws everywhere (curand
XORWOW on GPU, rand()/srand(7) on CPU, ti.random() in the Taichi
versions) so its Monte-Carlo error decays as O(N^-1/2) in samples per
pixel. This module provides the same draw interface backed by a padded,
hash-scrambled Sobol' low-discrepancy sequence: error on the smooth
parts of the integrand decays up to O(N^-3/2), i.e. the same image
quality at a fraction of the paths. Beyond-parity feature (the reference
has no QMC anywhere); selected with RenderConfig.sampler="qmc".

Construction (the hash-based Owen scrambling of Burley, JCGT 2020 —
public-domain technique, implemented from the math):

  - Each draw site (purpose group: pixel jitter, lens disk, scatter
    ball, dielectric choice, RR, NEE) uses Sobol' dimensions 0..2 of its
    OWN reordering of the sequence ("padding"): high-dimensional Sobol'
    projections are poor, 2-3D projections are excellent, and padding
    decorrelates sites through independent index shuffles.
  - The per-(pixel, bounce, site) scramble keys derive from the SAME
    triple32 fold chain as ops/rng.py, so the whole thing stays a pure
    function of (seed, pixel, sample, bounce, purpose) — checkpoint /
    resume / gradient replay keep working unchanged.
  - Both the index shuffle and the value scramble are "nested uniform
    scrambles": reverse-bits, then a Laine-Karras style permutation
    (each output bit = input bit XOR hash of strictly-lower bits; the
    multiply constants are even so x ^= x*c never feeds a bit into
    itself), then reverse back. In the un-reversed domain that makes
    output bit b depend only on input bits >= b, which is exactly an
    Owen scramble of a base-2 digit expansion:
      * applied to the VALUE it's the classic Owen scramble (flip of a
        digit depends on coarser digits) — variance-reducing and
        unbiased;
      * applied to the INDEX it maps every prefix {0..2^k-1} to an
        aligned block {c*2^k .. c*2^k + 2^k - 1} (bits >= k of the
        output are constant once input bits >= k are zero), and any
        aligned 2^k block of Sobol' indices is a (t,k,s)-net — so the
        shuffled sequence keeps the progressive stratification property
        at every power-of-2 sample count.

Everything is u32 bit arithmetic available in numpy, jax.numpy and
Pallas/Mosaic alike; the in-kernel twin in ops/pallas_mega.py reproduces
these streams bit-exactly (pinned by tests/test_qmc.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rt_tpu.ops import rng

_U32 = rng._U32


def _c(xp, v):
    return _U32[xp](v)


def reverse_bits(xp, x):
    """Bit-reverse a u32 (5-step butterfly)."""
    x = rng._u32(xp, x)
    x = ((x >> 1) & _c(xp, 0x55555555)) | ((x & _c(xp, 0x55555555)) << 1)
    x = ((x >> 2) & _c(xp, 0x33333333)) | ((x & _c(xp, 0x33333333)) << 2)
    x = ((x >> 4) & _c(xp, 0x0F0F0F0F)) | ((x & _c(xp, 0x0F0F0F0F)) << 4)
    x = ((x >> 8) & _c(xp, 0x00FF00FF)) | ((x & _c(xp, 0x00FF00FF)) << 8)
    return (x >> 16) | (x << 16)


def _lk_body(xp, x, seed):
    """Laine-Karras-style permutation: on a bit-REVERSED value, each
    output bit is the input bit XOR a hash of strictly lower bits (the
    multiply constants are all even), plus a seed-dependent offset."""
    x = rng._u32(xp, x) + rng._u32(xp, seed)
    x = x ^ (x * _c(xp, 0x6C50B47C))
    x = x ^ (x * _c(xp, 0xB82F1E52))
    x = x ^ (x * _c(xp, 0xC7AFE638))
    x = x ^ (x * _c(xp, 0x8D22F6E6))
    return x


def _lk(xp, x, seed):
    if xp is np:
        with np.errstate(over="ignore"):
            return _lk_body(xp, x, seed)
    return _lk_body(xp, x, seed)


def nested_scramble(xp, x, seed):
    """Owen scramble of a u32 digit expansion: output bit b depends only
    on input bits >= b. Used for both the value and the index."""
    return reverse_bits(xp, _lk(xp, reverse_bits(xp, x), seed))


def _direction_vectors():
    """Direction vectors (v_i = m_i << (32-i)) for Sobol' dims 1 and 2.

    Dim 1: primitive polynomial x+1   (s=1), m = [1]       -> m_i = 2m ^ m
    Dim 2: primitive polynomial x^2+x+1 (s=2), m = [1, 3]  -> m_i = 2m1 ^ 4m2 ^ m2
    (the standard Joe-Kuo initial values; dim 0 is the van der Corput
    radical inverse = plain bit reversal, computed without a table).
    """
    dims = []
    m = [1]
    for i in range(1, 32):
        m.append((m[i - 1] << 1) ^ m[i - 1])
    dims.append(np.array([mi << (31 - i) for i, mi in enumerate(m)],
                         dtype=np.uint32))
    m = [1, 3]
    for i in range(2, 32):
        m.append((m[i - 1] << 1) ^ (m[i - 2] << 2) ^ m[i - 2])
    dims.append(np.array([mi << (31 - i) for i, mi in enumerate(m)],
                         dtype=np.uint32))
    return dims


_DIRS = _direction_vectors()


def sobol_bits(xp, idx, dim: int):
    """Sobol' point (u32 radix) for one sample index and dimension 0-2."""
    idx = rng._u32(xp, idx)
    if dim == 0:
        return reverse_bits(xp, idx)
    dirs = _DIRS[dim - 1]
    acc = xp.zeros_like(idx)
    one = _c(xp, 1)
    for i in range(32):
        acc = acc ^ (((idx >> _c(xp, i)) & one) * _c(xp, int(dirs[i])))
    return acc


# purpose -> (site, dim): each site is one padded low-dim Sobol' slice.
_SITE = {
    rng.PIXEL_U: (0, 0), rng.PIXEL_V: (0, 1),
    rng.LENS_U1: (1, 0), rng.LENS_U2: (1, 1),
    rng.SCAT_U1: (2, 0), rng.SCAT_U2: (2, 1), rng.SCAT_U3: (2, 2),
    rng.DIEL_REFL: (3, 0),
    rng.RR: (4, 0),
    rng.NEE_PICK: (6, 0), rng.NEE_U1: (6, 1), rng.NEE_U2: (6, 2),
}

# constant occupying the key chain's "sample" slot for site keys — the
# QMC scramble must NOT vary per sample (the sample picks the Sobol'
# index instead), and this tag keeps site keys disjoint from rng draws.
QMC_TAG = 0x51D0B07
_SITE_BASE = 0x100  # site ids live above every rng purpose id


def site_seeds(xp, seed, pixel, bounce, site: int, dim: int):
    """(shuffle_seed, value_seed) for one (pixel, bounce, site, dim)."""
    sk = rng.key(xp, seed, pixel, QMC_TAG, bounce, _SITE_BASE + site)
    return rng.fold(xp, sk, 1), rng.fold(xp, sk, 2 + dim)


def uniform(xp, seed, pixel, sample, bounce, purpose):
    """U[0,1) float32 draw — same signature and stream-coordinate
    contract as rng.uniform, backed by the scrambled Sobol' sequence.
    `purpose` must be one of the static rng purpose constants."""
    purpose = int(purpose)
    if purpose not in _SITE:  # e.g. SCENE_GEN: host-side, not a path dim
        return rng.uniform(xp, seed, pixel, sample, bounce, purpose)
    site, dim = _SITE[purpose]
    shuf_seed, val_seed = site_seeds(xp, seed, pixel, bounce, site, dim)
    idx = nested_scramble(xp, sample, shuf_seed)
    bits = nested_scramble(xp, sobol_bits(xp, idx, dim), val_seed)
    return (bits >> 8).astype(xp.float32) * xp.float32(1.0 / (1 << 24))


def in_unit_ball(xp, seed, pixel, sample, bounce):
    """Unit-ball point via the same analytic map as rng.in_unit_ball,
    fed by a 3D scrambled-Sobol' site (dims 0-2 pad to one site: the
    (r, cos_t, phi) triplet is where stratification pays most)."""
    u1 = uniform(xp, seed, pixel, sample, bounce, rng.SCAT_U1)
    u2 = uniform(xp, seed, pixel, sample, bounce, rng.SCAT_U2)
    u3 = uniform(xp, seed, pixel, sample, bounce, rng.SCAT_U3)
    r = xp.cbrt(u1)
    cos_t = 1.0 - 2.0 * u2
    sin_t = xp.sqrt(xp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * np.pi * u3
    x = r * sin_t * xp.cos(phi)
    y = r * sin_t * xp.sin(phi)
    z = r * cos_t
    return xp.stack([x, y, z], axis=-1).astype(xp.float32)


def in_unit_disk(xp, seed, pixel, sample, bounce):
    """Unit-disk point for thin-lens defocus (2D site, dims 0-1)."""
    u1 = uniform(xp, seed, pixel, sample, bounce, rng.LENS_U1)
    u2 = uniform(xp, seed, pixel, sample, bounce, rng.LENS_U2)
    r = xp.sqrt(u1)
    phi = 2.0 * np.pi * u2
    return xp.stack(
        [r * xp.cos(phi), r * xp.sin(phi), xp.zeros_like(r)], axis=-1
    ).astype(xp.float32)
