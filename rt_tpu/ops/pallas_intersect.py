"""Pallas TPU closest-hit kernels.

The XLA formulation of ray-x-primitive candidate tests materializes
[B, N] intermediates in HBM (B rays x N primitives x several temps);
at production batch sizes that is gigabytes of HBM traffic per bounce
and becomes the renderer's bottleneck. This kernel computes the same
candidates tile-by-tile entirely in VMEM:

  - grid over ray tiles of R rays (rays ride the LANE axis),
  - spheres processed in chunks of C rows (the SUBLANE axis) via an
    in-kernel fori with a running (t_best, id_best) [1, R] carry,
  - HBM traffic = ray state in + (t, pid) out + the sphere table once
    per ray tile: O(B + N), not O(B*N).

Math is the reference's half-b quadratic, nearer-root-first
(gpu-version/object.cuh:47-75), with the tie-break "equal t -> larger
index wins" matching hittable_list::hit's `t <= closest` acceptance
(object.cuh:23-37) exactly like ops/intersect._last_argmin.

Differentiation: the Pallas engine is forward-only (the diff path pins
engine="xla"); both engines consume identical inputs and produce
identical hits, which tests/test_pallas.py pins.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = np.float32(np.inf)

RAY_TILE = 2048    # rays per grid step (an (8, 256) sublane x lane tile)
LANES = RAY_TILE // 8
MAX_CHUNK = 64     # spheres per inner iteration (leading broadcast axis)


def _sphere_kernel(cx_ref, cy_ref, cz_ref, c2r_ref, valid_ref,
                   rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
                   t_ref, pid_ref, *, chunk: int, n_chunks: int,
                   t_min: float):
    # per-ray tiles [8, L] (2048 rays laid out sublane x lane)
    rox, roy, roz = rox_ref[0], roy_ref[0], roz_ref[0]
    rdx, rdy, rdz = rdx_ref[0], rdy_ref[0], rdz_ref[0]
    a = rdx * rdx + rdy * rdy + rdz * rdz            # |rd|^2
    rd_dot_ro = rdx * rox + rdy * roy + rdz * roz
    ro_sq = rox * rox + roy * roy + roz * roz
    inv_a = 1.0 / a

    s, l = rox.shape

    def chunk_body(k, carry):
        t_best, id_best = carry
        sl = pl.ds(k * chunk, chunk)

        def lead(ref):  # [C, 1] -> [C, 1, 1] broadcast column
            return ref[sl, :].reshape(chunk, 1, 1)

        cx, cy, cz = lead(cx_ref), lead(cy_ref), lead(cz_ref)
        c2r = lead(c2r_ref)                          # |c|^2 - r^2
        valid = lead(valid_ref)                      # 1.0 live / 0.0 pad

        # hb[c,s,l] = rd.(ro - c); c_term = |ro - c|^2 - r^2
        hb = rd_dot_ro - (cx * rdx + cy * rdy + cz * rdz)     # [C, 8, L]
        c_term = ro_sq - 2.0 * (cx * rox + cy * roy + cz * roz) + c2r
        disc = hb * hb - a * c_term
        sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
        root1 = (-hb - sqrtd) * inv_a
        root2 = (-hb + sqrtd) * inv_a
        t = jnp.where(root1 >= t_min, root1,
                      jnp.where(root2 >= t_min, root2, INF))
        t = jnp.where((disc >= 0.0) & (valid > 0.0), t, INF)

        # chunk reduction: min t; ties -> larger sphere index
        tmin = jnp.min(t, axis=0)                              # [8, L]
        rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, s, l), 0)
        rows = rows + k * chunk
        idx = jnp.max(jnp.where(t == tmin, rows, -1), axis=0)  # [8, L]

        # merge with running best: accept on t < best OR (== best and
        # larger index) — the global later-wins tie-break
        take = (tmin < t_best) | ((tmin == t_best) & (idx > id_best))
        t_best = jnp.where(take, tmin, t_best)
        id_best = jnp.where(take, idx, id_best)
        return t_best, id_best

    t0 = jnp.full((s, l), INF, jnp.float32)
    i0 = jnp.zeros((s, l), jnp.int32)
    t_best, id_best = jax.lax.fori_loop(0, n_chunks, chunk_body, (t0, i0))
    t_ref[0] = t_best
    pid_ref[0] = id_best


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def sphere_closest_hit(centers, radii, live_mask, ro, rd,
                       t_min: float = 1e-3, interpret: bool = False):
    """Closest sphere hit per ray.

    centers [N,3], radii [N], live_mask [N] (False for pad rows),
    ro/rd [B,3]. Returns (t [B] f32 with inf on miss, pid [B] i32).
    B must be a multiple of RAY_TILE (callers pad); N is power-of-two
    table-padded, so it divides cleanly into chunks."""
    b = ro.shape[0]
    n = centers.shape[0]
    assert b % RAY_TILE == 0, b
    chunk = min(n, MAX_CHUNK)
    assert n % chunk == 0, (n, chunk)
    n_chunks = n // chunk

    g = b // RAY_TILE
    c2r = (centers * centers).sum(-1) - radii * radii

    def col(x):  # [N] -> [N, 1]
        return x.reshape(n, 1).astype(jnp.float32)

    def lanes(x):  # [B] -> [G, 8, L]
        return x.reshape(g, 8, LANES).astype(jnp.float32)

    sphere_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_sphere_kernel, chunk=chunk,
                               n_chunks=n_chunks, t_min=float(t_min))
    t, pid = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[sphere_spec] * 5 + [ray_spec] * 6,
        out_specs=(
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, 8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((g, 8, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(
        col(centers[:, 0]), col(centers[:, 1]), col(centers[:, 2]),
        col(c2r), col(live_mask.astype(jnp.float32)),
        lanes(ro[:, 0]), lanes(ro[:, 1]), lanes(ro[:, 2]),
        lanes(rd[:, 0]), lanes(rd[:, 1]), lanes(rd[:, 2]),
    )
    return t.reshape(b), pid.reshape(b)
