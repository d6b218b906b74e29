"""Pallas path-tracing megakernel: the full bounce loop on-chip.

This is the north-star kernel (BASELINE.json): one pallas_call traces a
tile of rays through the ENTIRE path — closest-hit, shading, scatter,
RNG — with all per-ray state resident in VMEM across bounces. Per
bounce, HBM sees nothing; per path, HBM traffic is one ray state in +
one out. Contrast the hybrid engine, where every bounce round-trips the
ray state and runs ~20 XLA gather/elementwise kernels — measured ~7x
slower per bounce.

Key structures:
  - Flat "shading tables" per primitive family (sphere / rect /
    cylinder): geometry + the primitive's material parameter block baked
    into one row, so the winner's full shading data is extracted during
    the closest-hit chunk merge by masked reduction — zero gathers
    anywhere. Every candidate also computes its world-space outward
    normal, so the merge carry is primitive-type-agnostic:
    (t, normal, material block). This flattening is the megakernel
    analogue of the Taichi SoA dispatch (taichi-version/material.py).
  - Counter-based RNG (the triple32 mixer of ops/rng.py) reimplemented
    in-kernel on int32 with logical shifts — bit-identical streams to
    the XLA/oracle path, keyed (pixel, sample, bounce, purpose).
  - Dead tiles short-circuit: each bounce runs under lax.cond on
    "any lane alive"; terminated tiles cost one scalar test per
    remaining bounce (rays are pixel-ordered; death is coherent).
  - Optional segmented tracing with live-ray compaction between
    segments (mega_trace / cfg.compact_every).

Radiometric semantics are gpu-version/main.cu:17-70 exactly (see
render/integrator.py). Supported scene shape (`mega_supported`, static):
EVERY reference scene — all four primitive families, all materials,
solid/checker/image textures on any primitive's UV (curved-primitive UVs
via in-kernel arctan2/arccos polynomials; the winner's UV parameters
ride the one-hot MXU extraction, so UV math runs once per ray).

The kernel itself is forward-only, but gradient renders can still use it:
the path-replay custom VJP (diff/replay.py) runs this kernel for the
forward pass and re-simulates bounces from the counter RNG for the
backward pass, so the diff path no longer pins engine="xla".
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rt_tpu.ops import qmc as qmc_mod
from rt_tpu.ops import rng as rng_mod
from rt_tpu.scene.types import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_LAMBERTIAN,
    MAT_METAL,
    SceneTables,
    TEX_CHECKER,
    TEX_IMAGE,
)

INF = np.float32(np.inf)
RAY_TILE = 2048
LANES = RAY_TILE // 8
SPH_CHUNK = 32   # spheres/triangles per inner iteration (leading broadcast
                 # axis). Swept 16/32/64/96/128 at the 1080p depth-50 cover
                 # headline (scripts/exp_chunk_sweep.py): 32 is the floor —
                 # 175 ms vs 201 ms at 128 (finer per-chunk AABB culling
                 # granularity wins; 16 regresses to 201 ms on loop overhead).
AUX_CHUNK = 16   # rects / cylinders per inner iteration

# Unified extraction block — cols 0..13 of EVERY table, pulled for the
# winning candidate by one [14,C]x[C,R] MXU matmul against the one-hot
# winner mask (bit-exact: bf16x3 decomposition is lossless for f32):
#   0..2  v0,v1,v2 (sphere: center; rect: k-axis onehot = normal;
#                   triangle: geometric normal; cylinder: zeros,
#                   overwritten with the per-candidate world normal)
#   3     v3       (sphere: radius — sign included, hollow-glass flips)
#   4     direct   (0: normal = (p - v)/v3 [sphere]; 1: normal = v)
#   5..7  mtype, checker, param (metal fuzz / dielectric IOR)
#   8..10 albedo   11..13 albedo2 (checker odd color)
#   14    img      (image-texture id, -1 none — triangles only)
_X_V = 0
_X_RAD = 3
_X_DIRECT = 4
_X_MTYPE, _X_CHECKER, _X_PARAM = 5, 6, 7
_X_ALB = 8
_X_ALB2 = 11
_X_IMG = 14
_X_COLS = 15

# per-family geometry extras (cols >= 14)
_S_C2R, _S_VALID = 15, 16
_S_COLS = 32

_R_K, _R_LO0, _R_LO1, _R_HI0, _R_HI1, _R_VALID = 15, 16, 17, 18, 19, 20
_R_F1 = 21  # free-axis-1 onehot
_R_F2 = 24  # free-axis-2 onehot
_R_COLS = 32

_Y_R = 15   # w2o rotation rows (row-major 3x3)
_Y_T = 24   # w2o translation
_Y_RAD2, _Y_ZMIN, _Y_ZMAX, _Y_VALID = 27, 28, 29, 30
_Y_COLS = 32

_T_V1 = 15  # 15..17
_T_E1 = 18  # v2-v1
_T_E2 = 21  # v3-v2
_T_E3 = 24  # v1-v3
_T_D0, _T_VALID = 27, 28   # d0 = dot(v1, n)
# triangle UVs + the barycentric normalizer live ONLY in the separate
# 17-col UV table (triangle_uv_table) the winner extraction pulls from;
# duplicating them here doubled the VMEM-resident triangle table
_T_COLS = 32

# family-specific UV parameter block (built only for image-texture
# scenes): one [N, 17] table per family, extracted for the winner by the
# same one-hot contraction as the attribute block, so UV math runs ONCE
# per ray post-merge instead of per candidate. Layout by family (col 16
# = family code 0/1/2/3 = sphere/rect/cylinder/triangle):
#   sphere:   (none — UV derives from the attribute block's center/radius)
#   rect:     0..2 free-axis-1 onehot, 3..5 free-axis-2 onehot,
#             6 lo0, 7 lo1, 8 1/(hi0-lo0), 9 1/(hi1-lo1)
#   cylinder: 0..8 w2o rotation rows, 9..11 w2o translation,
#             12 zmin, 13 1/(zmax-zmin)
#   triangle: 0..8 v1,v2,v3, 9 1/|cross(v2-v1,v3-v1)|,
#             10..15 uv1,uv2,uv3
_U_COLS = 17
_U_FAM = 16
_FAM_SPH, _FAM_RECT, _FAM_CYL, _FAM_TRI = 0.0, 1.0, 2.0, 3.0

# gradient-slot id (adjoint megakernel): every family table stores, in
# its (otherwise spare) last column, the table row that receives this
# primitive's radiometric adjoint — its texture row, or n_tex + its
# material row when untextured. Extracted per winner (one extra 1-col
# one-hot dot per chunk, adjoint kernel only) so the in-kernel backward
# can scatter cotangents into parameter tables by one-hot contraction.
_SLOT_COL = 31
_SLOT_SLAB = 128  # gradient-slot slab width (one lane tile)

_GOLD = np.int32(np.uint32(0x9E3779B9).astype(np.int64) - (1 << 32))
_M1 = np.int32(np.uint32(0xED5AD4BB).astype(np.int64) - (1 << 32))
_M2 = np.int32(np.uint32(0xAC4C1B51).astype(np.int64) - (1 << 32))
_M3 = np.int32(np.uint32(0x31848BAB).astype(np.int64) - (1 << 32))


def mega_supported(tables: SceneTables) -> bool:
    """Static scene-shape check: every reference scene shape is now
    supported — all four primitive families, all materials, solid /
    checker / image textures on ANY primitive's UV (the reference
    samples image textures by UV regardless of primitive,
    taichi-version/material.py:137-144; sphere UVs object.cuh:87-93,
    cylinder UVs object.cuh:282-288). Curved-primitive UVs use in-kernel
    arctan2/arccos polynomials (Mosaic has no transcendental arctan);
    the winner's UV parameters ride the same one-hot MXU extraction as
    the attribute block. Only an EMPTY scene falls back."""
    n_sph, n_rect, n_cyl, n_tri = tables.counts
    return (n_sph + n_rect + n_cyl + n_tri) > 0


def _ext_block(tables: SceneTables, mat_ids, v=None, rad=None,
               direct=1.0):
    """[N, 14] extraction block (see _X_* layout)."""
    mtype = tables.mat_type[mat_ids]
    tex = tables.mat_tex[mat_ids]
    tex_safe = jnp.maximum(tex, 0)
    ttype = tables.tex_type[tex_safe]
    is_checker = (tex >= 0) & (ttype == TEX_CHECKER)
    img = jnp.where((tex >= 0) & (ttype == TEX_IMAGE),
                    tables.tex_image[tex_safe], -1)
    from_tex = tables.tex_color[tex_safe]
    base = jnp.where((tex >= 0)[:, None], from_tex,
                     tables.mat_albedo[mat_ids])
    base = jnp.where((mtype == MAT_DIELECTRIC)[:, None],
                     jnp.ones_like(base), base)
    alb2 = tables.tex_color2[tex_safe]
    # metal fuzz and dielectric IOR are mutually exclusive: one param slot
    param = jnp.where(mtype == MAT_METAL, tables.mat_fuzz[mat_ids],
                      jnp.where(mtype == MAT_DIELECTRIC,
                                tables.mat_ior[mat_ids], 0.0))
    n = mat_ids.shape[0]
    blk = jnp.zeros((n, _X_COLS), jnp.float32)
    if v is not None:
        blk = blk.at[:, _X_V:_X_V + 3].set(v)
    if rad is not None:
        blk = blk.at[:, _X_RAD].set(rad)
    blk = blk.at[:, _X_DIRECT].set(direct)
    blk = blk.at[:, _X_MTYPE].set(mtype.astype(jnp.float32))
    blk = blk.at[:, _X_CHECKER].set(is_checker.astype(jnp.float32))
    blk = blk.at[:, _X_PARAM].set(param)
    blk = blk.at[:, _X_ALB:_X_ALB + 3].set(base)
    blk = blk.at[:, _X_ALB2:_X_ALB2 + 3].set(alb2)
    blk = blk.at[:, _X_IMG].set(img.astype(jnp.float32))
    return blk


def _slot_ids(tables: SceneTables, mat_ids) -> jnp.ndarray:
    """Per-primitive gradient-slot row (see _SLOT_COL): its texture row
    if the material samples one, else n_tex + its material row."""
    n_tex = tables.tex_color.shape[0]
    tex = tables.mat_tex[mat_ids]
    return jnp.where(tex >= 0, tex, n_tex + mat_ids).astype(jnp.float32)


def sphere_table(tables: SceneTables) -> jnp.ndarray:
    n = tables.sph_center.shape[0]
    c = tables.sph_center
    r = tables.sph_radius
    cols = jnp.zeros((n, _S_COLS), jnp.float32)
    cols = cols.at[:, :_X_COLS].set(
        _ext_block(tables, tables.sph_mat, v=c, rad=r, direct=0.0))
    cols = cols.at[:, _S_C2R].set((c * c).sum(-1) - r * r)
    cols = cols.at[:, _S_VALID].set(
        (tables.sph_obj >= 0).astype(jnp.float32))
    cols = cols.at[:, _SLOT_COL].set(_slot_ids(tables, tables.sph_mat))
    return cols


def rect_table(tables: SceneTables) -> jnp.ndarray:
    n = tables.rect_axis.shape[0]
    axis = tables.rect_axis
    rows = jnp.arange(n)
    onehot_k = jnp.zeros((n, 3), jnp.float32).at[rows, axis].set(1.0)
    f1 = jnp.where(axis == 0, 1, 0)
    f2 = jnp.where(axis == 2, 1, 2)
    oh1 = jnp.zeros((n, 3), jnp.float32).at[rows, f1].set(1.0)
    oh2 = jnp.zeros((n, 3), jnp.float32).at[rows, f2].set(1.0)
    cols = jnp.zeros((n, _R_COLS), jnp.float32)
    cols = cols.at[:, :_X_COLS].set(
        _ext_block(tables, tables.rect_mat, v=onehot_k))
    cols = cols.at[:, _R_K].set(tables.rect_k)
    cols = cols.at[:, _R_LO0].set(tables.rect_lo[:, 0])
    cols = cols.at[:, _R_LO1].set(tables.rect_lo[:, 1])
    cols = cols.at[:, _R_HI0].set(tables.rect_hi[:, 0])
    cols = cols.at[:, _R_HI1].set(tables.rect_hi[:, 1])
    cols = cols.at[:, _R_VALID].set(
        (tables.rect_obj >= 0).astype(jnp.float32))
    cols = cols.at[:, _R_F1:_R_F1 + 3].set(oh1)
    cols = cols.at[:, _R_F2:_R_F2 + 3].set(oh2)
    cols = cols.at[:, _SLOT_COL].set(_slot_ids(tables, tables.rect_mat))
    return cols


def cylinder_table(tables: SceneTables) -> jnp.ndarray:
    n = tables.cyl_radius.shape[0]
    w2o = tables.cyl_w2o
    cols = jnp.zeros((n, _Y_COLS), jnp.float32)
    cols = cols.at[:, :_X_COLS].set(_ext_block(tables, tables.cyl_mat))
    cols = cols.at[:, _Y_R:_Y_R + 9].set(w2o[:, :3, :3].reshape(n, 9))
    cols = cols.at[:, _Y_T:_Y_T + 3].set(w2o[:, :3, 3])
    cols = cols.at[:, _Y_RAD2].set(tables.cyl_radius ** 2)
    cols = cols.at[:, _Y_ZMIN].set(tables.cyl_zmin)
    cols = cols.at[:, _Y_ZMAX].set(tables.cyl_zmax)
    cols = cols.at[:, _Y_VALID].set(
        (tables.cyl_obj >= 0).astype(jnp.float32))
    cols = cols.at[:, _SLOT_COL].set(_slot_ids(tables, tables.cyl_mat))
    return cols


def triangle_table(tables: SceneTables) -> jnp.ndarray:
    n = tables.tri_v1.shape[0]
    v1, v2, v3 = tables.tri_v1, tables.tri_v2, tables.tri_v3
    n0 = tables.tri_n
    cols = jnp.zeros((n, _T_COLS), jnp.float32)
    cols = cols.at[:, :_X_COLS].set(
        _ext_block(tables, tables.tri_mat, v=n0))
    cols = cols.at[:, _T_V1:_T_V1 + 3].set(v1)
    cols = cols.at[:, _T_E1:_T_E1 + 3].set(v2 - v1)
    cols = cols.at[:, _T_E2:_T_E2 + 3].set(v3 - v2)
    cols = cols.at[:, _T_E3:_T_E3 + 3].set(v1 - v3)
    cols = cols.at[:, _T_D0].set((v1 * n0).sum(-1))
    cols = cols.at[:, _T_VALID].set(
        (tables.tri_obj >= 0).astype(jnp.float32))
    cols = cols.at[:, _SLOT_COL].set(_slot_ids(tables, tables.tri_mat))
    return cols


def _safe_inv(x):
    return jnp.where(x != 0.0, 1.0 / jnp.where(x != 0.0, x, 1.0), 0.0)


def _part1by2(x):
    """Spread 10 bits to every third bit (Morton interleave helper)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _morton3(nx, ny, nz):
    """30-bit Morton code from [0,1023]^3 integer coordinates."""
    return (_part1by2(nz) << 2) | (_part1by2(ny) << 1) | _part1by2(nx)


def sort_spheres_morton(sph_tab, chunk: int):
    """Reorder sphere-table rows along a Morton curve of their centers
    and compute tight per-chunk AABBs [K, 8] (bmin3, bmax3, pad2).

    Consecutive `chunk`-row blocks then cover compact spatial cells, so
    the kernel's per-chunk slab test can skip whole chunks for a tile of
    coherent rays. Pad rows sort to the end (key BIG) and produce empty
    (+inf/-inf) chunk boxes that never pass the slab test.

    Tie-break note: within-table exact-t ties resolve by ROW order; the
    Morton reorder can therefore pick a different winner than object
    order on measure-zero exact ties (same class of deviation as the
    BVH's first-hit-wins, accel/bvh.py docstring)."""
    c = sph_tab[:, _X_V:_X_V + 3]
    valid = sph_tab[:, _S_VALID] > 0.0
    vbig = jnp.where(valid[:, None], c, jnp.inf)
    vsmall = jnp.where(valid[:, None], c, -jnp.inf)
    lo = jnp.min(vbig, axis=0)
    hi = jnp.max(vsmall, axis=0)
    span = jnp.where(hi > lo, hi - lo, 1.0)
    q = jnp.clip(((c - lo) / span * 1023.0), 0.0, 1023.0).astype(jnp.int32)
    key = _morton3(q[:, 0], q[:, 1], q[:, 2])
    key = jnp.where(valid, key, np.int32(2 ** 30))
    order = jnp.argsort(key, stable=True)
    sph_tab = sph_tab[order]

    n = sph_tab.shape[0]
    k = n // chunk
    c = sph_tab[:, _X_V:_X_V + 3].reshape(k, chunk, 3)
    r = jnp.abs(sph_tab[:, _X_RAD]).reshape(k, chunk, 1)
    valid = (sph_tab[:, _S_VALID] > 0.0).reshape(k, chunk, 1)
    bmin = jnp.min(jnp.where(valid, c - r, jnp.inf), axis=1)
    bmax = jnp.max(jnp.where(valid, c + r, -jnp.inf), axis=1)
    bounds = jnp.concatenate(
        [bmin, bmax, jnp.zeros((k, 2), jnp.float32)], axis=1)
    return sph_tab, bounds, order


def sort_triangles_morton(tri_tab, chunk: int):
    """Morton-reorder triangle-table rows by centroid and compute tight
    per-chunk AABBs [K, 8] (bmin3, bmax3, pad2) — the triangle analogue
    of sort_spheres_morton, so tri_body can cond-skip whole chunks.

    Returns (sorted table, bounds, order); the caller must apply `order`
    to the per-triangle UV parameter table too (its rows carry v1/v2/v3
    and uv1/uv2/uv3 data, unlike the constant sphere UV rows)."""
    v1 = tri_tab[:, _T_V1:_T_V1 + 3]
    v2 = v1 + tri_tab[:, _T_E1:_T_E1 + 3]
    v3 = v2 + tri_tab[:, _T_E2:_T_E2 + 3]
    valid = tri_tab[:, _T_VALID] > 0.0
    cen = (v1 + v2 + v3) * np.float32(1.0 / 3.0)
    vbig = jnp.where(valid[:, None], cen, jnp.inf)
    vsmall = jnp.where(valid[:, None], cen, -jnp.inf)
    lo = jnp.min(vbig, axis=0)
    hi = jnp.max(vsmall, axis=0)
    span = jnp.where(hi > lo, hi - lo, 1.0)
    q = jnp.clip(((cen - lo) / span * 1023.0), 0.0, 1023.0).astype(jnp.int32)
    key = _morton3(q[:, 0], q[:, 1], q[:, 2])
    key = jnp.where(valid, key, np.int32(2 ** 30))
    order = jnp.argsort(key, stable=True)
    tri_tab = tri_tab[order]

    n = tri_tab.shape[0]
    k = n // chunk
    v1 = tri_tab[:, _T_V1:_T_V1 + 3]
    v2 = v1 + tri_tab[:, _T_E1:_T_E1 + 3]
    v3 = v2 + tri_tab[:, _T_E2:_T_E2 + 3]
    valid = (tri_tab[:, _T_VALID] > 0.0)[:, None]
    tmin = jnp.minimum(jnp.minimum(v1, v2), v3)
    tmax = jnp.maximum(jnp.maximum(v1, v2), v3)
    bmin = jnp.min(jnp.where(valid, tmin, jnp.inf).reshape(k, chunk, 3),
                   axis=1)
    bmax = jnp.max(jnp.where(valid, tmax, -jnp.inf).reshape(k, chunk, 3),
                   axis=1)
    bounds = jnp.concatenate(
        [bmin, bmax, jnp.zeros((k, 2), jnp.float32)], axis=1)
    return tri_tab, bounds, order


def sphere_uv_table(tables: SceneTables) -> jnp.ndarray:
    n = tables.sph_center.shape[0]
    cols = jnp.zeros((n, _U_COLS), jnp.float32)
    return cols.at[:, _U_FAM].set(_FAM_SPH)


def rect_uv_table(tables: SceneTables) -> jnp.ndarray:
    n = tables.rect_axis.shape[0]
    axis = tables.rect_axis
    rows = jnp.arange(n)
    f1 = jnp.where(axis == 0, 1, 0)
    f2 = jnp.where(axis == 2, 1, 2)
    oh1 = jnp.zeros((n, 3), jnp.float32).at[rows, f1].set(1.0)
    oh2 = jnp.zeros((n, 3), jnp.float32).at[rows, f2].set(1.0)
    cols = jnp.zeros((n, _U_COLS), jnp.float32)
    cols = cols.at[:, 0:3].set(oh1)
    cols = cols.at[:, 3:6].set(oh2)
    cols = cols.at[:, 6].set(tables.rect_lo[:, 0])
    cols = cols.at[:, 7].set(tables.rect_lo[:, 1])
    cols = cols.at[:, 8].set(
        _safe_inv(tables.rect_hi[:, 0] - tables.rect_lo[:, 0]))
    cols = cols.at[:, 9].set(
        _safe_inv(tables.rect_hi[:, 1] - tables.rect_lo[:, 1]))
    return cols.at[:, _U_FAM].set(_FAM_RECT)


def cylinder_uv_table(tables: SceneTables) -> jnp.ndarray:
    n = tables.cyl_radius.shape[0]
    w2o = tables.cyl_w2o
    cols = jnp.zeros((n, _U_COLS), jnp.float32)
    cols = cols.at[:, 0:9].set(w2o[:, :3, :3].reshape(n, 9))
    cols = cols.at[:, 9:12].set(w2o[:, :3, 3])
    cols = cols.at[:, 12].set(tables.cyl_zmin)
    cols = cols.at[:, 13].set(_safe_inv(tables.cyl_zmax - tables.cyl_zmin))
    return cols.at[:, _U_FAM].set(_FAM_CYL)


def triangle_uv_table(tables: SceneTables) -> jnp.ndarray:
    n = tables.tri_v1.shape[0]
    v1, v2, v3 = tables.tri_v1, tables.tri_v2, tables.tri_v3
    cols = jnp.zeros((n, _U_COLS), jnp.float32)
    cols = cols.at[:, 0:3].set(v1)
    cols = cols.at[:, 3:6].set(v2)
    cols = cols.at[:, 6:9].set(v3)
    area2 = jnp.linalg.norm(jnp.cross(v2 - v1, v3 - v1), axis=-1)
    cols = cols.at[:, 9].set(_safe_inv(area2))
    cols = cols.at[:, 10:12].set(tables.tri_uv1)
    cols = cols.at[:, 12:14].set(tables.tri_uv2)
    cols = cols.at[:, 14:16].set(tables.tri_uv3)
    return cols.at[:, _U_FAM].set(_FAM_TRI)


def sphere_coeff_tables(sph_tab):
    """[N,16] MXU coefficient rows for the sphere bilinear terms.

    hb  = rd.ro - c.rd          -> [1, -cx, -cy, -cz, 0...] . feats
    ct  = |ro|^2 - 2 c.ro + c2r -> [0,0,0,0, c2r, -2cx,-2cy,-2cz, 1, 0..]
    against per-bounce ray features
    feats = [rd.ro, dx, dy, dz, 1, ox, oy, oz, |ro|^2, 0...] ([16,S,L]).
    Moves 13 of ~32 per-candidate VPU passes onto the MXU (measured ~8x
    faster than the broadcast FMAs for these terms, scripts/
    exp_mxu_feats.py); the [C,16]x[16,S,L] dot_general lowers in Mosaic
    (K=16 — the K=3 form does not)."""
    c = sph_tab[:, _X_V:_X_V + 3]
    c2r = sph_tab[:, _S_C2R]
    n = sph_tab.shape[0]
    hb = jnp.zeros((n, 16), jnp.float32)
    hb = hb.at[:, 0].set(1.0).at[:, 1:4].set(-c)
    ct = jnp.zeros((n, 16), jnp.float32)
    ct = ct.at[:, 4].set(c2r).at[:, 5:8].set(-2.0 * c).at[:, 8].set(1.0)
    return hb, ct


def nee_light_table(tables: SceneTables) -> jnp.ndarray:
    """[Lp, 32] light rows for the in-kernel NEE sampler (cfg.nee on the
    megakernel; build gated by tables.nee_kernel_ok). Layout:
      0 fam (0/1/2/3)   1 area   2-4 Le even   5-7 Le odd   8 checker?
      sphere: 9-11 center, 12 |r|
      rect:   9-11 axis onehot (= normal), 12-14 f1 onehot,
              15-17 f2 onehot, 18 lo0, 19 lo1, 20 hi0-lo0, 21 hi1-lo1,
              22 k
      cyl:    9-17 o2w rotation (row-major), 18-20 o2w translation,
              21 |r|, 22 zmin, 23 zmax-zmin
      tri:    9-11 v1, 12-14 e1 (v2-v1), 15-17 e2 (v3-v1),
              18-20 unit geometric normal
    Shared tail: 24 gradient-slot row (_slot_ids, for the adjoint's
    NEE light-cotangent scatter), 25 image-texture id (-1 when the
    emission is solid/checker), 26-31 triangle uv1/uv2/uv3 (the
    light-point UV interpolants; other families derive UV from the
    sample draw itself), 32 tape-code key (orig_pid*4 + fam — the same
    encoding as the capture code tables) so the MIS emission weight can
    match a BSDF emitter hit back to its light row in-kernel.
    Rows are per-light; same column ranges are reused across families."""
    L = tables.n_lights
    fam = jnp.asarray(tables.light_fam)[:L]
    pid = jnp.asarray(tables.light_pid)[:L]
    Lp = max(8, -(-L // 8) * 8)
    out = jnp.zeros((Lp, 33), jnp.float32)

    def fam_pick(sph, rect, cyl, tri):
        return jnp.where(fam == 0, sph,
                         jnp.where(fam == 1, rect,
                                   jnp.where(fam == 2, cyl, tri)))

    ps = jnp.clip(pid, 0, tables.sph_center.shape[0] - 1)
    pr = jnp.clip(pid, 0, tables.rect_axis.shape[0] - 1)
    pc = jnp.clip(pid, 0, tables.cyl_radius.shape[0] - 1)
    pt = jnp.clip(pid, 0, tables.tri_v1.shape[0] - 1)

    mat = fam_pick(jnp.asarray(tables.sph_mat)[ps],
                   jnp.asarray(tables.rect_mat)[pr],
                   jnp.asarray(tables.cyl_mat)[pc],
                   jnp.asarray(tables.tri_mat)[pt])
    tex = jnp.asarray(tables.mat_tex)[mat]
    texs = jnp.maximum(tex, 0)
    even = jnp.where((tex >= 0)[:, None],
                     jnp.asarray(tables.tex_color)[texs],
                     jnp.asarray(tables.mat_albedo)[mat])
    odd = jnp.asarray(tables.tex_color2)[texs]
    chk = ((tex >= 0)
           & (jnp.asarray(tables.tex_type)[texs] == TEX_CHECKER))

    r_s = jnp.abs(jnp.asarray(tables.sph_radius)[ps])
    lo = jnp.asarray(tables.rect_lo)[pr]
    hi = jnp.asarray(tables.rect_hi)[pr]
    r_c = jnp.abs(jnp.asarray(tables.cyl_radius)[pc])
    zmin = jnp.asarray(tables.cyl_zmin)[pc]
    zlen = jnp.asarray(tables.cyl_zmax)[pc] - zmin
    tv1 = jnp.asarray(tables.tri_v1)[pt]
    te1 = jnp.asarray(tables.tri_v2)[pt] - tv1
    te2 = jnp.asarray(tables.tri_v3)[pt] - tv1
    tcr = jnp.cross(te1, te2)
    area = fam_pick(4.0 * np.pi * r_s * r_s,
                    (hi[:, 0] - lo[:, 0]) * (hi[:, 1] - lo[:, 1]),
                    2.0 * np.pi * r_c * zlen,
                    0.5 * jnp.sqrt((tcr * tcr).sum(-1)))

    out = out.at[:L, 0].set(fam.astype(jnp.float32))
    out = out.at[:L, 1].set(area)
    out = out.at[:L, 2:5].set(even)
    out = out.at[:L, 5:8].set(odd)
    out = out.at[:L, 8].set(chk.astype(jnp.float32))

    ax = jnp.asarray(tables.rect_axis)[pr]
    rows3 = jnp.arange(3)[None, :]
    oh_ax = (rows3 == ax[:, None]).astype(jnp.float32)
    f1 = jnp.where(ax == 0, 1, 0)
    f2 = jnp.where(ax == 2, 1, 2)
    oh_f1 = (rows3 == f1[:, None]).astype(jnp.float32)
    oh_f2 = (rows3 == f2[:, None]).astype(jnp.float32)
    o2w = jnp.asarray(tables.cyl_o2w)[pc]

    is_s = (fam == 0)[:, None]
    is_r = (fam == 1)[:, None]
    is_c = (fam == 2)[:, None]
    is_t = (fam == 3)[:, None]
    # per-family 9..23 blocks: zeros + each family's block masked
    blk = jnp.zeros((L, 15), jnp.float32)
    blk = blk + is_s * jnp.pad(jnp.concatenate(
        [jnp.asarray(tables.sph_center)[ps], r_s[:, None]], axis=1),
        ((0, 0), (0, 11)))
    rect_blk = jnp.concatenate(
        [oh_ax, oh_f1, oh_f2, lo[:, :1], lo[:, 1:2],
         (hi - lo)[:, :1], (hi - lo)[:, 1:2],
         jnp.asarray(tables.rect_k)[pr][:, None]], axis=1)  # [L,14]
    blk = blk + is_r * jnp.pad(rect_blk, ((0, 0), (0, 1)))
    cyl_blk = jnp.concatenate(
        [o2w[:, :3, :3].reshape(L, 9), o2w[:, :3, 3],
         r_c[:, None], zmin[:, None], zlen[:, None]], axis=1)  # [L,15]
    blk = blk + is_c * cyl_blk
    tri_blk = jnp.concatenate(
        [tv1, te1, te2, jnp.asarray(tables.tri_n)[pt]], axis=1)  # [L,12]
    blk = blk + is_t * jnp.pad(tri_blk, ((0, 0), (0, 3)))
    out = out.at[:L, 9:24].set(blk)

    n_tex = tables.tex_color.shape[0]
    slot = jnp.where(tex >= 0, tex, n_tex + mat).astype(jnp.float32)
    out = out.at[:L, 24].set(slot)
    img = jnp.where(
        (tex >= 0) & (jnp.asarray(tables.tex_type)[texs] == TEX_IMAGE),
        jnp.asarray(tables.tex_image)[texs], -1).astype(jnp.float32)
    out = out.at[:L, 25].set(img)
    out = out.at[:L, 26:28].set(jnp.asarray(tables.tri_uv1)[pt]
                                * is_t.astype(jnp.float32))
    out = out.at[:L, 28:30].set(jnp.asarray(tables.tri_uv2)[pt]
                                * is_t.astype(jnp.float32))
    out = out.at[:L, 30:32].set(jnp.asarray(tables.tri_uv3)[pt]
                                * is_t.astype(jnp.float32))
    out = out.at[:L, 32].set((pid * 4 + fam).astype(jnp.float32))
    return out


def image_atlas_rows(tables: SceneTables):
    """Flatten the [Ni,TH,TW,3] atlas to 3 channel planes [Ni*TH, TWp]
    (rows = img*TH + xi; lanes padded to a 128 multiple) for the
    double-one-hot sampler."""
    ni, th, tw = tables.images.shape[:3]
    r = ni * th
    twp = -(-tw // 128) * 128
    rp = -(-r // 8) * 8
    planes = []
    for c in range(3):
        p = tables.images[..., c].reshape(r, tw)
        p = jnp.pad(p, ((0, rp - r), (0, twp - tw)))
        planes.append(p.astype(jnp.float32))
    return planes


# ---------------------------------------------------------------------------
# in-kernel RNG: bit-identical to ops/rng.py (int32 with logical shifts)
# ---------------------------------------------------------------------------


def _shr(x, n):
    return jax.lax.shift_right_logical(x, jnp.full_like(x, n))


def _tri32(x):
    x = x ^ _shr(x, 17)
    x = x * _M1
    x = x ^ _shr(x, 11)
    x = x * _M2
    x = x ^ _shr(x, 15)
    x = x * _M3
    x = x ^ _shr(x, 14)
    return x


def _fold(state, word):
    return _tri32(state + word * _GOLD)


def _key(seed, pixel, sample, bounce, purpose):
    s = _fold(seed, pixel)
    s = _fold(s, sample)
    s = _fold(s, bounce)
    s = _fold(s, purpose)
    return s


# ---- in-kernel QMC twin (ops/qmc.py, bit-identical streams): the
# Owen-scrambled Sobol' sampler in the kernel's i32-with-logical-shift
# convention. Constants re-expressed as wrapped int32 like _M1-_M3. ----


def _i32c(v):
    v = int(v)
    return np.int32(v - (1 << 32) if v >= (1 << 31) else v)


_QK = tuple(_i32c(c) for c in (0x6C50B47C, 0xB82F1E52, 0xC7AFE638,
                               0x8D22F6E6))
_QMC_DIRS = tuple(tuple(_i32c(v) for v in d) for d in qmc_mod._DIRS)
_QMC_TAG = np.int32(qmc_mod.QMC_TAG)
_QSITE_BASE = int(qmc_mod._SITE_BASE)


def _revbits(x):
    x = (_shr(x, 1) & np.int32(0x55555555)) | ((x & np.int32(0x55555555)) << 1)
    x = (_shr(x, 2) & np.int32(0x33333333)) | ((x & np.int32(0x33333333)) << 2)
    x = (_shr(x, 4) & np.int32(0x0F0F0F0F)) | ((x & np.int32(0x0F0F0F0F)) << 4)
    x = (_shr(x, 8) & np.int32(0x00FF00FF)) | ((x & np.int32(0x00FF00FF)) << 8)
    return _shr(x, 16) | (x << 16)


def _nested_scramble(x, seed):
    x = _revbits(x) + seed
    for c in _QK:
        x = x ^ (x * c)
    return _revbits(x)


def _sobol_bits(idx, dim: int):
    if dim == 0:
        return _revbits(idx)
    dirs = _QMC_DIRS[dim - 1]
    acc = jnp.zeros_like(idx)
    one = np.int32(1)
    for i in range(32):
        acc = acc ^ ((_shr(idx, i) & one) * dirs[i])
    return acc


def _uniform(seed, pixel, sample, bounce, purpose, qmc: bool = False):
    """One U[0,1) draw at a stream coordinate. `purpose` is a STATIC
    rng purpose constant; qmc=True runs the scrambled-Sobol' twin."""
    if not qmc:
        bits = _key(seed, pixel, sample, bounce,
                    jnp.full_like(pixel, purpose))
        return _shr(bits, 8).astype(jnp.float32) * np.float32(1.0 / (1 << 24))
    site, dim = qmc_mod._SITE[int(purpose)]
    sk = _key(seed, pixel, jnp.full_like(pixel, _QMC_TAG), bounce,
              jnp.full_like(pixel, _QSITE_BASE + site))
    idx = _nested_scramble(sample, _fold(sk, jnp.full_like(pixel, 1)))
    bits = _nested_scramble(_sobol_bits(idx, dim),
                            _fold(sk, jnp.full_like(pixel, 2 + dim)))
    return _shr(bits, 8).astype(jnp.float32) * np.float32(1.0 / (1 << 24))


def _unit_ball(seed, pixel, sample, bounce, qmc: bool = False):
    u1 = _uniform(seed, pixel, sample, bounce, rng_mod.SCAT_U1, qmc)
    u2 = _uniform(seed, pixel, sample, bounce, rng_mod.SCAT_U2, qmc)
    u3 = _uniform(seed, pixel, sample, bounce, rng_mod.SCAT_U3, qmc)
    # Mosaic has no cbrt primitive; exp(log(x)/3) matches to ~1 ulp
    # (statistically identical streams; images agree within sample noise)
    r = jnp.where(u1 > 0.0,
                  jnp.exp(jnp.log(jnp.maximum(u1, 1e-38))
                          * np.float32(1.0 / 3.0)),
                  0.0)
    cos_t = 1.0 - 2.0 * u2
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = np.float32(2.0 * np.pi) * u3
    return (r * sin_t * jnp.cos(phi), r * sin_t * jnp.sin(phi), r * cos_t)


# ---------------------------------------------------------------------------
# in-kernel inverse trigonometry (Mosaic has no arctan/arccos primitive)
# ---------------------------------------------------------------------------


def _atan_poly(z):
    """Minimax arctan on |z| <= 1, abs err ~1e-5 rad (well under a texel
    at the reference's 100x100 textures: 1e-5/2pi * 100 ~ 2e-4 texel)."""
    z2 = z * z
    return z * (np.float32(0.9998660)
                + z2 * (np.float32(-0.3302995)
                        + z2 * (np.float32(0.1801410)
                                + z2 * (np.float32(-0.0851330)
                                        + z2 * np.float32(0.0208351)))))


def _atan2(y, x):
    """Four-quadrant arctan via octant reduction + polynomial; finite for
    every input including (0, 0) (returns 0 / pi there — callers guard
    degenerate lanes the same way the XLA path does)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    z = jnp.minimum(ax, ay) / jnp.maximum(hi, np.float32(1e-30))
    a = _atan_poly(z)
    a = jnp.where(ay > ax, np.float32(np.pi / 2) - a, a)
    a = jnp.where(x < 0.0, np.float32(np.pi) - a, a)
    return jnp.where(y < 0.0, -a, a)


def _acos(x):
    """arccos via atan2(sqrt(1-x^2), x) — exact endpoints 0 / pi."""
    x = jnp.clip(x, -1.0, 1.0)
    return _atan2(jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x)), x)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _dotg(a, b):
    """Contract the leading (chunk) dim: a [C,X] x b [C,...] -> [X,...],
    or a [K,3]-style [C,k] x cube [k,S,L] -> [C,S,L] via _dotk. MXU at
    HIGHEST precision (bf16x3 is lossless for f32 — extraction stays
    bit-exact)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _dotk(a, cube):
    """a [C,3] x cube [3,S,L] -> [C,S,L]: the ray-x-primitive bilinear
    terms on the MXU instead of broadcast VPU multiplies."""
    return jax.lax.dot_general(
        a, cube, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _merge(carry, t, ext):
    """Fold one chunk's winner into the carry.

    t [C,S,L] candidates; ext [N_ATTR,S,L] the chunk winner's extraction
    block (+uv rows). Ties: later chunk/table wins, matching the linear
    scan's `t <= closest` acceptance (object.cuh:23-37)."""
    t_best, attrs = carry
    tmin = jnp.min(t, axis=0)                             # [S,L]
    take = (tmin < t_best) | (jnp.isfinite(tmin) & (tmin == t_best))
    return (jnp.where(take, tmin, t_best), jnp.where(take, ext, attrs))


def _chunk_winner(t, c, s, l):
    """One-hot f32 mask [C,S,L] of each ray's within-chunk winner (last
    row on exact ties — matching _last_argmin semantics)."""
    tmin = jnp.min(t, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, s, l), 0)
    idx = jnp.max(jnp.where(t == tmin, rows, -1), axis=0)
    return (rows == idx).astype(jnp.float32)


def _make_background(scal_f_ref, grad_bg: bool):
    bg_r = scal_f_ref[0, 0]
    bg_g = scal_f_ref[0, 1]
    bg_b = scal_f_ref[0, 2]

    def background(dx, dy, dz):
        if not grad_bg:
            return bg_r, bg_g, bg_b
        inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        t = 0.5 * (dy * inv + 1.0)
        return ((1.0 - t) + t * 0.5, (1.0 - t) + t * 0.7, jnp.ones_like(t))

    return background


def _make_do_bounce(seed, pix, background,
                    sph_ref, rect_ref, cyl_ref, tri_ref,
                    sbnd_ref, tbnd_ref, hbco_ref, ctco_ref,
                    suv_ref, ruv_ref, yuv_ref, tuv_ref,
                    atr_ref, atg_ref, atb_ref, *,
                    ns: int, nr: int, ny_: int, nt: int,
                    s_chunk: int, r_chunk: int, y_chunk: int, t_chunk: int,
                    t_min: float, p_rr: float,
                    has_img: bool, img_th: int, img_tw: int,
                    cull: bool = False, cull_t: bool = False,
                    mxu: bool = False,
                    adjoint: bool = False, n_slots: int = 0,
                    Lrgb=None, grgb=None, grad_bg: bool = False,
                    capture: bool = False, code_refs=None,
                    nee: bool = False, nee_ref=None, n_lights: int = 0,
                    nee_img: bool = False, mis: bool = False,
                    nee_glossy: bool = False,
                    qmc: bool = False):
    """Build the per-bounce closure shared by both kernel drivers.

    capture=True (the in-kernel tape capture, diff/tape.py): each family
    appends its winner-code column (orig_pid*4 + family, exact in f32 up
    to 4M primitives) to the one-hot extraction — code_refs = per-family
    [N,1] tables — and do_bounce additionally returns the bounce's
    int32 tape code (ptype << TAPE_SHIFT | pid, -1 on miss).

    adjoint=True turns the bounce into the BACKWARD bounce of the
    path-replay VJP (diff/replay.py suffix identity): the forward math
    is replayed verbatim (bit-identical RNG streams), and additionally
    each bounce's radiometric cotangents are accumulated into parameter
    -table gradients by a one-hot contraction over `n_slots` gradient
    slots (textures then materials then background — see _SLOT_COL).
    Lrgb/grgb are the per-lane radiance L and loss cotangent g [S,L]x3;
    st gains (accA [3-row slabs], accA2, bg 3-scalar) carry entries.

    `bounce` and `sample` are per-lane i32 vectors (pix.shape): the
    segmented driver (_mega_kernel) broadcasts its scalar loop counter,
    while the regeneration driver (_regen_kernel) carries genuinely
    divergent per-lane counters — each lane advances through its own
    (sample, bounce) RNG stream coordinates independently."""
    s, l = pix.shape

    def _shadow_occluded(sx, sy, sz, wx, wy, wz, need):
        """Any-hit over every family's chunks for the NEE shadow
        segment t in (t_min, 0.999) of (s + t*w) — the in-kernel twin
        of ops/intersect.occluded. Chunk AABBs cond-skip like the main
        pass (the segment-bounded slab test prunes hard)."""
        t_hi = np.float32(1.0 - 1e-3)
        a_s = wx * wx + wy * wy + wz * wz
        rd_ro = wx * sx + wy * sy + wz * sz
        ro_sq = sx * sx + sy * sy + sz * sz
        inv_a = 1.0 / jnp.maximum(a_s, np.float32(1e-20))

        def col3(blk, j):
            return blk[:, j:j + 1].reshape(-1, 1, 1)

        def box_visible(bnd_ref, k, occ):
            bounds = [bnd_ref[k, j] for j in range(6)]

            def axis_slab(o_c, d_c, lo_s, hi_s):
                d_ok = d_c != 0.0
                inv = 1.0 / jnp.where(d_ok, d_c, 1.0)
                near = (lo_s - o_c) * inv
                far = (hi_s - o_c) * inv
                near, far = jnp.minimum(near, far), jnp.maximum(near, far)
                inside = (o_c >= lo_s) & (o_c <= hi_s)
                big = np.float32(3.0e38)
                near = jnp.where(d_ok, near, jnp.where(inside, -big, big))
                far = jnp.where(d_ok, far, jnp.where(inside, big, -big))
                return near, far

            n1, f1 = axis_slab(sx, wx, bounds[0], bounds[3])
            n2, f2 = axis_slab(sy, wy, bounds[1], bounds[4])
            n3, f3 = axis_slab(sz, wz, bounds[2], bounds[5])
            tn = jnp.maximum(jnp.maximum(n1, n2), n3)
            tf = jnp.minimum(jnp.minimum(f1, f2), f3)
            hit_box = (need & (occ <= 0.0)
                       & (tf >= jnp.maximum(tn, t_min))
                       & (tn <= t_hi))
            nonempty = bounds[0] <= bounds[3]
            return nonempty & (jnp.max(jnp.where(hit_box, 1.0, 0.0))
                               > 0.0)

        def sph_shadow_math(k, occ):
            sl = pl.ds(k * s_chunk, s_chunk)
            blk = sph_ref[sl, :]
            cx = col3(blk, _X_V)
            cy = col3(blk, _X_V + 1)
            cz = col3(blk, _X_V + 2)
            hb = rd_ro - (cx * wx + cy * wy + cz * wz)
            c_term = (ro_sq - 2.0 * (cx * sx + cy * sy + cz * sz)
                      + col3(blk, _S_C2R))
            disc = hb * hb - a_s * c_term
            sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
            r1 = (-hb - sqrtd) * inv_a
            r2 = (-hb + sqrtd) * inv_a
            ok = ((disc >= 0.0) & (col3(blk, _S_VALID) > 0.0)
                  & (((r1 >= t_min) & (r1 <= t_hi))
                     | ((r2 >= t_min) & (r2 <= t_hi))))
            return jnp.maximum(occ, jnp.max(jnp.where(ok, 1.0, 0.0), axis=0))

        def rect_shadow(k, occ):
            sl = pl.ds(k * r_chunk, r_chunk)
            blk = rect_ref[sl, :]

            def odot(j, vx, vy, vz):
                return (col3(blk, j) * vx + col3(blk, j + 1) * vy
                        + col3(blk, j + 2) * vz)

            ro_k = odot(_X_V, sx, sy, sz)
            rd_k = odot(_X_V, wx, wy, wz)
            rd_ok = rd_k != 0.0
            t = (col3(blk, _R_K) - ro_k) / jnp.where(rd_ok, rd_k, 1.0)
            x = odot(_R_F1, sx, sy, sz) + t * odot(_R_F1, wx, wy, wz)
            y = odot(_R_F2, sx, sy, sz) + t * odot(_R_F2, wx, wy, wz)
            ok = (rd_ok & (t >= t_min) & (t <= t_hi)
                  & (x >= col3(blk, _R_LO0)) & (x <= col3(blk, _R_HI0))
                  & (y >= col3(blk, _R_LO1)) & (y <= col3(blk, _R_HI1))
                  & (col3(blk, _R_VALID) > 0.0))
            return jnp.maximum(occ, jnp.max(jnp.where(ok, 1.0, 0.0), axis=0))

        def cyl_shadow(k, occ):
            sl = pl.ds(k * y_chunk, y_chunk)
            blk = cyl_ref[sl, :]

            def odot(j, vx, vy, vz):
                return (col3(blk, j) * vx + col3(blk, j + 1) * vy
                        + col3(blk, j + 2) * vz)

            oox = odot(_Y_R, sx, sy, sz) + col3(blk, _Y_T)
            ooy = odot(_Y_R + 3, sx, sy, sz) + col3(blk, _Y_T + 1)
            ooz = odot(_Y_R + 6, sx, sy, sz) + col3(blk, _Y_T + 2)
            odx = odot(_Y_R, wx, wy, wz)
            ody = odot(_Y_R + 3, wx, wy, wz)
            odz = odot(_Y_R + 6, wx, wy, wz)
            ac = odx * odx + ody * ody
            bc = 2.0 * (odx * oox + ody * ooy)
            cc = oox * oox + ooy * ooy - col3(blk, _Y_RAD2)
            delta = bc * bc - 4.0 * ac * cc
            sq = jnp.sqrt(jnp.maximum(delta, 0.0))
            a_ok = ac != 0.0
            inv2a = 1.0 / jnp.where(a_ok, 2.0 * ac, 1.0)
            t0 = -(bc - sq) * inv2a
            t1 = -(bc + sq) * inv2a
            t0, t1 = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
            zmin = col3(blk, _Y_ZMIN)
            zmax = col3(blk, _Y_ZMAX)
            z0 = ooz + t0 * odz
            z1 = ooz + t1 * odz
            ok0 = ((t0 >= t_min) & (t0 <= t_hi) & (z0 >= zmin)
                   & (z0 <= zmax))
            ok1 = ((t1 >= t_min) & (t1 <= t_hi) & (z1 >= zmin)
                   & (z1 <= zmax))
            ok = ((ok0 | ok1) & a_ok & (delta >= 0.0)
                  & (col3(blk, _Y_VALID) > 0.0))
            return jnp.maximum(occ, jnp.max(jnp.where(ok, 1.0, 0.0), axis=0))

        def tri_shadow(k, occ):
            sl = pl.ds(k * t_chunk, t_chunk)
            blk = tri_ref[sl, :]

            def odot(j, vx, vy, vz):
                return (col3(blk, j) * vx + col3(blk, j + 1) * vy
                        + col3(blk, j + 2) * vz)

            oc_n = odot(_X_V, sx, sy, sz) - col3(blk, _T_D0)
            sign = jnp.where(oc_n < 0.0, -1.0, 1.0)
            d_n = odot(_X_V, wx, wy, wz) * sign
            oc_ns = oc_n * sign
            t = -oc_ns / jnp.where(d_n != 0.0, d_n, 1.0)
            rx = sx + t * wx - col3(blk, _T_V1)
            ry = sy + t * wy - col3(blk, _T_V1 + 1)
            rz = sz + t * wz - col3(blk, _T_V1 + 2)

            def edge_dot(j, vx, vy, vz):
                ex = col3(blk, j)
                ey = col3(blk, j + 1)
                ez = col3(blk, j + 2)
                cxp = ey * vz - ez * vy
                cyp = ez * vx - ex * vz
                czp = ex * vy - ey * vx
                return (cxp * col3(blk, _X_V) + cyp * col3(blk, _X_V + 1)
                        + czp * col3(blk, _X_V + 2))

            s1 = edge_dot(_T_E1, rx, ry, rz)
            s2 = edge_dot(_T_E2, rx - col3(blk, _T_E1),
                          ry - col3(blk, _T_E1 + 1),
                          rz - col3(blk, _T_E1 + 2))
            s3 = edge_dot(_T_E3, rx + col3(blk, _T_E3),
                          ry + col3(blk, _T_E3 + 1),
                          rz + col3(blk, _T_E3 + 2))
            inside = (((s1 > 0) & (s2 > 0) & (s3 > 0))
                      | ((s1 < 0) & (s2 < 0) & (s3 < 0)))
            ok = ((d_n < 0.0) & inside & (t >= t_min) & (t <= t_hi)
                  & (col3(blk, _T_VALID) > 0.0))
            return jnp.maximum(occ, jnp.max(jnp.where(ok, 1.0, 0.0), axis=0))

        # float 0/1 occlusion carry (Mosaic mis-layouts a bool
        # fori carry against the [C,S,L] candidate masks)
        occ = jnp.zeros((s, l), jnp.float32)
        if ns:
            def sph_body(k, occ):
                if not cull:
                    return sph_shadow_math(k, occ)
                return jax.lax.cond(box_visible(sbnd_ref, k, occ),
                                    lambda o: sph_shadow_math(k, o),
                                    lambda o: o, occ)
            occ = jax.lax.fori_loop(0, ns // s_chunk, sph_body, occ)
        if nr:
            occ = jax.lax.fori_loop(0, nr // r_chunk, rect_shadow, occ)
        if ny_:
            occ = jax.lax.fori_loop(0, ny_ // y_chunk, cyl_shadow, occ)
        if nt:
            def tri_body(k, occ):
                if not cull_t:
                    return tri_shadow(k, occ)
                return jax.lax.cond(box_visible(tbnd_ref, k, occ),
                                    lambda o: tri_shadow(k, o),
                                    lambda o: o, occ)
            occ = jax.lax.fori_loop(0, nt // t_chunk, tri_body, occ)
        return occ

    def do_bounce(bounce, sample, st):
        if adjoint:
            (st, accA, accA2, accbg, accImg) = st
        (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, cr, cg, cb, alive) = st

        live = alive > 0.0
        if p_rr > 0.0:
            u_rr = _uniform(seed, pix, sample, bounce, rng_mod.RR, qmc)
            live = live & (u_rr <= p_rr)

        # ---- closest hit: ray x primitive bilinear terms as
        # [C,3]x[3,S,L] MXU contractions; the winner's 14-col attribute
        # block extracted by one [14,C]x[C,S,L] contraction against the
        # one-hot winner mask ----
        a = dx * dx + dy * dy + dz * dz
        rd_dot_ro = dx * ox + dy * oy + dz * oz
        ro_sq = ox * ox + oy * oy + oz * oz
        inv_a = 1.0 / a

        def col3(blk, j):
            return blk[:, j:j + 1].reshape(-1, 1, 1)

        n_uv = _U_COLS if has_img else 0

        want_code = capture or mis

        def _cr(fam_i):
            return code_refs[fam_i] if want_code else None

        def with_uv(ext, uv_ref, sl, exact, blk=None, cref=None):
            """Append the winner's 17-col UV parameter block (extracted
            by the same one-hot contraction) when the scene samples
            image textures; UV math itself runs post-merge, once. In
            adjoint mode also append the winner's gradient-slot row
            (_SLOT_COL); in capture mode the winner's tape-code row —
            one extra 1-col dot per chunk each."""
            if n_uv:
                ext = jnp.concatenate(
                    [ext, _dotg(uv_ref[sl, :], exact)], axis=0)
            if adjoint:
                ext = jnp.concatenate(
                    [ext, _dotg(blk[:, _SLOT_COL:_SLOT_COL + 1], exact)],
                    axis=0)
            if want_code:
                ext = jnp.concatenate(
                    [ext, _dotg(cref[sl, :], exact)], axis=0)
            return ext

        if mxu:
            # per-bounce ray features for the MXU bilinear contraction
            one = jnp.ones_like(a)
            zero = jnp.zeros_like(a)
            feats = jnp.stack(
                [rd_dot_ro, dx, dy, dz, one, ox, oy, oz, ro_sq,
                 zero, zero, zero, zero, zero, zero, zero])  # [16,S,L]

        def _sph_chunk_math(k, carry):
            sl = pl.ds(k * s_chunk, s_chunk)
            blk = sph_ref[sl, :]                           # [C, 16]
            if mxu:
                hb = jax.lax.dot_general(
                    hbco_ref[sl, :], feats, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                c_term = jax.lax.dot_general(
                    ctco_ref[sl, :], feats, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
            else:
                cx = col3(blk, _X_V)
                cy = col3(blk, _X_V + 1)
                cz = col3(blk, _X_V + 2)
                hb = rd_dot_ro - (cx * dx + cy * dy + cz * dz)
                c_term = (ro_sq - 2.0 * (cx * ox + cy * oy + cz * oz)
                          + col3(blk, _S_C2R))
            disc = hb * hb - a * c_term
            sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
            root1 = (-hb - sqrtd) * inv_a
            root2 = (-hb + sqrtd) * inv_a
            t = jnp.where(root1 >= t_min, root1,
                          jnp.where(root2 >= t_min, root2, INF))
            t = jnp.where((disc >= 0.0)
                          & (col3(blk, _S_VALID) > 0.0), t, INF)
            exact = _chunk_winner(t, s_chunk, s, l)
            ext = _dotg(blk[:, :_X_COLS], exact)           # [15,S,L] MXU
            return _merge(carry, t, with_uv(ext, suv_ref, sl, exact, blk,
                                            _cr(0)))

        def chunk_visible(bnd_ref, k, t_best_cur):
            # per-chunk slab test of every live lane against the chunk's
            # Morton-cell AABB (SMEM scalars): ~20 cheap [S,L] ops vs
            # ~30 x C ops for the candidate math — a chunk is skippable
            # when NO live lane can improve its t inside the box
            bounds = [bnd_ref[k, j] for j in range(6)]

            def axis_slab(o_c, d_c, lo_s, hi_s):
                d_ok = d_c != 0.0
                inv = 1.0 / jnp.where(d_ok, d_c, 1.0)
                near = (lo_s - o_c) * inv
                far = (hi_s - o_c) * inv
                near, far = jnp.minimum(near, far), jnp.maximum(near, far)
                inside = (o_c >= lo_s) & (o_c <= hi_s)
                big = np.float32(3.0e38)
                near = jnp.where(d_ok, near, jnp.where(inside, -big, big))
                far = jnp.where(d_ok, far, jnp.where(inside, big, -big))
                return near, far

            n1, f1 = axis_slab(ox, dx, bounds[0], bounds[3])
            n2, f2 = axis_slab(oy, dy, bounds[1], bounds[4])
            n3, f3 = axis_slab(oz, dz, bounds[2], bounds[5])
            tn = jnp.maximum(jnp.maximum(n1, n2), n3)
            tf = jnp.minimum(jnp.minimum(f1, f2), f3)
            # direction scale: slab t is in |d| units like candidate t
            box_hit = live & (tf >= jnp.maximum(tn, t_min)) \
                & (tn <= t_best_cur)
            # all-invalid chunks carry an empty (+inf,-inf) box, which
            # the near/far swap above would flip to (-inf,+inf) and
            # always pass — gate on the box being nonempty so padded
            # tail chunks actually cond-skip
            nonempty = bounds[0] <= bounds[3]
            return nonempty & (jnp.max(jnp.where(box_hit, 1.0, 0.0))
                               > 0.0)

        def sph_body(k, carry):
            if not cull:
                return _sph_chunk_math(k, carry)
            return jax.lax.cond(chunk_visible(sbnd_ref, k, carry[0]),
                                lambda c: _sph_chunk_math(k, c),
                                lambda c: c, carry)

        def rect_body(k, carry):
            sl = pl.ds(k * r_chunk, r_chunk)
            blk = rect_ref[sl, :]

            def odot(j, vx, vy, vz):
                return (col3(blk, j) * vx + col3(blk, j + 1) * vy
                        + col3(blk, j + 2) * vz)

            ro_k = odot(_X_V, ox, oy, oz)
            rd_k = odot(_X_V, dx, dy, dz)
            rd_ok = rd_k != 0.0
            t = (col3(blk, _R_K) - ro_k) / jnp.where(rd_ok, rd_k, 1.0)
            x = odot(_R_F1, ox, oy, oz) + t * odot(_R_F1, dx, dy, dz)
            y = odot(_R_F2, ox, oy, oz) + t * odot(_R_F2, dx, dy, dz)
            valid = (rd_ok & (t >= t_min)
                     & (x >= col3(blk, _R_LO0)) & (x <= col3(blk, _R_HI0))
                     & (y >= col3(blk, _R_LO1)) & (y <= col3(blk, _R_HI1))
                     & (col3(blk, _R_VALID) > 0.0))
            t = jnp.where(valid, t, INF)
            exact = _chunk_winner(t, r_chunk, s, l)
            ext = _dotg(blk[:, :_X_COLS], exact)
            return _merge(carry, t, with_uv(ext, ruv_ref, sl, exact, blk,
                                            _cr(1)))

        def cyl_body(k, carry):
            sl = pl.ds(k * y_chunk, y_chunk)
            blk = cyl_ref[sl, :]

            def odot(j, vx, vy, vz):
                return (col3(blk, j) * vx + col3(blk, j + 1) * vy
                        + col3(blk, j + 2) * vz)

            # object-space ray via the w2o rows (object.cuh:235-238)
            oox = odot(_Y_R, ox, oy, oz) + col3(blk, _Y_T)
            ooy = odot(_Y_R + 3, ox, oy, oz) + col3(blk, _Y_T + 1)
            ooz = odot(_Y_R + 6, ox, oy, oz) + col3(blk, _Y_T + 2)
            odx = odot(_Y_R, dx, dy, dz)
            ody = odot(_Y_R + 3, dx, dy, dz)
            odz = odot(_Y_R + 6, dx, dy, dz)

            ac = odx * odx + ody * ody
            bc = 2.0 * (odx * oox + ody * ooy)
            cc = oox * oox + ooy * ooy - col3(blk, _Y_RAD2)
            delta = bc * bc - 4.0 * ac * cc
            sq = jnp.sqrt(jnp.maximum(delta, 0.0))
            a_ok = ac != 0.0
            inv2a = 1.0 / jnp.where(a_ok, 2.0 * ac, 1.0)
            t0 = -(bc - sq) * inv2a
            t1 = -(bc + sq) * inv2a
            t0, t1 = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
            zmin = col3(blk, _Y_ZMIN)
            zmax = col3(blk, _Y_ZMAX)
            z0 = ooz + t0 * odz
            z1 = ooz + t1 * odz
            ok0 = (t0 >= t_min) & (z0 >= zmin) & (z0 <= zmax) & a_ok
            ok1 = (t1 >= t_min) & (z1 >= zmin) & (z1 <= zmax) & a_ok
            t = jnp.where(ok0, t0, jnp.where(ok1, t1, INF))
            t = jnp.where((delta >= 0.0)
                          & (col3(blk, _Y_VALID) > 0.0), t, INF)

            # per-candidate world normal: object radial through R^T
            # (apply_normal with minv = w2o, vec3.cuh:376-381)
            t_c = jnp.where(jnp.isfinite(t), t, 0.0)
            opx = oox + t_c * odx
            opy = ooy + t_c * ody
            ln2 = opx * opx + opy * opy
            inv_ln = jax.lax.rsqrt(jnp.where(ln2 > 0.0, ln2, 1.0))
            nox = opx * inv_ln
            noy = opy * inv_ln
            nx = (col3(blk, _Y_R) * nox + col3(blk, _Y_R + 3) * noy)
            nyv = (col3(blk, _Y_R + 1) * nox + col3(blk, _Y_R + 4) * noy)
            nz = (col3(blk, _Y_R + 2) * nox + col3(blk, _Y_R + 5) * noy)

            exact = _chunk_winner(t, y_chunk, s, l)
            ext = _dotg(blk[:, :_X_COLS], exact)
            # overwrite v0..v2 rows with the masked-reduced normal
            nw = jnp.stack([jnp.sum(exact * nx, axis=0),
                            jnp.sum(exact * nyv, axis=0),
                            jnp.sum(exact * nz, axis=0)])
            ext = jnp.concatenate([nw, ext[3:]], axis=0)
            return _merge(carry, t, with_uv(ext, yuv_ref, sl, exact, blk,
                                            _cr(2)))

        def _tri_chunk_math(k, carry):
            sl = pl.ds(k * t_chunk, t_chunk)
            blk = tri_ref[sl, :]

            def odot(j, vx, vy, vz):
                return (col3(blk, j) * vx + col3(blk, j + 1) * vy
                        + col3(blk, j + 2) * vz)

            oc_n = odot(_X_V, ox, oy, oz) - col3(blk, _T_D0)
            sign = jnp.where(oc_n < 0.0, -1.0, 1.0)
            d_n = odot(_X_V, dx, dy, dz) * sign
            oc_ns = oc_n * sign
            t = -oc_ns / jnp.where(d_n != 0.0, d_n, 1.0)
            # r - v1, with r = o + t*d (hittable.py:56-71 inside test)
            rx = ox + t * dx - col3(blk, _T_V1)
            ry = oy + t * dy - col3(blk, _T_V1 + 1)
            rz = oz + t * dz - col3(blk, _T_V1 + 2)

            def edge_dot(j, wx, wy, wz):
                ex = col3(blk, j)
                ey = col3(blk, j + 1)
                ez = col3(blk, j + 2)
                cxp = ey * wz - ez * wy
                cyp = ez * wx - ex * wz
                czp = ex * wy - ey * wx
                return (cxp * col3(blk, _X_V) + cyp * col3(blk, _X_V + 1)
                        + czp * col3(blk, _X_V + 2))

            s1 = edge_dot(_T_E1, rx, ry, rz)
            s2 = edge_dot(_T_E2, rx - col3(blk, _T_E1),
                          ry - col3(blk, _T_E1 + 1),
                          rz - col3(blk, _T_E1 + 2))
            s3 = edge_dot(_T_E3, rx + col3(blk, _T_E3),
                          ry + col3(blk, _T_E3 + 1),
                          rz + col3(blk, _T_E3 + 2))
            inside = (((s1 > 0) & (s2 > 0) & (s3 > 0))
                      | ((s1 < 0) & (s2 < 0) & (s3 < 0)))
            valid = ((d_n < 0.0) & inside & (t >= t_min)
                     & (col3(blk, _T_VALID) > 0.0))
            t = jnp.where(valid, t, INF)
            exact = _chunk_winner(t, t_chunk, s, l)
            ext = _dotg(blk[:, :_X_COLS], exact)
            return _merge(carry, t, with_uv(ext, tuv_ref, sl, exact, blk,
                                            _cr(3)))

        def tri_body(k, carry):
            if not cull_t:
                return _tri_chunk_math(k, carry)
            return jax.lax.cond(chunk_visible(tbnd_ref, k, carry[0]),
                                lambda c: _tri_chunk_math(k, c),
                                lambda c: c, carry)

        n_attr = (_X_COLS + n_uv + (1 if adjoint else 0)
                  + (1 if (capture or mis) else 0))
        carry = (jnp.full((s, l), INF, jnp.float32),
                 jnp.zeros((n_attr, s, l), jnp.float32))
        if ns:
            carry = jax.lax.fori_loop(0, ns // s_chunk, sph_body, carry)
        if nr:
            carry = jax.lax.fori_loop(0, nr // r_chunk, rect_body, carry)
        if ny_:
            carry = jax.lax.fori_loop(0, ny_ // y_chunk, cyl_body, carry)
        if nt:
            carry = jax.lax.fori_loop(0, nt // t_chunk, tri_body, carry)
        t_best, attrs = carry

        v0, v1_, v2, v3 = attrs[0], attrs[1], attrs[2], attrs[3]
        direct = attrs[_X_DIRECT] > 0.0
        w_mtype = attrs[_X_MTYPE]
        w_checker = attrs[_X_CHECKER]
        w_param = attrs[_X_PARAM]
        w_ar, w_ag, w_ab = attrs[_X_ALB], attrs[_X_ALB + 1], attrs[_X_ALB + 2]
        w_a2r, w_a2g, w_a2b = (attrs[_X_ALB2], attrs[_X_ALB2 + 1],
                               attrs[_X_ALB2 + 2])

        hit = jnp.isfinite(t_best)
        t_safe = jnp.where(hit, t_best, 1.0)
        px_ = ox + t_safe * dx
        py_ = oy + t_safe * dy
        pz_ = oz + t_safe * dz

        # outward normal: direct (rect/cyl/tri) or (p - center)/radius
        # (sphere; NEGATIVE radii flip inward — hollow glass,
        # main.cu:149-150)
        inv_rad = 1.0 / jnp.where(v3 == 0.0, 1.0, v3)
        nx = jnp.where(direct, v0, (px_ - v0) * inv_rad)
        ny2 = jnp.where(direct, v1_, (py_ - v1_) * inv_rad)
        nz = jnp.where(direct, v2, (pz_ - v2) * inv_rad)

        # set_face_normal (hittable.cuh:16-23)
        d_dot_n = dx * nx + dy * ny2 + dz * nz
        front = d_dot_n < 0.0
        sgn = jnp.where(front, 1.0, -1.0)
        nx, ny2, nz = nx * sgn, ny2 * sgn, nz * sgn

        # checker texture (texture.cuh:44-52)
        sines = (jnp.sin(10.0 * px_) * jnp.sin(10.0 * py_)
                 * jnp.sin(10.0 * pz_))
        use2 = (w_checker > 0.0) & (sines < 0.0)
        alb_r = jnp.where(use2, w_a2r, w_ar)
        alb_g = jnp.where(use2, w_a2g, w_ag)
        alb_b = jnp.where(use2, w_a2b, w_ab)

        if has_img:
            # ---- winner UV, computed ONCE per ray from the extracted
            # 17-col UV parameter block (see _U_COLS layout) ----
            uvp = attrs[_X_COLS:_X_COLS + _U_COLS]
            fam = uvp[_U_FAM]

            # sphere (object.cuh:87-93): unit offset from center
            sox = (px_ - v0) * inv_rad
            soy = (py_ - v1_) * inv_rad
            soz = (pz_ - v2) * inv_rad
            az_deg = (soz == 0.0) & (sox == 0.0)
            s_phi = _atan2(-soz, jnp.where(az_deg, 1.0, sox)) \
                + np.float32(np.pi)
            s_u = s_phi * np.float32(1.0 / (2.0 * np.pi))
            s_v = _acos(-soy) * np.float32(1.0 / np.pi)

            # rect (object.cuh:105-197): normalized free-axis coords
            r_x = uvp[0] * px_ + uvp[1] * py_ + uvp[2] * pz_
            r_y = uvp[3] * px_ + uvp[4] * py_ + uvp[5] * pz_
            r_u = (r_x - uvp[6]) * uvp[8]
            r_v = (r_y - uvp[7]) * uvp[9]

            # cylinder (object.cuh:282-288): object-space hit via w2o
            c_px = uvp[0] * px_ + uvp[1] * py_ + uvp[2] * pz_ + uvp[9]
            c_py = uvp[3] * px_ + uvp[4] * py_ + uvp[5] * pz_ + uvp[10]
            c_pz = uvp[6] * px_ + uvp[7] * py_ + uvp[8] * pz_ + uvp[11]
            c_deg = (c_py == 0.0) & (c_px == 0.0)
            c_phi = _atan2(c_py, jnp.where(c_deg, 1.0, c_px)) \
                + np.float32(2.0 * np.pi)
            c_u = c_phi * np.float32(1.0 / (4.0 * np.pi))
            c_v = (c_pz - uvp[12]) * uvp[13]

            # triangle: standard barycentric interp (the XLA
            # _attributes form; Taichi's swapped-weight quirk not
            # replicated, ops/intersect.py:443-447)
            def tri_l(jx, jy, jz):
                ax_ = uvp[jx] - px_
                ay_ = uvp[jy] - py_
                az_ = uvp[jz] - pz_
                return ax_, ay_, az_

            a1x, a1y, a1z = tri_l(3, 4, 5)   # v2 - p
            a2x, a2y, a2z = tri_l(6, 7, 8)   # v3 - p
            a3x, a3y, a3z = tri_l(0, 1, 2)   # v1 - p
            cx1 = a1y * a2z - a1z * a2y
            cy1 = a1z * a2x - a1x * a2z
            cz1 = a1x * a2y - a1y * a2x
            l1 = jnp.sqrt(cx1 * cx1 + cy1 * cy1 + cz1 * cz1) * uvp[9]
            cx2 = a2y * a3z - a2z * a3y
            cy2 = a2z * a3x - a2x * a3z
            cz2 = a2x * a3y - a2y * a3x
            l2 = jnp.sqrt(cx2 * cx2 + cy2 * cy2 + cz2 * cz2) * uvp[9]
            l3 = jnp.maximum(0.0, 1.0 - l1 - l2)
            t_u = uvp[10] * l1 + uvp[12] * l2 + uvp[14] * l3
            t_v = uvp[11] * l1 + uvp[13] * l2 + uvp[15] * l3

            u_w = jnp.where(fam == _FAM_SPH, s_u,
                            jnp.where(fam == _FAM_RECT, r_u,
                                      jnp.where(fam == _FAM_CYL, c_u,
                                                t_u)))
            v_w = jnp.where(fam == _FAM_SPH, s_v,
                            jnp.where(fam == _FAM_RECT, r_v,
                                      jnp.where(fam == _FAM_CYL, c_v,
                                                t_v)))

            # image texture via double one-hot contraction: no gathers.
            # out = sum_r sum_c OHx[r]*A[r,c]*OHy[c]; rows = img*TH+xi
            # (taichi material.py:137-144 texel addressing: u -> dim0)
            w_img = attrs[_X_IMG]
            has = w_img >= 0.0
            xi = jnp.clip(((u_w - jnp.floor(u_w)) * img_th), 0.0,
                          img_th - 1.0).astype(jnp.int32)
            yi = jnp.clip(((v_w - jnp.floor(v_w)) * img_tw), 0.0,
                          img_tw - 1.0).astype(jnp.int32)
            row = jnp.where(has, w_img.astype(jnp.int32) * img_th + xi,
                            -1)
            n_rows = atr_ref.shape[0]
            n_cols = atr_ref.shape[1]
            rids = jax.lax.broadcasted_iota(
                jnp.int32, (n_rows, s, l), 0)
            ohx = (rids == row).astype(jnp.float32)        # [R,S,L]
            cids = jax.lax.broadcasted_iota(
                jnp.int32, (n_cols, s, l), 0)
            ohy = (cids == yi).astype(jnp.float32)         # [TWp,S,L]

            def tex_sample(at_ref):
                b_ = _dotg(at_ref[...], ohx)               # [TWp,S,L]
                return jnp.sum(b_ * ohy, axis=0)

            alb_r = jnp.where(has, tex_sample(atr_ref), alb_r)
            alb_g = jnp.where(has, tex_sample(atg_ref), alb_g)
            alb_b = jnp.where(has, tex_sample(atb_ref), alb_b)

        mtype = w_mtype  # float codes
        is_lam = mtype == MAT_LAMBERTIAN
        is_met = mtype == MAT_METAL
        is_die = mtype == MAT_DIELECTRIC
        is_light = mtype == MAT_DIFFUSE_LIGHT

        # ---- scatter ----
        bx, by, bz = _unit_ball(seed, pix, sample, bounce, qmc)

        lam_x = nx + bx
        lam_y = ny2 + by
        lam_z = nz + bz
        degen = ((jnp.abs(lam_x) < 1e-8) & (jnp.abs(lam_y) < 1e-8)
                 & (jnp.abs(lam_z) < 1e-8))
        lam_x = jnp.where(degen, nx, lam_x)
        lam_y = jnp.where(degen, ny2, lam_y)
        lam_z = jnp.where(degen, nz, lam_z)

        inv_len = jax.lax.rsqrt(a)
        ux, uy, uz = dx * inv_len, dy * inv_len, dz * inv_len
        u_dot_n = ux * nx + uy * ny2 + uz * nz
        ref_x = ux - 2.0 * u_dot_n * nx
        ref_y = uy - 2.0 * u_dot_n * ny2
        ref_z = uz - 2.0 * u_dot_n * nz
        fuzz = w_param
        met_x = ref_x + fuzz * bx
        met_y = ref_y + fuzz * by
        met_z = ref_z + fuzz * bz
        met_ok = (met_x * nx + met_y * ny2 + met_z * nz) > 0.0

        ior = w_param
        ratio = jnp.where(front, 1.0 / jnp.where(ior == 0.0, 1.0, ior), ior)
        cos_theta = jnp.minimum(-u_dot_n, 1.0)
        sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
        cannot = ratio * sin_theta > 1.0
        r0 = (1.0 - ratio) / (1.0 + ratio)
        r0 = r0 * r0
        one_mc = 1.0 - cos_theta
        om2 = one_mc * one_mc
        schlick = r0 + (1.0 - r0) * om2 * om2 * one_mc
        u_refl = _uniform(seed, pix, sample, bounce,
                          rng_mod.DIEL_REFL, qmc)
        choose_ref = cannot | (schlick > u_refl)
        # refract (vec3.cuh:125-131)
        rp_x = ratio * (ux + cos_theta * nx)
        rp_y = ratio * (uy + cos_theta * ny2)
        rp_z = ratio * (uz + cos_theta * nz)
        rp_l2 = rp_x * rp_x + rp_y * rp_y + rp_z * rp_z
        par = -jnp.sqrt(jnp.abs(1.0 - rp_l2))
        fr_x = rp_x + par * nx
        fr_y = rp_y + par * ny2
        fr_z = rp_z + par * nz
        die_x = jnp.where(choose_ref, ref_x, fr_x)
        die_y = jnp.where(choose_ref, ref_y, fr_y)
        die_z = jnp.where(choose_ref, ref_z, fr_z)

        new_dx = jnp.where(is_lam, lam_x, jnp.where(is_met, met_x, die_x))
        new_dy = jnp.where(is_lam, lam_y, jnp.where(is_met, met_y, die_y))
        new_dz = jnp.where(is_lam, lam_z, jnp.where(is_met, met_z, die_z))
        att_r = jnp.where(is_die, 1.0, alb_r)
        att_g = jnp.where(is_die, 1.0, alb_g)
        att_b = jnp.where(is_die, 1.0, alb_b)
        sc_ok = (is_met & met_ok) | (~is_met & ~is_light)

        bgr, bgg, bgb = background(dx, dy, dz)

        scattered = live & hit & sc_ok
        emitter = live & hit & ~sc_ok & is_light
        missed = live & ~hit

        em_scale = jnp.where(is_light & (scattered | emitter), 1.0, 0.0)
        if nee and mis:
            # balance-heuristic weight on the BSDF-sampled emission hit
            # (integrator._bounce twin): alive = 2.0 + p_prev encodes
            # the previous diffuse draw's solid-angle density; the hit
            # emitter's light row is matched by its tape code (light
            # table col 32) to fetch the area p_nee needs
            ci_m = attrs[n_attr - 1]
            ltab = nee_ref[...]
            oh_m = (ltab[:, 32][:, None, None]
                    == ci_m[None, :, :]).astype(jnp.float32)
            area_h = jnp.sum(ltab[:, 1][:, None, None] * oh_m, axis=0)
            vx_ = px_ - ox
            vy_ = py_ - oy
            vz_ = pz_ - oz
            d2h = jnp.maximum(vx_ * vx_ + vy_ * vy_ + vz_ * vz_,
                              np.float32(1e-8))
            cos_lh = jnp.abs(nx * vx_ + ny2 * vy_ + nz * vz_) \
                / jnp.sqrt(d2h)
            p_nh = d2h / (jnp.maximum(area_h * np.float32(n_lights),
                                      np.float32(1e-8))
                          * jnp.maximum(cos_lh, np.float32(1e-6)))
            p_prev = jnp.maximum(alive - 2.0, 0.0)
            w_bh = jnp.where(p_prev > 0.0,
                             p_prev / (p_prev + p_nh + np.float32(1e-20)),
                             1.0)
            em_scale = em_scale * w_bh
        elif nee:
            # emission reached THROUGH a diffuse bounce was already
            # counted by that bounce's light sample (the 0.5 alive
            # encoding set below; integrator.py _bounce twin semantics)
            prev_d = alive == 0.5
            em_scale = jnp.where(prev_d, 0.0, em_scale)
        cr = cr + tpr * (em_scale * alb_r + jnp.where(missed, bgr, 0.0))
        cg = cg + tpg * (em_scale * alb_g + jnp.where(missed, bgg, 0.0))
        cb = cb + tpb * (em_scale * alb_b + jnp.where(missed, bgb, 0.0))

        if nee:
            # ---- in-kernel next-event estimation (integrator.py
            # _nee_direct twin, bit-identical RNG): area-sample one
            # light, shadow-test it against every family's chunks, add
            # the direct term for lambertian winners ----
            lam_lane = scattered & is_lam
            if nee_glossy:
                # fuzzy metal joins the light sampler (cfg.nee_glossy)
                lam_lane = lam_lane | (scattered & is_met
                                       & (fuzz > 0.0))
            u_pick = _uniform(seed, pix, sample, bounce,
                              rng_mod.NEE_PICK, qmc)
            u1 = _uniform(seed, pix, sample, bounce, rng_mod.NEE_U1, qmc)
            u2 = _uniform(seed, pix, sample, bounce, rng_mod.NEE_U2, qmc)
            li = jnp.minimum((u_pick * n_lights).astype(jnp.int32),
                             n_lights - 1)
            lp_rows = nee_ref.shape[0]
            lrow = jax.lax.broadcasted_iota(jnp.int32, (lp_rows, s, l), 0)
            oh_l = (lrow == li[None]).astype(jnp.float32)
            lt = _dotg(nee_ref[...], oh_l)            # [32,S,L]

            fam_l = lt[0]
            area_l = lt[1]
            phi = np.float32(2.0 * np.pi) * u2
            cphi = jnp.cos(phi)
            sphi = jnp.sin(phi)
            # sphere sample
            zs = 1.0 - 2.0 * u1
            sts = jnp.sqrt(jnp.maximum(0.0, 1.0 - zs * zs))
            nsx, nsy, nsz = sts * cphi, sts * sphi, zs
            spx = lt[9] + lt[12] * nsx
            spy = lt[10] + lt[12] * nsy
            spz = lt[11] + lt[12] * nsz
            # rect sample
            ra = lt[18] + u1 * lt[20]
            rb = lt[19] + u2 * lt[21]
            rpx2 = lt[9] * lt[22] + lt[12] * ra + lt[15] * rb
            rpy2 = lt[10] * lt[22] + lt[13] * ra + lt[16] * rb
            rpz2 = lt[11] * lt[22] + lt[14] * ra + lt[17] * rb
            # cylinder sample (o2w rows 9..17, T 18..20)
            zc = lt[22] + u1 * lt[23]
            cox = lt[21] * cphi
            coy = lt[21] * sphi
            cpx = lt[9] * cox + lt[10] * coy + lt[11] * zc + lt[18]
            cpy = lt[12] * cox + lt[13] * coy + lt[14] * zc + lt[19]
            cpz = lt[15] * cox + lt[16] * coy + lt[17] * zc + lt[20]
            cnx = lt[9] * cphi + lt[10] * sphi
            cny = lt[12] * cphi + lt[13] * sphi
            cnz = lt[15] * cphi + lt[16] * sphi
            # triangle sample (v1 9-11, e1 12-14, e2 15-17, n 18-20):
            # P = v1 + b2 e1 + b3 e2, the sqrt barycentric warp —
            # integrator._nee_direct twin
            sqt = jnp.sqrt(u1)
            b2t = sqt * (1.0 - u2)
            b3t = sqt * u2
            tpx_ = lt[9] + b2t * lt[12] + b3t * lt[15]
            tpy_ = lt[10] + b2t * lt[13] + b3t * lt[16]
            tpz_ = lt[11] + b2t * lt[14] + b3t * lt[17]

            is_sl = fam_l == _FAM_SPH
            is_rl = fam_l == _FAM_RECT
            is_cl = fam_l == _FAM_CYL
            lpx = jnp.where(is_sl, spx, jnp.where(is_rl, rpx2,
                            jnp.where(is_cl, cpx, tpx_)))
            lpy = jnp.where(is_sl, spy, jnp.where(is_rl, rpy2,
                            jnp.where(is_cl, cpy, tpy_)))
            lpz = jnp.where(is_sl, spz, jnp.where(is_rl, rpz2,
                            jnp.where(is_cl, cpz, tpz_)))
            lnx = jnp.where(is_sl, nsx, jnp.where(is_rl, lt[9],
                            jnp.where(is_cl, cnx, lt[18])))
            lny = jnp.where(is_sl, nsy, jnp.where(is_rl, lt[10],
                            jnp.where(is_cl, cny, lt[19])))
            lnz = jnp.where(is_sl, nsz, jnp.where(is_rl, lt[11],
                            jnp.where(is_cl, cnz, lt[20])))

            wix = lpx - px_
            wiy = lpy - py_
            wiz = lpz - pz_
            d2l = jnp.maximum(wix * wix + wiy * wiy + wiz * wiz,
                              np.float32(1e-8))
            distl = jnp.sqrt(d2l)
            cos_s = (nx * wix + ny2 * wiy + nz * wiz) / distl
            cos_lg = jnp.abs(lnx * wix + lny * wiy + lnz * wiz) / distl

            need = lam_lane & (cos_s > 0.0)
            occ = _shadow_occluded(px_, py_, pz_, wix, wiy, wiz,
                                   need) > 0.0

            # checker lights evaluate the 3D parity at the sample point
            sin_l = (jnp.sin(10.0 * lpx) * jnp.sin(10.0 * lpy)
                     * jnp.sin(10.0 * lpz))
            use_odd = (lt[8] > 0.0) & (sin_l < 0.0)
            ler = jnp.where(use_odd, lt[5], lt[2])
            leg = jnp.where(use_odd, lt[6], lt[3])
            leb = jnp.where(use_odd, lt[7], lt[4])

            if nee_img:
                # image-textured lights: Le = atlas texel at the LIGHT
                # POINT's UV (each family's hit-UV convention, derived
                # from the sample draw itself) — the same double
                # one-hot MXU contraction as the winner texel sample.
                # Emitted only when some light row carries an image id
                # (static), so solid/checker-only scenes pay nothing.
                s_az = (nsz == 0.0) & (nsx == 0.0)
                s_ul = (_atan2(-nsz, jnp.where(s_az, 1.0, nsx))
                        + np.float32(np.pi)) \
                    * np.float32(1.0 / (2.0 * np.pi))
                s_vl = _acos(-nsy) * np.float32(1.0 / np.pi)
                c_ul = (_atan2(sphi, cphi) + np.float32(2.0 * np.pi)) \
                    * np.float32(1.0 / (4.0 * np.pi))
                b1t = 1.0 - sqt
                t_ul = b1t * lt[26] + b2t * lt[28] + b3t * lt[30]
                t_vl = b1t * lt[27] + b2t * lt[29] + b3t * lt[31]
                u_li = jnp.where(is_sl, s_ul, jnp.where(is_rl, u1,
                                 jnp.where(is_cl, c_ul, t_ul)))
                v_li = jnp.where(is_sl, s_vl, jnp.where(is_rl, u2,
                                 jnp.where(is_cl, u1, t_vl)))
                has_li = lt[25] >= 0.0
                xi_l = jnp.clip((u_li - jnp.floor(u_li)) * img_th, 0.0,
                                img_th - 1.0).astype(jnp.int32)
                yi_l = jnp.clip((v_li - jnp.floor(v_li)) * img_tw, 0.0,
                                img_tw - 1.0).astype(jnp.int32)
                row_l = jnp.where(
                    has_li, lt[25].astype(jnp.int32) * img_th + xi_l, -1)
                rids_l = jax.lax.broadcasted_iota(
                    jnp.int32, (atr_ref.shape[0], s, l), 0)
                ohx_l = (rids_l == row_l).astype(jnp.float32)
                cids_l = jax.lax.broadcasted_iota(
                    jnp.int32, (atr_ref.shape[1], s, l), 0)
                ohy_l = (cids_l == yi_l).astype(jnp.float32)

                def _ltex(at_ref):
                    b_ = _dotg(at_ref[...], ohx_l)
                    return jnp.sum(b_ * ohy_l, axis=0)

                ler = jnp.where(has_li, _ltex(atr_ref), ler)
                leg = jnp.where(has_li, _ltex(atg_ref), leg)
                leb = jnp.where(has_li, _ltex(atb_ref), leb)

            cs_ = jnp.maximum(cos_s, 0.0)
            if mis or nee_glossy:
                # balance heuristic (integrator._nee_direct twin):
                # contribution factor p_b / (p_n + p_b); glossy lanes
                # use the fuzz-ball chord density about the mirror
                # direction (integrator._glossy_pdf twin)
                p_bl = np.float32(2.0 / np.pi) * cs_ * cs_ * cs_
                if nee_glossy:
                    cosr_l = (ref_x * wix + ref_y * wiy
                              + ref_z * wiz) / distl
                    gs2 = fuzz * fuzz - (1.0 - cosr_l * cosr_l)
                    g_in = (cosr_l > 0.0) & (gs2 > 0.0) & (fuzz > 0.0)
                    gsq = jnp.sqrt(jnp.maximum(gs2, 0.0))
                    gden = (np.float32(2.0 * np.pi)
                            * jnp.maximum(fuzz, np.float32(1e-8)) ** 3)
                    p_glo = jnp.where(
                        g_in,
                        gsq * (3.0 * cosr_l * cosr_l + gs2) / gden, 0.0)
                    p_bl = jnp.where(is_met, p_glo, p_bl)
                p_nl = d2l / (jnp.maximum(
                    area_l * np.float32(n_lights), np.float32(1e-8))
                    * jnp.maximum(cos_lg, np.float32(1e-6)))
                if mis:
                    w_l = p_bl / (p_nl + p_bl + np.float32(1e-20))
                else:
                    w_l = p_bl / jnp.maximum(p_nl, np.float32(1e-20))
            else:
                w_l = (cs_ * cs_ * cs_ * cos_lg / d2l) * area_l \
                    * np.float32(2.0 * n_lights / np.pi)
            okl = jnp.where(need & ~occ, w_l, 0.0)
            cr = cr + tpr * alb_r * ler * okl
            cg = cg + tpg * alb_g * leg * okl
            cb = cb + tpb * alb_b * leb * okl

        if adjoint:
            # ---- suffix-identity cotangents (diff/replay.py):
            # scattered non-dielectric: d(g.L)/datt = g*(L - C_after)/att
            # emitter (light):          d(g.L)/dalb = g*P
            # missed:                   d(g.L)/dbg  = g*P
            # P here is tp BEFORE this bounce's update; C_after = c
            # after the contribution above. One-hot over gradient slots
            # (winner's _SLOT_COL attr) scatters into parameter rows.
            Lr_, Lg_, Lb_ = Lrgb
            gr_, gg_, gb_ = grgb
            slot = attrs[_X_COLS + n_uv].astype(jnp.int32)
            s_mask = scattered & ~is_die

            def _cot(g_, L_, C_, att_, P_):
                ok = att_ != 0.0
                catt = jnp.where(s_mask & ok,
                                 g_ * (L_ - C_)
                                 / jnp.where(ok, att_, 1.0), 0.0)
                # em_scale respects NEE's diffuse-bounce emission
                # suppression (1.0 everywhere without nee)
                return catt + jnp.where(emitter, g_ * P_ * em_scale, 0.0)

            cots = (_cot(gr_, Lr_, cr, att_r, tpr),
                    _cot(gg_, Lg_, cg, att_g, tpg),
                    _cot(gb_, Lb_, cb, att_b, tpb))
            if nee:
                # NEE direct term c += tp*alb*Le*okl sits inside
                # C_after (the suffix identity excludes it), so its two
                # radiometric factors get explicit credits:
                # (a) the WINNER's albedo slot: + g*tp*Le*okl — summed
                #     into cots so checker/texel routing below applies;
                # (b) the LIGHT's emission slot (light-table row 24):
                #     + g*tp*alb*okl, with the same checker-parity ->
                #     color2 and image -> atlas routing as any winner.
                cots = (cots[0] + gr_ * tpr * ler * okl,
                        cots[1] + gg_ * tpg * leg * okl,
                        cots[2] + gb_ * tpb * leb * okl)
                le_cots = (gr_ * tpr * alb_r * okl,
                           gg_ * tpg * alb_g * okl,
                           gb_ * tpb * alb_b * okl)
                slot_l = lt[24].astype(jnp.int32)
                l_img = has_li if nee_img else (use_odd & ~use_odd)
                l_ok = jnp.where(l_img, 0.0, 1.0)
                l_prim = jnp.where(use_odd, 0.0, 1.0) * l_ok
                l_sec = jnp.where(use_odd, 1.0, 0.0) * l_ok
                lcp = tuple(c * l_prim for c in le_cots)
                lcs = tuple(c * l_sec for c in le_cots)
                if nee_img:
                    accImg = list(accImg)
                    for i3 in range(3):
                        ci_l = le_cots[i3] * jnp.where(l_img, 1.0, 0.0)
                        d = accImg[i3]
                        for si in range(s):
                            d = d + jax.lax.dot_general(
                                ohx_l[:, si, :] * ci_l[si][None, :],
                                ohy_l[:, si, :],
                                (((1,), (1,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)
                        accImg[i3] = d
                    accImg = tuple(accImg)
            # texel-sampled winners differentiate into the ATLAS, not
            # their tex_color row (ops/materials._texture_eval picks the
            # gather for TEX_IMAGE) — exclude them from the slot scatter
            img_lane = has if has_img else (use2 & ~use2)
            slot_ok = jnp.where(img_lane, 0.0, 1.0)
            prim = jnp.where(use2, 0.0, 1.0) * slot_ok
            secf = jnp.where(use2, 1.0, 0.0) * slot_ok
            cp = tuple(c * prim for c in cots)
            cs = tuple(c * secf for c in cots)
            if has_img:
                # atlas adjoint: dA[r,c] += sum_{s,l} OHx[r]*OHy[c]*cot
                # — per-sublane-row [R,L]x[C,L] MXU dots (the transpose
                # of the forward's double-one-hot texel sample)
                imgf = jnp.where(img_lane, 1.0, 0.0)
                accImg = list(accImg)
                for i3 in range(3):
                    ci = cots[i3] * imgf
                    d = accImg[i3]
                    for si in range(s):
                        d = d + jax.lax.dot_general(
                            ohx[:, si, :] * ci[si][None, :],
                            ohy[:, si, :],
                            (((1,), (1,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
                    accImg[i3] = d
                accImg = tuple(accImg)
            # slab the one-hot contraction: a full [n_slots,S,L] mask
            # (8 MB at 1024 slots) blows scoped VMEM, and Mosaic
            # supports neither both-trailing-dim reductions nor lane
            # concats past the first 128-lane tile — so the accumulator
            # is a STATIC LIST of per-slab [128] vectors (carried
    # through the bounce loop as a pytree) and each slab reduces
            # lanes then sublanes
            nsl = n_slots // _SLOT_SLAB
            pA = [list(ch) for ch in accA]    # [3][nsl] of [SLAB]
            pA2 = [list(ch) for ch in accA2]
            for k in range(nsl):
                sid = k * _SLOT_SLAB + jax.lax.broadcasted_iota(
                    jnp.int32, (_SLOT_SLAB, s, l), 0)
                oh = (sid == slot[None]).astype(jnp.float32)

                def _red(c):
                    return jnp.sum(jnp.sum(oh * c[None], axis=2), axis=1)

                for i in range(3):
                    pA[i][k] = pA[i][k] + _red(cp[i])
                    pA2[i][k] = pA2[i][k] + _red(cs[i])
                if nee:
                    # second scatter: the sampled LIGHT's slot
                    ohl = (sid == slot_l[None]).astype(jnp.float32)

                    def _redl(c):
                        return jnp.sum(jnp.sum(ohl * c[None], axis=2),
                                       axis=1)

                    for i in range(3):
                        pA[i][k] = pA[i][k] + _redl(lcp[i])
                        pA2[i][k] = pA2[i][k] + _redl(lcs[i])
            accA = tuple(tuple(ch) for ch in pA)
            accA2 = tuple(tuple(ch) for ch in pA2)
            if not grad_bg:
                accbg = tuple(
                    a + jnp.sum(jnp.where(missed, g_, 0.0) * P_)
                    for a, g_, P_ in zip(accbg, (gr_, gg_, gb_),
                                         (tpr, tpg, tpb)))

        comp = np.float32(1.0 / p_rr) if p_rr > 0.0 else np.float32(1.0)
        tpr = jnp.where(scattered, tpr * att_r * comp, tpr)
        tpg = jnp.where(scattered, tpg * att_g * comp, tpg)
        tpb = jnp.where(scattered, tpb * att_b * comp, tpb)
        ox = jnp.where(scattered, px_, ox)
        oy = jnp.where(scattered, py_, oy)
        oz = jnp.where(scattered, pz_, oz)
        dx = jnp.where(scattered, new_dx, dx)
        dy = jnp.where(scattered, new_dy, dy)
        dz = jnp.where(scattered, new_dz, dz)
        if nee and mis:
            # encode "scattered diffuse" as alive = 2.0 + p_prev (the
            # (2/pi)cos^3 density of the draw just taken, for the next
            # bounce's emission weight); liveness tests stay > 0
            ndl = jnp.sqrt(new_dx * new_dx + new_dy * new_dy
                           + new_dz * new_dz)
            inl = 1.0 / jnp.maximum(ndl, np.float32(1e-12))
            csd = jnp.maximum(
                (nx * new_dx + ny2 * new_dy + nz * new_dz) * inl, 0.0)
            pb_next = np.float32(2.0 / np.pi) * csd * csd * csd
            sampled = is_lam
            if nee_glossy:
                cr_n = (ref_x * new_dx + ref_y * new_dy
                        + ref_z * new_dz) * inl
                ns2 = fuzz * fuzz - (1.0 - cr_n * cr_n)
                n_in = (cr_n > 0.0) & (ns2 > 0.0) & (fuzz > 0.0)
                nsq = jnp.sqrt(jnp.maximum(ns2, 0.0))
                nden = (np.float32(2.0 * np.pi)
                        * jnp.maximum(fuzz, np.float32(1e-8)) ** 3)
                p_gn = jnp.where(
                    n_in, nsq * (3.0 * cr_n * cr_n + ns2) / nden, 0.0)
                glo_s = is_met & (fuzz > 0.0)
                pb_next = jnp.where(glo_s, p_gn, pb_next)
                sampled = sampled | glo_s
            alive = jnp.where(scattered,
                              jnp.where(sampled, 2.0 + pb_next,
                                        np.float32(1.0)),
                              np.float32(0.0))
        elif nee:
            # encode "scattered via a diffuse bounce" as alive = 0.5
            # (zero state-layout ripple: every liveness test is > 0)
            sampled = is_lam
            if nee_glossy:
                sampled = sampled | (is_met & (fuzz > 0.0))
            alive = jnp.where(scattered,
                              jnp.where(sampled, np.float32(0.5),
                                        np.float32(1.0)),
                              np.float32(0.0))
        else:
            alive = scattered.astype(jnp.float32)
        out = (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, cr, cg, cb, alive)
        if adjoint:
            return (out, accA, accA2, accbg, accImg)
        if capture:
            # tape code (diff/tape.py): ptype << TAPE_SHIFT | orig pid,
            # -1 on miss. The extracted code row is orig_pid*4 + family
            # (exact in f32); decode in int32.
            # static positive index: attrs[-1] lowers via dynamic_slice,
            # which Mosaic can't lower inside a while body
            ci = attrs[n_attr - 1].astype(jnp.int32)
            code = jnp.where(
                hit,
                jax.lax.shift_left(ci & 3, jnp.full_like(ci, 24))
                | _shr(ci, 2),
                jnp.full_like(ci, -1))
            return out, code
        return out

    return do_bounce


def _mega_kernel(scal_i_ref, scal_f_ref, sph_ref, rect_ref, cyl_ref,
                 tri_ref, sbnd_ref, tbnd_ref, hbco_ref, ctco_ref,
                 suv_ref, ruv_ref, yuv_ref, tuv_ref, nee_ref,
                 atr_ref, atg_ref, atb_ref,
                 scode_ref, rcode_ref, ycode_ref, tcode_ref,
                 rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
                 tpr_ref, tpg_ref, tpb_ref, cr_ref, cg_ref, cb_ref,
                 alive_ref, pix_ref, samp_ref,
                 oox_ref, ooy_ref, ooz_ref, odx_ref, ody_ref, odz_ref,
                 otpr_ref, otpg_ref, otpb_ref, ocr_ref, ocg_ref, ocb_ref,
                 oalive_ref, *,
                 ns: int, nr: int, ny_: int, nt: int,
                 s_chunk: int, r_chunk: int, y_chunk: int, t_chunk: int,
                 max_depth: int, t_min: float,
                 p_rr: float, grad_bg: bool, exhaust_bg: bool,
                 has_img: bool, img_th: int, img_tw: int,
                 cull: bool = False, cull_t: bool = False,
                 mxu: bool = False,
                 nee: bool = False, n_lights: int = 0,
                 nee_img: bool = False, mis: bool = False,
                 nee_glossy: bool = False,
                 qmc: bool = False):
    seed = scal_i_ref[0, 0]
    start_bounce = scal_i_ref[0, 2]
    pix = pix_ref[0]
    # per-lane sample indices (scal_i slot 1 is dead in this kernel):
    # every lane can sit at a different point of its own sample stream,
    # which is what adaptive sampling's per-pixel QMC continuation needs
    samp = samp_ref[0]
    background = _make_background(scal_f_ref, grad_bg)
    do_bounce = _make_do_bounce(
        seed, pix, background, sph_ref, rect_ref, cyl_ref, tri_ref,
        sbnd_ref, tbnd_ref, hbco_ref, ctco_ref, suv_ref, ruv_ref,
        yuv_ref, tuv_ref, atr_ref, atg_ref, atb_ref,
        nee=nee, nee_ref=nee_ref, n_lights=n_lights, nee_img=nee_img,
        mis=mis, nee_glossy=nee_glossy,
        code_refs=(scode_ref, rcode_ref, ycode_ref, tcode_ref),
        ns=ns, nr=nr, ny_=ny_, nt=nt, s_chunk=s_chunk, r_chunk=r_chunk,
        y_chunk=y_chunk, t_chunk=t_chunk, t_min=t_min, p_rr=p_rr,
        has_img=has_img, img_th=img_th, img_tw=img_tw, cull=cull,
        cull_t=cull_t, mxu=mxu, qmc=qmc)

    # while_loop (supported by Mosaic): the tile EXITS the bounce loop
    # the moment every lane is dead, rather than cond-skipping each
    # remaining bounce (which still pays a scalar test + carry phi per
    # bounce) — the in-kernel equivalent of the XLA integrator's
    # early-exit wavefront loop.
    def bounce_cond(bst):
        b, st_ = bst
        return (b < max_depth) & (jnp.max(st_[-1]) > 0.0)

    def bounce_body(bst):
        b, st_ = bst
        return b + 1, do_bounce(jnp.full_like(pix, start_bounce + b),
                                samp, st_)

    st = (rox_ref[0], roy_ref[0], roz_ref[0],
          rdx_ref[0], rdy_ref[0], rdz_ref[0],
          tpr_ref[0], tpg_ref[0], tpb_ref[0],
          cr_ref[0], cg_ref[0], cb_ref[0], alive_ref[0])
    _, st = jax.lax.while_loop(bounce_cond, bounce_body,
                               (jnp.int32(0), st))
    (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, cr, cg, cb, alive) = st

    if exhaust_bg:
        # only applied by the FINAL segment of a chunked trace
        bgr, bgg, bgb = background(dx, dy, dz)
        live = alive > 0.0
        cr = cr + jnp.where(live, tpr * bgr, 0.0)
        cg = cg + jnp.where(live, tpg * bgg, 0.0)
        cb = cb + jnp.where(live, tpb * bgb, 0.0)

    oox_ref[0], ooy_ref[0], ooz_ref[0] = ox, oy, oz
    odx_ref[0], ody_ref[0], odz_ref[0] = dx, dy, dz
    otpr_ref[0], otpg_ref[0], otpb_ref[0] = tpr, tpg, tpb
    ocr_ref[0], ocg_ref[0], ocb_ref[0] = cr, cg, cb
    oalive_ref[0] = alive


def _capture_kernel(scal_i_ref, scal_f_ref, sph_ref, rect_ref, cyl_ref,
                    tri_ref, sbnd_ref, tbnd_ref, hbco_ref, ctco_ref,
                    suv_ref, ruv_ref, yuv_ref, tuv_ref,
                    scode_ref, rcode_ref, ycode_ref, tcode_ref,
                    atr_ref, atg_ref, atb_ref,
                    rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
                    pix_ref,
                    ocode_ref, odepth_ref, *,
                    ns: int, nr: int, ny_: int, nt: int,
                    s_chunk: int, r_chunk: int, y_chunk: int,
                    t_chunk: int, max_depth: int, t_min: float,
                    p_rr: float, has_img: bool, img_th: int, img_tw: int,
                    cull: bool = False, cull_t: bool = False,
                    mxu: bool = False, qmc: bool = False):
    """Tape-capture megakernel (VERDICT r2 #3): one full-path trace that
    emits, per bounce, the closest-hit winner's tape code (the integer
    diff/tape.capture_tape records with the hybrid per-bounce
    intersector) plus each lane's death count d (#bounces still alive
    AFTER the bounce — a lane does bounce b work iff d >= b), which the
    death-sorted shrinking replay uses. Radiance is not an output: the
    capture is integer-valued and non-differentiable by design."""
    seed = scal_i_ref[0, 0]
    sample = scal_i_ref[0, 1]
    start_bounce = scal_i_ref[0, 2]
    pix = pix_ref[0]

    def background(dx, dy, dz):  # capture never consumes radiance
        z = jnp.zeros_like(dx)
        return z, z, z

    do_bounce = _make_do_bounce(
        seed, pix, background, sph_ref, rect_ref, cyl_ref, tri_ref,
        sbnd_ref, tbnd_ref, hbco_ref, ctco_ref, suv_ref, ruv_ref,
        yuv_ref, tuv_ref, atr_ref, atg_ref, atb_ref,
        ns=ns, nr=nr, ny_=ny_, nt=nt, s_chunk=s_chunk, r_chunk=r_chunk,
        y_chunk=y_chunk, t_chunk=t_chunk, t_min=t_min, p_rr=p_rr,
        has_img=has_img, img_th=img_th, img_tw=img_tw, cull=cull,
        cull_t=cull_t, mxu=mxu,
        capture=True,
        code_refs=(scode_ref, rcode_ref, ycode_ref, tcode_ref), qmc=qmc)

    # codes ride the while carry as a [max_depth, 8, LANES] value updated
    # by per-bounce select (Mosaic has no dynamic-index ref store inside
    # while bodies). Dead bounces keep code -1 (the replay masks dead
    # lanes by its own alive chain, so any fill works; -1 = "miss").
    brow = jax.lax.broadcasted_iota(jnp.int32,
                                    (max_depth,) + pix.shape, 0)

    def bounce_cond(bst):
        b, st_, dep, acc = bst
        return (b < max_depth) & (jnp.max(st_[-1]) > 0.0)

    def bounce_body(bst):
        b, st_, dep, acc = bst
        st_, code = do_bounce(jnp.full_like(pix, start_bounce + b),
                              jnp.full_like(pix, sample), st_)
        acc = jnp.where(brow == b, code[None], acc)
        dep = dep + (st_[-1] > 0.0).astype(jnp.int32)
        return b + 1, st_, dep, acc

    one = jnp.ones(pix.shape, jnp.float32)
    zero = jnp.zeros(pix.shape, jnp.float32)
    st = (rox_ref[0], roy_ref[0], roz_ref[0],
          rdx_ref[0], rdy_ref[0], rdz_ref[0],
          one, one, one, zero, zero, zero, one)
    acc0 = jnp.full((max_depth,) + pix.shape, -1, jnp.int32)
    _, _, dep, acc = jax.lax.while_loop(
        bounce_cond, bounce_body,
        (jnp.int32(0), st, jnp.zeros(pix.shape, jnp.int32), acc0))
    ocode_ref[0] = acc
    odepth_ref[0] = dep


@functools.partial(
    jax.jit,
    static_argnames=("counts", "max_depth", "t_min", "p_rr", "has_img",
                     "img_th", "img_tw", "cull", "cull_t", "mxu",
                     "qmc", "interpret"))
def capture_segment(sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd,
                    sph_co, uv_tabs, code_tabs, atlas, counts,
                    ro3, rd3, pixel, sample_idx, seed,
                    max_depth: int,
                    t_min: float = 1e-3, p_rr: float = 0.0,
                    has_img: bool = False, img_th: int = 1,
                    img_tw: int = 1,
                    cull: bool = False, cull_t: bool = False,
                    mxu: bool = False, qmc: bool = False,
                    interpret: bool = False):
    """Run the capture kernel over B primary rays (B % RAY_TILE == 0).
    Returns (codes [max_depth, B] int32, death [B] int32)."""
    b = ro3[0].shape[0]
    ns, nr, ny_, nt = counts
    assert b % RAY_TILE == 0
    g = b // RAY_TILE

    def lanes(x, dtype=jnp.float32):
        return x.reshape(g, 8, LANES).astype(dtype)

    scal_i = jnp.stack([jnp.asarray(seed).astype(jnp.int32),
                        jnp.asarray(sample_idx).astype(jnp.int32),
                        jnp.zeros((), jnp.int32)]).reshape(1, 3)
    scal_f = jnp.zeros((1, 3), jnp.float32)

    kernel = functools.partial(
        _capture_kernel, ns=ns, nr=nr, ny_=ny_, nt=nt,
        s_chunk=min(max(ns, 1), SPH_CHUNK),
        r_chunk=min(max(nr, 1), AUX_CHUNK),
        y_chunk=min(max(ny_, 1), AUX_CHUNK),
        t_chunk=min(max(nt, 1), SPH_CHUNK),
        max_depth=int(max_depth), t_min=float(t_min), p_rr=float(p_rr),
        has_img=bool(has_img), img_th=int(img_th), img_tw=int(img_tw),
        cull=bool(cull), cull_t=bool(cull_t), mxu=bool(mxu),
        qmc=bool(qmc))

    ray_spec = pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    code_spec = pl.BlockSpec((1, max_depth, 8, LANES),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    codes, death = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal_i
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal_f
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rect table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cylinder table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # triangle table
            pl.BlockSpec(memory_space=pltpu.SMEM),   # sphere chunk AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),   # triangle chunk AABBs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere hb coeffs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere ct coeffs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere UV params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rect UV params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cylinder UV params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # triangle UV params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere tape codes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rect tape codes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cylinder tape codes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # triangle tape codes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # atlas R
            pl.BlockSpec(memory_space=pltpu.VMEM),   # atlas G
            pl.BlockSpec(memory_space=pltpu.VMEM),   # atlas B
        ] + [ray_spec] * 7,
        out_specs=(code_spec, ray_spec),
        out_shape=(jax.ShapeDtypeStruct((g, max_depth, 8, LANES),
                                        jnp.int32),
                   jax.ShapeDtypeStruct((g, 8, LANES), jnp.int32)),
        interpret=interpret,
    )(
        scal_i, scal_f, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd,
        sph_co[0], sph_co[1],
        uv_tabs[0], uv_tabs[1], uv_tabs[2], uv_tabs[3],
        code_tabs[0], code_tabs[1], code_tabs[2], code_tabs[3],
        atlas[0], atlas[1], atlas[2],
        lanes(ro3[0]), lanes(ro3[1]), lanes(ro3[2]),
        lanes(rd3[0]), lanes(rd3[1]), lanes(rd3[2]),
        lanes(pixel, jnp.int32),
    )
    # [g, depth, 8, LANES] -> [depth, B]
    codes = jnp.transpose(codes.reshape(g, max_depth, RAY_TILE),
                          (1, 0, 2)).reshape(max_depth, b)
    return codes, death.reshape(b)


def mega_capture(tables: SceneTables, cfg, ro, rd, pixel, sample_idx,
                 seed):
    """In-kernel tape capture: codes [max_depth, B] int32 in
    diff/tape.py's format (ptype << TAPE_SHIFT | pid; -1 = miss) plus
    each lane's death count (#bounces alive after each bounce, summed).

    Replaces capture_tape's hybrid per-bounce intersector with ONE
    megakernel launch (single segment, no compaction — codes stay in
    ray order). Codes match the host capture bit-for-bit on live lanes
    (same RNG streams, same later-wins tie-break, modulo the
    measure-zero Morton-order exact-t ties cull_chunks always had);
    post-death lanes record -1 where the host records the stale
    winner — both are masked identically by the replay.

    Pre-condition: mega_supported(tables)."""
    b = ro.shape[0]
    pad = (-b) % RAY_TILE
    if pad:
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), jnp.float32)])
        rd = jnp.concatenate(
            [rd, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0],
                                              jnp.float32), (pad, 3))])
        pixel = jnp.concatenate([pixel, jnp.zeros((pad,), pixel.dtype)])

    (tbl, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd, sph_co,
     uv_tabs, code_tabs, atlas, counts, kw) = _prep_scene(
         tables, cfg, want_codes=True)
    kw = dict(kw)
    kw.pop("grad_bg", None)
    codes, death = capture_segment(
        sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd, sph_co,
        uv_tabs, code_tabs, atlas, counts,
        (ro[:, 0], ro[:, 1], ro[:, 2]),
        (rd[:, 0], rd[:, 1], rd[:, 2]),
        pixel.astype(jnp.int32), sample_idx, seed,
        max_depth=cfg.max_depth, **kw)
    return codes[:, :b], death[:b]


def _adjoint_kernel(scal_i_ref, scal_f_ref, sph_ref, rect_ref, cyl_ref,
                    tri_ref, sbnd_ref, tbnd_ref, hbco_ref, ctco_ref,
                    suv_ref, ruv_ref, yuv_ref, tuv_ref, nee_ref,
                    atr_ref, atg_ref, atb_ref,
                    rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
                    tpr_ref, tpg_ref, tpb_ref, cr_ref, cg_ref, cb_ref,
                    alive_ref, pix_ref,
                    lr_ref, lg_ref, lb_ref, gr_ref, gg_ref, gb_ref,
                    oox_ref, ooy_ref, ooz_ref, odx_ref, ody_ref, odz_ref,
                    otpr_ref, otpg_ref, otpb_ref, ocr_ref, ocg_ref,
                    ocb_ref, oalive_ref, oacc_ref,
                    oimr_ref, oimg_ref, oimb_ref, *,
                    ns: int, nr: int, ny_: int, nt: int,
                    s_chunk: int, r_chunk: int, y_chunk: int, t_chunk: int,
                    max_depth: int, t_min: float,
                    p_rr: float, grad_bg: bool, exhaust_bg: bool,
                    has_img: bool, img_th: int, img_tw: int,
                    n_slots: int = 0,
                    cull: bool = False, cull_t: bool = False,
                    mxu: bool = False, qmc: bool = False,
                    nee: bool = False, n_lights: int = 0,
                    nee_img: bool = False):
    """The BACKWARD megakernel: _mega_kernel's bounce loop replayed with
    the adjoint accumulation enabled (see _make_do_bounce adjoint=True).
    Extra per-lane inputs: the sample's radiance L and loss cotangent g;
    extra per-tile output: the [8, n_slots] gradient block (rows 0-2 =
    primary color adjoint rgb, 3-5 = checker color2 adjoint rgb, row 6
    lanes 0-2 = constant-background adjoint). Runs inside the SAME
    segmented-compaction wrapper machinery as the forward, so dead-tile
    short-circuit and live-ray packing accelerate the backward too."""
    seed = scal_i_ref[0, 0]
    sample = scal_i_ref[0, 1]
    start_bounce = scal_i_ref[0, 2]
    pix = pix_ref[0]
    background = _make_background(scal_f_ref, grad_bg)
    do_bounce = _make_do_bounce(
        seed, pix, background, sph_ref, rect_ref, cyl_ref, tri_ref,
        sbnd_ref, tbnd_ref, hbco_ref, ctco_ref, suv_ref, ruv_ref,
        yuv_ref, tuv_ref, atr_ref, atg_ref, atb_ref,
        ns=ns, nr=nr, ny_=ny_, nt=nt, s_chunk=s_chunk, r_chunk=r_chunk,
        y_chunk=y_chunk, t_chunk=t_chunk, t_min=t_min, p_rr=p_rr,
        has_img=has_img, img_th=img_th, img_tw=img_tw, cull=cull,
        cull_t=cull_t, mxu=mxu,
        adjoint=True, n_slots=n_slots,
        nee=nee, nee_ref=nee_ref, n_lights=n_lights, nee_img=nee_img,
        Lrgb=(lr_ref[0], lg_ref[0], lb_ref[0]),
        grgb=(gr_ref[0], gg_ref[0], gb_ref[0]), grad_bg=grad_bg, qmc=qmc)

    def bounce_cond(bst):
        b, (st_, _, _, _, _) = bst
        return (b < max_depth) & (jnp.max(st_[-1]) > 0.0)

    def bounce_body(bst):
        b, st_ = bst
        return b + 1, do_bounce(jnp.full_like(pix, start_bounce + b),
                                jnp.full_like(pix, sample), st_)

    st = (rox_ref[0], roy_ref[0], roz_ref[0],
          rdx_ref[0], rdy_ref[0], rdz_ref[0],
          tpr_ref[0], tpg_ref[0], tpb_ref[0],
          cr_ref[0], cg_ref[0], cb_ref[0], alive_ref[0])
    nsl = n_slots // _SLOT_SLAB
    zvec = tuple(jnp.zeros((_SLOT_SLAB,), jnp.float32)
                 for _ in range(nsl))
    z1 = jnp.float32(0.0)
    zimg = jnp.zeros(atr_ref.shape, jnp.float32)
    carry0 = (st, (zvec, zvec, zvec), (zvec, zvec, zvec), (z1, z1, z1),
              (zimg, zimg, zimg))
    _, (st, accA, accA2, accbg, accImg) = jax.lax.while_loop(
        bounce_cond, bounce_body, (jnp.int32(0), carry0))
    (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, cr, cg, cb, alive) = st

    if exhaust_bg:
        bgr, bgg, bgb = background(dx, dy, dz)
        live = alive > 0.0
        cr = cr + jnp.where(live, tpr * bgr, 0.0)
        cg = cg + jnp.where(live, tpg * bgg, 0.0)
        cb = cb + jnp.where(live, tpb * bgb, 0.0)
        if not grad_bg:
            # exhaust-to-background credit: d(g.L)/dbg += g*P on lanes
            # still alive at depth exhaustion (replay.py exhaust_bwd)
            gs_ = (gr_ref[0], gg_ref[0], gb_ref[0])
            accbg = tuple(
                a + jnp.sum(jnp.where(live, g_, 0.0) * P_)
                for a, g_, P_ in zip(accbg, gs_, (tpr, tpg, tpb)))

    oox_ref[0], ooy_ref[0], ooz_ref[0] = ox, oy, oz
    odx_ref[0], ody_ref[0], odz_ref[0] = dx, dy, dz
    otpr_ref[0], otpg_ref[0], otpb_ref[0] = tpr, tpg, tpb
    ocr_ref[0], ocg_ref[0], ocb_ref[0] = cr, cg, cb
    oalive_ref[0] = alive

    lane = jax.lax.broadcasted_iota(jnp.int32, (_SLOT_SLAB,), 0)
    bg0 = (jnp.where(lane == 0, accbg[0], 0.0)
           + jnp.where(lane == 1, accbg[1], 0.0)
           + jnp.where(lane == 2, accbg[2], 0.0))
    oimr_ref[0], oimg_ref[0], oimb_ref[0] = accImg
    zrow = jnp.zeros((_SLOT_SLAB,), jnp.float32)
    for k in range(n_slots // _SLOT_SLAB):
        oacc_ref[0, :, pl.ds(k * _SLOT_SLAB, _SLOT_SLAB)] = jnp.stack(
            [accA[0][k], accA[1][k], accA[2][k],
             accA2[0][k], accA2[1][k], accA2[2][k],
             bg0 if k == 0 else zrow, zrow], axis=0)


def _regen_kernel(scal_i_ref, scal_f_ref, sph_ref, rect_ref, cyl_ref,
                  tri_ref, sbnd_ref, tbnd_ref, hbco_ref, ctco_ref,
                  suv_ref, ruv_ref, yuv_ref, tuv_ref,
                  atr_ref, atg_ref, atb_ref,
                  rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
                  tpr_ref, tpg_ref, tpb_ref, cr_ref, cg_ref, cb_ref,
                  alive_ref, pix_ref, py_ref, samp_ref, bvec_ref,
                  oox_ref, ooy_ref, ooz_ref, odx_ref, ody_ref, odz_ref,
                  otpr_ref, otpg_ref, otpb_ref, ocr_ref, ocg_ref, ocb_ref,
                  oalive_ref, osamp_ref, obvec_ref, *,
                  ns: int, nr: int, ny_: int, nt: int,
                  s_chunk: int, r_chunk: int, y_chunk: int, t_chunk: int,
                  max_depth: int, spp: int, init: bool,
                  width: int, height: int,
                  defocus: bool, t_min: float,
                  p_rr: float, grad_bg: bool, exhaust_bg: bool,
                  has_img: bool, img_th: int, img_tw: int,
                  cull: bool = False, cull_t: bool = False,
                  mxu: bool = False, qmc: bool = False):
    """Sample-regeneration driver: the whole spp loop lives in-kernel.

    Instead of one launch per sample with occupancy decaying over the
    bounce loop (ray-average depth on the cover scene is 1.59 against a
    max_depth of 50), every lane that terminates a path IMMEDIATELY
    starts its next sample's camera ray — per-lane (sample, bounce)
    counters key the identical RNG stream coordinates the segmented
    driver draws, so radiance sums are bit-equal to spp separate
    launches accumulated in sample order. A tile exits when its worst
    lane has exhausted all spp samples: occupancy stays ~full for the
    whole frame, there are no per-sample launch/fixed costs. Camera
    generation (pixel jitter + thin-lens defocus disk,
    ops/camera.py:18-42 / gpu-version/camera.cuh:31-39) is
    reimplemented in-kernel on the same counter RNG.

    scal_i[0,2] (seg_iters, a RUNTIME scalar so every segment budget
    shares one compiled kernel) caps the iteration count so the host
    can interleave cross-tile compaction of the death-tail
    (mega_trace_regen): full per-lane state (incl. samp/bvec RNG
    coordinates) rides in and out; resuming a capped tile is
    bit-identical to having let it run."""
    seed = scal_i_ref[0, 0]
    sample_base = scal_i_ref[0, 1]
    seg_iters = scal_i_ref[0, 2]
    pix = pix_ref[0]
    py = py_ref[0]
    background = _make_background(scal_f_ref, grad_bg)
    do_bounce = _make_do_bounce(
        seed, pix, background, sph_ref, rect_ref, cyl_ref, tri_ref,
        sbnd_ref, tbnd_ref, hbco_ref, ctco_ref, suv_ref, ruv_ref,
        yuv_ref, tuv_ref, atr_ref, atg_ref, atb_ref,
        ns=ns, nr=nr, ny_=ny_, nt=nt, s_chunk=s_chunk, r_chunk=r_chunk,
        y_chunk=y_chunk, t_chunk=t_chunk, t_min=t_min, p_rr=p_rr,
        has_img=has_img, img_th=img_th, img_tw=img_tw, cull=cull,
        cull_t=cull_t, mxu=mxu, qmc=qmc)

    # camera frame constants (SMEM scalars; layout set by mega_regen)
    c_org = (scal_f_ref[0, 3], scal_f_ref[0, 4], scal_f_ref[0, 5])
    c_ll = (scal_f_ref[0, 6], scal_f_ref[0, 7], scal_f_ref[0, 8])
    c_hor = (scal_f_ref[0, 9], scal_f_ref[0, 10], scal_f_ref[0, 11])
    c_ver = (scal_f_ref[0, 12], scal_f_ref[0, 13], scal_f_ref[0, 14])
    c_u = (scal_f_ref[0, 15], scal_f_ref[0, 16], scal_f_ref[0, 17])
    c_v = (scal_f_ref[0, 18], scal_f_ref[0, 19], scal_f_ref[0, 20])
    c_lr = scal_f_ref[0, 21]

    px_i = pix - py * width
    px_f = px_i.astype(jnp.float32)
    py_f = py.astype(jnp.float32)
    # derived from the loaded pix vector (not a scalar splat) so the
    # while_loop carry gets a CONCRETE layout: Mosaic cannot relayout a
    # body result into a replicated-splat carry init ("Invalid
    # relayout ... replicated in destination but not in source")
    zero_b = jnp.minimum(pix, 0)

    def camera_ray(samp):
        """Bit-matches ops/camera.generate_rays (same RNG draws, same
        f32 expression order per component)."""
        ru = _uniform(seed, pix, samp, zero_b, rng_mod.PIXEL_U, qmc)
        rv = _uniform(seed, pix, samp, zero_b, rng_mod.PIXEL_V, qmc)
        s_ = (px_f + ru) / np.float32(width - 1)
        t_ = (py_f + rv) / np.float32(height - 1)
        if defocus:
            u1 = _uniform(seed, pix, samp, zero_b, rng_mod.LENS_U1, qmc)
            u2 = _uniform(seed, pix, samp, zero_b, rng_mod.LENS_U2, qmc)
            r = jnp.sqrt(u1)
            phi = np.float32(2.0 * np.pi) * u2
            rl0 = c_lr * (r * jnp.cos(phi))
            rl1 = c_lr * (r * jnp.sin(phi))
            off = tuple(c_u[j] * rl0 + c_v[j] * rl1 for j in range(3))
        else:
            off = (jnp.zeros_like(s_),) * 3
        ro = tuple(c_org[j] + off[j] for j in range(3))
        rd = tuple(((c_ll[j] + s_ * c_hor[j]) + t_ * c_ver[j]
                    - c_org[j]) - off[j] for j in range(3))
        return ro + rd

    if init:
        # segment 0 initializes ON-KERNEL: sample_base's camera rays
        # from the same Mosaic-compiled camera_ray that regenerates
        # samples 1.. — bit-identical streams by construction. (A host
        # generate_rays init is the same f32 expression but XLA may
        # contract FMAs differently than Mosaic — measured ulp drift on
        # v5e that path divergence then amplifies.)
        samp0 = zero_b + sample_base
        bvec0 = zero_b
        cam0 = camera_ray(samp0)
        zf = jnp.minimum(px_f, 0.0)   # concrete-layout zeros (px_f >= 0)
        onef = zf + 1.0
        st0 = cam0 + (onef, onef, onef, zf, zf, zf, onef)
    else:
        samp0 = samp_ref[0]
        bvec0 = bvec_ref[0]
        st0 = (rox_ref[0], roy_ref[0], roz_ref[0],
               rdx_ref[0], rdy_ref[0], rdz_ref[0],
               tpr_ref[0], tpg_ref[0], tpb_ref[0],
               cr_ref[0], cg_ref[0], cb_ref[0], alive_ref[0])
    end = sample_base + spp  # first sample index NOT owed by this launch

    def cond(c):
        it, samp, bvec, st_ = c
        pending = (st_[-1] > 0.0) | ((samp + 1) < end)
        return (it < seg_iters) & jnp.any(pending)

    def body(c):
        it, samp, bvec, st_ = c
        (ox, oy, oz, dx, dy, dz,
         tpr, tpg, tpb, cr, cg, cb, alive) = st_
        # 1) per-lane depth exhaustion (the segmented driver applies
        # this after its loop; per-lane it happens when bvec hits depth)
        exh = (alive > 0.0) & (bvec >= max_depth)
        if exhaust_bg:
            bgr, bgg, bgb = background(dx, dy, dz)
            cr = cr + jnp.where(exh, tpr * bgr, 0.0)
            cg = cg + jnp.where(exh, tpg * bgg, 0.0)
            cb = cb + jnp.where(exh, tpb * bgb, 0.0)
        alive = jnp.where(exh, 0.0, alive)
        # 2) regenerate: dead lanes that still owe samples start the
        # next sample's camera ray NOW (no idle bounces)
        reg = (alive == 0.0) & ((samp + 1) < end)
        samp = jnp.where(reg, samp + 1, samp)
        bvec = jnp.where(reg, 0, bvec)
        cam = camera_ray(samp)
        ox = jnp.where(reg, cam[0], ox)
        oy = jnp.where(reg, cam[1], oy)
        oz = jnp.where(reg, cam[2], oz)
        dx = jnp.where(reg, cam[3], dx)
        dy = jnp.where(reg, cam[4], dy)
        dz = jnp.where(reg, cam[5], dz)
        tpr = jnp.where(reg, 1.0, tpr)
        tpg = jnp.where(reg, 1.0, tpg)
        tpb = jnp.where(reg, 1.0, tpb)
        alive = jnp.where(reg, 1.0, alive)
        st_ = (ox, oy, oz, dx, dy, dz,
               tpr, tpg, tpb, cr, cg, cb, alive)
        # 3) one bounce at per-lane (sample, bounce) coordinates
        st_ = do_bounce(bvec, samp, st_)
        return it + 1, samp, bvec + 1, st_

    _, samp, bvec, st = jax.lax.while_loop(
        cond, body, (jnp.int32(0), samp0, bvec0, st0))
    (oox_ref[0], ooy_ref[0], ooz_ref[0], odx_ref[0], ody_ref[0],
     odz_ref[0], otpr_ref[0], otpg_ref[0], otpb_ref[0],
     ocr_ref[0], ocg_ref[0], ocb_ref[0], oalive_ref[0]) = st
    osamp_ref[0] = samp
    obvec_ref[0] = bvec


@functools.partial(
    jax.jit,
    static_argnames=("counts", "max_depth", "t_min", "p_rr", "grad_bg",
                     "exhaust_bg", "has_img", "img_th", "img_tw",
                     "cull", "cull_t", "mxu", "qmc", "interpret", "nee",
                     "n_lights", "nee_img", "mis", "nee_glossy"))
def mega_segment(sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd, sph_co,
                 uv_tabs, nee_tab,
                 atlas, counts,
                 background, state, pixel, sample_idx, seed, start_bounce,
                 max_depth: int,
                 t_min: float = 1e-3, p_rr: float = 0.0,
                 grad_bg: bool = False, exhaust_bg: bool = False,
                 has_img: bool = False, img_th: int = 1, img_tw: int = 1,
                 cull: bool = False, cull_t: bool = False,
                 mxu: bool = False,
                 qmc: bool = False, interpret: bool = False,
                 nee: bool = False, n_lights: int = 0,
                 nee_img: bool = False, mis: bool = False,
                 nee_glossy: bool = False,
                 code_tabs=None):
    """Advance B rays (B % RAY_TILE == 0) max_depth bounces.

    state: tuple of 13 [B] f32 arrays
    (ox,oy,oz, dx,dy,dz, tpr,tpg,tpb, cr,cg,cb, alive). Returns the
    updated tuple. start_bounce offsets the RNG bounce coordinate so a
    chunked trace draws exactly the same stream as a single-segment one.
    sample_idx may be a scalar (every lane at the same sample — the
    classic uniform-spp launch) or a [B] vector of per-lane sample
    indices (adaptive sampling's per-pixel stream continuation).
    counts = (padded sphere rows or 0, rect rows or 0, cyl rows or 0,
    triangle rows or 0):
    zero disables that family's chunk loop at trace time."""
    b = state[0].shape[0]
    ns, nr, ny_, nt = counts
    assert b % RAY_TILE == 0
    g = b // RAY_TILE

    def lanes(x, dtype=jnp.float32):
        return x.reshape(g, 8, LANES).astype(dtype)

    samp = jnp.broadcast_to(
        jnp.asarray(sample_idx).astype(jnp.int32).reshape(-1)
        if jnp.ndim(sample_idx) else
        jnp.asarray(sample_idx).astype(jnp.int32), (b,))
    scal_i = jnp.stack([jnp.asarray(seed).astype(jnp.int32),
                        jnp.zeros((), jnp.int32),  # dead slot (per-lane samp)
                        jnp.asarray(start_bounce).astype(jnp.int32)]
                       ).reshape(1, 3)
    scal_f = jnp.asarray(background, jnp.float32).reshape(1, 3)

    kernel = functools.partial(
        _mega_kernel, ns=ns, nr=nr, ny_=ny_, nt=nt,
        s_chunk=min(max(ns, 1), SPH_CHUNK),
        r_chunk=min(max(nr, 1), AUX_CHUNK),
        y_chunk=min(max(ny_, 1), AUX_CHUNK),
        t_chunk=min(max(nt, 1), SPH_CHUNK),
        max_depth=int(max_depth),
        t_min=float(t_min), p_rr=float(p_rr), grad_bg=bool(grad_bg),
        exhaust_bg=bool(exhaust_bg), has_img=bool(has_img),
        img_th=int(img_th), img_tw=int(img_tw), cull=bool(cull),
        cull_t=bool(cull_t), mxu=bool(mxu), qmc=bool(qmc),
        nee=bool(nee), n_lights=int(n_lights), nee_img=bool(nee_img),
        mis=bool(mis), nee_glossy=bool(nee_glossy))
    if code_tabs is None:
        code_tabs = tuple(jnp.zeros((8, 1), jnp.float32)
                          for _ in range(4))

    ray_spec = pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal_i
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal_f
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rect table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cylinder table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # triangle table
            pl.BlockSpec(memory_space=pltpu.SMEM),   # sphere chunk AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),   # triangle chunk AABBs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere hb coeffs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere ct coeffs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere UV params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rect UV params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cylinder UV params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # triangle UV params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # NEE light table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # atlas R
            pl.BlockSpec(memory_space=pltpu.VMEM),   # atlas G
            pl.BlockSpec(memory_space=pltpu.VMEM),   # atlas B
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sph codes (mis)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rect codes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cyl codes
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tri codes
        ] + [ray_spec] * 15,
        out_specs=(ray_spec,) * 13,
        out_shape=tuple(jax.ShapeDtypeStruct((g, 8, LANES), jnp.float32)
                        for _ in range(13)),
        interpret=interpret,
    )(
        scal_i, scal_f, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd,
        sph_co[0], sph_co[1],
        uv_tabs[0], uv_tabs[1], uv_tabs[2], uv_tabs[3], nee_tab,
        atlas[0], atlas[1], atlas[2],
        code_tabs[0], code_tabs[1], code_tabs[2], code_tabs[3],
        *[lanes(s) for s in state],
        lanes(pixel, jnp.int32),
        lanes(samp, jnp.int32),
    )
    return tuple(o.reshape(b) for o in outs)


def adjoint_segment(sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd,
                    sph_co, uv_tabs, nee_tab, atlas, counts,
                    background, state, pixel, Lg6, sample_idx, seed,
                    start_bounce, max_depth: int, n_slots: int,
                    t_min: float = 1e-3, p_rr: float = 0.0,
                    grad_bg: bool = False, exhaust_bg: bool = False,
                    has_img: bool = False, img_th: int = 1,
                    img_tw: int = 1,
                    cull: bool = False, cull_t: bool = False,
                    mxu: bool = False, qmc: bool = False,
                    interpret: bool = False,
                    nee: bool = False, n_lights: int = 0,
                    nee_img: bool = False):
    """Advance B replay lanes max_depth bounces AND accumulate the
    radiometric parameter adjoints (see _adjoint_kernel). Lg6 = 6 [B]
    f32 arrays (Lr,Lg,Lb,gr,gg,gb). Returns (state, grads [gtiles, 8,
    n_slots]) — sum grads over axis 0 (and over segments) outside."""
    b = state[0].shape[0]
    ns, nr, ny_, nt = counts
    assert b % RAY_TILE == 0
    assert n_slots % _SLOT_SLAB == 0
    g = b // RAY_TILE

    def lanes(x, dtype=jnp.float32):
        return x.reshape(g, 8, LANES).astype(dtype)

    scal_i = jnp.stack([jnp.asarray(seed).astype(jnp.int32),
                        jnp.asarray(sample_idx).astype(jnp.int32),
                        jnp.asarray(start_bounce).astype(jnp.int32)]
                       ).reshape(1, 3)
    scal_f = jnp.asarray(background, jnp.float32).reshape(1, 3)

    kernel = functools.partial(
        _adjoint_kernel, ns=ns, nr=nr, ny_=ny_, nt=nt,
        s_chunk=min(max(ns, 1), SPH_CHUNK),
        r_chunk=min(max(nr, 1), AUX_CHUNK),
        y_chunk=min(max(ny_, 1), AUX_CHUNK),
        t_chunk=min(max(nt, 1), SPH_CHUNK),
        max_depth=int(max_depth), n_slots=int(n_slots),
        t_min=float(t_min), p_rr=float(p_rr), grad_bg=bool(grad_bg),
        exhaust_bg=bool(exhaust_bg), has_img=bool(has_img),
        img_th=int(img_th), img_tw=int(img_tw), cull=bool(cull),
        cull_t=bool(cull_t), mxu=bool(mxu), qmc=bool(qmc),
        nee=bool(nee), n_lights=int(n_lights), nee_img=bool(nee_img))

    ray_spec = pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((1, 8, n_slots), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    rp_, twp_ = atlas[0].shape
    img_spec = pl.BlockSpec((1, rp_, twp_), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal_i
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal_f
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rect table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cylinder table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # triangle table
            pl.BlockSpec(memory_space=pltpu.SMEM),   # sphere chunk AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),   # triangle chunk AABBs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere hb coeffs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere ct coeffs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere UV params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rect UV params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cylinder UV params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # triangle UV params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # NEE light table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # atlas R
            pl.BlockSpec(memory_space=pltpu.VMEM),   # atlas G
            pl.BlockSpec(memory_space=pltpu.VMEM),   # atlas B
        ] + [ray_spec] * 20,
        out_specs=(ray_spec,) * 13 + (acc_spec,) + (img_spec,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((g, 8, LANES), jnp.float32)
                        for _ in range(13))
        + (jax.ShapeDtypeStruct((g, 8, n_slots), jnp.float32),)
        + tuple(jax.ShapeDtypeStruct((g, rp_, twp_), jnp.float32)
                for _ in range(3)),
        interpret=interpret,
    )(
        scal_i, scal_f, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd,
        sph_co[0], sph_co[1],
        uv_tabs[0], uv_tabs[1], uv_tabs[2], uv_tabs[3], nee_tab,
        atlas[0], atlas[1], atlas[2],
        *[lanes(s) for s in state],
        lanes(pixel, jnp.int32),
        *[lanes(x) for x in Lg6],
    )
    return (tuple(o.reshape(b) for o in outs[:13]), outs[13],
            outs[14:17])


def _shrink_buckets(g_tiles: int):
    """Static tile-count ladder for the between-segment prefix shrink.

    ~x0.4-0.5 geometric steps: the smallest bucket covering the live
    prefix bounds the dead-tile overhead at <~2.5x the live tile count,
    while keeping the lax.switch branch count (= compiled kernel
    variants per segment) at five. Always includes the full grid, so
    any liveness is covered."""
    fr = (0.05, 0.13, 0.32, 0.63, 1.0)
    return sorted({max(1, int(np.ceil(g_tiles * f))) for f in fr})


def _segment_shrunk(buckets, live_tiles, args, state, pixel, sample_idx,
                    seed, start_bounce, seg_kw):
    """Run one segment on only the first K tiles, K = the smallest
    static bucket covering every live ray (live rays are a prefix after
    _compact's any-live-first group sort). The suffix is dead — its
    state passes through untouched, so results are bit-identical to the
    full-grid segment; what the bucket saves is the dead tiles'
    ~7.4 us/tile grid-step + DMA fixed cost (measured,
    scripts/exp_deadtile_r3.py). lax.switch on a device scalar: no host
    sync; every branch is compiled once (persistent-cache friendly)."""
    idx = jnp.minimum(
        jnp.sum(live_tiles > jnp.asarray(buckets, jnp.int32)),
        len(buckets) - 1)

    def make_branch(k):
        bt = buckets[k] * RAY_TILE

        def branch(state, pixel):
            sub = tuple(s[:bt] for s in state)
            si = (sample_idx[:bt] if jnp.ndim(sample_idx)
                  else sample_idx)
            sub = mega_segment(*args, sub, pixel[:bt], si, seed,
                               start_bounce, **seg_kw)
            return tuple(
                jnp.concatenate([n, s[bt:]]) if bt < s.shape[0] else n
                for n, s in zip(sub, state))

        return branch

    return jax.lax.switch(
        idx, [make_branch(k) for k in range(len(buckets))], state, pixel)


def _fresh_state(ro, rd):
    b = ro.shape[0]
    z = jnp.zeros((b,), jnp.float32)
    o = jnp.ones((b,), jnp.float32)
    return (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
            o, o, o, z, z, z, o)


def _compact(state, pixel, orig_g, group: int = 128,
             sort: str = "dead", ints=(), pending=None):
    """Group-granularity live-ray compaction.

    Sorts GROUPS of `group` consecutive rays (stable, any-live groups
    first) instead of individual rows: the permutation gather then moves
    [B/group, group*16]-shaped rows — KB-sized DMAs instead of 2M
    4-byte element gathers. Measured on a v5e at 2M rays: ~6 ms total
    (argsort 2.3 ms + row-take), vs ~400 ms for 16 separate per-element
    row gathers (the round-1 formulation that made compaction a net
    loss). Group granularity wastes at most (live groups x group) lanes
    of packing vs a perfect row sort; death is spatially coherent in the
    64x32-screen-block ray order, so live groups are few.

    All 14 per-ray words (13 f32 state + pixel as bitcast f32) ride one
    packed array so the gather runs once. The packed layout is
    [g, 14*group] — group-sized lane-aligned blocks per column — NEVER
    a [B, 14] array: TPU tiling pads a narrow trailing dim to 128
    lanes, which at 2M rays inflates every intermediate 8.5x and OOMs
    HBM (seen in practice: 15 x 1 GB broadcast_in_dim temps). group=128
    keeps every reshape exactly lane-width.

    orig_g tracks the permutation at GROUP granularity ([g] i32 — rows
    only ever move as whole groups), so the final unpermute is a tiny
    argsort + one packed group-row gather instead of the [B,3]
    per-element scatter that used to cost ~115 ms/2M rays — more than
    the compactions it was undoing."""
    b = state[0].shape[0]
    g = b // group
    alive = state[-1] > 0.0 if pending is None else pending
    alive_g = alive.reshape(g, group).any(-1)
    if sort == "spatial":
        # secondary key: direction octant (major) + Morton cell of the
        # group's mean live-ray origin (minor) — packs each kernel tile
        # into a coherent ray bundle so per-chunk AABB culling can skip
        # (SURVEY §7 hard part 3: per-tile ray sorting)
        af = alive.astype(jnp.float32).reshape(g, group)
        cnt = jnp.maximum(af.sum(-1), 1.0)

        def gmean(x):
            return (x.reshape(g, group) * af).sum(-1) / cnt

        mx, my, mz = gmean(state[0]), gmean(state[1]), gmean(state[2])
        ddx, ddy, ddz = gmean(state[3]), gmean(state[4]), gmean(state[5])
        lo = jnp.stack([jnp.min(jnp.where(alive_g, v, jnp.inf))
                        for v in (mx, my, mz)])
        hi = jnp.stack([jnp.max(jnp.where(alive_g, v, -jnp.inf))
                        for v in (mx, my, mz)])
        span = jnp.where(hi > lo, hi - lo, 1.0)

        def q(v, i):
            return jnp.clip((v - lo[i]) / span[i] * 255.0,
                            0.0, 255.0).astype(jnp.int32)

        morton = _morton3(q(mx, 0), q(my, 1), q(mz, 2)) >> 6  # 18 bits
        octant = ((ddx > 0).astype(jnp.int32) * 4
                  + (ddy > 0).astype(jnp.int32) * 2
                  + (ddz > 0).astype(jnp.int32))
        key = octant * (1 << 18) + morton
        key = jnp.where(alive_g, key, np.int32(1 << 24))
        perm = jnp.argsort(key, stable=True)
    else:
        perm = jnp.argsort(~alive_g, stable=True)
    def as_f32(x):
        return jax.lax.bitcast_convert_type(x.astype(jnp.int32),
                                            jnp.float32)

    n_state = len(state)
    cols = list(state) + [as_f32(pixel)] + [as_f32(x) for x in ints]
    packed = jnp.concatenate([c.reshape(g, group) for c in cols], axis=1)
    packed = packed[perm]                          # [g, n_cols*group]
    parts = [packed[:, i * group:(i + 1) * group].reshape(b)
             for i in range(len(cols))]
    state = tuple(parts[:n_state])
    pixel = jax.lax.bitcast_convert_type(parts[n_state], jnp.int32)
    ints_out = tuple(jax.lax.bitcast_convert_type(p, jnp.int32)
                     for p in parts[n_state + 1:])
    if ints:
        return state, pixel, orig_g[perm], ints_out
    return state, pixel, orig_g[perm]


def _pad_rows(tab, chunk):
    n = tab.shape[0]
    if n % chunk:
        pad = chunk - n % chunk
        tab = jnp.concatenate(
            [tab, jnp.zeros((pad, tab.shape[1]), tab.dtype)])
    return tab


def _pad_chunked(tab, max_chunk):
    """Pad table rows so `min(rows, max_chunk)` evenly chunks them.

    The kernel's chunk size is re-derived from the PADDED row count as
    min(rows, max_chunk) (mega_segment); a table at or under max_chunk
    rows is its own single chunk, a bigger one must be a multiple of
    max_chunk. Padding to a multiple of the LOGICAL primitive count
    (the pre-round-2 scheme) breaks when the SoA table is already
    row-padded past max_chunk: e.g. 18 spheres stored in 32 rows padded
    to a multiple of 18 -> 36 rows, but chunk = min(36, 32) = 32 does
    not divide 36."""
    if tab.shape[0] <= max_chunk:
        return tab
    return _pad_rows(tab, max_chunk)


def _prep_scene(tables: SceneTables, cfg, want_codes: bool = False):
    """Padded SoA tables + static kernel kwargs: the scene-side
    setup shared by the segmented (mega_trace) and regeneration
    (mega_trace_regen) drivers.

    want_codes=True (the capture kernel) additionally returns per-family
    [N,1] tape-code tables (orig_pid*4 + family — original indices, so
    codes refer to SceneTables rows even after the Morton sorts)."""
    n_sph, n_rect, n_cyl, n_tri = tables.counts
    tbl = jax.tree_util.tree_map(jnp.asarray, tables)
    sph_tab = _pad_chunked(sphere_table(tbl) if n_sph
                           else jnp.zeros((1, _S_COLS), jnp.float32),
                           SPH_CHUNK)
    rect_tab = _pad_chunked(rect_table(tbl) if n_rect
                            else jnp.zeros((1, _R_COLS), jnp.float32),
                            AUX_CHUNK)
    cyl_tab = _pad_chunked(cylinder_table(tbl) if n_cyl
                           else jnp.zeros((1, _Y_COLS), jnp.float32),
                           AUX_CHUNK)
    tri_tab = _pad_chunked(triangle_table(tbl) if n_tri
                           else jnp.zeros((1, _T_COLS), jnp.float32),
                           SPH_CHUNK)
    has_img = bool(tables.img_on)
    if has_img:
        atlas = tuple(image_atlas_rows(tbl))
        img_th, img_tw = tables.images.shape[1], tables.images.shape[2]
        uv_tabs = (
            _pad_chunked(sphere_uv_table(tbl) if n_sph
                         else jnp.zeros((1, _U_COLS), jnp.float32),
                         SPH_CHUNK),
            _pad_chunked(rect_uv_table(tbl) if n_rect
                         else jnp.zeros((1, _U_COLS), jnp.float32),
                         AUX_CHUNK),
            _pad_chunked(cylinder_uv_table(tbl) if n_cyl
                         else jnp.zeros((1, _U_COLS), jnp.float32),
                         AUX_CHUNK),
            _pad_chunked(triangle_uv_table(tbl) if n_tri
                         else jnp.zeros((1, _U_COLS), jnp.float32),
                         SPH_CHUNK),
        )
    else:
        atlas = tuple(jnp.zeros((8, 128), jnp.float32) for _ in range(3))
        img_th = img_tw = 1
        uv_tabs = tuple(jnp.zeros((8, _U_COLS), jnp.float32)
                        for _ in range(4))
    counts = (sph_tab.shape[0] if n_sph else 0,
              rect_tab.shape[0] if n_rect else 0,
              cyl_tab.shape[0] if n_cyl else 0,
              tri_tab.shape[0] if n_tri else 0)

    want_cull = bool(getattr(cfg, "cull_chunks", False))
    cull = want_cull and n_sph > 0
    if cull:
        # Morton-sort sphere rows so consecutive chunks are spatial
        # cells; per-chunk AABBs let the kernel cond-skip whole chunks.
        # (The sphere UV-param table needs no reorder: its rows carry no
        # per-sphere data, only the family code.)
        s_chunk_val = min(max(sph_tab.shape[0], 1), SPH_CHUNK)
        sph_tab, sbnd, sorder = sort_spheres_morton(sph_tab, s_chunk_val)
    else:
        sbnd = jnp.zeros((1, 8), jnp.float32)
        sorder = None

    # triangle culling pays only with >=2 chunks (a single chunk's cond
    # can never skip: some lane always wants the scene's only cell)
    t_chunk_val = min(max(tri_tab.shape[0], 1), SPH_CHUNK)
    cull_t = want_cull and n_tri > 0 and tri_tab.shape[0] // t_chunk_val >= 2
    if cull_t:
        tri_tab, tbnd, torder = sort_triangles_morton(tri_tab, t_chunk_val)
        if has_img:
            # per-triangle UV rows (v1/v2/v3, uv1/uv2/uv3) must follow
            # the same permutation; padded row counts match by
            # construction (_pad_rows with the same chunk)
            uv_tabs = uv_tabs[:3] + (uv_tabs[3][torder],)
    else:
        tbnd = jnp.zeros((1, 8), jnp.float32)
        torder = None

    mxu = bool(getattr(cfg, "mxu_intersect", False)) and n_sph > 0
    if mxu:
        # coefficient tables derive from the (possibly Morton-sorted)
        # final row order
        sph_co = sphere_coeff_tables(sph_tab)
    else:
        sph_co = (jnp.zeros((8, 16), jnp.float32),
                  jnp.zeros((8, 16), jnp.float32))

    interpret = jax.default_backend() != "tpu"
    kw = dict(p_rr=cfg.p_rr,
              grad_bg=cfg.background_mode == "gradient",
              has_img=has_img, img_th=img_th, img_tw=img_tw,
              cull=cull, cull_t=cull_t, mxu=mxu,
              qmc=getattr(cfg, "sampler", "rng") == "qmc",
              interpret=interpret)
    if want_codes:
        def codes_for(tab, fam, order):
            n = tab.shape[0]
            ids = (order.astype(jnp.float32) if order is not None
                   else jnp.arange(n, dtype=jnp.float32))
            return (ids * 4.0 + jnp.float32(fam)).reshape(n, 1)

        code_tabs = (codes_for(sph_tab, _FAM_SPH, sorder),
                     codes_for(rect_tab, _FAM_RECT, None),
                     codes_for(cyl_tab, _FAM_CYL, None),
                     codes_for(tri_tab, _FAM_TRI, torder))
        return (tbl, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd,
                sph_co, uv_tabs, code_tabs, atlas, counts, kw)
    return (tbl, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd,
            sph_co, uv_tabs, atlas, counts, kw)


def mega_trace(tables: SceneTables, cfg, ro, rd, pixel, sample_idx, seed):
    """Full-path trace via the megakernel; pads to RAY_TILE internally.

    cfg.compact_every splits the bounce loop into segments with a
    live-ray group compaction between segments — the stream-compacted
    wavefront (SURVEY.md §7 north star). Measured on the cover scene at
    1080p depth 50 (v5e, BASELINE.md round 2): the per-tile dead-ray
    short-circuit alone leaves 27.4 tile-bounches of work per ray
    against a ray-average depth of 1.59 (one live glass path keeps a
    whole 2048-lane tile alive); compact_every=4 packs live rays every
    4 bounces for 2.89M -> 5.05M paths/s. Config default stays 0 (tiny
    unit-test renders don't amortize the extra kernel compiles); the
    CLI/bench production paths enable it.

    Pre-condition: mega_supported(tables)."""
    b = ro.shape[0]
    pad = (-b) % RAY_TILE
    per_lane = bool(jnp.ndim(sample_idx))
    if pad:
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), jnp.float32)])
        rd = jnp.concatenate(
            [rd, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                                  (pad, 3))])
        pixel = jnp.concatenate([pixel, jnp.zeros((pad,), pixel.dtype)])
        if per_lane:
            sample_idx = jnp.concatenate(
                [jnp.asarray(sample_idx).astype(jnp.int32),
                 jnp.zeros((pad,), jnp.int32)])
    bp = b + pad

    nee_on = bool(getattr(cfg, "nee", False)) and tables.n_lights > 0
    mis_on = nee_on and bool(getattr(cfg, "mis", False))
    glossy_on = nee_on and bool(getattr(cfg, "nee_glossy", False))
    if mis_on:
        (tbl, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd, sph_co,
         uv_tabs, code_tabs, atlas, counts, kw) = _prep_scene(
             tables, cfg, want_codes=True)
    else:
        (tbl, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd, sph_co,
         uv_tabs, atlas, counts, kw) = _prep_scene(tables, cfg)
        code_tabs = None
    exhaust = cfg.exhaust_mode == "background"

    nee_tab = (nee_light_table(tbl) if nee_on
               else jnp.zeros((8, 33), jnp.float32))
    nee_img = nee_on and tables.nee_img

    ce = getattr(cfg, "compact_every", 0)
    explicit = tuple(getattr(cfg, "compact_schedule", ()) or ())
    if explicit:
        # consume the schedule up to max_depth (clamping the last
        # segment), then append the remainder as one segment
        schedule, left = [], cfg.max_depth
        for s in explicit:
            if s <= 0 or left == 0:
                continue
            s = min(s, left)
            schedule.append(s)
            left -= s
        if left:
            schedule.append(left)
    elif ce == 0 or ce >= cfg.max_depth:
        schedule = [cfg.max_depth]
    elif ce > 0:
        schedule = [ce] * (cfg.max_depth // ce)
        if cfg.max_depth % ce:
            schedule.append(cfg.max_depth % ce)
    else:
        # auto (-1): geometric early-heavy schedule [1,2,4,8,...] —
        # the death curve front-loads (measured cover@1080p: 83% of rays
        # survive bounce 0, 3% bounce 5), so compactions concentrate
        # where live-count still drops fast, and segment count stays
        # O(log depth)
        schedule, seg, left = [], 1, cfg.max_depth
        while left > 0:
            s = min(seg, left)
            schedule.append(s)
            left -= s
            seg *= 2

    group = getattr(cfg, "compact_group", 128)
    state = _fresh_state(ro, rd)
    pixel = pixel.astype(jnp.int32)
    orig_g = jnp.arange(bp // group, dtype=jnp.int32)
    g_tiles = bp // RAY_TILE
    shrink = (bool(getattr(cfg, "compact_shrink", True))
              and len(schedule) > 1 and g_tiles > 1)
    buckets = _shrink_buckets(g_tiles) if shrink else None
    live_tiles = None
    done = 0
    for i, seg in enumerate(schedule):
        last = i == len(schedule) - 1
        seg_args = (sph_tab, rect_tab, cyl_tab, tri_tab, sbnd,
                    tbnd, sph_co, uv_tabs, nee_tab, atlas, counts,
                    tbl.background)
        seg_kw = dict(max_depth=seg, exhaust_bg=exhaust and last,
                      nee=nee_on, n_lights=tables.n_lights,
                      nee_img=nee_img, mis=mis_on, nee_glossy=glossy_on,
                      code_tabs=code_tabs,
                      **kw)
        if live_tiles is None or buckets is None:
            state = mega_segment(*seg_args, state, pixel,
                                 sample_idx, seed, jnp.int32(done),
                                 **seg_kw)
        else:
            state = _segment_shrunk(buckets, live_tiles, seg_args, state,
                                    pixel, sample_idx, seed,
                                    jnp.int32(done), seg_kw)
        done += seg
        if not last:
            if per_lane:
                # the per-lane sample vector rides the group permutation
                # exactly like pixel ids do
                state, pixel, orig_g, (sample_idx,) = _compact(
                    state, pixel, orig_g, group=group,
                    sort=getattr(cfg, "compact_sort", "dead"),
                    ints=(jnp.asarray(sample_idx).astype(jnp.int32),))
            else:
                state, pixel, orig_g = _compact(
                    state, pixel, orig_g, group=group,
                    sort=getattr(cfg, "compact_sort", "dead"))
            if shrink:
                ag = (state[12].reshape(bp // group, group) > 0.0).any(-1)
                n_live_g = ag.sum().astype(jnp.int32)
                live_tiles = ((n_live_g * jnp.int32(group)
                               + jnp.int32(RAY_TILE - 1))
                              // jnp.int32(RAY_TILE))

    cr, cg, cb = state[9], state[10], state[11]
    if len(schedule) == 1:
        # no compaction -> no permutation to undo
        return jnp.stack([cr, cg, cb], axis=-1)[:b]
    # undo the composed group permutation: rows only ever moved as whole
    # groups, so the inverse is a tiny [g] argsort + ONE packed group-row
    # gather (a per-element [B,3] scatter here used to cost ~115 ms at
    # 2M rays — more than every compaction it was undoing combined)
    g = bp // group
    packed = jnp.concatenate(
        [c.reshape(g, group) for c in (cr, cg, cb)], axis=1)
    packed = packed[jnp.argsort(orig_g)]
    rgb = jnp.stack([packed[:, i * group:(i + 1) * group].reshape(bp)
                     for i in range(3)], axis=-1)
    return rgb[:b]


def mega_trace_adjoint(tables: SceneTables, cfg, ro, rd, pixel,
                       sample_idx, seed, L, gcot,
                       depth_bwd: int, exhaust: bool):
    """Backward megakernel pass for ONE sample of the path-replay VJP.

    Replays the bounce loop (bit-identical RNG) while accumulating the
    radiometric suffix-identity adjoints in-kernel (_adjoint_kernel),
    with the SAME segmented live-ray compaction as the forward — the
    backward inherits dead-tile short-circuit, group packing, and chunk
    culling. L/gcot [B,3]: the sample's radiance and the loss cotangent
    rows. Returns {"tex_color": [Nx,3], "tex_color2": [Nx,3],
    "mat_albedo": [Nm,3], "background": [3]} gradient arrays.

    Covers ALL REPLAY_FIELDS including "images": texel cotangents
    accumulate into per-tile atlas-plane accumulators by the transpose
    of the forward's double-one-hot texel sample (per-sublane-row MXU
    dots); adjoint_atlas_ok() gates very large atlases back to the
    XLA/hybrid replay."""
    b = ro.shape[0]
    pad = (-b) % RAY_TILE
    if pad:
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), jnp.float32)])
        rd = jnp.concatenate(
            [rd, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                                  (pad, 3))])
        pixel = jnp.concatenate([pixel, jnp.zeros((pad,), pixel.dtype)])
        L = jnp.concatenate([L, jnp.zeros((pad, 3), jnp.float32)])
        gcot = jnp.concatenate([gcot, jnp.zeros((pad, 3), jnp.float32)])
    bp = b + pad

    (tbl, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd, sph_co,
     uv_tabs, atlas, counts, kw) = _prep_scene(tables, cfg)
    n_tex = tables.tex_color.shape[0]
    n_mat = tables.mat_albedo.shape[0]
    n_slots = -(-(n_tex + n_mat) // LANES) * LANES
    grad_bg = kw.get("grad_bg", False)
    nee_on = bool(getattr(cfg, "nee", False)) and tables.n_lights > 0
    nee_tab = (nee_light_table(tbl) if nee_on
               else jnp.zeros((8, 33), jnp.float32))

    ce = getattr(cfg, "compact_every", 0)
    explicit = tuple(getattr(cfg, "compact_schedule", ()) or ())
    depth_bwd = int(depth_bwd)
    if explicit:
        schedule, left = [], depth_bwd
        for s_ in explicit:
            if s_ <= 0 or left == 0:
                continue
            s_ = min(s_, left)
            schedule.append(s_)
            left -= s_
        if left:
            schedule.append(left)
    elif ce == 0 or ce >= depth_bwd:
        schedule = [depth_bwd]
    elif ce > 0:
        schedule = [ce] * (depth_bwd // ce)
        if depth_bwd % ce:
            schedule.append(depth_bwd % ce)
    else:
        schedule, seg, left = [], 1, depth_bwd
        while left > 0:
            s_ = min(seg, left)
            schedule.append(s_)
            left -= s_
            seg *= 2

    group = getattr(cfg, "compact_group", 128)
    state = _fresh_state(ro, rd)
    Lg6 = (L[:, 0], L[:, 1], L[:, 2],
           gcot[:, 0], gcot[:, 1], gcot[:, 2])
    pixel = pixel.astype(jnp.int32)
    orig_g = jnp.arange(bp // group, dtype=jnp.int32)
    gsum = jnp.zeros((8, n_slots), jnp.float32)
    gimg = [jnp.zeros(atlas[0].shape, jnp.float32) for _ in range(3)]
    done = 0
    for i, seg in enumerate(schedule):
        last = i == len(schedule) - 1
        state, gseg, gimg_seg = adjoint_segment(
            sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd, sph_co,
            uv_tabs, nee_tab, atlas, counts, tbl.background, state,
            pixel, Lg6, sample_idx, seed, jnp.int32(done),
            max_depth=seg, n_slots=n_slots,
            nee=nee_on, n_lights=tables.n_lights,
            nee_img=nee_on and tables.nee_img,
            exhaust_bg=exhaust and last, **kw)
        gsum = gsum + jnp.sum(gseg, axis=0)
        if kw.get("has_img"):
            gimg = [a + jnp.sum(p, axis=0)
                    for a, p in zip(gimg, gimg_seg)]
        done += seg
        if not last:
            packed, pixel, orig_g = _compact(
                tuple(state) + Lg6, pixel, orig_g, group=group,
                sort=getattr(cfg, "compact_sort", "dead"),
                pending=state[12] > 0.0)
            state, Lg6 = packed[:13], packed[13:]

    out = {
        "tex_color": gsum[0:3, :n_tex].T,
        "tex_color2": gsum[3:6, :n_tex].T,
        "mat_albedo": gsum[0:3, n_tex:n_tex + n_mat].T,
        "background": (jnp.zeros((3,), jnp.float32) if grad_bg
                       else gsum[6, 0:3]),
    }
    if kw.get("has_img"):
        ni, th, tw = tables.images.shape[:3]
        out["images"] = jnp.stack(
            [p[:ni * th, :tw].reshape(ni, th, tw) for p in gimg],
            axis=-1)
    return out


def adjoint_atlas_ok(tables: SceneTables) -> bool:
    """True when the in-kernel atlas adjoint's per-tile accumulators
    (3 x [Ni*TH, TWp] f32, carried through the bounce loop) fit
    comfortably in scoped VMEM; bigger atlases fall back to the
    XLA/hybrid replay for ALL fields (replay.py gates on this)."""
    if not bool(tables.img_on):
        return True
    ni, th, tw = tables.images.shape[:3]
    rp = -(-(ni * th) // 8) * 8
    twp = -(-tw // 128) * 128
    return rp * twp <= (1 << 17)  # 3 x 512 KB of VMEM accumulators


def camera_vec(cam) -> jnp.ndarray:
    """Flatten the thin-lens camera frame to the 19-float SMEM layout
    _regen_kernel expects (origin, lower_left, horizontal, vertical,
    u, v, lens_radius)."""
    return jnp.concatenate([
        jnp.asarray(cam.origin, jnp.float32).reshape(3),
        jnp.asarray(cam.lower_left, jnp.float32).reshape(3),
        jnp.asarray(cam.horizontal, jnp.float32).reshape(3),
        jnp.asarray(cam.vertical, jnp.float32).reshape(3),
        jnp.asarray(cam.u, jnp.float32).reshape(3),
        jnp.asarray(cam.v, jnp.float32).reshape(3),
        jnp.asarray(cam.lens_radius, jnp.float32).reshape(1)])


@functools.partial(
    jax.jit,
    static_argnames=("counts", "max_depth", "spp", "init", "width",
                     "height",
                     "defocus", "t_min", "p_rr", "grad_bg", "exhaust_bg",
                     "has_img", "img_th", "img_tw", "cull", "cull_t",
                     "mxu", "qmc", "interpret"))
def mega_regen(sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd, sph_co,
               uv_tabs, atlas, counts, background, cam_vec,
               state, pixel, py, samp, bvec,
               sample_base, seed, seg_iters, *, max_depth, spp,
               init=False,
               width, height,
               defocus, t_min=1e-3, p_rr=0.0, grad_bg=False,
               exhaust_bg=False, has_img=False, img_th=1, img_tw=1,
               cull=False, cull_t=False, mxu=False, qmc=False,
               interpret=False):
    """Advance B regen lanes up to seg_iters regen-loop iterations.

    state: the 13-tuple of [B] f32 arrays (ox..alive); samp/bvec: [B]
    i32 per-lane RNG stream coordinates; seg_iters a RUNTIME i32 (all
    segment budgets share one compiled kernel). Returns (state, samp,
    bvec). Run to seg_iters >= spp*(max_depth+1): the radiance sums in
    state[9:12] are bit-equal to spp separate mega_segment launches
    accumulated in sample order (identical RNG stream coordinates,
    identical f32 addition order)."""
    b = pixel.shape[0]
    ns, nr, ny_, nt = counts
    assert b % RAY_TILE == 0
    g = b // RAY_TILE

    def lanes(x, dtype=jnp.float32):
        return x.reshape(g, 8, LANES).astype(dtype)

    scal_i = jnp.stack([jnp.asarray(seed).astype(jnp.int32),
                        jnp.asarray(sample_base).astype(jnp.int32),
                        jnp.asarray(seg_iters).astype(jnp.int32)]
                       ).reshape(1, 3)
    scal_f = jnp.concatenate(
        [jnp.asarray(background, jnp.float32).reshape(3),
         jnp.asarray(cam_vec, jnp.float32).reshape(19)]).reshape(1, 22)

    kernel = functools.partial(
        _regen_kernel, ns=ns, nr=nr, ny_=ny_, nt=nt,
        s_chunk=min(max(ns, 1), SPH_CHUNK),
        r_chunk=min(max(nr, 1), AUX_CHUNK),
        y_chunk=min(max(ny_, 1), AUX_CHUNK),
        t_chunk=min(max(nt, 1), SPH_CHUNK),
        max_depth=int(max_depth), spp=int(spp), init=bool(init),
        width=int(width), height=int(height), defocus=bool(defocus),
        t_min=float(t_min), p_rr=float(p_rr), grad_bg=bool(grad_bg),
        exhaust_bg=bool(exhaust_bg), has_img=bool(has_img),
        img_th=int(img_th), img_tw=int(img_tw), cull=bool(cull),
        cull_t=bool(cull_t), mxu=bool(mxu), qmc=bool(qmc))

    ray_spec = pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal_i
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scal_f (bg + camera)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rect table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cylinder table
            pl.BlockSpec(memory_space=pltpu.VMEM),   # triangle table
            pl.BlockSpec(memory_space=pltpu.SMEM),   # sphere chunk AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),   # triangle chunk AABBs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere hb coeffs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere ct coeffs
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sphere UV params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rect UV params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cylinder UV params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # triangle UV params
            pl.BlockSpec(memory_space=pltpu.VMEM),   # atlas R
            pl.BlockSpec(memory_space=pltpu.VMEM),   # atlas G
            pl.BlockSpec(memory_space=pltpu.VMEM),   # atlas B
        ] + [ray_spec] * 17,
        out_specs=(ray_spec,) * 15,
        out_shape=tuple(jax.ShapeDtypeStruct(
            (g, 8, LANES), jnp.float32 if i < 13 else jnp.int32)
            for i in range(15)),
        interpret=interpret,
    )(
        scal_i, scal_f, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd,
        sph_co[0], sph_co[1],
        uv_tabs[0], uv_tabs[1], uv_tabs[2], uv_tabs[3],
        atlas[0], atlas[1], atlas[2],
        *[lanes(s) for s in state],
        lanes(pixel, jnp.int32), lanes(py, jnp.int32),
        lanes(samp, jnp.int32), lanes(bvec, jnp.int32),
    )
    flat = [o.reshape(b) for o in outs]
    return tuple(flat[:13]), flat[13], flat[14]


def regen_schedule(spp: int, max_depth: int, every: int,
                   growth: int = 2):
    """Iteration budgets for the segmented regen loop.

    every=0: one segment covering the worst case (no compaction).
    every=N>0: fixed N-iteration segments.
    every=-1 (auto): [3*spp, 2*spp, 4*spp, 8*spp, ...] — the first
    segment covers the lane-AVERAGE total work (spp x ~2.6 iterations
    on the cover scene), later ones chase the geometric death-tail —
    mirroring mega_trace's auto bounce schedule. Budgets always sum to
    spp*(max_depth+1), the per-lane worst case, so completion never
    depends on the schedule (capped tiles just resume). growth widens
    the geometric step (shrink mode uses 4: segments on a shrunken
    array are cheap, host pending-count syncs are not)."""
    total = spp * (max_depth + 1)
    if every == 0 or every >= total:
        return [total]
    if every > 0:
        sched = [every] * (total // every)
        if total % every:
            sched.append(total % every)
        return sched
    head = (5 if growth == 4 else 3) * spp
    sched, left, seg = [], total, head
    while left > 0:
        s = min(seg, left)
        sched.append(s)
        left -= s
        seg = growth * spp if len(sched) == 1 else seg * growth
    return sched


# previous-frame shrink plans: plan_key -> [prefix lanes per boundary].
# Populated from pending counts fetched once per frame (see
# mega_trace_regen); stale or missing entries are always SAFE (frame
# runs wider than needed, or the residual guard cleans up).
_shrink_plans: dict = {}


def _bucket_tiles(t: int) -> int:
    """Round a tile count up to a half-octave bucket (1,2,3,4,6,8,12,
    16,24,...): jit signatures repeat across frames (bounded compile
    set) while over-allocating at most 50% of the pending work."""
    c = 1
    while True:
        if t <= c:
            return c
        if c > 1 and t <= c + c // 2:
            return c + c // 2
        c *= 2


def mega_trace_regen(tables: SceneTables, cfg, pixel, py, seed, spp,
                     sample_base=0, width=None, height=None):
    """Render spp samples for the given pixels via in-kernel sample
    regeneration — primary-ray generation, the spp loop, and the bounce
    loop all live on-chip; HBM sees a [B,3] radiance sum out. Replaces
    render()'s per-sample launches: a lane whose path terminates simply
    starts its next sample, so occupancy never decays until the tail of
    the LAST sample.

    cfg.regen_compact segments the in-kernel loop by iteration budget
    with a cross-tile group compaction of still-pending lanes between
    segments (the death-tail: a tile otherwise runs to its WORST lane's
    total — measured 122 mean tile-iterations on cover@1080p spp8
    against a 21-iteration lane average). Per-lane samp/bounce RNG
    coordinates ride the permutation, so the image stays bit-identical.

    Returns the radiance sum [B, 3] over [sample_base, sample_base+spp).
    Pre-condition: mega_supported(tables)."""
    width = cfg.width if width is None else width
    height = cfg.height if height is None else height
    b = pixel.shape[0]
    pad = (-b) % RAY_TILE
    if pad:
        pixel = jnp.concatenate([pixel, jnp.zeros((pad,), pixel.dtype)])
        py = jnp.concatenate([py, jnp.zeros((pad,), py.dtype)])
    bp = b + pad
    pixel = pixel.astype(jnp.int32)
    py = py.astype(jnp.int32)

    (tbl, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd, sph_co,
     uv_tabs, atlas, counts, kw) = _prep_scene(tables, cfg)

    # segment 0 self-initializes IN-kernel (init=True): camera rays from
    # the same Mosaic-compiled camera_ray that regenerates samples 1.. —
    # keeps the whole stream bit-identical to the per-sample launch
    # path. The state/samp/bvec inputs to segment 0 are dummies.
    zeros = jnp.zeros((bp,), jnp.float32)
    state = (zeros,) * 13
    samp = jnp.zeros((bp,), jnp.int32)
    bvec = jnp.zeros((bp,), jnp.int32)

    shrink = bool(getattr(cfg, "regen_shrink", True))
    sched = regen_schedule(int(spp), int(cfg.max_depth),
                           int(getattr(cfg, "regen_compact", 0)),
                           growth=4 if shrink else 2)
    group = getattr(cfg, "compact_group", 128)
    orig_g = jnp.arange(bp // group, dtype=jnp.int32)
    end = int(sample_base) + int(spp)
    run = functools.partial(
        mega_regen, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd,
        sph_co, uv_tabs, atlas, counts, tbl.background,
        camera_vec(tbl.camera),
        max_depth=cfg.max_depth, spp=int(spp), width=int(width),
        height=int(height), defocus=bool(cfg.enable_defocus),
        exhaust_bg=cfg.exhaust_mode == "background", **kw)

    # Tail segments run on a SHRUNKEN active prefix [0:S): a pallas grid
    # pays every tile's VMEM DMAs even when the bounce loop exits
    # immediately, so packing alone (constant array size) leaves the
    # death-tail's fixed costs in place (measured neutral at g16, 18%
    # worse at g128 vs single-launch). Shapes can't depend on a device
    # value without a host sync, and a mid-frame sync through the
    # tunnel costs ~160 ms/segment (measured: sync-per-segment shrink
    # was a wash) — so the bucket PLAN is taken from the previous
    # frame's measured pending counts (fetched once at frame end, when
    # the pipeline is drained anyway) and a residual-pending guard
    # reruns a full-size cleanup segment in the rare case a bucket was
    # too small (stale plan after a big scene/camera change). Frame 1
    # runs all segments full-size and just records counts.
    plan_key = (int(width), int(height), int(spp), int(cfg.max_depth),
                int(group), tuple(sched), int(np.uint32(seed)), bp)
    plan = _shrink_plans.get(plan_key) if shrink else None
    counts_dev = []
    S = bp
    for i, seg in enumerate(sched):
        sl = slice(0, S)
        st, sa, bv = run(tuple(a[sl] for a in state), pixel[sl], py[sl],
                         samp[sl], bvec[sl],
                         jnp.int32(sample_base), jnp.int32(seed),
                         jnp.int32(seg), init=(i == 0))
        last = i == len(sched) - 1
        if not last:
            pending = (st[-1] > 0.0) | ((sa + 1) < end)
            if shrink:  # device scalar; fetched AFTER the last dispatch
                counts_dev.append(
                    jnp.sum(pending.reshape(-1, group).any(-1)))
            st, pi, og, (pyp, sa, bv) = _compact(
                st, pixel[sl], orig_g[:S // group], group=group,
                sort=getattr(cfg, "compact_sort", "dead"),
                ints=(py[sl], sa, bv), pending=pending)
        else:
            pi, og, pyp = pixel[sl], orig_g[:S // group], py[sl]

        if S < bp:  # write the prefix back into the full arrays
            state = tuple(jnp.concatenate([a, f[S:]])
                          for a, f in zip(st, state))
            pixel = jnp.concatenate([pi, pixel[S:]])
            py = jnp.concatenate([pyp, py[S:]])
            samp = jnp.concatenate([sa, samp[S:]])
            bvec = jnp.concatenate([bv, bvec[S:]])
            orig_g = jnp.concatenate([og, orig_g[S // group:]])
        else:
            state, pixel, py, samp, bvec, orig_g = st, pi, pyp, sa, bv, og

        if not last and plan is not None:
            S = plan[i]

    if shrink and len(sched) > 1:
        resid = (state[-1] > 0.0) | ((samp + 1) < end)
        n_resid = jnp.sum(resid)
        # ONE drain of the dispatch pipeline: boundary counts for the
        # next frame's plan + the too-small-bucket guard
        fetched = np.asarray(jnp.stack(counts_dev + [n_resid]))
        lanes_per = [int(c) * group for c in fetched[:-1]]
        _shrink_plans[plan_key] = [
            min(bp, _bucket_tiles(max(1, -(-int(lp * 1.25) // RAY_TILE)))
                * RAY_TILE) for lp in lanes_per]
        if int(fetched[-1]) > 0:
            # a bucket undershot (first frame never does: it's
            # full-size): resume EVERYTHING in one full-size segment —
            # bit-identical continuation of the per-lane streams
            state, samp, bvec = run(
                state, pixel, py, samp, bvec,
                jnp.int32(sample_base), jnp.int32(seed),
                jnp.int32(spp * (int(cfg.max_depth) + 1)), init=False)

    cr, cg, cb = state[9], state[10], state[11]
    if len(sched) == 1:
        return jnp.stack([cr, cg, cb], axis=-1)[:b]
    # undo the composed group permutation (see mega_trace)
    g = bp // group
    packed = jnp.concatenate(
        [c.reshape(g, group) for c in (cr, cg, cb)], axis=1)
    packed = packed[jnp.argsort(orig_g)]
    rgb = jnp.stack([packed[:, i * group:(i + 1) * group].reshape(bp)
                     for i in range(3)], axis=-1)
    return rgb[:b]
