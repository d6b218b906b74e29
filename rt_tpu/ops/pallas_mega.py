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
sphere/rect/cylinder/triangle primitives, all four materials, solid +
checker textures. Image textures (per-lane atlas gathers) fall back to
the hybrid engine.

Forward-only (the diff path pins engine="xla").
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rt_tpu.ops import rng as rng_mod
from rt_tpu.scene.types import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_LAMBERTIAN,
    MAT_METAL,
    SceneTables,
    TEX_CHECKER,
)

INF = np.float32(np.inf)
RAY_TILE = 2048
LANES = RAY_TILE // 8
SPH_CHUNK = 128  # spheres per inner iteration (leading broadcast axis)
AUX_CHUNK = 16   # rects / cylinders per inner iteration

# material block layout (appended to every table's geometry columns)
_MB_MTYPE, _MB_CHECKER, _MB_PARAM = 0, 1, 2
_MB_ALB = 3    # 3,4,5
_MB_ALB2 = 6   # 6,7,8
_MB_COLS = 9

# sphere table: geometry cols then the material block
_S_CX, _S_CY, _S_CZ, _S_RAD, _S_C2R, _S_VALID = 0, 1, 2, 3, 4, 5
_S_MB = 6
_S_COLS = 16

# rect table: k-axis onehot, free-axis onehots, k, lo/hi bounds, valid
_R_KX, _R_KY, _R_KZ = 0, 1, 2
_R_F1 = 3   # 3,4,5
_R_F2 = 6   # 6,7,8
_R_K, _R_LO0, _R_LO1, _R_HI0, _R_HI1, _R_VALID = 9, 10, 11, 12, 13, 14
_R_MB = 16
_R_COLS = 32

# cylinder table: w2o rotation rows, translation, radius^2, z-slab, valid
_Y_R = 0    # 0..8 row-major 3x3
_Y_TX, _Y_TY, _Y_TZ = 9, 10, 11
_Y_RAD2, _Y_ZMIN, _Y_ZMAX, _Y_VALID = 12, 13, 14, 15
_Y_MB = 16
_Y_COLS = 32

# triangle table: v1, edges (v2-v1, v3-v2, v1-v3), unit normal, valid
_T_V1 = 0   # 0,1,2
_T_E1 = 3   # 3,4,5
_T_E2 = 6   # 6,7,8
_T_E3 = 9   # 9,10,11
_T_N = 12   # 12,13,14
_T_VALID = 15
_T_MB = 16
_T_COLS = 32

_GOLD = np.int32(np.uint32(0x9E3779B9).astype(np.int64) - (1 << 32))
_M1 = np.int32(np.uint32(0xED5AD4BB).astype(np.int64) - (1 << 32))
_M2 = np.int32(np.uint32(0xAC4C1B51).astype(np.int64) - (1 << 32))
_M3 = np.int32(np.uint32(0x31848BAB).astype(np.int64) - (1 << 32))


def mega_supported(tables: SceneTables) -> bool:
    """Static scene-shape check (counts + image-atlas shape only).
    Image textures are the one unsupported feature (in-kernel per-lane
    atlas gathers) — those scenes use the hybrid engine."""
    n_sph, n_rect, n_cyl, n_tri = tables.counts
    no_images = tables.images.shape[:3] == (1, 1, 1)
    return (n_sph + n_rect + n_cyl + n_tri) > 0 and no_images


def _mat_block(tables: SceneTables, mat_ids):
    """[N, 9] material block for primitive rows with material mat_ids."""
    mtype = tables.mat_type[mat_ids]
    tex = tables.mat_tex[mat_ids]
    tex_safe = jnp.maximum(tex, 0)
    ttype = tables.tex_type[tex_safe]
    is_checker = (tex >= 0) & (ttype == TEX_CHECKER)
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
    mb = jnp.zeros((n, _MB_COLS), jnp.float32)
    mb = mb.at[:, _MB_MTYPE].set(mtype.astype(jnp.float32))
    mb = mb.at[:, _MB_CHECKER].set(is_checker.astype(jnp.float32))
    mb = mb.at[:, _MB_PARAM].set(param)
    mb = mb.at[:, _MB_ALB:_MB_ALB + 3].set(base)
    mb = mb.at[:, _MB_ALB2:_MB_ALB2 + 3].set(alb2)
    return mb


def sphere_table(tables: SceneTables) -> jnp.ndarray:
    n = tables.sph_center.shape[0]
    c = tables.sph_center
    r = tables.sph_radius
    cols = jnp.zeros((n, _S_COLS), jnp.float32)
    cols = cols.at[:, _S_CX].set(c[:, 0])
    cols = cols.at[:, _S_CY].set(c[:, 1])
    cols = cols.at[:, _S_CZ].set(c[:, 2])
    cols = cols.at[:, _S_RAD].set(r)
    cols = cols.at[:, _S_C2R].set((c * c).sum(-1) - r * r)
    cols = cols.at[:, _S_VALID].set(
        (tables.sph_obj >= 0).astype(jnp.float32))
    cols = cols.at[:, _S_MB:_S_MB + _MB_COLS].set(
        _mat_block(tables, tables.sph_mat))
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
    cols = cols.at[:, _R_KX:_R_KZ + 1].set(onehot_k)
    cols = cols.at[:, _R_F1:_R_F1 + 3].set(oh1)
    cols = cols.at[:, _R_F2:_R_F2 + 3].set(oh2)
    cols = cols.at[:, _R_K].set(tables.rect_k)
    cols = cols.at[:, _R_LO0].set(tables.rect_lo[:, 0])
    cols = cols.at[:, _R_LO1].set(tables.rect_lo[:, 1])
    cols = cols.at[:, _R_HI0].set(tables.rect_hi[:, 0])
    cols = cols.at[:, _R_HI1].set(tables.rect_hi[:, 1])
    cols = cols.at[:, _R_VALID].set(
        (tables.rect_obj >= 0).astype(jnp.float32))
    cols = cols.at[:, _R_MB:_R_MB + _MB_COLS].set(
        _mat_block(tables, tables.rect_mat))
    return cols


def cylinder_table(tables: SceneTables) -> jnp.ndarray:
    n = tables.cyl_radius.shape[0]
    w2o = tables.cyl_w2o
    cols = jnp.zeros((n, _Y_COLS), jnp.float32)
    cols = cols.at[:, _Y_R:_Y_R + 9].set(
        w2o[:, :3, :3].reshape(n, 9))
    cols = cols.at[:, _Y_TX].set(w2o[:, 0, 3])
    cols = cols.at[:, _Y_TY].set(w2o[:, 1, 3])
    cols = cols.at[:, _Y_TZ].set(w2o[:, 2, 3])
    cols = cols.at[:, _Y_RAD2].set(tables.cyl_radius ** 2)
    cols = cols.at[:, _Y_ZMIN].set(tables.cyl_zmin)
    cols = cols.at[:, _Y_ZMAX].set(tables.cyl_zmax)
    cols = cols.at[:, _Y_VALID].set(
        (tables.cyl_obj >= 0).astype(jnp.float32))
    cols = cols.at[:, _Y_MB:_Y_MB + _MB_COLS].set(
        _mat_block(tables, tables.cyl_mat))
    return cols


def triangle_table(tables: SceneTables) -> jnp.ndarray:
    n = tables.tri_v1.shape[0]
    v1, v2, v3 = tables.tri_v1, tables.tri_v2, tables.tri_v3
    cols = jnp.zeros((n, _T_COLS), jnp.float32)
    cols = cols.at[:, _T_V1:_T_V1 + 3].set(v1)
    cols = cols.at[:, _T_E1:_T_E1 + 3].set(v2 - v1)
    cols = cols.at[:, _T_E2:_T_E2 + 3].set(v3 - v2)
    cols = cols.at[:, _T_E3:_T_E3 + 3].set(v1 - v3)
    cols = cols.at[:, _T_N:_T_N + 3].set(tables.tri_n)
    cols = cols.at[:, _T_VALID].set(
        (tables.tri_obj >= 0).astype(jnp.float32))
    cols = cols.at[:, _T_MB:_T_MB + _MB_COLS].set(
        _mat_block(tables, tables.tri_mat))
    return cols


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


def _uniform(seed, pixel, sample, bounce, purpose):
    bits = _key(seed, pixel, sample, bounce, purpose)
    return _shr(bits, 8).astype(jnp.float32) * np.float32(1.0 / (1 << 24))


def _unit_ball(seed, pixel, sample, bounce):
    u1 = _uniform(seed, pixel, sample, bounce,
                  jnp.full_like(pixel, rng_mod.SCAT_U1))
    u2 = _uniform(seed, pixel, sample, bounce,
                  jnp.full_like(pixel, rng_mod.SCAT_U2))
    u3 = _uniform(seed, pixel, sample, bounce,
                  jnp.full_like(pixel, rng_mod.SCAT_U3))
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
# kernel
# ---------------------------------------------------------------------------

# carry attribute order: nx, ny, nz, mtype, checker, param, alb*3, alb2*3
_N_ATTRS = 12


def _merge_chunk(carry, t, cand_attrs, shape3):
    """Fold one chunk's candidates into the running (t_best, attrs).

    t: [C,s,l] candidate distances (INF = miss). cand_attrs: 12 arrays
    broadcastable to [C,s,l]. Ties: later chunk/table wins (matching the
    linear scan's `t <= closest` acceptance, object.cuh:23-37)."""
    t_best, attrs = carry
    c, s, l = shape3
    tmin = jnp.min(t, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, s, l), 0)
    idx = jnp.max(jnp.where(t == tmin, rows, -1), axis=0)
    exact = rows == idx                       # single winner row
    take = (tmin < t_best) | (jnp.isfinite(tmin) & (tmin == t_best))

    new_attrs = []
    for old, cand in zip(attrs, cand_attrs):
        ext = jnp.sum(jnp.where(exact, cand, 0.0), axis=0)
        new_attrs.append(jnp.where(take, ext, old))
    return jnp.where(take, tmin, t_best), tuple(new_attrs)


def _mega_kernel(scal_i_ref, scal_f_ref, sph_ref, rect_ref, cyl_ref,
                 tri_ref,
                 rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
                 tpr_ref, tpg_ref, tpb_ref, cr_ref, cg_ref, cb_ref,
                 alive_ref, pix_ref,
                 oox_ref, ooy_ref, ooz_ref, odx_ref, ody_ref, odz_ref,
                 otpr_ref, otpg_ref, otpb_ref, ocr_ref, ocg_ref, ocb_ref,
                 oalive_ref, *,
                 ns: int, nr: int, ny_: int, nt: int,
                 s_chunk: int, r_chunk: int, y_chunk: int, t_chunk: int,
                 max_depth: int, t_min: float,
                 p_rr: float, grad_bg: bool, exhaust_bg: bool):
    seed = scal_i_ref[0, 0]
    sample = scal_i_ref[0, 1]
    start_bounce = scal_i_ref[0, 2]
    bg_r = scal_f_ref[0, 0]
    bg_g = scal_f_ref[0, 1]
    bg_b = scal_f_ref[0, 2]

    pix = pix_ref[0]
    s, l = pix.shape

    def background(dx, dy, dz):
        if not grad_bg:
            return bg_r, bg_g, bg_b
        inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        t = 0.5 * (dy * inv + 1.0)
        return ((1.0 - t) + t * 0.5, (1.0 - t) + t * 0.7, jnp.ones_like(t))

    def do_bounce(b, st):
        (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, cr, cg, cb, alive) = st
        bounce = jnp.full_like(pix, start_bounce + b)

        live = alive > 0.0
        if p_rr > 0.0:
            u_rr = _uniform(seed, pix, sample, bounce,
                            jnp.full_like(pix, rng_mod.RR))
            live = live & (u_rr <= p_rr)

        a = dx * dx + dy * dy + dz * dz
        rd_dot_ro = dx * ox + dy * oy + dz * oz
        ro_sq = ox * ox + oy * oy + oz * oz
        inv_a = 1.0 / a

        # ---- closest hit: per-family chunk loops share one carry of
        # (t_best, [normal, material-block]) ----

        def sph_body(k, carry):
            sl = pl.ds(k * s_chunk, s_chunk)

            def col(j):
                return sph_ref[sl, j:j + 1].reshape(s_chunk, 1, 1)

            cx, cy, cz = col(_S_CX), col(_S_CY), col(_S_CZ)
            rad = col(_S_RAD)
            c2r, valid = col(_S_C2R), col(_S_VALID)

            hb = rd_dot_ro - (cx * dx + cy * dy + cz * dz)
            c_term = ro_sq - 2.0 * (cx * ox + cy * oy + cz * oz) + c2r
            disc = hb * hb - a * c_term
            sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
            root1 = (-hb - sqrtd) * inv_a
            root2 = (-hb + sqrtd) * inv_a
            t = jnp.where(root1 >= t_min, root1,
                          jnp.where(root2 >= t_min, root2, INF))
            t = jnp.where((disc >= 0.0) & (valid > 0.0), t, INF)

            # candidate outward normal (p - c)/rad; NEGATIVE radii flip
            # it inward — the hollow-glass trick (main.cu:149-150)
            t_c = jnp.where(jnp.isfinite(t), t, 0.0)
            inv_rad = 1.0 / jnp.where(rad == 0.0, 1.0, rad)
            nx = (ox + t_c * dx - cx) * inv_rad
            nyv = (oy + t_c * dy - cy) * inv_rad
            nz = (oz + t_c * dz - cz) * inv_rad

            cand = (nx, nyv, nz,
                    col(_S_MB + _MB_MTYPE), col(_S_MB + _MB_CHECKER),
                    col(_S_MB + _MB_PARAM),
                    col(_S_MB + _MB_ALB), col(_S_MB + _MB_ALB + 1),
                    col(_S_MB + _MB_ALB + 2),
                    col(_S_MB + _MB_ALB2), col(_S_MB + _MB_ALB2 + 1),
                    col(_S_MB + _MB_ALB2 + 2))
            return _merge_chunk(carry, t, cand, (s_chunk, s, l))

        def rect_body(k, carry):
            sl = pl.ds(k * r_chunk, r_chunk)

            def col(j):
                return rect_ref[sl, j:j + 1].reshape(r_chunk, 1, 1)

            kx, ky, kz = col(_R_KX), col(_R_KY), col(_R_KZ)
            ro_k = kx * ox + ky * oy + kz * oz
            rd_k = kx * dx + ky * dy + kz * dz
            rd_ok = rd_k != 0.0
            t = (col(_R_K) - ro_k) / jnp.where(rd_ok, rd_k, 1.0)
            f1x, f1y, f1z = col(_R_F1), col(_R_F1 + 1), col(_R_F1 + 2)
            f2x, f2y, f2z = col(_R_F2), col(_R_F2 + 1), col(_R_F2 + 2)
            x = (f1x * ox + f1y * oy + f1z * oz
                 + t * (f1x * dx + f1y * dy + f1z * dz))
            y = (f2x * ox + f2y * oy + f2z * oz
                 + t * (f2x * dx + f2y * dy + f2z * dz))
            valid = (rd_ok & (t >= t_min)
                     & (x >= col(_R_LO0)) & (x <= col(_R_HI0))
                     & (y >= col(_R_LO1)) & (y <= col(_R_HI1))
                     & (col(_R_VALID) > 0.0))
            t = jnp.where(valid, t, INF)

            cand = (kx, ky, kz,
                    col(_R_MB + _MB_MTYPE), col(_R_MB + _MB_CHECKER),
                    col(_R_MB + _MB_PARAM),
                    col(_R_MB + _MB_ALB), col(_R_MB + _MB_ALB + 1),
                    col(_R_MB + _MB_ALB + 2),
                    col(_R_MB + _MB_ALB2), col(_R_MB + _MB_ALB2 + 1),
                    col(_R_MB + _MB_ALB2 + 2))
            return _merge_chunk(carry, t, cand, (r_chunk, s, l))

        def cyl_body(k, carry):
            sl = pl.ds(k * y_chunk, y_chunk)

            def col(j):
                return cyl_ref[sl, j:j + 1].reshape(y_chunk, 1, 1)

            r00, r01, r02 = col(_Y_R), col(_Y_R + 1), col(_Y_R + 2)
            r10, r11, r12 = col(_Y_R + 3), col(_Y_R + 4), col(_Y_R + 5)
            r20, r21, r22 = col(_Y_R + 6), col(_Y_R + 7), col(_Y_R + 8)
            # object-space ray (object.cuh:235-238 via the w2o transform)
            ox_o = r00 * ox + r01 * oy + r02 * oz + col(_Y_TX)
            oy_o = r10 * ox + r11 * oy + r12 * oz + col(_Y_TY)
            oz_o = r20 * ox + r21 * oy + r22 * oz + col(_Y_TZ)
            dx_o = r00 * dx + r01 * dy + r02 * dz
            dy_o = r10 * dx + r11 * dy + r12 * dz
            dz_o = r20 * dx + r21 * dy + r22 * dz

            ac = dx_o * dx_o + dy_o * dy_o
            bc = 2.0 * (dx_o * ox_o + dy_o * oy_o)
            cc = ox_o * ox_o + oy_o * oy_o - col(_Y_RAD2)
            delta = bc * bc - 4.0 * ac * cc
            sq = jnp.sqrt(jnp.maximum(delta, 0.0))
            a_ok = ac != 0.0
            inv2a = 1.0 / jnp.where(a_ok, 2.0 * ac, 1.0)
            t0 = -(bc - sq) * inv2a
            t1 = -(bc + sq) * inv2a
            t0, t1 = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
            zmin, zmax = col(_Y_ZMIN), col(_Y_ZMAX)

            z0 = oz_o + t0 * dz_o
            z1 = oz_o + t1 * dz_o
            ok0 = (t0 >= t_min) & (z0 >= zmin) & (z0 <= zmax) & a_ok
            ok1 = (t1 >= t_min) & (z1 >= zmin) & (z1 <= zmax) & a_ok
            t = jnp.where(ok0, t0, jnp.where(ok1, t1, INF))
            t = jnp.where((delta >= 0.0) & (col(_Y_VALID) > 0.0), t, INF)

            # candidate normal: object-space radial, to world via R^T
            # (apply_normal with minv = w2o, vec3.cuh:376-381)
            t_c = jnp.where(jnp.isfinite(t), t, 0.0)
            opx = ox_o + t_c * dx_o
            opy = oy_o + t_c * dy_o
            ln2 = opx * opx + opy * opy
            inv_ln = jax.lax.rsqrt(jnp.where(ln2 > 0.0, ln2, 1.0))
            nox = opx * inv_ln
            noy = opy * inv_ln
            nx = r00 * nox + r10 * noy
            nyv = r01 * nox + r11 * noy
            nz = r02 * nox + r12 * noy

            cand = (nx, nyv, nz,
                    col(_Y_MB + _MB_MTYPE), col(_Y_MB + _MB_CHECKER),
                    col(_Y_MB + _MB_PARAM),
                    col(_Y_MB + _MB_ALB), col(_Y_MB + _MB_ALB + 1),
                    col(_Y_MB + _MB_ALB + 2),
                    col(_Y_MB + _MB_ALB2), col(_Y_MB + _MB_ALB2 + 1),
                    col(_Y_MB + _MB_ALB2 + 2))
            return _merge_chunk(carry, t, cand, (y_chunk, s, l))

        def tri_body(k, carry):
            sl = pl.ds(k * t_chunk, t_chunk)

            def col(j):
                return tri_ref[sl, j:j + 1].reshape(t_chunk, 1, 1)

            n0x, n0y, n0z = col(_T_N), col(_T_N + 1), col(_T_N + 2)
            v1x, v1y, v1z = col(_T_V1), col(_T_V1 + 1), col(_T_V1 + 2)
            # plane hit with origin-side flip (hittable.py:38-55)
            oc_n = ((ox - v1x) * n0x + (oy - v1y) * n0y
                    + (oz - v1z) * n0z)
            sign = jnp.where(oc_n < 0.0, -1.0, 1.0)
            d_n = (dx * n0x + dy * n0y + dz * n0z) * sign
            oc_ns = oc_n * sign
            t = -oc_ns / jnp.where(d_n != 0.0, d_n, 1.0)
            # inside test via edge cross-dots (hittable.py:56-71)
            rx = ox + t * dx - v1x
            ry = oy + t * dy - v1y
            rz = oz + t * dz - v1z
            e1x, e1y, e1z = col(_T_E1), col(_T_E1 + 1), col(_T_E1 + 2)
            e2x, e2y, e2z = col(_T_E2), col(_T_E2 + 1), col(_T_E2 + 2)
            e3x, e3y, e3z = col(_T_E3), col(_T_E3 + 1), col(_T_E3 + 2)

            def edge_dot(ex, ey, ez, wx, wy, wz):
                cxp = ey * wz - ez * wy
                cyp = ez * wx - ex * wz
                czp = ex * wy - ey * wx
                return cxp * n0x + cyp * n0y + czp * n0z

            s1 = edge_dot(e1x, e1y, e1z, rx, ry, rz)
            # w2 = r - v2 = (r - v1) - e1 ; w3 = r - v3 = (r - v1) + e3
            s2 = edge_dot(e2x, e2y, e2z, rx - e1x, ry - e1y, rz - e1z)
            s3 = edge_dot(e3x, e3y, e3z, rx + e3x, ry + e3y, rz + e3z)
            inside = (((s1 > 0) & (s2 > 0) & (s3 > 0))
                      | ((s1 < 0) & (s2 < 0) & (s3 < 0)))
            valid = ((d_n < 0.0) & inside & (t >= t_min)
                     & (col(_T_VALID) > 0.0))
            t = jnp.where(valid, t, INF)

            # candidate normal = STORED geometric normal (the XLA path
            # also reports tri_n unflipped; set_face_normal flips later)
            cand = (n0x, n0y, n0z,
                    col(_T_MB + _MB_MTYPE), col(_T_MB + _MB_CHECKER),
                    col(_T_MB + _MB_PARAM),
                    col(_T_MB + _MB_ALB), col(_T_MB + _MB_ALB + 1),
                    col(_T_MB + _MB_ALB + 2),
                    col(_T_MB + _MB_ALB2), col(_T_MB + _MB_ALB2 + 1),
                    col(_T_MB + _MB_ALB2 + 2))
            return _merge_chunk(carry, t, cand, (t_chunk, s, l))

        t0 = jnp.full((s, l), INF, jnp.float32)
        attrs0 = tuple(jnp.zeros((s, l), jnp.float32)
                       for _ in range(_N_ATTRS))
        carry = (t0, attrs0)
        if ns:
            carry = jax.lax.fori_loop(0, ns // s_chunk, sph_body, carry)
        if nr:
            carry = jax.lax.fori_loop(0, nr // r_chunk, rect_body, carry)
        if ny_:
            carry = jax.lax.fori_loop(0, ny_ // y_chunk, cyl_body, carry)
        if nt:
            carry = jax.lax.fori_loop(0, nt // t_chunk, tri_body, carry)
        t_best, attrs = carry
        (nx, ny2, nz, w_mtype, w_checker, w_param,
         w_ar, w_ag, w_ab, w_a2r, w_a2g, w_a2b) = attrs

        hit = jnp.isfinite(t_best)
        t_safe = jnp.where(hit, t_best, 1.0)
        px_ = ox + t_safe * dx
        py_ = oy + t_safe * dy
        pz_ = oz + t_safe * dz

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

        mtype = w_mtype  # float codes
        is_lam = mtype == MAT_LAMBERTIAN
        is_met = mtype == MAT_METAL
        is_die = mtype == MAT_DIELECTRIC
        is_light = mtype == MAT_DIFFUSE_LIGHT

        # ---- scatter ----
        bx, by, bz = _unit_ball(seed, pix, sample, bounce)

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
                          jnp.full_like(pix, rng_mod.DIEL_REFL))
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
        cr = cr + tpr * (em_scale * alb_r + jnp.where(missed, bgr, 0.0))
        cg = cg + tpg * (em_scale * alb_g + jnp.where(missed, bgg, 0.0))
        cb = cb + tpb * (em_scale * alb_b + jnp.where(missed, bgb, 0.0))

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
        alive = scattered.astype(jnp.float32)
        return (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, cr, cg, cb, alive)

    def bounce_step(b, st):
        any_alive = jnp.max(st[-1]) > 0.0
        return jax.lax.cond(any_alive, lambda s_: do_bounce(b, s_),
                            lambda s_: s_, st)

    st = (rox_ref[0], roy_ref[0], roz_ref[0],
          rdx_ref[0], rdy_ref[0], rdz_ref[0],
          tpr_ref[0], tpg_ref[0], tpb_ref[0],
          cr_ref[0], cg_ref[0], cb_ref[0], alive_ref[0])
    st = jax.lax.fori_loop(0, max_depth, bounce_step, st)
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


@functools.partial(
    jax.jit,
    static_argnames=("counts", "max_depth", "t_min", "p_rr", "grad_bg",
                     "exhaust_bg", "interpret"))
def mega_segment(sph_tab, rect_tab, cyl_tab, tri_tab, counts, background,
                 state, pixel, sample_idx, seed, start_bounce,
                 max_depth: int,
                 t_min: float = 1e-3, p_rr: float = 0.0,
                 grad_bg: bool = False, exhaust_bg: bool = False,
                 interpret: bool = False):
    """Advance B rays (B % RAY_TILE == 0) max_depth bounces.

    state: tuple of 13 [B] f32 arrays
    (ox,oy,oz, dx,dy,dz, tpr,tpg,tpb, cr,cg,cb, alive). Returns the
    updated tuple. start_bounce offsets the RNG bounce coordinate so a
    chunked trace draws exactly the same stream as a single-segment one.
    counts = (padded sphere rows or 0, rect rows or 0, cyl rows or 0):
    zero disables that family's chunk loop at trace time."""
    b = state[0].shape[0]
    ns, nr, ny_, nt = counts
    assert b % RAY_TILE == 0
    g = b // RAY_TILE

    def lanes(x, dtype=jnp.float32):
        return x.reshape(g, 8, LANES).astype(dtype)

    scal_i = jnp.stack([jnp.asarray(seed).astype(jnp.int32),
                        jnp.asarray(sample_idx).astype(jnp.int32),
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
        exhaust_bg=bool(exhaust_bg))

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
        ] + [ray_spec] * 14,
        out_specs=(ray_spec,) * 13,
        out_shape=tuple(jax.ShapeDtypeStruct((g, 8, LANES), jnp.float32)
                        for _ in range(13)),
        interpret=interpret,
    )(
        scal_i, scal_f, sph_tab, rect_tab, cyl_tab, tri_tab,
        *[lanes(s) for s in state],
        lanes(pixel, jnp.int32),
    )
    return tuple(o.reshape(b) for o in outs)


def _fresh_state(ro, rd):
    b = ro.shape[0]
    z = jnp.zeros((b,), jnp.float32)
    o = jnp.ones((b,), jnp.float32)
    return (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
            o, o, o, z, z, z, o)


def _compact(state, pixel, orig):
    """Reorder rays so live lanes come first (stable) — dead tiles are
    then contiguous at the tail and short-circuit in the next segment.
    orig carries each row's original ray index for the final unpermute."""
    alive = state[-1] > 0.0
    perm = jnp.argsort(~alive, stable=True)
    state = tuple(s[perm] for s in state)
    return state, pixel[perm], orig[perm]


def _pad_rows(tab, chunk):
    n = tab.shape[0]
    if n % chunk:
        pad = chunk - n % chunk
        tab = jnp.concatenate(
            [tab, jnp.zeros((pad, tab.shape[1]), tab.dtype)])
    return tab


def mega_trace(tables: SceneTables, cfg, ro, rd, pixel, sample_idx, seed):
    """Full-path trace via the megakernel; pads to RAY_TILE internally.

    cfg.compact_every > 0 splits the bounce loop into segments of that
    many bounces with a live-ray compaction between segments — the
    stream-compacted wavefront (SURVEY.md §7 north star). Compaction
    pays off on very deep traces; the per-tile dead-ray short-circuit
    already captures most of the win at typical depths, so 0 (off) is
    the default.

    Pre-condition: mega_supported(tables)."""
    b = ro.shape[0]
    pad = (-b) % RAY_TILE
    if pad:
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), jnp.float32)])
        rd = jnp.concatenate(
            [rd, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                                  (pad, 3))])
        pixel = jnp.concatenate([pixel, jnp.zeros((pad,), pixel.dtype)])
    bp = b + pad

    n_sph, n_rect, n_cyl, n_tri = tables.counts
    tbl = jax.tree_util.tree_map(jnp.asarray, tables)
    sph_tab = _pad_rows(sphere_table(tbl) if n_sph
                        else jnp.zeros((1, _S_COLS), jnp.float32),
                        min(max(n_sph, 1), SPH_CHUNK))
    rect_tab = _pad_rows(rect_table(tbl) if n_rect
                         else jnp.zeros((1, _R_COLS), jnp.float32),
                         min(max(n_rect, 1), AUX_CHUNK))
    cyl_tab = _pad_rows(cylinder_table(tbl) if n_cyl
                        else jnp.zeros((1, _Y_COLS), jnp.float32),
                        min(max(n_cyl, 1), AUX_CHUNK))
    tri_tab = _pad_rows(triangle_table(tbl) if n_tri
                        else jnp.zeros((1, _T_COLS), jnp.float32),
                        min(max(n_tri, 1), SPH_CHUNK))
    counts = (sph_tab.shape[0] if n_sph else 0,
              rect_tab.shape[0] if n_rect else 0,
              cyl_tab.shape[0] if n_cyl else 0,
              tri_tab.shape[0] if n_tri else 0)

    interpret = jax.default_backend() != "tpu"
    kw = dict(p_rr=cfg.p_rr,
              grad_bg=cfg.background_mode == "gradient",
              interpret=interpret)
    exhaust = cfg.exhaust_mode == "background"

    ce = getattr(cfg, "compact_every", 0)
    if ce <= 0 or ce >= cfg.max_depth:
        schedule = [cfg.max_depth]
    else:
        schedule = [ce] * (cfg.max_depth // ce)
        if cfg.max_depth % ce:
            schedule.append(cfg.max_depth % ce)

    state = _fresh_state(ro, rd)
    pixel = pixel.astype(jnp.int32)
    orig = jnp.arange(bp, dtype=jnp.int32)
    done = 0
    for i, seg in enumerate(schedule):
        last = i == len(schedule) - 1
        state = mega_segment(sph_tab, rect_tab, cyl_tab, tri_tab, counts,
                             tbl.background, state, pixel,
                             sample_idx, seed, jnp.int32(done),
                             max_depth=seg,
                             exhaust_bg=exhaust and last, **kw)
        done += seg
        if not last:
            state, pixel, orig = _compact(state, pixel, orig)

    cr, cg, cb = state[9], state[10], state[11]
    rgb = jnp.stack([cr, cg, cb], axis=-1)
    # undo the compaction permutations
    rgb = jnp.zeros((bp, 3), jnp.float32).at[orig].set(rgb)
    return rgb[:b]
