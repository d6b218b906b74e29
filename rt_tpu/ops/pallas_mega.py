"""Pallas path-tracing megakernel: the full bounce loop on-chip.

This is the north-star kernel (BASELINE.json): one pallas_call traces a
tile of rays through the ENTIRE path — closest-hit, shading, scatter,
RNG — with all per-ray state resident in VMEM across bounces. Per
bounce, HBM sees nothing; per path, HBM traffic is one ray in + one RGB
out. Contrast the hybrid engine, where every bounce round-trips the ray
state and runs ~20 XLA gather/elementwise kernels (ops/intersect.py
_attributes + ops/materials.scatter) — measured ~7x slower per bounce.

Key structures:
  - A flat [N, 16] "shading table": sphere geometry + its material's
    full parameter set baked into one row (sphere-indexed), so the
    winner's shading data is extracted during the closest-hit chunk
    merge by masked reduction — zero gathers anywhere. This flattening
    is the megakernel analogue of the Taichi SoA material dispatch
    (taichi-version/material.py:89-145).
  - Counter-based RNG (the triple32 mixer of ops/rng.py) reimplemented
    in-kernel on int32 with logical shifts — bit-identical streams to
    the XLA/oracle path, keyed (pixel, sample, bounce, purpose).
  - Dead tiles short-circuit: each bounce runs under lax.cond on
    "any lane alive", so a tile whose rays have all terminated costs a
    scalar test per remaining bounce (the wavefront-compaction payoff
    without moving any memory; rays are pixel-ordered, and death is
    spatially coherent).

Radiometric semantics are gpu-version/main.cu:17-70 exactly (see
render/integrator.py). Supported scene shape (static check
`mega_supported`): sphere primitives, all four materials, solid +
checker textures. Anything else falls back to the hybrid engine.

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
MAX_CHUNK = 64

# shading-table columns
_C_CX, _C_CY, _C_CZ, _C_RAD, _C_C2R, _C_VALID = 0, 1, 2, 3, 4, 5
_C_MTYPE, _C_CHECKER, _C_PARAM = 6, 7, 8
_C_ALB = 9    # 9,10,11
_C_ALB2 = 12  # 12,13,14
_N_COLS = 16

_I32 = jnp.int32
_GOLD = np.int32(np.uint32(0x9E3779B9).astype(np.int64) - (1 << 32))
_M1 = np.int32(np.uint32(0xED5AD4BB).astype(np.int64) - (1 << 32))
_M2 = np.int32(np.uint32(0xAC4C1B51).astype(np.int64) - (1 << 32))
_M3 = np.int32(np.uint32(0x31848BAB).astype(np.int64) - (1 << 32))


def mega_supported(tables: SceneTables) -> bool:
    """Static scene-shape check (counts + image-atlas shape only)."""
    n_sph, n_rect, n_cyl, n_tri = tables.counts
    no_images = tables.images.shape[:3] == (1, 1, 1)
    return n_sph > 0 and n_rect == n_cyl == n_tri == 0 and no_images


def shading_table(tables: SceneTables) -> jnp.ndarray:
    """Bake sphere geometry + material + texture into [N, 16] rows.
    O(N) gathers, done once per launch outside the kernel."""
    n = tables.sph_center.shape[0]
    mat = tables.sph_mat
    mtype = tables.mat_type[mat]
    tex = tables.mat_tex[mat]
    tex_safe = jnp.maximum(tex, 0)
    ttype = tables.tex_type[tex_safe]
    is_checker = (tex >= 0) & (ttype == TEX_CHECKER)
    from_tex = tables.tex_color[tex_safe]
    base = jnp.where((tex >= 0)[:, None], from_tex, tables.mat_albedo[mat])
    base = jnp.where((mtype == MAT_DIELECTRIC)[:, None],
                     jnp.ones_like(base), base)
    alb2 = tables.tex_color2[tex_safe]
    # metal fuzz and dielectric IOR are mutually exclusive: one param slot
    param = jnp.where(mtype == MAT_METAL, tables.mat_fuzz[mat],
                      jnp.where(mtype == MAT_DIELECTRIC,
                                tables.mat_ior[mat], 0.0))
    c = tables.sph_center
    r = tables.sph_radius
    cols = jnp.zeros((n, _N_COLS), jnp.float32)
    cols = cols.at[:, _C_CX].set(c[:, 0])
    cols = cols.at[:, _C_CY].set(c[:, 1])
    cols = cols.at[:, _C_CZ].set(c[:, 2])
    cols = cols.at[:, _C_RAD].set(r)
    cols = cols.at[:, _C_C2R].set((c * c).sum(-1) - r * r)
    cols = cols.at[:, _C_VALID].set((tables.sph_obj >= 0).astype(jnp.float32))
    cols = cols.at[:, _C_MTYPE].set(mtype.astype(jnp.float32))
    cols = cols.at[:, _C_CHECKER].set(is_checker.astype(jnp.float32))
    cols = cols.at[:, _C_PARAM].set(param)
    cols = cols.at[:, _C_ALB:_C_ALB + 3].set(base)
    cols = cols.at[:, _C_ALB2:_C_ALB2 + 3].set(alb2)
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


def _mega_kernel(scal_i_ref, scal_f_ref, sh_ref,
                 rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
                 tpr_ref, tpg_ref, tpb_ref, cr_ref, cg_ref, cb_ref,
                 alive_ref, pix_ref,
                 oox_ref, ooy_ref, ooz_ref, odx_ref, ody_ref, odz_ref,
                 otpr_ref, otpg_ref, otpb_ref, ocr_ref, ocg_ref, ocb_ref,
                 oalive_ref, *,
                 n: int, chunk: int, max_depth: int, t_min: float,
                 p_rr: float, grad_bg: bool, exhaust_bg: bool):
    seed = scal_i_ref[0, 0]
    sample = scal_i_ref[0, 1]
    start_bounce = scal_i_ref[0, 2]
    bg_r = scal_f_ref[0, 0]
    bg_g = scal_f_ref[0, 1]
    bg_b = scal_f_ref[0, 2]

    pix = pix_ref[0]
    n_chunks = n // chunk

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

        # ---- closest hit over sphere chunks, extracting the winner's
        # full shading row by masked reduction ----
        a = dx * dx + dy * dy + dz * dz
        rd_dot_ro = dx * ox + dy * oy + dz * oz
        ro_sq = ox * ox + oy * oy + oz * oz
        inv_a = 1.0 / a

        s, l = pix.shape
        n_attr = 11  # cx cy cz rad mtype checker param alb(3) -> plus alb2(3)

        def chunk_body(k, carry):
            t_best, attrs = carry
            sl = pl.ds(k * chunk, chunk)

            def col(j):
                return sh_ref[sl, j:j + 1].reshape(chunk, 1, 1)

            cx, cy, cz = col(_C_CX), col(_C_CY), col(_C_CZ)
            c2r, valid = col(_C_C2R), col(_C_VALID)

            hb = rd_dot_ro - (cx * dx + cy * dy + cz * dz)
            c_term = ro_sq - 2.0 * (cx * ox + cy * oy + cz * oz) + c2r
            disc = hb * hb - a * c_term
            sqrtd = jnp.sqrt(jnp.maximum(disc, 0.0))
            root1 = (-hb - sqrtd) * inv_a
            root2 = (-hb + sqrtd) * inv_a
            t = jnp.where(root1 >= t_min, root1,
                          jnp.where(root2 >= t_min, root2, INF))
            t = jnp.where((disc >= 0.0) & (valid > 0.0), t, INF)

            tmin = jnp.min(t, axis=0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, s, l), 0)
            idx = jnp.max(jnp.where(t == tmin, rows, -1), axis=0)
            exact = rows == idx                       # single winner row
            # later chunk wins exact-t ties (ascending index order); the
            # isfinite guard keeps INF==INF from "winning"
            take = (tmin < t_best) | (jnp.isfinite(tmin) & (tmin == t_best))

            def extract(j):
                v = col(j)
                return jnp.sum(jnp.where(exact, v, 0.0), axis=0)

            new_attrs = []
            for ai, j in enumerate((_C_CX, _C_CY, _C_CZ, _C_RAD, _C_MTYPE,
                                    _C_CHECKER, _C_PARAM,
                                    _C_ALB, _C_ALB + 1, _C_ALB + 2,
                                    _C_ALB2, _C_ALB2 + 1, _C_ALB2 + 2)):
                new_attrs.append(jnp.where(take, extract(j), attrs[ai]))
            t_best = jnp.where(take, tmin, t_best)
            return t_best, tuple(new_attrs)

        t0 = jnp.full((s, l), INF, jnp.float32)
        attrs0 = tuple(jnp.zeros((s, l), jnp.float32) for _ in range(13))
        t_best, attrs = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                          (t0, attrs0))
        (w_cx, w_cy, w_cz, w_rad, w_mtype, w_checker, w_param,
         w_ar, w_ag, w_ab, w_a2r, w_a2g, w_a2b) = attrs

        hit = jnp.isfinite(t_best)
        t_safe = jnp.where(hit, t_best, 1.0)
        px_ = ox + t_safe * dx
        py_ = oy + t_safe * dy
        pz_ = oz + t_safe * dz

        inv_rad = 1.0 / jnp.where(w_rad == 0.0, 1.0, w_rad)
        nx = (px_ - w_cx) * inv_rad
        ny = (py_ - w_cy) * inv_rad
        nz = (pz_ - w_cz) * inv_rad
        d_dot_n = dx * nx + dy * ny + dz * nz
        front = d_dot_n < 0.0
        sgn = jnp.where(front, 1.0, -1.0)
        nx, ny, nz = nx * sgn, ny * sgn, nz * sgn

        # checker texture (texture.cuh:44-52)
        sines = (jnp.sin(10.0 * px_) * jnp.sin(10.0 * py_)
                 * jnp.sin(10.0 * pz_))
        odd = w_checker > 0.0
        use2 = odd & (sines < 0.0)
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
        lam_y = ny + by
        lam_z = nz + bz
        degen = ((jnp.abs(lam_x) < 1e-8) & (jnp.abs(lam_y) < 1e-8)
                 & (jnp.abs(lam_z) < 1e-8))
        lam_x = jnp.where(degen, nx, lam_x)
        lam_y = jnp.where(degen, ny, lam_y)
        lam_z = jnp.where(degen, nz, lam_z)

        inv_len = jax.lax.rsqrt(a)
        ux, uy, uz = dx * inv_len, dy * inv_len, dz * inv_len
        u_dot_n = ux * nx + uy * ny + uz * nz
        ref_x = ux - 2.0 * u_dot_n * nx
        ref_y = uy - 2.0 * u_dot_n * ny
        ref_z = uz - 2.0 * u_dot_n * nz
        fuzz = w_param
        met_x = ref_x + fuzz * bx
        met_y = ref_y + fuzz * by
        met_z = ref_z + fuzz * bz
        met_ok = (met_x * nx + met_y * ny + met_z * nz) > 0.0

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
        rp_y = ratio * (uy + cos_theta * ny)
        rp_z = ratio * (uz + cos_theta * nz)
        rp_l2 = rp_x * rp_x + rp_y * rp_y + rp_z * rp_z
        par = -jnp.sqrt(jnp.abs(1.0 - rp_l2))
        fr_x = rp_x + par * nx
        fr_y = rp_y + par * ny
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
        return jax.lax.cond(any_alive, lambda s: do_bounce(b, s),
                            lambda s: s, st)

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
    static_argnames=("max_depth", "t_min", "p_rr", "grad_bg", "exhaust_bg",
                     "interpret"))
def mega_segment(shading, background, state, pixel, sample_idx, seed,
                 start_bounce, max_depth: int, t_min: float = 1e-3,
                 p_rr: float = 0.0, grad_bg: bool = False,
                 exhaust_bg: bool = False, interpret: bool = False):
    """Advance B rays (B % RAY_TILE == 0) max_depth bounces.

    state: tuple of 13 [B] f32 arrays
    (ox,oy,oz, dx,dy,dz, tpr,tpg,tpb, cr,cg,cb, alive). Returns the
    updated tuple. start_bounce offsets the RNG bounce coordinate so a
    chunked trace draws exactly the same stream as a single-segment one.
    """
    b = state[0].shape[0]
    n = shading.shape[0]
    assert b % RAY_TILE == 0
    chunk = min(n, MAX_CHUNK)
    assert n % chunk == 0
    g = b // RAY_TILE

    def lanes(x, dtype=jnp.float32):
        return x.reshape(g, 8, LANES).astype(dtype)

    scal_i = jnp.stack([jnp.asarray(seed).astype(jnp.int32),
                        jnp.asarray(sample_idx).astype(jnp.int32),
                        jnp.asarray(start_bounce).astype(jnp.int32)]
                       ).reshape(1, 3)
    scal_f = jnp.asarray(background, jnp.float32).reshape(1, 3)

    kernel = functools.partial(
        _mega_kernel, n=n, chunk=chunk, max_depth=int(max_depth),
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
            pl.BlockSpec(memory_space=pltpu.VMEM),   # shading table
        ] + [ray_spec] * 14,
        out_specs=(ray_spec,) * 13,
        out_shape=tuple(jax.ShapeDtypeStruct((g, 8, LANES), jnp.float32)
                        for _ in range(13)),
        interpret=interpret,
    )(
        scal_i, scal_f, shading,
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


def mega_trace(tables: SceneTables, cfg, ro, rd, pixel, sample_idx, seed):
    """Full-path trace via the megakernel; pads to RAY_TILE internally.

    cfg.compact_every > 0 splits the bounce loop into segments of that
    many bounces with a live-ray compaction between segments — the
    stream-compacted wavefront (SURVEY.md §7 north star): after a few
    bounces most lanes are dead, compaction packs survivors into few
    tiles, and the dead tiles cost one scalar test per remaining bounce.

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
    sh = shading_table(tables)
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
        # pad rays are dead after segment 1, so compaction pushes them out
        state = mega_segment(sh, tables.background, state, pixel,
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
