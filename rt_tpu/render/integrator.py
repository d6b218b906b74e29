"""The path-tracing integrator: a wavefront bounce loop over a ray batch.

Radiometric semantics are the CUDA reference's iterative ray_color
(gpu-version/main.cu:17-70), normative for the whole framework:

  while depth > 0:
      if hit and scatter:   color += emitted * T ; T *= attenuation
      elif hit (no scatter): color += T * emitted ; stop   (lights, absorbed metal)
      else (miss):           color += T * background ; stop
  depth exhausted -> contributes what it accumulated (no background)

plus, as config options, the variants found in the sibling versions:
  - gradient-sky background (cmake-cpu-version/main.cpp:35-38)
  - background credit on depth exhaustion (taichi wavefront,
    taichi-version/main.py:194-196)
  - Russian roulette with p_rr survival and 1/p_rr compensation
    (朴素光线追踪/4_0_path_tracing.py:43-88)

TPU-native shape: the whole batch advances one bounce per iteration with
masked (dead) lanes — the wavefront pattern of taichi-version/main.py:154-211
— under lax.while_loop (early-exit when every lane is dead) or lax.scan
(fixed trip count; reverse-differentiable for the inverse-rendering path).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from rt_tpu.config import RenderConfig
from rt_tpu.ops import geometry as geom
from rt_tpu.ops import materials, rng
from rt_tpu.ops.intersect import intersect
from rt_tpu.scene.types import SceneTables


class RayState(NamedTuple):
    o: jnp.ndarray        # [B,3]
    d: jnp.ndarray        # [B,3]
    throughput: jnp.ndarray  # [B,3]
    rgb: jnp.ndarray      # [B,3]
    alive: jnp.ndarray    # [B] bool


def background_color(tables: SceneTables, cfg: RenderConfig, d):
    if cfg.background_mode == "gradient":
        unit = geom.unit(jnp, d)
        t = 0.5 * (unit[:, 1] + 1.0)
        white = jnp.ones((3,), jnp.float32)
        blue = jnp.array([0.5, 0.7, 1.0], jnp.float32)
        return (1.0 - t)[:, None] * white + t[:, None] * blue
    return jnp.broadcast_to(tables.background, d.shape)


def _glossy_pdf(cosr, fz):
    """Solid-angle density of the reference metal's reflect + fuzz*ball
    draw (vec3.cuh fuzz semantics): the chord integral of the uniform
    unit ball scaled to radius fz about the mirror direction,
    p(w) = s (3 cos^2 + s^2) / (2 pi fz^3) with s = sqrt(fz^2 - sin^2)
    inside the cone sin < fz, zero outside. The lambertian
    (2/pi)cos^3 law is exactly the fz=1-about-the-normal case."""
    s2 = fz * fz - (1.0 - cosr * cosr)
    inside = (cosr > 0.0) & (s2 > 0.0) & (fz > 0.0)
    s = jnp.sqrt(jnp.maximum(s2, 0.0))
    denom = (2.0 * np.pi) * jnp.maximum(fz, 1e-8) ** 3
    return jnp.where(inside, s * (3.0 * cosr * cosr + s2) / denom, 0.0)


def _nee_direct(tables: SceneTables, cfg: RenderConfig, hit, albedo,
                pixel, sample_idx, seed, bounce_idx, rd=None):
    """Direct-light term for one lambertian bounce: sample one point on
    one emissive primitive (area sampling over spheres / rects /
    cylinders), cast a shadow ray, and return the single-sample
    estimate of the direct radiance [B,3] (zero where the sample is
    occluded or below the horizon).

    Estimator: the framework's "lambertian" is the reference's
    n + uniform-in-unit-ball rule (vec3.cuh:133-141), whose direction
    density is p(w) = (2/pi) cos^3(theta) (the chord through a unit
    ball centered on the normal is [0, 2 cos theta]; p ~ integral of
    t^2 dt = (8/3) cos^3, normalized over the hemisphere) — NOT the
    true-Lambertian cos/pi. Splitting its estimator at one bounce:
        Ld = albedo * Le * (2/pi) cos^3(theta_s) * cos_l / d^2 * A * L
    with the light picked uniformly (pdf 1/L) and its area sampled
    uniformly (pdf 1/A). Lights are two-sided (the reference's
    diffuse_light emits from both faces, material.cuh:175-178), hence
    |cos_l|. This is an OPT-IN extension; the reference has no light
    sampling of any kind."""
    from rt_tpu.ops.intersect import occluded

    smp = rng.resolve(cfg.sampler)
    L = tables.n_lights
    u_pick = smp.uniform(jnp, seed, pixel, sample_idx, bounce_idx,
                         rng.NEE_PICK)
    li = jnp.minimum((u_pick * L).astype(jnp.int32), L - 1)
    fam = tables.light_fam[li]
    pid = tables.light_pid[li]
    u1 = smp.uniform(jnp, seed, pixel, sample_idx, bounce_idx, rng.NEE_U1)
    u2 = smp.uniform(jnp, seed, pixel, sample_idx, bounce_idx, rng.NEE_U2)

    b = pixel.shape[0]
    point = jnp.zeros((b, 3), jnp.float32)
    n_l = jnp.zeros((b, 3), jnp.float32)
    area = jnp.zeros((b,), jnp.float32)
    mat_l = jnp.zeros((b,), jnp.int32)
    # UV of the sampled light point, per family's own hit-UV convention
    # (ops/intersect.py) — image/textured emission evaluates at the
    # SAMPLED point, exactly like a BSDF hit on the light would
    u_l = jnp.zeros((b,), jnp.float32)
    v_l = jnp.zeros((b,), jnp.float32)
    n_sph, n_rect, n_cyl, n_tri = tables.counts

    def sel(cond, a, bv):
        return jnp.where(cond[:, None] if a.ndim == 2 else cond, a, bv)

    if n_sph:
        ps = jnp.clip(pid, 0, tables.sph_center.shape[0] - 1)
        c = tables.sph_center[ps]
        r = jnp.abs(tables.sph_radius[ps])
        z = 1.0 - 2.0 * u1
        st = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
        phi = jnp.float32(2.0 * np.pi) * u2
        ns = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), z], -1)
        is_s = fam == 0
        point = sel(is_s, c + r[:, None] * ns, point)
        n_l = sel(is_s, ns, n_l)
        area = jnp.where(is_s, 4.0 * np.pi * r * r, area)
        mat_l = jnp.where(is_s, tables.sph_mat[ps], mat_l)
        # sphere UV (object.cuh:87-93 twin, ops/intersect.py sphere UV)
        az_deg = (ns[:, 2] == 0.0) & (ns[:, 0] == 0.0)
        s_phi = jnp.arctan2(-ns[:, 2],
                            jnp.where(az_deg, 1.0, ns[:, 0])) + np.pi
        u_l = jnp.where(is_s, s_phi / (2 * np.pi), u_l)
        v_l = jnp.where(is_s,
                        jnp.arccos(jnp.clip(-ns[:, 1], -1.0, 1.0)) / np.pi,
                        v_l)
    if n_rect:
        pr = jnp.clip(pid, 0, tables.rect_axis.shape[0] - 1)
        ax = tables.rect_axis[pr]
        lo = tables.rect_lo[pr]
        hi = tables.rect_hi[pr]
        k = tables.rect_k[pr]
        f1 = jnp.where(ax == 0, 1, 0)
        f2 = jnp.where(ax == 2, 1, 2)
        a_c = lo[:, 0] + u1 * (hi[:, 0] - lo[:, 0])
        b_c = lo[:, 1] + u2 * (hi[:, 1] - lo[:, 1])
        axes = jnp.arange(3, dtype=jnp.int32)[None, :]
        pt = (jnp.where(axes == ax[:, None], k[:, None], 0.0)
              + jnp.where(axes == f1[:, None], a_c[:, None], 0.0)
              + jnp.where(axes == f2[:, None], b_c[:, None], 0.0))
        is_r = fam == 1
        point = sel(is_r, pt, point)
        n_l = sel(is_r, (axes == ax[:, None]).astype(jnp.float32), n_l)
        area = jnp.where(
            is_r, (hi[:, 0] - lo[:, 0]) * (hi[:, 1] - lo[:, 1]), area)
        mat_l = jnp.where(is_r, tables.rect_mat[pr], mat_l)
        # rect UV = the unit square draw itself
        u_l = jnp.where(is_r, u1, u_l)
        v_l = jnp.where(is_r, u2, v_l)
    if n_cyl:
        pc = jnp.clip(pid, 0, tables.cyl_radius.shape[0] - 1)
        r = jnp.abs(tables.cyl_radius[pc])
        zmin = tables.cyl_zmin[pc]
        zmax = tables.cyl_zmax[pc]
        o2w = tables.cyl_o2w[pc]
        phi = jnp.float32(2.0 * np.pi) * u2
        zc = zmin + u1 * (zmax - zmin)
        po = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), zc], -1)
        no = jnp.stack([jnp.cos(phi), jnp.sin(phi),
                        jnp.zeros_like(phi)], -1)
        is_c = fam == 2
        point = sel(is_c, geom.apply_point(jnp, o2w, po), point)
        # rotation-only transforms (the reference's rotate/translate):
        # the lateral normal transforms by the rotation block
        n_l = sel(is_c, geom.apply_vec(jnp, o2w, no), n_l)
        area = jnp.where(
            is_c, 2.0 * np.pi * r * (zmax - zmin), area)
        mat_l = jnp.where(is_c, tables.cyl_mat[pc], mat_l)
        # cylinder UV: object-space phi re-derived through arctan2 so it
        # lands in intersect's (pi, 3pi]/(4pi) range convention
        c_phi2 = jnp.arctan2(jnp.sin(phi), jnp.cos(phi)) + 2 * np.pi
        u_l = jnp.where(is_c, c_phi2 / (4 * np.pi), u_l)
        v_l = jnp.where(is_c, u1, v_l)
    if n_tri:
        # uniform area sample: P = v1 + b2*e1 + b3*e2 with
        # b2 = sqrt(u1)(1-u2), b3 = sqrt(u1) u2 (the standard sqrt
        # warp); two-sided like every reference emitter, so the stored
        # unit geometric normal's orientation is irrelevant under the
        # |cos_l| below
        pt_ = jnp.clip(pid, 0, tables.tri_v1.shape[0] - 1)
        v1 = tables.tri_v1[pt_]
        e1 = tables.tri_v2[pt_] - v1
        e2 = tables.tri_v3[pt_] - v1
        sq = jnp.sqrt(u1)
        b2 = sq * (1.0 - u2)
        b3 = sq * u2
        pt3 = v1 + b2[:, None] * e1 + b3[:, None] * e2
        crl = geom.safe_length(jnp, geom.cross(jnp, e1, e2))
        is_t = fam == 3
        point = sel(is_t, pt3, point)
        n_l = sel(is_t, tables.tri_n[pt_], n_l)
        area = jnp.where(is_t, 0.5 * crl, area)
        mat_l = jnp.where(is_t, tables.tri_mat[pt_], mat_l)
        b1 = 1.0 - sq
        uvt = (tables.tri_uv1[pt_] * b1[:, None]
               + tables.tri_uv2[pt_] * b2[:, None]
               + tables.tri_uv3[pt_] * b3[:, None])
        u_l = jnp.where(is_t, uvt[:, 0], u_l)
        v_l = jnp.where(is_t, uvt[:, 1], v_l)

    wi = point - hit.p
    d2 = jnp.maximum(geom.length_squared(jnp, wi), 1e-8)
    dist = jnp.sqrt(d2)
    cos_s = geom.dot(jnp, hit.normal, wi) / dist
    cos_l = jnp.abs(geom.dot(jnp, n_l, wi)) / dist
    Le = materials.emitted(tables, mat_l, u_l, v_l, point)
    occ = occluded(tables, hit.p, wi, t_max=jnp.float32(1.0 - 1e-3),
                   engine=("xla" if cfg.engine in ("mega", "queue")
                           else cfg.engine))
    cs = jnp.maximum(cos_s, 0.0)
    ok = (cos_s > 0.0) & ~occ
    mis = bool(getattr(cfg, "mis", False))
    glossy = bool(getattr(cfg, "nee_glossy", False)) and rd is not None
    if mis or glossy:
        p_b = jnp.float32(2.0 / np.pi) * cs * cs * cs
        if glossy:
            # fuzzy-metal lanes sample their own fuzz-ball density
            # about the mirror direction (cfg.nee_glossy); the caller
            # masks the term to lambertian|glossy lanes
            from rt_tpu.scene.types import MAT_METAL

            mc = jnp.clip(hit.mat, 0, tables.mat_type.shape[0] - 1)
            fz = tables.mat_fuzz[mc]
            R = geom.reflect(jnp, geom.unit(jnp, rd), hit.normal)
            cosr = geom.dot(jnp, R, wi) / dist
            p_b = jnp.where(tables.mat_type[mc] == MAT_METAL,
                            _glossy_pdf(cosr, fz), p_b)
        p_n = d2 / (jnp.maximum(area * jnp.float32(L), 1e-8)
                    * jnp.maximum(cos_l, 1e-6))
        if mis:
            # balance heuristic: albedo Le p_b/(p_n + p_b) (= the
            # single-technique p_b/p_n times w = p_n/(p_n+p_b));
            # p_n -> inf as cos_l -> 0 (grazing light) so the term -> 0
            w = p_b / (p_n + p_b + 1e-20)
        else:
            w = p_b / jnp.maximum(p_n, 1e-20)
    else:
        w = (cs * cs * cs * cos_l / d2) * area * jnp.float32(2.0 * L / np.pi)
    return jnp.where(ok[:, None], albedo * Le * w[:, None], 0.0)


def _prim_area(tables: SceneTables, ptype, pid):
    """Surface area of the hit primitive, per family (same formulas as
    the NEE area sampler above — lateral-only cylinders, two-sided
    everything): the BSDF-side MIS weight needs p_nee of the direction
    that just hit an emitter."""
    b = ptype.shape[0]
    area = jnp.zeros((b,), jnp.float32)
    n_sph, n_rect, n_cyl, n_tri = tables.counts
    if n_sph:
        ps = jnp.clip(pid, 0, tables.sph_center.shape[0] - 1)
        r = jnp.abs(tables.sph_radius[ps])
        area = jnp.where(ptype == 0, 4.0 * np.pi * r * r, area)
    if n_rect:
        pr = jnp.clip(pid, 0, tables.rect_axis.shape[0] - 1)
        lo = tables.rect_lo[pr]
        hi = tables.rect_hi[pr]
        area = jnp.where(ptype == 1,
                         (hi[:, 0] - lo[:, 0]) * (hi[:, 1] - lo[:, 1]),
                         area)
    if n_cyl:
        pc = jnp.clip(pid, 0, tables.cyl_radius.shape[0] - 1)
        r = jnp.abs(tables.cyl_radius[pc])
        area = jnp.where(
            ptype == 2,
            2.0 * np.pi * r * (tables.cyl_zmax[pc] - tables.cyl_zmin[pc]),
            area)
    if n_tri:
        pt_ = jnp.clip(pid, 0, tables.tri_v1.shape[0] - 1)
        e1 = tables.tri_v2[pt_] - tables.tri_v1[pt_]
        e2 = tables.tri_v3[pt_] - tables.tri_v1[pt_]
        crl = geom.safe_length(jnp, geom.cross(jnp, e1, e2))
        area = jnp.where(ptype == 3, 0.5 * crl, area)
    return area


def _bounce(tables: SceneTables, cfg: RenderConfig, state: RayState,
            pixel, sample_idx, seed, bounce_idx, prev_diff=None):
    """Advance every live lane one bounce. With cfg.nee (prev_diff is a
    [B] bool carry), returns (RayState, new_prev_diff): emission picked
    up through a diffuse bounce is suppressed (NEE already counted it)
    and each lambertian bounce adds its direct-light sample."""
    o, d, tp, rgb, alive = state
    nee = prev_diff is not None
    smp = rng.resolve(cfg.sampler)

    survive = jnp.ones_like(alive)
    if cfg.p_rr > 0.0:
        # RR check precedes the hit test (4_0_path_tracing.py:45-46)
        u_rr = smp.uniform(jnp, seed, pixel, sample_idx, bounce_idx, rng.RR)
        survive = u_rr <= cfg.p_rr

    hit = intersect(tables, o, d, engine=cfg.engine,
                    traversal=cfg.traversal)

    ball = smp.in_unit_ball(jnp, seed, pixel, sample_idx, bounce_idx)
    refl_u = smp.uniform(jnp, seed, pixel, sample_idx, bounce_idx,
                         rng.DIEL_REFL)
    sc, em = materials.shade(tables, hit.mat, d, hit.normal, hit.front_face,
                             hit.u, hit.v, hit.p, ball, refl_u)

    bg = background_color(tables, cfg, d)

    live = alive & survive
    scattered = live & hit.hit & sc.ok
    emitter = live & hit.hit & ~sc.ok
    missed = live & ~hit.hit

    mis = nee and bool(getattr(cfg, "mis", False))
    em_eff = em
    if mis:
        # balance-heuristic weight on the BSDF-sampled emission hit:
        # prev_diff carries the PREVIOUS diffuse draw's solid-angle
        # density (0 = previous bounce not diffuse -> weight 1, the
        # plain estimator). p_nee is evaluated for the direction that
        # hit this emitter; every emitter is in the light list
        # (scene/types.py collects all MAT_DIFFUSE_LIGHT rows).
        vec = hit.p - o
        d2h = jnp.maximum(geom.length_squared(jnp, vec), 1e-8)
        cos_lh = jnp.abs(geom.dot(jnp, hit.normal, vec)) / jnp.sqrt(d2h)
        a_hit = _prim_area(tables, hit.ptype, hit.pid)
        p_n = d2h / (jnp.maximum(a_hit * jnp.float32(tables.n_lights),
                                 1e-8)
                     * jnp.maximum(cos_lh, 1e-6))
        w_b = jnp.where(prev_diff > 0.0,
                        prev_diff / (prev_diff + p_n + 1e-20), 1.0)
        em_eff = em * w_b[:, None]
    elif nee:
        # emission reached THROUGH a diffuse bounce was already counted
        # by that bounce's light sample
        em_eff = jnp.where(prev_diff[:, None], jnp.zeros_like(em), em)

    # color += emitted * T on every hit; += T * background on miss
    contrib = (jnp.where(scattered[:, None] | emitter[:, None], em_eff, 0.0)
               + jnp.where(missed[:, None], bg, 0.0))
    rgb = rgb + tp * contrib

    if nee:
        mt = tables.mat_type[jnp.clip(hit.mat, 0,
                                      tables.mat_type.shape[0] - 1)]
        from rt_tpu.scene.types import MAT_LAMBERTIAN

        is_diffuse = mt == MAT_LAMBERTIAN
        lam = scattered & is_diffuse
        glossy_on = bool(getattr(cfg, "nee_glossy", False))
        sel = lam
        if glossy_on:
            from rt_tpu.scene.types import MAT_METAL

            fz_l = tables.mat_fuzz[jnp.clip(
                hit.mat, 0, tables.mat_type.shape[0] - 1)]
            glo = scattered & (mt == MAT_METAL) & (fz_l > 0.0)
            sel = lam | glo
        ld = _nee_direct(tables, cfg, hit, sc.attenuation, pixel,
                         sample_idx, seed, bounce_idx,
                         rd=d if glossy_on else None)
        rgb = rgb + jnp.where(sel[:, None], tp * ld, 0.0)
        if mis:
            # density of the draw just taken, for the NEXT bounce's
            # emission weight: (2/pi)cos^3 for the n + unit-ball rule,
            # the fuzz-ball chord density for glossy metal
            udir = geom.unit(jnp, sc.direction)
            csn = jnp.maximum(geom.dot(jnp, udir, hit.normal), 0.0)
            p_new = jnp.float32(2.0 / np.pi) * csn * csn * csn
            if glossy_on:
                Rn = geom.reflect(jnp, geom.unit(jnp, d), hit.normal)
                p_new = jnp.where(
                    glo, _glossy_pdf(geom.dot(jnp, udir, Rn), fz_l),
                    p_new)
            prev_diff = jnp.where(sel, p_new, 0.0)
        else:
            prev_diff = sel

    rr_comp = jnp.float32(1.0 / cfg.p_rr) if cfg.p_rr > 0.0 else jnp.float32(1.0)
    tp = jnp.where(scattered[:, None], tp * sc.attenuation * rr_comp, tp)
    o = jnp.where(scattered[:, None], hit.p, o)
    d = jnp.where(scattered[:, None], sc.direction, d)
    alive = scattered
    st = RayState(o, d, tp, rgb, alive)
    if nee:
        return st, prev_diff
    return st


def trace(tables: SceneTables, cfg: RenderConfig, ro, rd, pixel, sample_idx,
          seed) -> jnp.ndarray:
    """Trace a batch of primary rays to radiance [B,3].

    engine="mega" routes supported scenes (spheres + solid/checker
    textures) through the full-path Pallas megakernel
    (ops/pallas_mega.py); unsupported scenes fall back to the hybrid
    per-bounce loop with engine="pallas"."""
    nee = bool(cfg.nee) and tables.n_lights > 0
    if cfg.engine == "queue":
        from rt_tpu.ops.pallas_mega import mega_supported
        from rt_tpu.ops.pallas_queue import queue_trace

        if mega_supported(tables):
            # persistent ray-queue megakernel: occupancy never decays
            # (VMEM staging pool + lane-granular MXU repack each bounce)
            return queue_trace(tables, cfg, ro, rd, pixel, sample_idx,
                               seed)
        cfg = cfg.replace(engine="pallas")  # empty scene only
    if cfg.engine == "mega":
        from rt_tpu.ops.pallas_mega import mega_supported, mega_trace

        if mega_supported(tables):
            # NEE runs IN-KERNEL (light table + per-bounce shadow chunk
            # pass) for EVERY light family and emission texture —
            # solid/checker bake as color rows, image lights sample the
            # atlas at the light-point UV in-kernel. sample_idx passes
            # through as-is: the kernel takes per-lane sample indices
            # (adaptive sampling's per-pixel stream continuation works
            # on every engine).
            return mega_trace(tables, cfg, ro, rd, pixel, sample_idx,
                              seed)
        cfg = cfg.replace(engine="pallas")  # empty scene only

    b = ro.shape[0]
    state = RayState(
        o=ro, d=rd,
        throughput=jnp.ones((b, 3), jnp.float32),
        rgb=jnp.zeros((b, 3), jnp.float32),
        alive=jnp.ones((b,), bool),
    )
    pd0 = (None if not nee
           else jnp.zeros((b,), jnp.float32)
           if getattr(cfg, "mis", False)
           else jnp.zeros((b,), bool))

    if cfg.loop == "scan":
        def body(carry, i):
            st, pd = carry
            out = _bounce(tables, cfg, st, pixel, sample_idx, seed, i,
                          prev_diff=pd)
            return (out if nee else (out, None)), None

        (state, _), _ = jax.lax.scan(
            body, (state, pd0),
            jnp.arange(cfg.max_depth, dtype=jnp.uint32))
    else:
        def cond(carry):
            i, st, pd = carry
            return (i < cfg.max_depth) & jnp.any(st.alive)

        def body(carry):
            i, st, pd = carry
            out = _bounce(tables, cfg, st, pixel, sample_idx, seed,
                          i.astype(jnp.uint32), prev_diff=pd)
            st, pd = out if nee else (out, None)
            return (i + 1, st, pd)

        _, state, _ = jax.lax.while_loop(cond, body,
                                         (jnp.int32(0), state, pd0))

    rgb = state.rgb
    if cfg.exhaust_mode == "background":
        # depth-exhausted rays credit the sky (taichi main.py:194-196)
        bg = background_color(tables, cfg, state.d)
        rgb = rgb + jnp.where(state.alive[:, None], state.throughput * bg, 0.0)
    return rgb
