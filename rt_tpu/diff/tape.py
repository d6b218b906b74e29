"""Winner-tape reverse-mode gradients: record the path's discrete
structure, differentiate the smooth remainder with plain AD.

The scan estimator (diff/inverse.py, method="ad") reverse-differentiates
the FULL bounce loop — including the closest-hit candidate pass over
every primitive ([B,N] quadratics per bounce, stored as residuals) — so
its memory AND its backward compute scale with the primitive count. The
replay VJP (diff/replay.py) fixes memory for the radiometric fields but
covers geometry only in FORWARD mode: K one-hot tangent directions, one
pushed chain each — fine for a handful of components, useless for
"recover every sphere's center" (K ~ thousands).

This module closes that gap with a two-pass design:

  1. CAPTURE (non-differentiable, any engine): trace the path once and
     record, per bounce, only its DISCRETE outcome — the closest-hit
     winner's (family, index) packed in one int32 per ray per bounce
     (-1 = miss). Every other discrete decision (RR survival, the
     Schlick coin, scatter-vs-absorb, the sampled unit-ball vector) is
     a pure function of the counter RNG's (pixel, sample, bounce)
     coordinates (ops/rng.py), so it needs no storage at all.
  2. REPLAY (differentiable): re-run the bounce loop where the hit is
     recomputed against the KNOWN winner only — the per-lane leaf tests
     of ops/intersect.py — making each bounce an O(1)-per-ray smooth
     closed-form function of the scene tables. Plain `jax.grad`
     through this replay yields REVERSE-mode gradients for EVERY
     continuous parameter at once: geometry (sphere centers/radii,
     rect extents, cylinder caps/radii, triangle vertices), materials
     (albedo, fuzz, IOR, emission), background, and the image-texture
     atlas — one backward pass, cost independent of the parameter
     count.

Memory is held at O(B * sqrt(depth)) by two-level rematerialization:
the bounce scan is chunked into ~sqrt(depth) segments, each segment is
a `jax.checkpoint` (storing only its entry carry), and each bounce
inside a segment is checkpointed again (its shading one-hots are
recomputed during the backward instead of stored).

Estimator semantics are IDENTICAL to method="ad": with the same
parameters the taped winner is the winner the full intersect would
pick, the comparisons AD detaches are exactly the decisions the tape
froze, and the interior chains (hit distance, normal, UV, scatter
direction, Schlick blend) carry the same derivatives — test_tape pins
the gradients against scan-AD. Like every detached-sampling estimator
here, visibility-boundary (silhouette) terms are not captured; compose
with the CRN finite-difference estimator (diff/inverse.fit_fd /
fit_hybrid) when silhouettes dominate.

The reference renderer has no gradients of any kind (BASELINE.json's
north star adds differentiability on top of parity); the closest-hit
semantics replayed here are the CUDA scan's
(gpu-version/object.cuh:23-37, main.cu:17-70).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from rt_tpu.config import RenderConfig
from rt_tpu.diff.inverse import _device_tables, apply_params
from rt_tpu.ops import geometry as geom
from rt_tpu.ops import materials, rng
from rt_tpu.ops.camera import generate_rays
from rt_tpu.ops.intersect import (
    PTYPE_CYLINDER,
    PTYPE_RECT,
    PTYPE_SPHERE,
    PTYPE_TRIANGLE,
    _attributes,
    _cylinder_leaf_test,
    _rect_leaf_test,
    _sphere_leaf_test,
    _triangle_leaf_test,
    intersect,
)
from rt_tpu.render.integrator import background_color
from rt_tpu.scene.types import SceneTables

TAPE_SHIFT = 24                     # code = ptype << 24 | pid ; -1 = miss
_PID_MASK = (1 << TAPE_SHIFT) - 1
_T_MIN = 1e-3                       # the reference's shadow-acne epsilon
                                    # (gpu-version/main.cu:45)

# every continuous scene parameter the tape replay differentiates.
# Geometry fields beyond the sphere tables are included because the
# leaf tests + attribute recompute are closed-form in them too; their
# scope is the same interior-chain one. Note rect_lo/hi, cyl_zmin/zmax
# and tri_v2/v3 act ONLY through the hit UV, and every UV consumer is
# nearest-neighbor (image textures) or hit-point-based (checker) — so
# their interior gradient is zero almost everywhere (AD through the
# full intersect agrees; test_tape pins it): use fit_fd for those, like
# any silhouette-driven parameter. rect_k, cyl_radius and tri_v1 carry
# real plane/quadric chains. cyl_w2o is a 4x4 affine with a baked
# analytic inverse — treat pose via fit_fd instead of differentiating
# the matrix entries.
TAPE_FIELDS = (
    "mat_albedo", "mat_fuzz", "mat_ior",
    "tex_color", "tex_color2", "background", "images",
    "sph_center", "sph_radius",
    "rect_k", "rect_lo", "rect_hi",
    "cyl_radius", "cyl_zmin", "cyl_zmax",
    "tri_v1", "tri_v2", "tri_v3",
    # "camera" takes a whole CameraDef pytree: primary rays are
    # generated from it INSIDE the differentiable region, so camera
    # pose gradients flow through every bounce's hit-point chain
    # (photometric parallax). Chain ops.camera.make_camera_jnp in
    # front to optimize raw lookfrom/lookat/vfov/aperture instead of
    # the derived frame.
    "camera",
)


def capture_tape(tables: SceneTables, cfg: RenderConfig, ro, rd, pixel,
                 sample, seed, engine: Optional[str] = None):
    """Trace (ro, rd) and record each bounce's closest-hit winner.

    Returns codes [max_depth, B] int32: ptype << 24 | pid on a hit, -1
    on a miss. NON-differentiable by construction (inputs are
    stop_gradient'ed; the outputs are integers), so it can run any
    forward engine — default the Pallas per-bounce intersector on TPU,
    XLA elsewhere. Dead lanes keep recording whatever their stale ray
    intersects, exactly like the wavefront loop's masked lanes — the
    replay masks them identically."""
    from rt_tpu.ops.pallas_mega import mega_capture, mega_supported

    if engine is None:
        engine = ("mega" if (jax.default_backend() == "tpu"
                             and mega_supported(tables))
                  else "pallas" if jax.default_backend() == "tpu"
                  else "xla")
    smp = rng.resolve(cfg.sampler)
    tables = jax.tree_util.tree_map(jax.lax.stop_gradient, tables)
    ro = jax.lax.stop_gradient(ro)
    rd = jax.lax.stop_gradient(rd)
    b = ro.shape[0]

    if engine == "mega" and mega_supported(tables):
        # in-kernel capture (VERDICT r2 #3): one megakernel launch per
        # sample instead of max_depth hybrid intersect dispatches.
        # Post-death lanes record -1 where the hybrid records the stale
        # winner — masked identically by the replay's alive chain.
        sample_scalar = jnp.asarray(sample).reshape(-1)[0]
        # winner codes are NEE-invariant; the capture kernel runs the
        # plain estimator (the replay re-adds the direct term)
        codes, _ = mega_capture(tables, cfg.replace(nee=False), ro, rd,
                                jnp.asarray(pixel).astype(jnp.int32),
                                sample_scalar, seed)
        return codes

    def body(st, i):
        o, d, alive = st
        survive = jnp.ones_like(alive)
        if cfg.p_rr > 0.0:
            u_rr = smp.uniform(jnp, seed, pixel, sample, i, rng.RR)
            survive = u_rr <= cfg.p_rr
        hit = intersect(tables, o, d, engine=engine,
                        traversal=cfg.traversal)
        ball = smp.in_unit_ball(jnp, seed, pixel, sample, i)
        refl_u = smp.uniform(jnp, seed, pixel, sample, i, rng.DIEL_REFL)
        sc, _ = materials.shade(tables, hit.mat, d, hit.normal,
                                hit.front_face, hit.u, hit.v, hit.p,
                                ball, refl_u)
        code = jnp.where(
            hit.hit,
            (hit.ptype << TAPE_SHIFT) | hit.pid,
            -1).astype(jnp.int32)
        scattered = alive & survive & hit.hit & sc.ok
        o2 = jnp.where(scattered[:, None], hit.p, o)
        d2 = jnp.where(scattered[:, None], sc.direction, d)
        return (o2, d2, scattered), code

    _, codes = jax.lax.scan(
        body, (ro, rd, jnp.ones((b,), bool)),
        jnp.arange(cfg.max_depth, dtype=jnp.uint32))
    return codes


def _known_t(tables: SceneTables, o, d, ptype, pid):
    """Hit distance against each lane's KNOWN winner primitive — the
    per-lane leaf tests of ops/intersect.py, family-selected by ptype.
    O(1) work per ray; differentiable in the primitive parameters."""
    n_sph, n_rect, n_cyl, n_tri = tables.counts
    fams = []
    if n_sph:
        fams.append((PTYPE_SPHERE, _sphere_leaf_test, n_sph))
    if n_rect:
        fams.append((PTYPE_RECT, _rect_leaf_test, n_rect))
    if n_cyl:
        fams.append((PTYPE_CYLINDER, _cylinder_leaf_test, n_cyl))
    if n_tri:
        fams.append((PTYPE_TRIANGLE, _triangle_leaf_test, n_tri))
    t = jnp.full(o.shape[:1], np.float32(np.inf))
    for pt, factory, n in fams:
        # clamp out-of-family pids before the gather: the jnp.where
        # zeroes both the value and (via its VJP) the cotangent of
        # non-selected lanes, so the clamped row receives no gradient
        pc = jnp.clip(pid, 0, n - 1)
        tf = factory(tables)(pc, o, d, _T_MIN)
        t = jnp.where(ptype == pt, tf, t)
    return t


def _attributes_for_tape(tables: SceneTables, o, d, code):
    """Differentiable hit record against the taped winner `code` [B]:
    the known-winner recompute _tape_bounce is built on, also used by
    the tangent replay's per-bounce linearization (replay.py geom_tape).
    The isfinite guard drops ulp-disagreement lanes (batched candidate
    pass vs per-lane leaf form at grazing/t_min edges) dead instead of
    poisoning the batch with inf hit points."""
    hit_mask = code >= 0
    ptype = jnp.where(hit_mask, code >> TAPE_SHIFT, 0).astype(jnp.int32)
    pid = jnp.where(hit_mask, code & _PID_MASK, 0).astype(jnp.int32)
    t = _known_t(tables, o, d, ptype, pid)
    valid = hit_mask & jnp.isfinite(t)
    t = jnp.where(valid, t, 1.0)
    return _attributes(tables, o, d, valid, t, ptype, pid,
                       jnp.where(valid, pid, -1))


def _tape_bounce(tables: SceneTables, cfg: RenderConfig, st, code, pixel,
                 sample, seed, bounce, rr_comp):
    """One differentiable bounce against the taped winner — the
    integrator's _bounce (render/integrator.py) with the full intersect
    replaced by the known-winner recompute. With cfg.nee the state
    carries prev_diff and the bounce adds the NEE direct term: Le and
    the light-sample geometry differentiate naturally; the shadow test
    (piecewise-constant) is recomputed by an any-hit pass, exactly the
    forward estimator's draw-for-draw semantics."""
    o, d, tp, rgb, alive, prev_diff = st
    nee = bool(cfg.nee) and tables.n_lights > 0
    smp = rng.resolve(cfg.sampler)

    survive = jnp.ones_like(alive)
    if cfg.p_rr > 0.0:
        u_rr = smp.uniform(jnp, seed, pixel, sample, bounce, rng.RR)
        survive = u_rr <= cfg.p_rr

    hit_mask = code >= 0
    hit = _attributes_for_tape(tables, o, d, code)
    valid = hit.hit

    ball = smp.in_unit_ball(jnp, seed, pixel, sample, bounce)
    refl_u = smp.uniform(jnp, seed, pixel, sample, bounce, rng.DIEL_REFL)
    sc, em = materials.shade(tables, hit.mat, d, hit.normal,
                             hit.front_face, hit.u, hit.v, hit.p,
                             ball, refl_u)
    bg = background_color(tables, cfg, d)

    live = alive & survive
    scattered = live & valid & sc.ok
    emitter = live & valid & ~sc.ok
    missed = live & ~hit_mask

    mis = nee and bool(getattr(cfg, "mis", False))
    em_eff = em
    if mis:
        # balance-heuristic emission weight (integrator._bounce twin):
        # prev_diff carries the previous diffuse draw's density
        from rt_tpu.render.integrator import _prim_area

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
        # by that bounce's light sample (integrator._bounce twin)
        em_eff = jnp.where(prev_diff[:, None], jnp.zeros_like(em), em)
    contrib = (jnp.where((scattered | emitter)[:, None], em_eff, 0.0)
               + jnp.where(missed[:, None], bg, 0.0))
    rgb = rgb + tp * contrib
    if nee:
        from rt_tpu.render.integrator import _nee_direct
        from rt_tpu.scene.types import MAT_LAMBERTIAN

        mt = tables.mat_type[jnp.clip(hit.mat, 0,
                                      tables.mat_type.shape[0] - 1)]
        lam = scattered & (mt == MAT_LAMBERTIAN)
        glossy_on = bool(getattr(cfg, "nee_glossy", False))
        sel = lam
        if glossy_on:
            from rt_tpu.scene.types import MAT_METAL

            fz_l = tables.mat_fuzz[jnp.clip(
                hit.mat, 0, tables.mat_type.shape[0] - 1)]
            glo = scattered & (mt == MAT_METAL) & (fz_l > 0.0)
            sel = lam | glo
        ld = _nee_direct(tables, cfg, hit, sc.attenuation, pixel,
                         sample, seed, bounce,
                         rd=d if glossy_on else None)
        rgb = rgb + jnp.where(sel[:, None], tp * ld, 0.0)
        if mis:
            from rt_tpu.render.integrator import _glossy_pdf

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
    tp = jnp.where(scattered[:, None], tp * sc.attenuation * rr_comp, tp)
    o = jnp.where(scattered[:, None], hit.p, o)
    d = jnp.where(scattered[:, None], sc.direction, d)
    return (o, d, tp, rgb, scattered, prev_diff)


def replay_tape(tables: SceneTables, cfg: RenderConfig, ro, rd, codes,
                pixel, sample, seed, segment: Optional[int] = None):
    """Differentiable radiance [B,3] of the taped paths.

    Two-level remat: the depth loop runs as ~sqrt(depth) checkpointed
    segments of checkpointed bounces, so reverse-mode residues are
    O(B * (depth/segment + segment)) ray states instead of every
    bounce's shading internals."""
    depth = codes.shape[0]
    if segment is None:
        segment = max(1, int(round(depth ** 0.5)))
    segment = min(segment, depth)
    rr_comp = (jnp.float32(1.0 / cfg.p_rr) if cfg.p_rr > 0.0
               else jnp.float32(1.0))
    b = ro.shape[0]
    pd_dt = (jnp.float32 if getattr(cfg, "mis", False) else bool)
    st = (ro, rd,
          jnp.ones((b, 3), jnp.float32),
          jnp.zeros((b, 3), jnp.float32),
          jnp.ones((b,), bool),
          jnp.zeros((b,), pd_dt))

    def one_bounce(st, xs):
        code, i = xs
        return _tape_bounce(tables, cfg, st, code, pixel, sample, seed,
                            i, rr_comp), None

    ckpt_bounce = jax.checkpoint(one_bounce)

    def seg_body(st, xs):
        seg_codes, seg_idx = xs
        st, _ = jax.lax.scan(ckpt_bounce, st, (seg_codes, seg_idx))
        return st, None

    idx = jnp.arange(depth, dtype=jnp.uint32)
    n_full, rem = divmod(depth, segment)
    head = n_full * segment
    if n_full:
        st, _ = jax.lax.scan(
            jax.checkpoint(seg_body), st,
            (codes[:head].reshape(n_full, segment, b),
             idx[:head].reshape(n_full, segment)))
    if rem:
        st, _ = jax.lax.scan(ckpt_bounce, st, (codes[head:], idx[head:]))

    o, d, tp, rgb, alive, _pd = st
    if cfg.exhaust_mode == "background":
        bg = background_color(tables, cfg, d)
        rgb = rgb + jnp.where(alive[:, None], tp * bg, 0.0)
    return rgb


def make_tape_render(tables: SceneTables, cfg: RenderConfig, spp: int,
                     px, py, tape_engine: Optional[str] = None,
                     segment: Optional[int] = None):
    """img_fn(params, sample_base) -> mean taped-replay radiance [B,3],
    reverse-differentiable in every TAPE_FIELDS entry of params by plain
    jax.grad — no custom VJP needed: the capture is integer-valued and
    detached, the replay is an ordinary smooth computation."""
    base = _device_tables(tables)
    width, height = cfg.width, cfg.height
    px = jnp.asarray(px, jnp.int32)
    py = jnp.asarray(py, jnp.int32)
    pixel = (py * width + px).astype(jnp.uint32)
    seed = jnp.uint32(cfg.seed)
    b = px.shape[0]

    # precompute the integer tapes for every sample OUTSIDE the
    # checkpointed per-sample body when they fit in HBM: the codes are
    # gradient-free int32s, so saving them as scan inputs costs no AD
    # residuals and spares the backward from re-running the capture
    # trace per sample (measured 1080p depth-50: 2.3 s per sample of a
    # 14.8 s step). Beyond the budget the capture moves inside the
    # checkpoint and is recomputed instead.
    _STORE_TAPE_MAX = 1 << 29  # int32s = 2 GiB
    store_tape = spp * cfg.max_depth * b <= _STORE_TAPE_MAX

    def img_fn(params, sample_base=0.0):
        tbl = apply_params(base, params)
        s0 = jnp.asarray(sample_base, jnp.float32).astype(jnp.uint32)
        samples = s0 + jnp.arange(spp, dtype=jnp.uint32)

        def _rays(s):
            sample = jnp.full(px.shape, s, jnp.uint32)
            ro, rd = generate_rays(tbl.camera, width, height, px, py,
                                   sample, seed, cfg.enable_defocus, cfg.sampler)
            return sample, ro, rd

        def _replay(s, codes):
            sample, ro, rd = _rays(s)
            return replay_tape(tbl, cfg, ro, rd, codes, pixel, sample,
                               seed, segment=segment)

        if store_tape:
            def cap_one(s):
                sample, ro, rd = _rays(s)
                return capture_tape(tbl, cfg, ro, rd, pixel, sample,
                                    seed, engine=tape_engine)

            codes_all = jax.lax.map(cap_one, samples)  # [spp, depth, B]

            def one(acc, xs):
                s, codes = xs
                return acc + _replay(s, codes), None

            acc, _ = jax.lax.scan(jax.checkpoint(one),
                                  jnp.zeros((b, 3), jnp.float32),
                                  (samples, codes_all))
        else:
            def one(acc, s):
                sample, ro, rd = _rays(s)
                codes = capture_tape(tbl, cfg, ro, rd, pixel, sample,
                                     seed, engine=tape_engine)
                return acc + _replay(s, codes), None

            acc, _ = jax.lax.scan(jax.checkpoint(one),
                                  jnp.zeros((b, 3), jnp.float32),
                                  samples)
        return acc / jnp.float32(spp)

    return img_fn


def make_tape_vg(tables: SceneTables, cfg: RenderConfig, px, py, target,
                 schedule=(1, 1, 2, 4, 8, 16),
                 min_width: int = 1 << 16, spp: int = 1):
    """Fast all-params gradient step: in-kernel capture + death-sorted
    shrinking replay (VERDICT r2 #3). Returns step(params, sample_base=0)
    -> (loss, grads) for an spp-sample tape estimate of the MSE against
    `target` rows [B,3]. With spp > 1 every sample is captured (one
    kernel launch each) and the lanes sort by the MAX death over
    samples, so all samples share one layout and accumulate into one
    sorted image — widths are conservative by the across-sample max,
    still ~B*avg_max_depth instead of B*depth.

    Two phases, two jits:

      1. CAPTURE (jit #1): ONE megakernel launch per step
         (ops/pallas_mega.mega_capture) records every bounce's winner
         code AND each lane's exact death count — replacing the hybrid
         per-bounce intersector (measured round 2: 2.3 s of the 12.6 s
         step at 1080p depth-50).
      2. REPLAY-GRAD (jit #2, cached per width signature): lanes are
         sorted by death (descending, stable — a cheap device argsort),
         so live lanes are a PREFIX whose length at each depth is known
         on the host from the death histogram. The replay then runs as
         host-unrolled segments, each sliced to the smallest bucketed
         static width covering its live prefix (+1 bounce of slack for
         ulp-level alive-chain divergence between the kernel and the
         XLA leaf replay). Dead suffixes freeze; the loss compares
         against the same-order-sorted target, so no unsort enters the
         differentiated path. Work drops from B*depth lane-bounces to
         ~B*avg_depth (19x at the cover scene's 2.59 avg), and the
         shrunken widths make per-bounce residuals affordable — no
         outer remat level, so the backward recomputes each bounce once
         instead of twice.

    Width buckets are powers of two (floored at min_width), so the
    replay jit recompiles at most a handful of times across a fit run.
    Requires mega_supported(tables); silhouette terms are detached as in
    every tape estimate."""
    import functools as _ft

    from rt_tpu.ops.pallas_mega import mega_capture, mega_supported

    assert mega_supported(tables), "mega_capture needs a megakernel scene"
    # cfg.nee: the CAPTURE runs nee=False (winner codes and deaths are
    # NEE-invariant — NEE draws separate RNG purposes and never changes
    # path geometry or liveness); the REPLAY adds the direct term
    # differentiably per bounce (_tape_bounce).
    cap_cfg = (cfg.replace(nee=False)
               if bool(cfg.nee) and tables.n_lights > 0 else cfg)
    base = _device_tables(tables)
    width, height = cfg.width, cfg.height
    px = jnp.asarray(px, jnp.int32)
    py = jnp.asarray(py, jnp.int32)
    pixel = (py * width + px).astype(jnp.int32)
    seed = jnp.uint32(cfg.seed)
    b = int(px.shape[0])
    target_j = jnp.asarray(target, jnp.float32)

    depth = cfg.max_depth
    # segment schedule (bounce counts); remainder appended
    sched = []
    left = depth
    for s in schedule:
        if left <= 0:
            break
        s = min(s, left)
        sched.append(s)
        left -= s
    if left:
        sched.append(left)
    # boundary start bounces (first segment always runs full width)
    starts = np.cumsum([0] + sched[:-1])

    @jax.jit
    def cap_fn(params, sample_base):
        tbl = apply_params(base, params)
        s0 = jnp.asarray(sample_base, jnp.float32).astype(jnp.uint32)
        samples = s0 + jnp.arange(spp, dtype=jnp.uint32)

        def cap_one(s_):
            sample = jnp.full(px.shape, s_, jnp.uint32)
            ro, rd = generate_rays(tbl.camera, width, height, px, py,
                                   sample, seed, cfg.enable_defocus, cfg.sampler)
            return mega_capture(tbl, cap_cfg,
                                jax.lax.stop_gradient(ro),
                                jax.lax.stop_gradient(rd),
                                pixel, s_, seed)

        codes, death = jax.lax.map(cap_one, samples)  # [spp,depth,B]
        # +1 bounce slack: a lane whose replay alive-chain outlives the
        # kernel's by one ulp-flipped discrete decision still finishes
        # (its next code is -1, so it dies in that extra bounce); max
        # over samples so every sample's live lanes stay in the prefix
        d_eff = jnp.minimum(death.max(axis=0) + 1, depth - 1)
        order = jnp.argsort(-d_eff, stable=True)
        cnt = jnp.stack([(d_eff >= s).sum() for s in starts[1:]])
        return codes, order, cnt

    def _bucket(n):
        n = int(n)
        if n <= min_width:
            return min(min_width, b)
        return min(b, 1 << int(np.ceil(np.log2(n))))

    @_ft.lru_cache(maxsize=32)
    def _vg_fn(widths):
        def _replay_sorted(tbl, codes_s, order, pid_s, s_):
            """One sample's sorted shrinking replay -> rgb [B,3]."""
            pxs = pid_s % width
            pys = pid_s // width
            sample = jnp.full(pid_s.shape, s_, jnp.uint32)
            ro, rd = generate_rays(tbl.camera, width, height, pxs, pys,
                                   sample, seed, cfg.enable_defocus, cfg.sampler)
            rr_comp = (jnp.float32(1.0 / cfg.p_rr) if cfg.p_rr > 0.0
                       else jnp.float32(1.0))
            st = (ro, rd,
                  jnp.ones((b, 3), jnp.float32),
                  jnp.zeros((b, 3), jnp.float32),
                  jnp.ones((b,), bool),
                  jnp.zeros((b,), jnp.float32
                            if getattr(cfg, "mis", False) else bool))
            upid = pid_s.astype(jnp.uint32)

            done = 0
            for k, seg in enumerate(sched):
                w_k = b if k == 0 else widths[k - 1]
                sub = tuple(x[:w_k] for x in st)
                codes_seg = jnp.take(codes_s[done:done + seg],
                                     order[:w_k], axis=1)
                idx = jnp.arange(done, done + seg, dtype=jnp.uint32)

                def one_bounce(s2, xs, _w=w_k):
                    code, i = xs
                    return _tape_bounce(
                        tbl, cfg, s2, code, upid[:_w], sample[:_w],
                        seed, i, rr_comp), None

                sub, _ = jax.lax.scan(jax.checkpoint(one_bounce), sub,
                                      (codes_seg, idx))
                st = tuple(
                    jnp.concatenate([n_, x[w_k:]]) if w_k < b else n_
                    for n_, x in zip(sub, st))
                done += seg

            o, d, tp, rgb, alive, _pd = st
            if cfg.exhaust_mode == "background":
                bg = background_color(tbl, cfg, d)
                rgb = rgb + jnp.where(alive[:, None], tp * bg, 0.0)
            return rgb

        def loss_fn(params, codes, order, sample_base):
            tbl = apply_params(base, params)
            s0 = jnp.asarray(sample_base, jnp.float32).astype(jnp.uint32)
            pid_s = jnp.take(pixel, order)          # non-diff int gather
            samples = s0 + jnp.arange(spp, dtype=jnp.uint32)

            if spp == 1:
                img = _replay_sorted(tbl, codes[0], order, pid_s,
                                     samples[0])
            else:
                def one(acc, xs):
                    s_, codes_s = xs
                    return acc + _replay_sorted(tbl, codes_s, order,
                                                pid_s, s_), None

                acc, _ = jax.lax.scan(jax.checkpoint(one),
                                      jnp.zeros((b, 3), jnp.float32),
                                      (samples, codes))
                img = acc / jnp.float32(spp)
            tgt = jnp.take(target_j, order, axis=0)  # non-diff gather
            return jnp.mean((img - tgt) ** 2)

        return jax.jit(jax.value_and_grad(loss_fn))

    def step(params, sample_base=0.0):
        codes, order, cnt = cap_fn(params, sample_base)
        widths = tuple(_bucket(n) for n in np.asarray(cnt))
        return _vg_fn(widths)(params, codes, order, sample_base)

    return step


def make_tape_loss_fn(tables: SceneTables, cfg: RenderConfig, spp: int,
                      px, py, target,
                      tape_engine: Optional[str] = None,
                      segment: Optional[int] = None,
                      n_valid: Optional[int] = None):
    """(params, sample_base) -> scalar MSE against target rows [B,3];
    jax.grad of this yields reverse-mode gradients for every continuous
    parameter in params (TAPE_FIELDS) in ONE backward pass. n_valid
    masks sharding-pad rows like make_replay_loss_fn."""
    img_fn = make_tape_render(tables, cfg, spp, px, py,
                              tape_engine=tape_engine, segment=segment)
    target = jnp.asarray(target, jnp.float32)
    n_rows = int(np.shape(px)[0])
    if n_valid is not None and n_valid == n_rows:
        n_valid = None

    def loss_fn(params, sample_base=0.0):
        bad = set(params) - set(TAPE_FIELDS)
        if bad:
            raise ValueError(
                f"tape gradients cover {TAPE_FIELDS}; got {sorted(bad)}")
        img = img_fn(params, sample_base)
        se = (img - target) ** 2
        if n_valid is None:
            return jnp.mean(se)
        keep = (jnp.arange(se.shape[0]) < n_valid)[:, None]
        return jnp.sum(jnp.where(keep, se, 0.0)) / jnp.float32(3 * n_valid)

    return loss_fn
