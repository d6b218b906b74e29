"""Path-replay backward: O(B)-memory gradients via a custom VJP.

Round 1 differentiated the renderer by plain reverse-mode through a
fixed-trip `lax.scan`, which (a) stores every bounce's ray state as a
residual — O(B * depth) memory, out of reach at 1080p — and (b) pins the
forward pass to the slow XLA engine. This module implements the
SURVEY §7 "hard part 2" design instead: a `jax.custom_vjp` whose

  - FORWARD is any engine — including the Pallas megakernel — with NO
    residual state beyond the input rays and the per-sample radiance;
  - BACKWARD re-simulates the path bounce-by-bounce from the counter
    RNG (ops/rng.py keys every draw on absolute (pixel, sample, bounce,
    purpose) coordinates, so the replay consumes bit-identical streams),
    accumulating parameter gradients on the fly with O(B) live state.

The estimator is the standard path-replay identity. Writing the path's
radiance as L = sum_b P_{b-1} * c_b with per-channel prefix throughput
P_b = P_{b-1} * a_b (attenuation) and bounce contribution c_b (emission
or background):

    dL/da_b = P_{b-1} * S_b          with S_b = (L - C_b) / P_b
            = (L - C_b) / a_b        (per channel)
    dL/dc_b = P_{b-1}

where C_b is the color accumulated through bounce b. L is known from a
forward pass, so each bounce's adjoint needs only running (P, C) — no
stored trajectory. The division is the known PRB caveat: a channel whose
attenuation is EXACTLY zero yields 0/0 and we substitute 0 (gradients
through later bounces of such a channel are genuinely zero; only the
current bounce's own adjoint is lost, and only at measure-zero exact-0
albedos).

Scope: the analytic suffix adjoint above covers the RADIOMETRIC chain —
albedo, emission (tex_color/tex_color2 feeding diffuse_light),
background — with detached sampling, same as the reference-free design
in diff/inverse.py. Parameters acting through the hit geometry or the
scattered direction (sph_center, sph_radius, mat_fuzz, mat_ior —
GEOM_FIELDS) have no closed-form suffix identity; for selected
components of those, a FORWARD-MODE tangent replay (`geom_spec`)
re-simulates the path with the per-bounce step `jax.linearize`d once
and K one-hot parameter tangents pushed through it — still O(B) primal
memory (O(B*K) tangents), still any-depth, discrete decisions detached
automatically because they are comparisons. Silhouette terms are not
captured by either estimator; use the CRN finite-difference estimator
(diff/inverse.fit_fd) when visibility boundaries dominate. The
reference renderer has no gradients at all (BASELINE.json north star
adds them).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from rt_tpu.config import RenderConfig
from rt_tpu.diff.inverse import _device_tables, apply_params
from rt_tpu.ops import materials, rng
from rt_tpu.ops.camera import generate_rays
from rt_tpu.ops.intersect import intersect
from rt_tpu.render.integrator import _nee_direct, background_color, trace
from rt_tpu.scene.types import MAT_LAMBERTIAN as _MAT_LAMBERTIAN
from rt_tpu.scene.types import SceneTables

# fields whose gradient the analytic suffix-adjoint replay computes.
# "images" is the image-texture atlas [NI,H,W,3]: the texel fetch is an
# integer-indexed gather (ops/materials._texture_eval), whose VJP is a
# scatter-add of the per-bounce attenuation adjoint into the sampled
# texels — i.e. TEXTURE RECOVERY from renders falls out of the same
# suffix identity (only texels actually hit by some path receive
# gradient; unseen texels keep their init)
REPLAY_FIELDS = ("mat_albedo", "tex_color", "tex_color2", "background",
                 "images")

# fields whose INTERIOR derivative the forward-mode (tangent) replay
# computes — parameters that act through the hit geometry or the
# scattered direction, where the suffix identity has no closed form:
# hit distance/normal/UV chains (sph_center, sph_radius), the metal
# fuzz lobe, and the dielectric Schlick/refraction chain (mat_ior).
# Silhouette (visibility-boundary) terms are NOT captured — that is
# the same detached-sampling scope as the scan path (diff/inverse.py);
# use fit_fd's CRN estimator when silhouettes dominate.
GEOM_FIELDS = ("sph_center", "sph_radius", "mat_fuzz", "mat_ior")


def _safe_div(num, den):
    ok = den != 0.0
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)


def make_replay_render(
    tables: SceneTables,
    cfg: RenderConfig,
    spp: int,
    px,
    py,
    bwd_engine: Optional[str] = None,
    geom_spec: Optional[Dict[str, Sequence[tuple]]] = None,
    bwd_depth: Optional[int] = None,
    bwd_early_exit: bool = False,
    bwd_kernel: Optional[bool] = None,
    geom_tape: Optional[bool] = None,
):
    """Build img_fn(params) -> mean radiance [B,3] with a path-replay VJP.

    params keys must be a subset of REPLAY_FIELDS + GEOM_FIELDS. px/py
    are the fixed pixel batch (closed over; integer arrays carry no
    cotangents). Forward runs cfg.engine verbatim (megakernel included);
    the radiometric backward replays with `bwd_engine` (default: the
    hybrid Pallas engine on TPU, XLA elsewhere).

    geom_spec selects GEOM_FIELDS components for the forward-mode
    tangent replay, {field: [component_index_tuple, ...]} — e.g.
    {"sph_center": [(0, 0), (0, 2)]} differentiates sphere 0's x and z.
    Each component is one tangent direction pushed through a replay
    whose per-bounce step is `jax.linearize`d once (primal shared by
    all K directions); the geometry backward therefore runs the XLA
    intersector (the Pallas kernels are forward-only) and costs
    O(B * K) tangent memory. Components NOT listed get zero gradient
    rows (like fit_fd); fields in geom_spec must be in params.

    bwd_depth truncates BOTH replays (not the forward) at that bounce:
    adjoint mass beyond bounce b decays with the throughput product, so
    truncation bias is tiny (measured cover scene: replaying 8 of 50
    bounces changes the gradient by ~0.4%) while backward cost drops
    roughly in proportion. None (default) replays to cfg.max_depth —
    exact. With truncation the exhaust-to-background credit is skipped
    (truncated lanes are not exhausted).

    bwd_early_exit adds `any(alive)` to the replay-loop conditions so
    the loops stop once every lane has terminated. Default OFF: at
    production shapes the tail of live lanes nearly always reaches
    depth_bwd so the exit never fires, while the any() itself costs a
    full [B] reduction per iteration — and under GSPMD sharding it
    becomes a cross-device all-reduce per iteration (measured on the
    8-device virtual mesh: train-step weak-scaling efficiency 0.68
    with the early exit vs 0.94 fixed-trip; single-CPU-device step
    0.315 -> 0.243 s; real-TPU 1080p grad step identical to 1 ms).
    Turn it on for EXACT (bwd_depth=None) replays of deep configs on
    scenes whose paths all die in the first few bounces.

    bwd_kernel selects the ADJOINT MEGAKERNEL for the radiometric
    backward (pallas_mega.mega_trace_adjoint): the replay runs inside
    the same Pallas bounce loop as the forward — dead-tile
    short-circuit, live-ray group compaction, and chunk culling
    included — accumulating parameter adjoints in-kernel by one-hot
    contraction over gradient slots. None (default) = auto: on when
    the forward engine is the megakernel on a TPU backend. Covers ALL
    REPLAY_FIELDS including "images" (in-kernel atlas adjoint); only
    very large atlases (pallas_mega.adjoint_atlas_ok) fall back to the
    XLA/hybrid per-bounce replay.

    geom_tape routes the TANGENT replay's per-bounce intersection
    through the taped winner (VERDICT r2 #7): the winner codes are
    captured once per sample (the in-kernel mega_capture on TPU), and
    each linearized bounce recomputes the hit against the KNOWN winner
    only (tape.py's per-lane leaf tests) — O(1) per ray instead of the
    full O(N) XLA candidate pass. The tape freezes exactly the
    decisions the tangent estimator detaches anyway (comparisons), so
    the tangents agree with the full-intersect form wherever winners
    agree (everywhere but ulp-flip grazing lanes). None (default) =
    auto: on for TPU backends with a megakernel-supported scene."""
    base = _device_tables(tables)
    width, height = cfg.width, cfg.height
    smp = rng.resolve(cfg.sampler)
    if bwd_engine is None:
        if cfg.engine in ("mega", "queue"):
            # whole-path engines have no per-bounce hit records; the
            # replay needs the hybrid/XLA intersector
            bwd_engine = "pallas" if jax.default_backend() == "tpu" else "xla"
        else:
            bwd_engine = cfg.engine
    bcfg = cfg.replace(engine=bwd_engine, loop="while")
    # the per-sample radiance L needs no AD — run it on the FAST forward
    # engine (the persistent queue / megakernel on TPU); only the
    # per-bounce replay needs the hybrid/XLA intersector's hit records
    lcfg = (cfg if cfg.engine in ("mega", "queue")
            and jax.default_backend() == "tpu" else bcfg)
    depth_bwd = (min(int(bwd_depth), cfg.max_depth) if bwd_depth
                 else cfg.max_depth)
    # exhaust credit is only correct when the replay reaches full depth
    exhaust_bwd = (cfg.exhaust_mode == "background"
                   and depth_bwd == cfg.max_depth)

    px = jnp.asarray(px, jnp.int32)
    py = jnp.asarray(py, jnp.int32)
    pixel = (py * width + px).astype(jnp.uint32)
    seed = jnp.uint32(cfg.seed)
    b = px.shape[0]
    rr_comp = (jnp.float32(1.0 / cfg.p_rr) if cfg.p_rr > 0.0
               else jnp.float32(1.0))
    # cfg.nee: both replays reproduce the integrator's direct-light
    # estimator term-for-term (same NEE_PICK/U1/U2 counter-RNG draws,
    # same suppression of emission reached through a diffuse bounce),
    # so the suffix identity stays exact: the NEE term is just one more
    # per-bounce contribution c_b = att * ld, differentiated through
    # the same per-bounce jax.vjp / jax.linearize as emission. The
    # shadow-visibility factor is a bool (detached), matching the scan
    # path's own AD semantics.
    nee = bool(cfg.nee) and base.n_lights > 0
    if nee and (getattr(cfg, "mis", False)
                or getattr(cfg, "nee_glossy", False)):
        raise ValueError(
            "cfg.mis/nee_glossy: the path-replay suffix identity "
            "reproduces the single-technique lambertian NEE term; "
            "MIS/glossy gradients ride the tape estimator "
            "(fit --method tape) or plain scan AD instead")

    def _rays(tbl, s):
        sample = jnp.full(px.shape, s, jnp.uint32)
        ro, rd = generate_rays(tbl.camera, width, height, px, py, sample,
                               seed, cfg.enable_defocus, cfg.sampler)
        return ro, rd, sample

    def _forward(params, s0):
        tbl = apply_params(base, params)

        def body(i, acc):
            ro, rd, sample = _rays(tbl, s0 + i.astype(jnp.uint32))
            return acc + trace(tbl, cfg, ro, rd, pixel, sample, seed)

        acc = jax.lax.fori_loop(0, spp, body,
                                jnp.zeros((b, 3), jnp.float32))
        return acc / jnp.float32(spp)

    def _replay_sample_grads(params, g, s, grads, L=None):
        """Accumulate d(g . L_s)/dparams for sample s by path replay.

        L: per-sample radiance [B,3] for the suffix identity. The
        custom-VJP forward stores it as a residual (the fwd pass
        computes every sample's radiance anyway — recomputing it here
        cost 0.26 s/sample at 1080p depth-50, 23%+ of the whole grad
        step); None falls back to recomputing on the fast engine (used
        when the residual stack would be too large — see _STORE_L_MAX)."""
        tbl = apply_params(base, params)
        ro, rd, sample = _rays(tbl, s)
        if L is None:
            L = trace(tbl, lcfg, ro, rd, pixel, sample, seed)

        def cond(carry):
            i, o, d, P, C, alive, pd, gr = carry
            if bwd_early_exit:
                return (i < depth_bwd) & jnp.any(alive)
            return i < depth_bwd

        def body(carry):
            i, o, d, P, C, alive, pd, gr = carry
            bounce = i.astype(jnp.uint32)

            survive = jnp.ones_like(alive)
            if cfg.p_rr > 0.0:
                u_rr = smp.uniform(jnp, seed, pixel, sample, bounce, rng.RR)
                survive = u_rr <= cfg.p_rr

            hit = intersect(tbl, o, d, engine=bcfg.engine,
                            traversal=cfg.traversal)
            ball = smp.in_unit_ball(jnp, seed, pixel, sample, bounce)
            refl_u = smp.uniform(jnp, seed, pixel, sample, bounce,
                                 rng.DIEL_REFL)

            def h(pp):
                t2 = apply_params(base, pp)
                sc, em = materials.shade(
                    t2, hit.mat, d, hit.normal, hit.front_face,
                    hit.u, hit.v, hit.p, ball, refl_u)
                bg = background_color(t2, cfg, d)
                outs = (sc.attenuation, em, bg, sc.direction,
                        sc.ok.astype(jnp.float32))
                if nee:
                    # detach geometry inside the direct-light term: the
                    # radiometric suffix adjoint owns only albedo /
                    # emission / background; geometry derivatives of the
                    # NEE chain belong to the tangent replay. This also
                    # keeps the shadow any-hit (a Pallas kernel on TPU)
                    # off the differentiated path.
                    ppg = {k: (jax.lax.stop_gradient(v)
                               if k in GEOM_FIELDS else v)
                           for k, v in pp.items()}
                    t2g = apply_params(base, ppg)
                    ld = _nee_direct(t2g, bcfg, hit, sc.attenuation,
                                     pixel, sample, seed, bounce)
                    outs = outs + (ld,)
                return outs

            houts, h_vjp = jax.vjp(h, params)
            att, em, bg, new_dir, ok_f = houts[:5]
            ok = ok_f > 0.5

            live = alive & survive
            scattered = live & hit.hit & ok
            emitter = live & hit.hit & ~ok
            missed = live & ~hit.hit

            # cfg.nee: emission reached THROUGH a diffuse bounce was
            # already counted by that bounce's light sample
            em_mask = scattered | emitter
            if nee:
                em_mask = em_mask & ~pd
                mt = tbl.mat_type[jnp.clip(
                    hit.mat, 0, tbl.mat_type.shape[0] - 1)]
                lam = scattered & (mt == _MAT_LAMBERTIAN)

            contrib = (jnp.where(em_mask[:, None], em, 0.0)
                       + jnp.where(missed[:, None], bg, 0.0))
            if nee:
                contrib = contrib + jnp.where(lam[:, None], houts[5], 0.0)
            C2 = C + P * contrib
            P2 = jnp.where(scattered[:, None], P * att * rr_comp, P)

            # adjoints (see module docstring): dL/datt = (L - C2)/att on
            # scattered lanes; dL/d{em,bg,ld} = P on their lanes
            cot_att = jnp.where(scattered[:, None],
                                _safe_div(g * (L - C2), att), 0.0)
            cot_em = jnp.where(em_mask[:, None], g * P, 0.0)
            cot_bg = jnp.where(missed[:, None], g * P, 0.0)
            cots = (cot_att, cot_em, cot_bg,
                    jnp.zeros_like(new_dir), jnp.zeros_like(ok_f))
            if nee:
                cots = cots + (jnp.where(lam[:, None], g * P, 0.0),)
            (gr_inc,) = h_vjp(cots)
            gr = jax.tree_util.tree_map(jnp.add, gr, gr_inc)

            o2 = jnp.where(scattered[:, None], hit.p, o)
            d2 = jnp.where(scattered[:, None], new_dir, d)
            pd2 = lam if nee else pd
            return (i + 1, o2, d2, P2, C2, scattered, pd2, gr)

        carry0 = (jnp.int32(0), ro, rd,
                  jnp.ones((b, 3), jnp.float32),
                  jnp.zeros((b, 3), jnp.float32),
                  jnp.ones((b,), bool),
                  jnp.zeros((b,), bool), grads)
        (_, o, d, P, C, alive, _, grads) = jax.lax.while_loop(
            cond, body, carry0)

        if exhaust_bwd:
            # depth-exhausted lanes credit the sky: one more vjp step
            def h2(pp):
                return background_color(apply_params(base, pp), cfg, d)

            _, vjp2 = jax.vjp(h2, params)
            cot = jnp.where(alive[:, None], g * P, 0.0)
            grads = jax.tree_util.tree_map(jnp.add, grads, vjp2(cot)[0])
        return grads

    if geom_tape is None:
        from rt_tpu.ops.pallas_mega import mega_supported

        geom_tape = (jax.default_backend() == "tpu"
                     and mega_supported(base))

    _geom_flat, _n_dirs = [], 0
    if geom_spec:
        _geom_flat = [(f, tuple(idx)) for f, idxs in sorted(geom_spec.items())
                      for idx in idxs]
        _n_dirs = len(_geom_flat)
        bad = set(geom_spec) - set(GEOM_FIELDS)
        if bad:
            raise ValueError(
                f"geom_spec fields must be in {GEOM_FIELDS}; got {sorted(bad)}")
        for f, idx in _geom_flat:
            shape = np.shape(getattr(base, f))
            if len(idx) != len(shape) or any(
                    not (0 <= i < s) for i, s in zip(idx, shape)):
                # an out-of-range index would silently become a dropped
                # one-hot scatter = a silently-zero gradient
                raise ValueError(
                    f"geom_spec component {f}{idx} out of bounds for "
                    f"table shape {shape}")

    def _geom_tangent_basis(params):
        """One-hot tangent pytree per geom_spec direction, stacked on a
        leading K axis (zeros for every non-selected component/field)."""
        missing = set(geom_spec) - set(params)
        if missing:
            raise ValueError(
                f"geom_spec fields {sorted(missing)} are not in params "
                "— pass them (their current table values) so the "
                "tangent replay can perturb them")
        tans = {f: jnp.zeros((_n_dirs,) + jnp.shape(v), jnp.float32)
                for f, v in params.items()}
        for j, (f, idx) in enumerate(_geom_flat):
            tans[f] = tans[f].at[(j,) + idx].set(1.0)
        return tans

    def _replay_sample_geom(params, tans, g, s, acc):
        """Accumulate d(g . L_s)/d(direction_k) [K] by a tangent replay:
        re-simulate the path with the XLA intersector (bit-identical RNG
        streams), `jax.linearize` each bounce once, and push all K
        parameter tangents through the linearized step. Discrete
        decisions (closest-hit winner, scatter/RR/Schlick branches) are
        comparisons, so their tangents vanish — detached sampling by
        construction; only interior chains (t, hit point, normal, UV,
        fuzz lobe, Schlick/refraction) carry derivatives."""
        tbl = apply_params(base, params)
        ro, rd, sample = _rays(tbl, s)

        if geom_tape:
            # capture the winner tape once per sample (in-kernel on
            # TPU); every linearized bounce then recomputes the hit
            # against the KNOWN winner — O(1)/ray vs the O(N) candidate
            # pass (VERDICT r2 #7)
            from rt_tpu.diff.tape import (
                _PID_MASK, TAPE_SHIFT, _attributes_for_tape, capture_tape)

            codes_all = capture_tape(tbl, cfg, ro, rd, pixel, sample,
                                     seed)

        def cond(carry):
            i, o, d, P, C, alive, pd, tst = carry
            if bwd_early_exit:
                return (i < depth_bwd) & jnp.any(alive)
            return i < depth_bwd

        def body(carry):
            i, o, d, P, C, alive, pd, (to, td, tP, tC) = carry
            bounce = i.astype(jnp.uint32)

            survive = jnp.ones_like(alive)
            if cfg.p_rr > 0.0:
                u_rr = smp.uniform(jnp, seed, pixel, sample, bounce, rng.RR)
                survive = u_rr <= cfg.p_rr
            ball = smp.in_unit_ball(jnp, seed, pixel, sample, bounce)
            refl_u = smp.uniform(jnp, seed, pixel, sample, bounce,
                                 rng.DIEL_REFL)
            if geom_tape:
                code_i = jax.lax.dynamic_index_in_dim(
                    codes_all, i, axis=0, keepdims=False)

            def f(o, d, P, C, pp):
                t2 = apply_params(base, pp)
                if geom_tape:
                    hit = _attributes_for_tape(t2, o, d, code_i)
                else:
                    hit = intersect(t2, o, d, engine="xla",
                                    traversal=cfg.traversal)
                sc, em = materials.shade(
                    t2, hit.mat, d, hit.normal, hit.front_face,
                    hit.u, hit.v, hit.p, ball, refl_u)
                bg = background_color(t2, cfg, d)
                live = alive & survive
                scattered = live & hit.hit & sc.ok
                emitter = live & hit.hit & ~sc.ok
                missed = live & ~hit.hit
                em_mask = scattered | emitter
                if nee:
                    # NEE with ATTACHED geometry: light position / hit
                    # point / cos chains carry tangents (the estimator's
                    # interior derivative); shadow visibility is a bool
                    # (detached, same as the scan path's AD). engine
                    # "xla" keeps the any-hit linearizable.
                    em_mask = em_mask & ~pd
                    mt = tbl.mat_type[jnp.clip(
                        hit.mat, 0, tbl.mat_type.shape[0] - 1)]
                    lam = scattered & (mt == _MAT_LAMBERTIAN)
                    ld = _nee_direct(t2, cfg.replace(engine="xla"), hit,
                                     sc.attenuation, pixel, sample, seed,
                                     bounce)
                contrib = (jnp.where(em_mask[:, None], em, 0.0)
                           + jnp.where(missed[:, None], bg, 0.0))
                if nee:
                    contrib = contrib + jnp.where(lam[:, None], ld, 0.0)
                C2 = C + P * contrib
                P2 = jnp.where(scattered[:, None],
                               P * sc.attenuation * rr_comp, P)
                o2 = jnp.where(scattered[:, None], hit.p, o)
                d2 = jnp.where(scattered[:, None], sc.direction, d)
                lam_f = (lam if nee else scattered).astype(jnp.float32)
                return o2, d2, P2, C2, scattered.astype(jnp.float32), lam_f

            (o2, d2, P2, C2, sc_f, lam_f), lin = jax.linearize(
                f, o, d, P, C, params)
            to2, td2, tP2, tC2, _, _ = jax.vmap(lin)(to, td, tP, tC, tans)
            return (i + 1, o2, d2, P2, C2, sc_f > 0.5,
                    (lam_f > 0.5) if nee else pd,
                    (to2, td2, tP2, tC2))

        k = _n_dirs
        zk = lambda x: jnp.zeros((k,) + x.shape, jnp.float32)  # noqa: E731
        carry0 = (jnp.int32(0), ro, rd,
                  jnp.ones((b, 3), jnp.float32),
                  jnp.zeros((b, 3), jnp.float32),
                  jnp.ones((b,), bool),
                  jnp.zeros((b,), bool),
                  (zk(ro), zk(rd),
                   jnp.zeros((k, b, 3), jnp.float32),
                   jnp.zeros((k, b, 3), jnp.float32)))
        (_, o, d, P, C, alive, _, (to, td, tP, tC)) = jax.lax.while_loop(
            cond, body, carry0)

        if exhaust_bwd:
            def f2(d, P, C, pp):
                bg = background_color(apply_params(base, pp), cfg, d)
                return C + jnp.where(alive[:, None], P * bg, 0.0)

            (C,), lin2 = jax.linearize(
                lambda dd, pP, cC, pp: (f2(dd, pP, cC, pp),),
                d, P, C, params)
            (tC,) = jax.vmap(lin2)(td, tP, tC, tans)

        return acc + jnp.einsum("bc,kbc->k", g, tC)

    # store per-sample radiance residuals up to this many floats
    # (spp * B * 3); beyond it (e.g. very high spp at 1080p) the
    # backward recomputes L per sample on the fast engine instead
    _STORE_L_MAX = 1 << 28  # 256M floats = 1 GiB f32
    store_L = spp * b * 3 <= _STORE_L_MAX

    # s0f: the sample-index base as a FLOAT scalar (floored to uint32
    # inside) so per-step sample rotation — true SGD over fresh Monte-
    # Carlo samples — threads through the custom VJP with an ordinary
    # zero cotangent. With a FIXED base the optimizer fits the fixed
    # sample noise: the cover-scene mass-albedo recovery plateaus at
    # median error ~0.10 with fixed samples vs converging with rotation
    # (see fit(..., resample=True)).
    @jax.custom_vjp
    def img_fn(params, s0f):
        return _forward(params, s0f.astype(jnp.uint32))

    def img_fwd(params, s0f):
        s0 = s0f.astype(jnp.uint32)
        if not store_L:
            return _forward(params, s0), (params, None, s0)
        tbl = apply_params(base, params)

        def one(s):
            ro, rd, sample = _rays(tbl, s.astype(jnp.uint32))
            return trace(tbl, cfg, ro, rd, pixel, sample, seed)

        Ls = jax.lax.map(one, s0 + jnp.arange(spp, dtype=jnp.uint32))
        return (jnp.sum(Ls, axis=0) / jnp.float32(spp),
                (params, Ls, s0))

    use_kernel = (bwd_kernel if bwd_kernel is not None
                  else (cfg.engine in ("mega", "queue")
                        and jax.default_backend() == "tpu"))
    # round 4: the adjoint megakernel replays NEE too — the direct-light
    # term's albedo and light-emission credits accumulate in-kernel
    # (pallas_mega._make_do_bounce adjoint+nee), so NEE renders keep
    # the fast backward.

    def img_bwd(res, g):
        params, Ls, s0 = res
        gs = g / jnp.float32(spp)  # mean over samples

        def body(s, grads):
            return _replay_sample_grads(
                params, gs, s0 + s.astype(jnp.uint32), grads,
                L=None if Ls is None else Ls[s])

        def kernel_radiometric(grads):
            """Radiometric backward on the adjoint kernel — one pass
            per sample. engine='queue' replays on the persistent-queue
            adjoint (no completion ring/sort, queue packing —
            queue_trace_adjoint); otherwise the segmented adjoint
            megakernel with the forward's compaction machinery."""
            from rt_tpu.ops.pallas_mega import mega_trace_adjoint
            from rt_tpu.ops.pallas_queue import queue_trace_adjoint

            adjoint = (queue_trace_adjoint if cfg.engine == "queue"
                       else mega_trace_adjoint)
            tbl = apply_params(base, params)

            def kbody(s, grads):
                s_ = s0 + s.astype(jnp.uint32)
                ro, rd, sample = _rays(tbl, s_)
                gk = adjoint(
                    tbl, cfg, ro, rd, pixel, s_, seed,
                    L=(Ls[s] if Ls is not None
                       else trace(tbl, lcfg, ro, rd, pixel, sample,
                                  seed)),
                    gcot=gs, depth_bwd=depth_bwd, exhaust=exhaust_bwd)
                return {k: (v + gk[k] if k in gk else v)
                        for k, v in grads.items()}

            return jax.lax.fori_loop(0, spp, kbody, grads)

        # NOTE: when params mix REPLAY_FIELDS and geom_spec fields, the
        # paths are re-simulated twice (suffix adjoint + tangent loop).
        # A shared primal sweep could feed both, but the adjoint replay
        # wants the fast (Pallas) intersector while the tangent one
        # needs the differentiable XLA form — kept separate.
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        if set(params) & set(REPLAY_FIELDS):
            kernel_ok = use_kernel
            if kernel_ok and "images" in params:
                from rt_tpu.ops.pallas_mega import adjoint_atlas_ok

                kernel_ok = adjoint_atlas_ok(base)
            if kernel_ok:
                grads = kernel_radiometric(grads)
            else:
                grads = jax.lax.fori_loop(0, spp, body, grads)

        # a geom_spec field with an EMPTY component list means "the
        # forward should use this param but no tangent replay runs for
        # it" — the hybrid optimizer (fit_hybrid) supplies that field's
        # gradient out-of-band via CRN finite differences instead
        if _n_dirs:
            tans = _geom_tangent_basis(params)

            def gbody(s, acc):
                return _replay_sample_geom(params, tans, gs,
                                           s0 + s.astype(jnp.uint32), acc)

            dirs = jax.lax.fori_loop(
                0, spp, gbody, jnp.zeros((_n_dirs,), jnp.float32))
            grads = dict(grads)
            for j, (f, idx) in enumerate(_geom_flat):
                grads[f] = grads[f].at[idx].add(dirs[j])
        return (grads, jnp.float32(0.0))

    img_fn.defvjp(img_fwd, img_bwd)
    return img_fn


def make_replay_loss_fn(tables: SceneTables, cfg: RenderConfig, spp: int,
                        px, py, target,
                        bwd_engine: Optional[str] = None,
                        geom_spec: Optional[Dict[str, Sequence[tuple]]]
                        = None,
                        bwd_depth: Optional[int] = None,
                        n_valid: Optional[int] = None,
                        bwd_early_exit: bool = False,
                        bwd_kernel: Optional[bool] = None,
                        geom_tape: Optional[bool] = None):
    """(params) -> scalar MSE against target rows [B,3], with the replay
    VJP underneath. jax.grad of this runs in O(B) memory at any depth.
    Geometry/fuzz/IOR components listed in geom_spec get forward-mode
    tangent-replay gradients; bwd_depth truncates the replays for a
    ~proportional backward speedup at ~0.4% gradient bias (see
    make_replay_render). n_valid masks sharding-pad rows (duplicates of
    pixel 0, see _padded_pixel_list) out of the mean so the sharded
    loss equals the unpadded single-device one."""
    img_fn = make_replay_render(tables, cfg, spp, px, py, bwd_engine,
                                geom_spec=geom_spec, bwd_depth=bwd_depth,
                                bwd_early_exit=bwd_early_exit,
                                bwd_kernel=bwd_kernel,
                                geom_tape=geom_tape)
    target = jnp.asarray(target, jnp.float32)
    n_rows = int(np.shape(px)[0])
    if n_valid is not None and n_valid == n_rows:
        n_valid = None
    geom_ok = set(geom_spec) if geom_spec else set()

    def loss_fn(params, sample_base=0.0):
        bad = set(params) - set(REPLAY_FIELDS) - geom_ok
        if bad:
            raise ValueError(
                f"replay gradients cover {REPLAY_FIELDS} plus geom_spec "
                f"fields {sorted(geom_ok)} of {GEOM_FIELDS}; got "
                f"{sorted(bad)} (use the scan path or fit_fd, or pass "
                "geom_spec)")
        missing = geom_ok - set(params)
        if missing:
            raise ValueError(
                f"geom_spec fields {sorted(missing)} are not in params")
        img = img_fn(params, jnp.asarray(sample_base, jnp.float32))
        se = (img - target) ** 2
        if n_valid is None:
            return jnp.mean(se)
        keep = (jnp.arange(se.shape[0]) < n_valid)[:, None]
        return jnp.sum(jnp.where(keep, se, 0.0)) / jnp.float32(3 * n_valid)

    return loss_fn
