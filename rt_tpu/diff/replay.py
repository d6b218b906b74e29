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

Scope: this estimator covers the RADIOMETRIC chain — albedo, emission
(tex_color/tex_color2 feeding diffuse_light), background — with detached
sampling, same as the reference-free design in diff/inverse.py. Geometry
parameters' interior derivatives (hit-distance chains) still use the
scan path; silhouettes use the CRN finite-difference estimator
(diff/inverse.fit_fd). The reference renderer has no gradients at all
(BASELINE.json north star adds them).
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
from rt_tpu.render.integrator import background_color, trace
from rt_tpu.scene.types import SceneTables

# fields whose gradient the replay estimator computes exactly
REPLAY_FIELDS = ("mat_albedo", "tex_color", "tex_color2", "background")


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
):
    """Build img_fn(params) -> mean radiance [B,3] with a path-replay VJP.

    params keys must be a subset of REPLAY_FIELDS. px/py are the fixed
    pixel batch (closed over; integer arrays carry no cotangents).
    Forward runs cfg.engine verbatim (megakernel included); backward
    replays with `bwd_engine` (default: the hybrid Pallas engine on TPU,
    XLA elsewhere)."""
    base = _device_tables(tables)
    width, height = cfg.width, cfg.height
    if bwd_engine is None:
        if cfg.engine == "mega":
            bwd_engine = "pallas" if jax.default_backend() == "tpu" else "xla"
        else:
            bwd_engine = cfg.engine
    bcfg = cfg.replace(engine=bwd_engine, loop="while")

    px = jnp.asarray(px, jnp.int32)
    py = jnp.asarray(py, jnp.int32)
    pixel = (py * width + px).astype(jnp.uint32)
    seed = jnp.uint32(cfg.seed)
    b = px.shape[0]
    rr_comp = (jnp.float32(1.0 / cfg.p_rr) if cfg.p_rr > 0.0
               else jnp.float32(1.0))

    def _rays(tbl, s):
        sample = jnp.full(px.shape, s, jnp.uint32)
        ro, rd = generate_rays(tbl.camera, width, height, px, py, sample,
                               seed, cfg.enable_defocus)
        return ro, rd, sample

    def _forward(params):
        tbl = apply_params(base, params)

        def body(i, acc):
            ro, rd, sample = _rays(tbl, i.astype(jnp.uint32))
            return acc + trace(tbl, cfg, ro, rd, pixel, sample, seed)

        acc = jax.lax.fori_loop(0, spp, body,
                                jnp.zeros((b, 3), jnp.float32))
        return acc / jnp.float32(spp)

    def _replay_sample_grads(params, g, s, grads):
        """Accumulate d(g . L_s)/dparams for sample s by path replay."""
        tbl = apply_params(base, params)
        ro, rd, sample = _rays(tbl, s)
        # per-sample radiance for the suffix identity — recomputed, not
        # stored (the forward pass keeps no per-sample residuals)
        L = trace(tbl, bcfg, ro, rd, pixel, sample, seed)

        def cond(carry):
            i, o, d, P, C, alive, gr = carry
            return (i < cfg.max_depth) & jnp.any(alive)

        def body(carry):
            i, o, d, P, C, alive, gr = carry
            bounce = i.astype(jnp.uint32)

            survive = jnp.ones_like(alive)
            if cfg.p_rr > 0.0:
                u_rr = rng.uniform(jnp, seed, pixel, sample, bounce, rng.RR)
                survive = u_rr <= cfg.p_rr

            hit = intersect(tbl, o, d, engine=bcfg.engine,
                            traversal=cfg.traversal)
            ball = rng.in_unit_ball(jnp, seed, pixel, sample, bounce)
            refl_u = rng.uniform(jnp, seed, pixel, sample, bounce,
                                 rng.DIEL_REFL)

            def h(pp):
                t2 = apply_params(base, pp)
                sc, em = materials.shade(
                    t2, hit.mat, d, hit.normal, hit.front_face,
                    hit.u, hit.v, hit.p, ball, refl_u)
                bg = background_color(t2, cfg, d)
                return (sc.attenuation, em, bg, sc.direction,
                        sc.ok.astype(jnp.float32))

            (att, em, bg, new_dir, ok_f), h_vjp = jax.vjp(h, params)
            ok = ok_f > 0.5

            live = alive & survive
            scattered = live & hit.hit & ok
            emitter = live & hit.hit & ~ok
            missed = live & ~hit.hit

            contrib = (jnp.where((scattered | emitter)[:, None], em, 0.0)
                       + jnp.where(missed[:, None], bg, 0.0))
            C2 = C + P * contrib
            P2 = jnp.where(scattered[:, None], P * att * rr_comp, P)

            # adjoints (see module docstring): dL/datt = (L - C2)/att on
            # scattered lanes; dL/d{em,bg} = P on their lanes
            cot_att = jnp.where(scattered[:, None],
                                _safe_div(g * (L - C2), att), 0.0)
            cot_em = jnp.where((scattered | emitter)[:, None], g * P, 0.0)
            cot_bg = jnp.where(missed[:, None], g * P, 0.0)
            (gr_inc,) = h_vjp((cot_att, cot_em, cot_bg,
                               jnp.zeros_like(new_dir),
                               jnp.zeros_like(ok_f)))
            gr = jax.tree_util.tree_map(jnp.add, gr, gr_inc)

            o2 = jnp.where(scattered[:, None], hit.p, o)
            d2 = jnp.where(scattered[:, None], new_dir, d)
            return (i + 1, o2, d2, P2, C2, scattered, gr)

        carry0 = (jnp.int32(0), ro, rd,
                  jnp.ones((b, 3), jnp.float32),
                  jnp.zeros((b, 3), jnp.float32),
                  jnp.ones((b,), bool), grads)
        (_, o, d, P, C, alive, grads) = jax.lax.while_loop(
            cond, body, carry0)

        if cfg.exhaust_mode == "background":
            # depth-exhausted lanes credit the sky: one more vjp step
            def h2(pp):
                return background_color(apply_params(base, pp), cfg, d)

            _, vjp2 = jax.vjp(h2, params)
            cot = jnp.where(alive[:, None], g * P, 0.0)
            grads = jax.tree_util.tree_map(jnp.add, grads, vjp2(cot)[0])
        return grads

    @jax.custom_vjp
    def img_fn(params):
        return _forward(params)

    def img_fwd(params):
        return _forward(params), params

    def img_bwd(params, g):
        gs = g / jnp.float32(spp)  # mean over samples

        def body(s, grads):
            return _replay_sample_grads(params, gs, s.astype(jnp.uint32),
                                        grads)

        grads0 = jax.tree_util.tree_map(jnp.zeros_like, params)
        grads = jax.lax.fori_loop(0, spp, body, grads0)
        return (grads,)

    img_fn.defvjp(img_fwd, img_bwd)
    return img_fn


def make_replay_loss_fn(tables: SceneTables, cfg: RenderConfig, spp: int,
                        px, py, target,
                        bwd_engine: Optional[str] = None):
    """(params) -> scalar MSE against target rows [B,3], with the replay
    VJP underneath. jax.grad of this runs in O(B) memory at any depth."""
    img_fn = make_replay_render(tables, cfg, spp, px, py, bwd_engine)
    target = jnp.asarray(target, jnp.float32)

    def loss_fn(params):
        bad = set(params) - set(REPLAY_FIELDS)
        if bad:
            raise ValueError(
                f"replay gradients cover {REPLAY_FIELDS}; got {sorted(bad)} "
                "(use the scan path or fit_fd for geometry parameters)")
        img = img_fn(params)
        return jnp.mean((img - target) ** 2)

    return loss_fn
