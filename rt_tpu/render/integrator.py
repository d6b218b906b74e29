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


def _bounce(tables: SceneTables, cfg: RenderConfig, state: RayState,
            pixel, sample_idx, seed, bounce_idx) -> RayState:
    """Advance every live lane one bounce."""
    o, d, tp, rgb, alive = state

    survive = jnp.ones_like(alive)
    if cfg.p_rr > 0.0:
        # RR check precedes the hit test (4_0_path_tracing.py:45-46)
        u_rr = rng.uniform(jnp, seed, pixel, sample_idx, bounce_idx, rng.RR)
        survive = u_rr <= cfg.p_rr

    hit = intersect(tables, o, d, engine=cfg.engine,
                    traversal=cfg.traversal)

    ball = rng.in_unit_ball(jnp, seed, pixel, sample_idx, bounce_idx)
    refl_u = rng.uniform(jnp, seed, pixel, sample_idx, bounce_idx,
                         rng.DIEL_REFL)
    sc, em = materials.shade(tables, hit.mat, d, hit.normal, hit.front_face,
                             hit.u, hit.v, hit.p, ball, refl_u)

    bg = background_color(tables, cfg, d)

    live = alive & survive
    scattered = live & hit.hit & sc.ok
    emitter = live & hit.hit & ~sc.ok
    missed = live & ~hit.hit

    # color += emitted * T on every hit; += T * background on miss
    contrib = (jnp.where(scattered[:, None] | emitter[:, None], em, 0.0)
               + jnp.where(missed[:, None], bg, 0.0))
    rgb = rgb + tp * contrib

    rr_comp = jnp.float32(1.0 / cfg.p_rr) if cfg.p_rr > 0.0 else jnp.float32(1.0)
    tp = jnp.where(scattered[:, None], tp * sc.attenuation * rr_comp, tp)
    o = jnp.where(scattered[:, None], hit.p, o)
    d = jnp.where(scattered[:, None], sc.direction, d)
    alive = scattered
    return RayState(o, d, tp, rgb, alive)


def trace(tables: SceneTables, cfg: RenderConfig, ro, rd, pixel, sample_idx,
          seed) -> jnp.ndarray:
    """Trace a batch of primary rays to radiance [B,3].

    engine="mega" routes supported scenes (spheres + solid/checker
    textures) through the full-path Pallas megakernel
    (ops/pallas_mega.py); unsupported scenes fall back to the hybrid
    per-bounce loop with engine="pallas"."""
    if cfg.engine == "mega":
        from rt_tpu.ops.pallas_mega import mega_supported, mega_trace

        if mega_supported(tables):
            sample_scalar = jnp.asarray(sample_idx).reshape(-1)[0]
            return mega_trace(tables, cfg, ro, rd, pixel, sample_scalar,
                              seed)
        cfg = cfg.replace(engine="pallas")

    b = ro.shape[0]
    state = RayState(
        o=ro, d=rd,
        throughput=jnp.ones((b, 3), jnp.float32),
        rgb=jnp.zeros((b, 3), jnp.float32),
        alive=jnp.ones((b,), bool),
    )

    if cfg.loop == "scan":
        def body(st, i):
            return _bounce(tables, cfg, st, pixel, sample_idx, seed, i), None

        state, _ = jax.lax.scan(body, state,
                                jnp.arange(cfg.max_depth, dtype=jnp.uint32))
    else:
        def cond(carry):
            i, st = carry
            return (i < cfg.max_depth) & jnp.any(st.alive)

        def body(carry):
            i, st = carry
            st = _bounce(tables, cfg, st, pixel, sample_idx, seed,
                         i.astype(jnp.uint32))
            return (i + 1, st)

        _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))

    rgb = state.rgb
    if cfg.exhaust_mode == "background":
        # depth-exhausted rays credit the sky (taichi main.py:194-196)
        bg = background_color(tables, cfg, state.d)
        rgb = rgb + jnp.where(state.alive[:, None], state.throughput * bg, 0.0)
    return rgb
