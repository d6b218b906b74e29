"""Adaptive sampling: spend the path budget where the noise is.

The reference renders a fixed spp everywhere (gpu-version/main.cu:95-101
loops a constant ns per pixel; every sibling version does the same).
Real scenes concentrate Monte-Carlo noise in a small fraction of pixels
(glass, defocus edges, penumbras, fireflies), so uniform allocation
wastes most of its samples on already-converged sky and diffuse walls.
This driver is a beyond-parity extension: a two-stage adaptive allocator
on top of the existing (pixel_sum, n_samples) progressive accumulator.

How it stays TPU-shaped and replay-exact:
  - The BASE pass renders spp_base samples for every pixel through the
    normal engine path (megakernel included), split into two halves;
    the per-pixel half-mean disagreement is the error estimate sigma_p.
  - Each ADAPTIVE round selects the top-B pixels by priority
    sigma_p / sqrt(n_p) (B fixed -> one stable jit signature;
    relative=True divides by luminance for perceptual allocation) and
    renders k more samples for just those pixels.
  - Sample coordinates: every selected pixel CONTINUES its own stream
    at index n_p — per-lane sample indices on EVERY engine (the
    megakernel carries a per-lane sample vector through its compaction
    permutation, ops/pallas_mega.py), so with sampler="qmc" each pixel
    consumes one contiguous scrambled-Sobol' prefix and keeps the full
    low-discrepancy benefit.
  - Every allocation decision consumes only PREVIOUS rounds' data
    (classic two-stage sampling) and the whole run is a pure function of
    (scene, cfg, budget) — deterministic and exactly reproducible. The
    estimator is consistent and asymptotically unbiased; like every
    two-stage scheme it carries the small textbook adaptive bias (the
    base-pass samples pick each pixel's final n_p and are then divided
    by it), which decays with spp_base and is far below the noise it
    removes.
  - After each round the selected pixels' sigma is refreshed from the
    disagreement between the round mean and the running mean — pixels
    whose rare bright paths only show up late (fireflies) bubble back up
    instead of being written off by the base pass's blind halves.

The estimator is sum_p / n_p: an equally-weighted average of unbiased
sample means.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from rt_tpu.config import RenderConfig
from rt_tpu.render.renderer import render, render_pixels
from rt_tpu.scene.types import SceneTables

def _luminance(img3):
    return (0.2126 * img3[..., 0] + 0.7152 * img3[..., 1]
            + 0.0722 * img3[..., 2])


def _box3(x):
    """3x3 box filter (edge-clamped): per-pixel half-difference sigma
    estimates are extremely noisy at production base budgets; MC noise
    is spatially correlated, so pooling neighbors cuts the estimator's
    own variance ~9x. Used for ALLOCATION only — the running per-pixel
    sigma bookkeeping stays unpooled."""
    p = np.pad(x, 1, mode="edge")
    return (p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
            + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
            + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]) / 9.0


def render_adaptive(
    tables: SceneTables,
    cfg: RenderConfig,
    spp_base: Optional[int] = None,
    rounds: int = 16,
    sel_frac: float = 0.125,
    batch_samples: Optional[int] = None,
    relative: bool = False,
    progress: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Render with cfg.samples_per_pixel * n_pixels TOTAL paths,
    adaptively allocated. Returns (pixel_sum [H,W,3], n [H,W]) — the
    image is pixel_sum / n[..., None] (adaptive_mean).

    spp_base (default spp//2, min 4, even) is the uniform exploration
    budget; the remaining (spp - spp_base) * n_pixels paths are spent
    over `rounds` greedy rounds on the top sel_frac of pixels by the
    marginal-variance-reduction score sigma/n (repeatedly topping up
    the argmax of sigma/n converges to the n_p-proportional-to-sigma_p
    allocation that minimizes total variance for a fixed path budget —
    NOT sigma/sqrt(n), which overconcentrates at n ~ sigma^2).
    Allocation scores pool sigma over a 3x3 neighborhood (_box3);
    relative=True divides by luminance for perceptually-even noise
    instead of minimal absolute RMSE. batch_samples, if given, caps the
    per-round top-up k."""
    w, h = cfg.width, cfg.height
    n_pix = w * h
    spp = cfg.samples_per_pixel
    if spp_base is None:
        spp_base = max(4, spp // 2)
    spp_base = min(spp, spp_base + (spp_base % 2))
    seed = int(cfg.seed)

    # ---- base pass: two half-budget renders -> error estimate ----
    # all path accounting below uses the ACTUALLY rendered base count
    # (2*half, or 1 in the degenerate spp_base==1 case) so the total
    # spend is exactly cfg.samples_per_pixel * n_pixels
    half = spp_base // 2
    c1 = cfg.replace(samples_per_pixel=max(half, 1))
    a1 = np.asarray(render(tables, c1))
    if half:
        a2 = np.asarray(render(tables, c1, sample_offset=half))
        acc = a1 + a2
        n_base = 2 * half
    else:
        a2 = a1
        acc = a1
        n_base = 1
    n = np.full((h, w), n_base, np.float32)
    # half-mean disagreement ~ 2 * stderr(spp_base); constants cancel in
    # the ranking, only the sqrt(n) decay matters
    sigma = _luminance(np.abs(a1 / max(half, 1)
                              - a2 / max(half, 1))) * np.sqrt(max(half, 1))

    budget = (spp - n_base) * n_pix
    if budget <= 0 or rounds <= 0:
        return acc, n

    per_round = budget // rounds
    # fixed selection size (stable jit signature): top sel_frac of the
    # frame, padded to a lane multiple; per-round top-up k spends the
    # round's share across it. If batch_samples caps k, the selection
    # widens so each round still spends its full share.
    def _pad128(x):
        return -(-max(x, 1) // 128) * 128

    b_sel = min(_pad128(int(n_pix * sel_frac)), n_pix)
    if per_round < b_sel:
        # a round's share is below the selection width: shrink the
        # selection (lane-padded) instead of overspending ~b_sel per
        # round — e.g. spp=5 (budget 1*n_pix over 16 rounds) used to
        # spend ~2*n_pix
        b_sel = min(_pad128(per_round), n_pix)
    k = max(1, per_round // b_sel)
    if batch_samples is not None and k > batch_samples:
        k = batch_samples
        b_sel = min(_pad128(per_round // k), n_pix)
    if b_sel >= n_pix:
        b_sel = n_pix
        k = max(1, per_round // n_pix)

    pix_flat = np.arange(n_pix, dtype=np.int32)
    px_all = (pix_flat % w).astype(np.int32)
    py_all = (pix_flat // w).astype(np.int32)

    spent = 0
    for r in range(rounds):
        if spent + k * b_sel > budget + b_sel - 1:
            break  # lane-padding slack only; never a whole extra round
        spent += k * b_sel
        score = _box3(sigma) / n
        if relative:
            score = score / (_luminance(acc / n[..., None]) + 1e-2)
        score = score.reshape(-1)
        if b_sel < n_pix:
            sel = np.argpartition(score, n_pix - b_sel)[n_pix - b_sel:]
        else:
            sel = pix_flat
        sel_px = jnp.asarray(px_all[sel])
        sel_py = jnp.asarray(py_all[sel])
        ys, xs = py_all[sel], px_all[sel]
        # per-pixel continuation on EVERY engine: each pixel extends its
        # OWN sample stream at n_p (per-lane sample indices ride the
        # megakernel too) — contiguous scrambled-Sobol' prefixes under
        # sampler="qmc"
        starts = jnp.asarray(n[ys, xs].astype(np.uint32))
        part = np.asarray(render_pixels(
            tables, cfg, sel_px, sel_py, starts,
            int(k), np.uint32(seed), w, h))
        mean_before = _luminance(acc[ys, xs]) / n[ys, xs]
        acc[ys, xs] += part
        n[ys, xs] += k
        # sigma refresh: round-mean vs prior running-mean disagreement is
        # a (noisy, sqrt(k)-scaled) observation of the same sigma; EMA
        # both ways so estimates converge, while late fireflies still
        # raise sigma enough for the pooled score to re-select them
        obs = np.abs(_luminance(part) / k - mean_before) * np.sqrt(k)
        sigma[ys, xs] = 0.5 * sigma[ys, xs] + 0.5 * obs
        if progress:
            print(f"\radaptive round {r + 1}/{rounds} "
                  f"(+{k} spp x {len(sel)} px)", end="", flush=True)
    if progress:
        print()
    return acc, n


def adaptive_mean(acc: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Per-pixel mean radiance [H,W,3] from (pixel_sum, n)."""
    return acc / np.maximum(n, 1.0)[..., None]
