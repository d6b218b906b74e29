"""Render configuration.

Mirrors the reference's two-tier config surface (argv flags + JSON scene
header): width/height/spp/max_depth/background come from the scene JSON
top level (gpu-version/parser.hpp:512-517), the rest are framework knobs
the reference hard-codes (#defines, hardcoded if(true) switches).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (non-traced) render settings. Hashable: usable as a jit static arg."""

    width: int = 400
    height: int = 225
    samples_per_pixel: int = 16
    max_depth: int = 8

    # Background on miss:
    #   "constant" — scene background color (gpu-version/main.cu:63)
    #   "gradient" — (1-t)*white + t*(0.5,0.7,1.0) sky
    #                (cmake-cpu-version/main.cpp:35-38, taichi main.py:16-21)
    background_mode: str = "constant"

    # What a depth-exhausted ray contributes:
    #   "black"      — zero (gpu-version/main.cu:68-69, normative)
    #   "background" — throughput * background (taichi wavefront, main.py:194-196)
    exhaust_mode: str = "black"

    # Thin-lens defocus. The CUDA reference *disables* lens sampling
    # (camera.cuh:33-34); the CPU/Taichi versions keep it. Default off to
    # match the primary (GPU) implementation.
    enable_defocus: bool = False

    # Russian-roulette survival probability; 0 disables RR (GPU semantics).
    # The naive tracer uses p_rr=0.9 (朴素光线追踪/4_0_path_tracing.py:43-46).
    p_rr: float = 0.0

    # RNG stream seed (reference pins seeds for run-to-run comparability:
    # srand(7), curand_init(idx,0,0), random.seed(2023)).
    seed: int = 0

    # Sample-sequence generator:
    #   "rng" — counter-based triple32 pseudo-random (ops/rng.py), the
    #           reference-equivalent default
    #   "qmc" — padded Owen-scrambled Sobol' (ops/qmc.py): same draw
    #           coordinates, low-discrepancy points — lower error at
    #           equal spp. Beyond-parity extension (the reference is
    #           pseudo-random everywhere).
    sampler: str = "rng"

    # Next-event estimation (OPT-IN extension beyond the reference's
    # semantics): at every lambertian bounce, additionally sample one
    # point on one emissive primitive (sphere / rect / cylinder area
    # sampling), cast a shadow ray, and add the direct term; emission
    # picked up by diffuse-scattered rays is then suppressed so nothing
    # double-counts. Same expectation as the plain estimator, far lower
    # variance on light-driven scenes (the reference's production
    # blue.json is lit by 4 cylinder lights). Ignored when the scene
    # has no NEE-sampleable lights. Runs IN-KERNEL on the mega/queue
    # engines (light table + per-bounce shadow chunk pass) since
    # round 4 — every light family including image-textured emitters.
    nee: bool = False

    # Multiple importance sampling over the two techniques above
    # (OPT-IN, requires nee=True): instead of suppressing emission
    # reached through a diffuse bounce outright, weight BOTH the NEE
    # sample and the BSDF-sampled emission hit by the balance
    # heuristic w = p_own / (p_nee + p_bsdf) in solid-angle measure
    # (p_bsdf = (2/pi) cos^3 — the reference lambertian's
    # n + unit-ball density; p_nee = d^2 / (A * n_lights * |cos_l|)).
    # Same expectation as either technique alone; variance no longer
    # blows up on large/near lights (where NEE's d^2/A weight is the
    # loser) nor on small lights (where BSDF sampling is). Runs
    # IN-KERNEL on every engine (mega/queue carry p_prev in the alive
    # channel and match emitter hits to light rows by tape code).
    # Gradients: winner-tape + scan AD differentiate the smooth
    # weights; the path-replay suffix identity refuses (single-
    # technique NEE only).
    mis: bool = False

    # Extend NEE/MIS to FUZZY-METAL bounces (opt-in, requires nee):
    # glossy lanes light-sample with their own fuzz-ball density about
    # the mirror direction, p(w) = s(3cos^2+s^2)/(2 pi fuzz^3) inside
    # the cone sin < fuzz (the chord integral of the reference's
    # reflect + fuzz*ball draw; the lambertian (2/pi)cos^3 is its
    # fuzz=1-about-the-normal case), and their emission weights by the
    # same carried density. Pair with mis=True on tight cones (a light
    # outside a narrow cone contributes zero to the NEE sample while
    # suppression still applies — unbiased but high-variance alone).
    # Runs IN-KERNEL on every engine (mega/queue included); forward +
    # tape/scan-AD gradients; the replay identity refuses.
    nee_glossy: bool = False

    # Execution knobs (not part of reference semantics).
    engine: str = "xla"     # "xla" | "pallas" | "mega" | "queue"
    loop: str = "while"            # "while" | "scan" (scan is differentiable)
    traversal: str = "linear"      # "linear" | "bvh"
    rays_per_batch: int = 1 << 17  # sample-batch size fed to one device step
    # megakernel stream compaction: split the bounce loop into segments
    # and pack live rays between segments so dead 2048-lane kernel tiles
    # short-circuit. >0 = fixed segment length; -1 = auto geometric
    # schedule [1,2,4,8,...] matched to the front-loaded death curve;
    # 0 = off. Compaction granularity is compact_group consecutive rays
    # (group-row gathers are ~60x cheaper than per-element row gathers).
    compact_every: int = 0
    compact_group: int = 128  # lane-width groups: zero layout padding
    # explicit segment schedule (bounce counts summing to <= max_depth;
    # remainder appended); overrides compact_every when nonempty
    compact_schedule: Tuple[int, ...] = ()
    # megakernel spatial culling: Morton-sort the sphere table and skip
    # whole 128-row chunks whose AABB no live lane in the tile can hit.
    # Default ON: measured neutral at 488 spheres, 1.77x at 1940
    # (BASELINE.md round 2); costs a ~1% slab gate per chunk. Flips
    # measure-zero exact-t tie winners (row-order ties, like the BVH).
    cull_chunks: bool = True
    # sphere bilinear terms (hb, c_term) on the MXU via a [C,16]x[16,S,L]
    # coefficient contraction instead of broadcast VPU FMAs
    mxu_intersect: bool = False
    # between-segment prefix shrink: after each compaction (live groups
    # are a prefix) run the next segment on only the smallest static
    # tile bucket covering every live ray, via lax.switch on a device
    # scalar (no host sync). Bit-identical images — the skipped suffix
    # is dead and its state passes through untouched; what it saves is
    # the dead tiles' ~7.4 us/tile grid-step fixed cost (measured,
    # scripts/exp_deadtile_r3.py: ~22 ms of a ~147 ms 1080p depth-50
    # frame). Costs one compiled kernel per (segment, bucket) pair.
    compact_shrink: bool = True
    # compaction sort key: "dead" (liveness only) or "spatial"
    # (liveness, then direction octant + Morton cell of each group's
    # mean live-ray origin — packs tiles into coherent ray bundles so
    # chunk culling can fire)
    compact_sort: str = "dead"
    # in-kernel sample regeneration (engine="mega" only): the whole spp
    # loop lives inside one kernel launch per tile — a lane whose path
    # terminates immediately starts its next sample's camera ray, so
    # occupancy never decays and per-sample launch + compaction costs
    # vanish. Bit-identical images (same RNG stream coordinates, same
    # f32 accumulation order). Supersedes compact_every when on.
    regen: bool = False
    # cross-tile death-tail compaction for regen: segment the in-kernel
    # loop by iteration budget and group-compact still-pending lanes
    # between segments (0 = off/single kernel, -1 = auto geometric
    # schedule, N>0 = fixed N-iteration segments). Bit-identical images
    # (per-lane RNG coordinates ride the permutation).
    regen_compact: int = 0
    # shrink the ray array to the pending power-of-2 tile bucket between
    # regen segments (one host pending-count sync per segment): tail
    # segments then skip the dead tiles' VMEM DMA fixed costs entirely,
    # not just their bounce loops
    regen_shrink: bool = True
    # queue-steps per kernel launch for engine="queue" (the persistent
    # ray-queue megakernel, ops/pallas_queue.py): 0 = auto (scales with
    # the batch's tile count). Smaller values relaunch more often (the
    # in-jit while loop resumes exactly — images are bit-identical for
    # any value); the knob exists for tests and tail tuning.
    queue_steps: int = 0

    @property
    def aspect_ratio(self) -> float:
        return self.width / self.height

    @property
    def num_pixels(self) -> int:
        return self.width * self.height

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)

    def background_tuple(self, scene_background: Tuple[float, float, float]):
        return tuple(float(c) for c in scene_background)
