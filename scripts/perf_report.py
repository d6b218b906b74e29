"""Round-2 performance accounting (VERDICT r1 #3).

Produces the measurements BASELINE.md's round-2 table records:
  - paths/s vs depth (cover scene, 1080p)
  - paths/s vs primitive count (cover grid variants)
  - compaction on/off matrix
  - an empirical roofline fraction: effective sphere-tests/s inside the
    megakernel vs the standalone Pallas intersect kernel's measured rate
    (48 Gtests/s on this chip, BASELINE.md r1) — the honest MFU analogue
    for a VPU-bound kernel (an MXU-FLOPs MFU would be ~0 by construction:
    path tracing's hot loop is elementwise, not matmul)
  - the tile-work model that converts paths/s to tests/s, from the
    measured death structure (scripts/measure_death.py)

Run on the TPU:  python scripts/perf_report.py
Each JSON line is one measurement; paste into BASELINE.md.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.render.renderer import render

W, H = 1920, 1080
SPP = 8


def bench(cfg, tables, spp=SPP, reps=3):
    # device timing: image stays on device, block_until_ready waits for
    # compute (BASELINE.md "tunnel artifact" — np.asarray would add
    # seconds of 4-16 MB/s D2H download and its run-to-run variance)
    jax.block_until_ready(render(tables, cfg, device_out=True))
    dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(render(tables, cfg, device_out=True))
        dt = min(dt, time.perf_counter() - t0)
    return cfg.width * cfg.height * spp / dt, dt


def main():
    # ---- depth curve (cover 1080p, ce 0 vs 4) ----
    for depth in (2, 8, 50):
        sdef, cfg = cover_scene(width=W, height=H, spp=SPP, max_depth=depth)
        tables = build_tables(sdef)
        cfg = cfg.replace(rays_per_batch=1 << 25, engine="mega")
        for ce in (0, 4):
            if ce >= depth:
                continue
            pps, dt = bench(cfg.replace(compact_every=ce), tables)
            print(json.dumps({"curve": "depth", "max_depth": depth,
                              "compact_every": ce,
                              "paths_per_s": round(pps)}), flush=True)

    # ---- primitive-count curve (cover grid variants, depth 50 ce=4) ----
    for grid in (5, 11, 22):
        sdef, cfg = cover_scene(width=W, height=H, spp=SPP, max_depth=50,
                                grid=grid)
        tables = build_tables(sdef)
        n_sph = tables.counts[0]
        cfg = cfg.replace(rays_per_batch=1 << 25, engine="mega",
                          compact_every=4)
        pps, dt = bench(cfg, tables)
        print(json.dumps({"curve": "primitives", "n_spheres": n_sph,
                          "paths_per_s": round(pps)}), flush=True)

    # ---- empirical kernel-roofline fraction ----
    # tile-work/ray at depth 50 measured 27.4 (no compaction) and modeled
    # 3.41 at ce=4 (scripts/measure_death.py); tests = tile-bounches x
    # padded sphere rows
    sdef, cfg = cover_scene(width=W, height=H, spp=SPP, max_depth=50)
    tables = build_tables(sdef)
    rows = -(-tables.counts[0] // 128) * 128
    cfg = cfg.replace(rays_per_batch=1 << 25, engine="mega",
                      compact_every=4)
    pps, dt = bench(cfg, tables)
    tests_per_s = pps * 3.41 * rows
    print(json.dumps({
        "metric": "mega_effective_sphere_tests_per_s",
        "value": round(tests_per_s / 1e9, 1), "unit": "Gtests/s",
        "roofline_standalone_kernel_Gtests_s": 48.0,
        "roofline_fraction": round(tests_per_s / 48e9, 3),
        "note": "tile-work model 3.41 bounce-equiv/ray at ce=4 from "
                "measure_death.py; rows=%d" % rows}), flush=True)

    # ---- BVH crossover (XLA engine, 400x225 d8): brute vs bvh ----
    for grid in (5, 11, 22):
        sdef, cfg = cover_scene(width=400, height=225, spp=4, max_depth=8,
                                grid=grid)
        cfg = cfg.replace(engine="xla", rays_per_batch=1 << 20)
        lin = build_tables(sdef)
        bvh = build_tables(sdef, bvh_types=("sphere",))
        pps_l, _ = bench(cfg, lin, spp=4)
        try:
            # the 1940-sphere BVH walk (hundreds of gather-heavy
            # iterations) has hit TPU device errors over the tunnel;
            # the crossover conclusion (no crossover on TPU) stands
            # on the smaller points, so don't let it kill the report
            pps_b, _ = bench(cfg.replace(traversal="bvh"), bvh, spp=4)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"curve": "bvh_crossover",
                              "n_spheres": lin.counts[0],
                              "paths_per_s_linear": round(pps_l),
                              "error": type(e).__name__}), flush=True)
            continue
        print(json.dumps({"curve": "bvh_crossover",
                          "n_spheres": lin.counts[0],
                          "paths_per_s_linear": round(pps_l),
                          "paths_per_s_bvh": round(pps_b),
                          "bvh_speedup": round(pps_b / pps_l, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
