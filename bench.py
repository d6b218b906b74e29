"""Benchmark: paths/s on the reference's headline workload shape.

Workload: the RTiOW final cover scene (the reference's production shape —
~490 spheres; cmake-cpu-version/main.cpp:125-172, dormant CUDA variant
gpu-version/main.cu:160-215) at 1920x1080, max_depth 50 (blue2.json's
frame shape, gpu-version/blue2.json). Throughput is measured over full
frames at a modest spp and is flat in spp (each sample batch is an
independent identical launch), so the number IS the 500-spp rate.

Baseline: the only performance number the reference publishes is the
Taichi wavefront renderer's ~9.25 s for its 400x225@50spp cover render
(taichi-version/README.md:15) = 4.5e6/9.25 ~ 4.86e5 paths/s.
vs_baseline is our paths/s against that figure (BASELINE.md records that
no CUDA/A100 number exists to anchor against).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time
import sys

import numpy as np

TAICHI_BASELINE_PATHS_PER_S = 400 * 225 * 50 / 9.25

# ---- kernel-efficiency model constants (VERDICT r2 #6) ----
# Speed-of-light definition: every ray does exactly its own live bounces
# of full-table closest-hit work at the standalone Pallas intersect
# kernel's measured rate. Effective useful test rate
#   tests/s = paths/s x RAY_AVG_WORK_BOUNCES x PADDED_SPHERE_ROWS
# divided by the standalone rate = roofline_frac. Regressions in KERNEL
# efficiency (vs scene-shape flattery) move this number.
RAY_AVG_WORK_BOUNCES = 2.591  # cover@1080p depth-50, measured per-lane
#   death bounces (scripts/exp_tilework_r3.py, r3). For context the same
#   measurement gives ACTUAL tile work 6.768 bounce-equiv/ray at the prod
#   schedule (group-granularity packing waste 2.6x) — the useful-work
#   fraction charges that waste to us, as it should.
PADDED_SPHERE_ROWS = 512      # 488 spheres -> 4 chunks of 128
STANDALONE_GTESTS = 48e9      # standalone closest-hit kernel, measured
#   131k rays x 512 spheres (BASELINE.md r1; exp_bounce_ablate.py)
# Model MFU: sphere candidate math ~30 VPU flops/test (hb/c_term dot
# terms, disc, sqrt, two roots, winner min/one-hot); v5e VPU peak
# ~12.3e12 flops/s (8 sublanes x 128 lanes x 4 ALUs x 2 FMA x 1.5 GHz).
# Path tracing is VPU-bound by design — MXU-FLOPs MFU would be ~0.
FLOPS_PER_TEST = 30.0
VPU_PEAK_FLOPS = 12.3e12


def main():
    import os

    import jax

    # persistent compile cache: the depth-50 megakernel takes minutes to
    # compile cold; cached recompiles are seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rt_tpu.config import RenderConfig
    from rt_tpu.scene.builders import cover_scene
    from rt_tpu.scene.types import build_tables
    from rt_tpu.parallel.mesh import make_mesh
    from rt_tpu.parallel.sharded import render_sharded_ex
    from rt_tpu.render.renderer import render

    width, height, depth = 1920, 1080, 50
    # 16 samples = exactly one full launch at rays_per_batch 1<<25:
    # per-launch overhead fully amortized (148.9 ms/sample vs 162 at
    # spp 4, BASELINE.md round-2 north-star section), and the same
    # per-sample rate holds steady through 500-spp production frames
    spp_timed = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    sdef, cfg = cover_scene(width=width, height=height, spp=spp_timed,
                            max_depth=depth)
    # one launch covers the whole frame x all samples: device dispatch is
    # fully amortized (the axon tunnel costs ~30ms per host->device call).
    # Tapered compaction schedule + 32-ray groups: measured best of the
    # round-2 sweep (BASELINE.md; segment lengths track the death curve,
    # finer groups pack scattered survivors tighter)
    # round 4: the persistent ray-queue megakernel (ops/pallas_queue.py)
    # is the production single-chip engine — occupancy never decays, so
    # the round-3 2.59x group-packing waste is gone (28.2M vs 13.8M
    # paths/s at this shape; BASELINE.md round-4). The sharded leg still
    # exercises the segmented megakernel (its compact kwargs below).
    cfg = cfg.replace(rays_per_batch=1 << 25, engine="queue",
                      compact_schedule=(2, 3, 5, 10), compact_group=16,
                      cull_chunks=True)
    tables = build_tables(sdef)
    n_dev = len(jax.devices())

    if n_dev == 1:
        import jax as _jax
        # compile (persistent-cached) + warm, same graph
        _jax.block_until_ready(render(tables, cfg, device_out=True))
        # Timing boundary: block_until_ready on the device-resident
        # [H,W,3] image — the chip's frame rate. np.asarray is NOT the
        # boundary because this environment reaches the TPU through a
        # tunnel moving ~4-16 MB/s (the 24 MB accumulator download costs
        # seconds; a production host's PCIe moves it in ~2 ms). The
        # host-end-to-end rate including that download is reported as
        # host_e2e_paths_per_s (BASELINE.md "tunnel artifact").
        times = []
        for _ in range(5):  # the tunnel has ~15-25% run-to-run noise:
            t0 = time.perf_counter()    # report best + median + spread
            img = render(tables, cfg, device_out=True)
            _jax.block_until_ready(img)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        dt_med = float(np.median(times))
        spread = round((max(times) - dt) / dt, 3)
        spp_done = spp_timed
        # mega control row (VERDICT r4 #7): the segmented megakernel at
        # the same shape, so either engine's regression is
        # machine-visible round-over-round
        mega_cfg = cfg.replace(engine="mega")
        _jax.block_until_ready(render(tables, mega_cfg, device_out=True))
        mtimes = []
        for _ in range(3):
            t0 = time.perf_counter()
            mimg = render(tables, mega_cfg, device_out=True)
            _jax.block_until_ready(mimg)
            mtimes.append(time.perf_counter() - t0)
        dt_mega = min(mtimes)
        t0 = time.perf_counter()
        host_img = np.asarray(img)  # one download, outside the timed reps
        dl = time.perf_counter() - t0
        assert np.isfinite(host_img).all()
        e2e = width * height * spp_done / (dt + dl)
    else:
        # sharded path: the segmented megakernel is the default here;
        # the queue engine also runs under shard_map (test_parallel
        # parametrizes it over 4 mesh shapes on the virtual CPU mesh),
        # but multi-REAL-chip hardware is unavailable in this
        # environment, so the mega row stays the sharded control
        cfg = cfg.replace(engine="mega")
        mesh = make_mesh((n_dev, 1))
        render_sharded_ex(tables, cfg.replace(samples_per_pixel=1), mesh)
        t0 = time.perf_counter()
        img, spp_done = render_sharded_ex(tables, cfg, mesh)
        dt = time.perf_counter() - t0

    paths = width * height * spp_done
    paths_per_s = paths / dt
    per_chip = paths_per_s / len(jax.devices())

    tests_per_s = per_chip * RAY_AVG_WORK_BOUNCES * PADDED_SPHERE_ROWS
    out = {
        "metric": "cover_scene_1080p_depth50_paths_per_s_per_chip",
        "value": round(per_chip, 1),
        "unit": "paths/s/chip",
        "vs_baseline": round(per_chip / TAICHI_BASELINE_PATHS_PER_S, 3),
        # machine-readable kernel efficiency (VERDICT r2 #6): useful
        # closest-hit work per second vs the standalone intersect
        # kernel's own measured rate; and a model-based VPU-flops MFU
        "roofline_frac": round(tests_per_s / STANDALONE_GTESTS, 3),
        "mfu": round(tests_per_s * FLOPS_PER_TEST / VPU_PEAK_FLOPS, 4),
    }
    if n_dev == 1:
        out["run_spread"] = spread  # tunnel-noise dispersion over 5 runs
        out["median_paths_per_s"] = round(paths / dt_med, 1)
        out["mega_control_paths_per_s"] = round(paths / dt_mega, 1)
        out["host_e2e_paths_per_s"] = round(e2e, 1)  # incl. tunnel download

        # sharded leg (VERDICT r2 #1): the production megakernel traced
        # THROUGH shard_map on the real chip — a (1,1) mesh compiles and
        # runs the same GSPMD program a pod would partition. Small frame:
        # this guards the composition, not the throughput.
        try:
            mesh = make_mesh((1, 1), jax.devices()[:1])
            scfg = cfg.replace(width=480, height=272, samples_per_pixel=2,
                               max_depth=8, compact_schedule=(2,),
                               engine="mega")
            t0 = time.perf_counter()
            img, spp_sh = render_sharded_ex(tables, scfg, mesh)
            dt_sh = time.perf_counter() - t0
            assert np.isfinite(img).all()
            out["sharded_mega_ok"] = True
            out["sharded_mega_wall_s"] = round(dt_sh, 2)
        except Exception as e:  # noqa: BLE001
            out["sharded_mega_ok"] = False
            out["sharded_mega_error"] = type(e).__name__
    print(json.dumps(out))


if __name__ == "__main__":
    main()
