"""Round-5 soak bisect of the sustained-queue tunnel wedge (VERDICT r4 #1).

Round 4's operational note: thousands of back-to-back queue launches
(the blue2 production animation) wedged the axon tunnel worker twice
(~45-min server recovery), while the segmented megakernel has run
multi-hour animation jobs wedge-free. Suspected: per-launch resource
accumulation in the worker (DMA semaphores or aliased-buffer state)
across many pallas_call invocations.

This script soaks N *frames* of queue rendering (each frame = one
jitted lax.while_loop of queue_launch relaunches, exactly the
production path) at a small shape, logging per-frame wall time so any
monotonic degradation is visible BEFORE a wedge. Run under `timeout`
from the caller; a hang past the per-frame watchdog is the wedge.

Usage: python scripts/exp_queue_soak_r5.py [n_frames] [queue_steps]
Writes one line per frame to stdout; summary JSON at the end.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rt_tpu.scene.builders import cover_scene
    from rt_tpu.scene.types import build_tables
    from rt_tpu.render.renderer import render

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    qsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    # production shape (the wedge repro: the blue2 run was ~320
    # launches per 1080p spp-1000 frame): --big soaks the bench shape,
    # ~10 while_loop launches of 1<<25 lanes per frame
    big = "--big" in sys.argv

    if big:
        sdef, cfg = cover_scene(width=1920, height=1080, spp=16,
                                max_depth=50)
        cfg = cfg.replace(engine="queue", rays_per_batch=1 << 25,
                          cull_chunks=True)
    else:
        sdef, cfg = cover_scene(width=400, height=224, spp=16,
                                max_depth=16)
        cfg = cfg.replace(engine="queue", rays_per_batch=1 << 21,
                          cull_chunks=True)
    if qsteps:
        cfg = cfg.replace(queue_steps=qsteps)
    tables = build_tables(sdef)

    # warm/compile
    jax.block_until_ready(render(tables, cfg, device_out=True))
    times = []
    t_start = time.time()
    for i in range(n_frames):
        # cfg (incl. seed) is a STATIC jit arg — keep it constant so
        # frames don't recompile; repeated jit calls re-execute (each
        # bench rep re-runs identically, bench.py)
        t0 = time.perf_counter()
        img = render(tables, cfg, device_out=True)
        jax.block_until_ready(img)
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"frame {i:4d}  {dt * 1e3:8.1f} ms", flush=True)
    arr = np.asarray(times)
    print(json.dumps({
        "n_frames": n_frames, "queue_steps": qsteps,
        "total_s": round(time.time() - t_start, 1),
        "per_frame_ms": {
            "min": round(float(arr.min() * 1e3), 1),
            "median": round(float(np.median(arr) * 1e3), 1),
            "max": round(float(arr.max() * 1e3), 1),
            "first10_med": round(float(np.median(arr[:10]) * 1e3), 1),
            "last10_med": round(float(np.median(arr[-10:]) * 1e3), 1),
        }}), flush=True)


if __name__ == "__main__":
    main()
