"""TPU benchmark: in-kernel sample regeneration vs the segmented
per-sample headline path (cover 1080p depth-50 spp-8, render() end to
end).

Variants: regen off (current bench.py config), regen single-kernel,
regen + auto death-tail compaction with and without prefix shrinking.
Shrink runs extra warm frames so the bucket plan (recorded at frame-1
drain) is in effect for the timed reps.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.render.renderer import render

W, H, DEPTH, SPP = 1920, 1080, 50, 8
sdef, cfg0 = cover_scene(width=W, height=H, spp=SPP, max_depth=DEPTH)
tables = build_tables(sdef)
base = cfg0.replace(rays_per_batch=1 << 25, engine="mega",
                    cull_chunks=True, compact_group=16)

variants = [
    ("headline(sched,g16)", base.replace(compact_schedule=(2, 3, 5, 10))),
    ("regen single", base.replace(regen=True, regen_compact=0)),
    ("regen auto noshrink", base.replace(regen=True, regen_compact=-1,
                                         regen_shrink=False)),
    ("regen auto shrink", base.replace(regen=True, regen_compact=-1,
                                       regen_shrink=True)),
]

results = {}
for name, c in variants:
    t0 = time.perf_counter()
    render(tables, c)  # compile + warm (and record shrink plan frame)
    warm = time.perf_counter() - t0
    if getattr(c, "regen_shrink", False) and c.regen and c.regen_compact:
        render(tables, c)  # second frame renders under the plan
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        render(tables, c)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    pps = W * H * SPP / dt
    results[name] = pps
    print(json.dumps({"variant": name, "frame_s": round(dt, 3),
                      "paths_per_s": round(pps / 1e6, 2),
                      "spread": round((max(times) - dt) / dt, 3),
                      "first_s": round(warm, 1)}), flush=True)

best = max(results, key=results.get)
print(json.dumps({"best": best, "paths_per_s_M": round(results[best] / 1e6, 2)}))
