"""Sweep compact_every on the bench workload (cover 1080p depth 50)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rt_tpu.config import RenderConfig
from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.render.renderer import render

width, height, depth, spp = 1920, 1080, 50, 8
sdef, cfg0 = cover_scene(width=width, height=height, spp=spp, max_depth=depth)
cfg0 = cfg0.replace(rays_per_batch=1 << 25, engine="mega")
tables = build_tables(sdef)

results = {}
for ce in [0, 2, 4, -1, 8]:
    cfg = cfg0.replace(compact_every=ce)
    t0 = time.perf_counter()
    render(tables, cfg)  # compile+warm
    compile_s = time.perf_counter() - t0
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        img = render(tables, cfg)
        dt = min(dt, time.perf_counter() - t0)
    pps = width * height * spp / dt
    results[ce] = pps
    print(json.dumps({"compact_every": ce, "paths_per_s": round(pps),
                      "frame_s": round(dt, 2),
                      "compile_s": round(compile_s, 1)}), flush=True)
