"""QMC cost on the chip: the bench shape (cover 1080p depth-50,
production compaction schedule) timed with sampler rng vs qmc."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.render.renderer import render

w, h, depth, spp = 1920, 1080, 50, 16
sdef, cfg = cover_scene(width=w, height=h, spp=spp, max_depth=depth)
cfg = cfg.replace(rays_per_batch=1 << 25, engine="mega",
                  compact_schedule=(2, 3, 5, 10), compact_group=16,
                  cull_chunks=True)
tables = build_tables(sdef)

for smp in ("rng", "qmc"):
    c = cfg.replace(sampler=smp)
    jax.block_until_ready(render(tables, c, device_out=True))  # compile+warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        img = render(tables, c, device_out=True)
        jax.block_until_ready(img)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{smp}: {dt:.3f}s best of {['%.3f' % t for t in times]} "
          f"-> {w*h*spp/dt/1e6:.2f}M paths/s", flush=True)
