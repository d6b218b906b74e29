"""Production-scene benchmarks: blue2.json (1920x1080 rect/cyl 'DNA'
scene) and the big-cover variant, final headline configs."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from rt_tpu.scene.parser import parse_scene
from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.render.renderer import render

spp = 8
sdef, cfg = parse_scene("/root/reference/gpu-version/blue2.json")
cfg = cfg.replace(samples_per_pixel=spp, engine="mega",
                  rays_per_batch=1 << 25,
                  compact_schedule=(2, 3, 5, 10), compact_group=16)
tables = build_tables(sdef)
# device timing (BASELINE.md tunnel artifact): block_until_ready waits
# for compute; the 24 MB download would add seconds of D2H variance
jax.block_until_ready(render(tables, cfg, device_out=True))
dt = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    jax.block_until_ready(render(tables, cfg, device_out=True))
    dt = min(dt, time.perf_counter() - t0)
pps = cfg.width * cfg.height * spp / dt
print(json.dumps({"scene": "blue2.json 1920x1080 d50", "paths_per_s": round(pps),
                  "frame_s": round(dt, 2)}), flush=True)

# big cover with culling at the full-frame level
sdef, cfg = cover_scene(width=1920, height=1080, spp=spp, max_depth=50,
                        grid=22)
cfg = cfg.replace(engine="mega", rays_per_batch=1 << 25,
                  compact_schedule=(2, 3, 5, 10), compact_group=16,
                  cull_chunks=True)
tables = build_tables(sdef)
jax.block_until_ready(render(tables, cfg, device_out=True))
dt = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    jax.block_until_ready(render(tables, cfg, device_out=True))
    dt = min(dt, time.perf_counter() - t0)
pps = cfg.width * cfg.height * spp / dt
print(json.dumps({"scene": "cover-1940sph 1080p d50 cull",
                  "paths_per_s": round(pps), "frame_s": round(dt, 2)}),
      flush=True)
