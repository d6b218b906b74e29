"""Round-4: persistent-queue megakernel vs the segmented production
engine at the bench shape (cover 1080p depth-50), same timing method as
bench.py (device-resident output + block_until_ready, best of 3).

The queue engine is the mechanism BASELINE.md round-3 named as the only
way past the measured 2.59x group-packing floor; kill criterion
(VERDICT r3 #2): beat 16M paths/s or record the per-stage reason.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.render.renderer import render

width, height, depth = 1920, 1080, 50
spp = int(sys.argv[1]) if len(sys.argv) > 1 else 16
sdef, cfg = cover_scene(width=width, height=height, spp=spp,
                        max_depth=depth)
cfg = cfg.replace(rays_per_batch=1 << 25, cull_chunks=True)
tables = build_tables(sdef)
paths = width * height * spp

variants = {
    "mega(prod)": cfg.replace(engine="mega",
                              compact_schedule=(2, 3, 5, 10),
                              compact_group=16),
    "queue": cfg.replace(engine="queue"),
    "queue-nocull": cfg.replace(engine="queue", cull_chunks=False),
    "queue-steps-big": cfg.replace(engine="queue", queue_steps=49152),
    "queue-steps-2k": cfg.replace(engine="queue", queue_steps=2048),
    "queue-steps-1k": cfg.replace(engine="queue", queue_steps=1024),
    "queue-steps-4k": cfg.replace(engine="queue", queue_steps=4096),
}
for name in (sys.argv[2:] or variants):
    c = variants[name]
    t0 = time.time()
    jax.block_until_ready(render(tables, c, device_out=True))
    print(f"{name}: compile+warm {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        img = render(tables, c, device_out=True)
        jax.block_until_ready(img)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    host = np.asarray(img)
    assert np.isfinite(host).all()
    print(f"{name}: {dt:.3f}s best-of-3 (spread {(max(times)-dt)/dt:.3f}) "
          f"= {paths/dt/1e6:.2f}M paths/s  mean={host.mean():.4f}",
          flush=True)

# extra variants via argv names:
