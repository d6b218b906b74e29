"""Re-sweep the megakernel configuration with DEVICE timing.

Every earlier sweep (schedule/group, chunk size, regen, culling) timed
`render()` end to end, i.e. through the axon tunnel's 4-16 MB/s D2H
link — seconds of download variance per rep (BASELINE.md "tunnel
artifact"). This re-runs the key comparisons with
`render(device_out=True)` + `block_until_ready` (measured spread
<1%), at the bench shape: cover 1080p depth-50.

Usage: python scripts/exp_device_sweep.py [spp]  (default 4)
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.render.renderer import render
from rt_tpu.ops import pallas_mega as pm

W, H, DEPTH = 1920, 1080, 50
SPP = int(sys.argv[1]) if len(sys.argv) > 1 else 4

sdef, cfg0 = cover_scene(width=W, height=H, spp=SPP, max_depth=DEPTH)
tables = build_tables(sdef)
base = cfg0.replace(rays_per_batch=1 << 25, engine="mega", cull_chunks=True)


def bench(name, c, chunk=None, reps=3, warm=1):
    saved = pm.SPH_CHUNK
    try:
        if chunk is not None:
            pm.SPH_CHUNK = chunk
        t0 = time.perf_counter()
        for _ in range(warm):
            jax.block_until_ready(render(tables, c, device_out=True))
        tw = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(render(tables, c, device_out=True))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(json.dumps({
            "variant": name, "frame_s": round(dt, 4),
            "paths_per_s_M": round(W * H * SPP / dt / 1e6, 2),
            "spread": round((max(times) - dt) / dt, 4),
            "warm_s": round(tw, 1)}), flush=True)
        return dt
    finally:
        pm.SPH_CHUNK = saved


# ---- current production point ----
prod = base.replace(compact_schedule=(2, 3, 5, 10), compact_group=16)
bench("prod sched(2,3,5,10)/g16/c32", prod)

# ---- compaction schedule / group ----
bench("sched(2,3,5,10)/g32", base.replace(
    compact_schedule=(2, 3, 5, 10), compact_group=32))
bench("sched(2,3,5,10)/g8", base.replace(
    compact_schedule=(2, 3, 5, 10), compact_group=8))
bench("sched(2,4,8)/g16", base.replace(
    compact_schedule=(2, 4, 8), compact_group=16))
bench("sched(2,3,4,6,9,14)/g16", base.replace(
    compact_schedule=(2, 3, 4, 6, 9, 14), compact_group=16))
bench("sched(1,2,3,5,10)/g16", base.replace(
    compact_schedule=(1, 2, 3, 5, 10), compact_group=16))
bench("ce=4/g16", base.replace(compact_every=4, compact_group=16))
bench("no compaction", base.replace(compact_every=0))

# ---- chunk size at the prod schedule ----
bench("prod c16", prod, chunk=16)
bench("prod c64", prod, chunk=64)

# ---- culling off ----
bench("prod cull off", prod.replace(cull_chunks=False))

# ---- regen ----
bench("regen single", base.replace(regen=True, regen_compact=0))
bench("regen auto noshrink", base.replace(
    regen=True, regen_compact=-1, regen_shrink=False))
bench("regen auto shrink", base.replace(
    regen=True, regen_compact=-1, regen_shrink=True), warm=2)
