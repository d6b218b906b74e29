"""Device-timed RAY_TILE sweep (kernel grid granularity).

Smaller tiles = finer per-tile chunk culling + finer dead-tile
short-circuit (both fire per grid step), at the cost of more grid
steps. Screen-block pixel order is matched to the tile size so one
tile = one contiguous screen block (64x16 for 1024, 64x32 for 2048,
64x64 for 4096). Times mega_trace at the bench shape with the prod
compaction schedule, device-sync only.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.ops import pallas_mega as pm
from rt_tpu.ops.camera import generate_rays

W, H, DEPTH = 1920, 1080, 50
sdef, cfg = cover_scene(width=W, height=H, spp=1, max_depth=DEPTH)
tables = build_tables(sdef)
tbl = jax.tree_util.tree_map(jnp.asarray, tables)
cfg = cfg.replace(engine="mega", compact_schedule=(2, 3, 5, 10),
                  compact_group=16, cull_chunks=True)

pix = np.arange(W * H, dtype=np.int32)
px_all, py_all = pix % W, pix // W


def ray_order(bx, by):
    block = (py_all // by) * ((W + bx - 1) // bx) + (px_all // bx)
    order = np.argsort(block, kind="stable")
    px = jnp.asarray(px_all[order]); py = jnp.asarray(py_all[order])
    pixel = jnp.asarray((py_all * W + px_all)[order].astype(np.uint32))
    ro, rd = generate_rays(tbl.camera, W, H, px, py,
                           jnp.zeros_like(pixel), jnp.uint32(0), False)
    return ro, rd, pixel


def bench(tile, bx, by, reps=3):
    saved = (pm.RAY_TILE, pm.LANES)
    try:
        pm.RAY_TILE, pm.LANES = tile, tile // 8
        ro, rd, pixel = ray_order(bx, by)

        @jax.jit
        def f(ro, rd, pixel):
            return pm.mega_trace(tbl, cfg, ro, rd, pixel,
                                 jnp.uint32(0), jnp.uint32(0))

        jax.block_until_ready(f(ro, rd, pixel))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(ro, rd, pixel))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(json.dumps({"tile": tile, "block": f"{bx}x{by}",
                          "sample_ms": round(dt * 1e3, 1),
                          "spread": round((max(times) - dt) / dt, 4)}),
              flush=True)
    finally:
        pm.RAY_TILE, pm.LANES = saved


bench(2048, 64, 32)   # production
bench(1024, 64, 16)
bench(1024, 32, 32)
bench(4096, 64, 64)
bench(512, 32, 16)
