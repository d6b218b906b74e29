"""Round-3: measure the dead-tile grid-step fixed cost directly.

Hypothesis (from the schedule-variant timings): each mega_segment
launch pays ~8-10 us per 2048-lane grid step even for DEAD tiles
(unconditional tile-state DMA + step overhead), so a 5-segment 1080p
frame spends ~40 ms of its ~147 ms walking dead tiles. Test: trace a
ray population that dies immediately (sky-only: camera pointed at
nothing) through one depth-50 single-segment kernel at 1013 tiles vs
64 tiles, and diff.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.ops import pallas_mega as pm

sdef, cfg = cover_scene(width=1920, height=1080, spp=1, max_depth=50)
tables = build_tables(sdef)
tbl = jax.tree_util.tree_map(jnp.asarray, tables)


def timeit(name, f, *args, reps=5):
    o = f(*args); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:7.1f} ms", flush=True)
    return best


c = cfg.replace(engine="mega", max_depth=50, compact_schedule=(),
                cull_chunks=True)

for n_tiles in (1013, 256, 64):
    b = n_tiles * 2048
    # rays pointing straight up from above the scene: miss everything,
    # die at bounce 0 -> every tile short-circuits after one bounce
    ro = jnp.tile(jnp.asarray([[0.0, 50.0, 0.0]], jnp.float32), (b, 1))
    rd = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (b, 1))
    pixel = jnp.arange(b, dtype=jnp.int32) % (1920 * 1080)

    @jax.jit
    def f(ro, rd, pixel):
        return pm.mega_trace(tbl, c, ro, rd, pixel,
                             jnp.uint32(0), jnp.uint32(0))
    dt = timeit(f"all-dead d50 tiles={n_tiles:4d}", f, ro, rd, pixel)
