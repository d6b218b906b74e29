"""Re-sweep compaction schedule + group size at SPH_CHUNK=32.

The (2,3,5,10)/g16 headline optimum was tuned at chunk 128; finer
chunks change the dead-lane cost (culling skips whole chunks for
coherent dead regions), so the compaction break-even moves. Sweep at
the 1080p depth-50 cover headline, per 2M-ray sample.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.ops import pallas_mega as pm
from rt_tpu.ops.camera import generate_rays

w, h = 1920, 1080
sdef, cfg = cover_scene(width=w, height=h, spp=1, max_depth=50)
tables = build_tables(sdef)
tbl = jax.tree_util.tree_map(jnp.asarray, tables)

pix = np.arange(w * h, dtype=np.int32)
px_all, py_all = pix % w, pix // w
block = (py_all // 32) * ((w + 63) // 64) + (px_all // 64)
order = np.argsort(block, kind="stable")
px = jnp.asarray(px_all[order]); py = jnp.asarray(py_all[order])
pixel = jnp.asarray((py_all * w + px_all)[order].astype(np.uint32))
ro, rd = generate_rays(tbl.camera, w, h, px, py, jnp.zeros_like(pixel),
                       jnp.uint32(0), False)


def timeit(name, f, *args, reps=4):
    o = f(*args); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)
    return best


def run(name, sched, group):
    c = cfg.replace(engine="mega", compact_schedule=sched,
                    compact_group=group, cull_chunks=True)

    @jax.jit
    def f(ro, rd, pixel):
        return pm.mega_trace(tbl, c, ro, rd, pixel,
                             jnp.uint32(0), jnp.uint32(0))
    return timeit(name, f, ro, rd, pixel)


run("base (2,3,5,10) g16", (2, 3, 5, 10), 16)
run("(2,3,5,10) g8", (2, 3, 5, 10), 8)
run("(2,3,5,10) g32", (2, 3, 5, 10), 32)
run("(2,3,4,6,9,14) g16", (2, 3, 4, 6, 9, 14), 16)
run("(2,4,8) g16", (2, 4, 8), 16)
run("(3,6,12) g16", (3, 6, 12), 16)
run("none", (), 16)
