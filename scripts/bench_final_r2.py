import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json, numpy as np, jax, jax.numpy as jnp, subprocess
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.ops import pallas_mega as pm
from rt_tpu.ops.camera import generate_rays

w, h, depth = 1920, 1080, 50
sdef, cfg = cover_scene(width=w, height=h, spp=1, max_depth=depth)
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

def timeit(name, f, *args, reps=3):
    o = f(*args); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.0f} ms", flush=True)

def make(group, sched):
    c = cfg.replace(compact_group=group, compact_schedule=sched, engine="mega")
    @jax.jit
    def f(ro, rd, pixel):
        return pm.mega_trace(tbl, c, ro, rd, pixel, jnp.uint32(0), jnp.uint32(0))
    return f

timeit("sched(2,3,5,10) g16", make(16, (2, 3, 5, 10)), ro, rd, pixel)
timeit("sched(2,3,5,10) g8", make(8, (2, 3, 5, 10)), ro, rd, pixel)
timeit("sched(2,2,3,3,5,5,10) g32", make(32, (2, 2, 3, 3, 5, 5, 10)), ro, rd, pixel)
