import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp
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
sample = jnp.zeros_like(pixel)
ro, rd = generate_rays(tbl.camera, w, h, px, py, sample, jnp.uint32(0), False)

def timeit(name, f, *args, reps=4):
    o = f(*args); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:7.1f} ms ({w*h/best/1e6:.2f}M)", flush=True)
    return best

for grp, shrink in ((16, True), (8, True), (8, False), (4, True)):
    c = cfg.replace(engine="mega", max_depth=50,
                    compact_schedule=(2, 3, 5, 10), compact_group=grp,
                    cull_chunks=True, compact_shrink=shrink)
    @jax.jit
    def f(ro, rd, pixel):
        return pm.mega_trace(tbl, c, ro, rd, pixel, jnp.uint32(0),
                             jnp.uint32(0))
    timeit(f"prod g{grp} shrink={int(shrink)}", f, ro, rd, pixel)
