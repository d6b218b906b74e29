"""MXU-intersect in the full megakernel at bench shapes."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.ops import pallas_mega as pm
from rt_tpu.ops.camera import generate_rays

w, h, depth = 1920, 1080, 50

def setup(grid):
    sdef, cfg = cover_scene(width=w, height=h, spp=1, max_depth=depth,
                            grid=grid)
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
    return cfg, tbl, ro, rd, pixel, tables.counts[0]

def timeit(name, f, *args, reps=3):
    o = f(*args); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.0f} ms", flush=True)

for grid in (11, 22):
    cfg, tbl, ro, rd, pixel, n = setup(grid)
    base = cfg.replace(engine="mega", compact_schedule=(2, 3, 5, 10),
                       compact_group=16, cull_chunks=True)
    for name, c in [("cull", base),
                    ("cull+mxu", base.replace(mxu_intersect=True))]:
        @jax.jit
        def f(ro, rd, pixel, c=c):
            return pm.mega_trace(tbl, c, ro, rd, pixel, jnp.uint32(0),
                                 jnp.uint32(0))
        timeit(f"grid{grid} n={n} {name}", f, ro, rd, pixel)
