"""Sweep SPH_CHUNK at d1 and at the headline d50 config (cover 1080p).

Follow-up to exp_bounce_ablate: c64 beat c128 by 10% at d1 (finer cull
granularity — extraction/merge measured free). Find the floor."""
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
    print(f"{name}: {best*1e3:.1f} ms", flush=True)
    return best


def run(name, chunk, headline=False, md=1):
    saved = pm.SPH_CHUNK
    try:
        pm.SPH_CHUNK = chunk
        if headline:
            c = cfg.replace(engine="mega", compact_schedule=(2, 3, 5, 10),
                            compact_group=16, cull_chunks=True)
        else:
            c = cfg.replace(engine="mega", max_depth=md, compact_every=0,
                            cull_chunks=True)

        @jax.jit
        def f(ro, rd, pixel):
            return pm.mega_trace(tbl, c, ro, rd, pixel,
                                 jnp.uint32(0), jnp.uint32(0))
        return timeit(name, f, ro, rd, pixel)
    finally:
        pm.SPH_CHUNK = saved


run("d1 c32", 32)
run("d1 c64", 64)   # known 40.8
run("d1 c96", 96)
run("d50 headline c128 (base 207)", 128, headline=True)
run("d50 headline c64", 64, headline=True)
run("d50 headline c32", 32, headline=True)

# appended after first sweep: measured c128 201.3 / c64 182.9 / c32
# 176.4 ms at the d50 headline -> probe c16 before changing the default
if os.environ.get("SWEEP_C16"):
    run("d1 c16", 16)
    run("d50 headline c16", 16, headline=True)
