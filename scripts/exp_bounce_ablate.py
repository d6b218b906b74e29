"""Ablate the megakernel's per-bounce cost at full occupancy (depth 1).

Isolates, on the real TPU at the bench shape (cover scene, 2M primary
rays, 488 spheres -> 512 padded rows):
  - chunk size (128 / 256 / 512)
  - per-chunk AABB cull cond (on / off)
  - winner one-hot + MXU attribute extraction (on / fake)
  - attribute merge select (on / off)
The standalone closest-hit kernel (pallas_intersect) measured 48
Gtests/s = ~21 ms for this shape; the full bounce measures ~53 ms.
This script locates the difference.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, numpy as np, jax, jax.numpy as jnp
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
bx, by = 64, 32
block = (py_all // by) * ((w + bx - 1) // bx) + (px_all // bx)
order = np.argsort(block, kind="stable")
px = jnp.asarray(px_all[order]); py = jnp.asarray(py_all[order])
pixel = jnp.asarray((py_all * w + px_all)[order].astype(np.uint32))
sample = jnp.zeros_like(pixel)
ro, rd = generate_rays(tbl.camera, w, h, px, py, sample, jnp.uint32(0), False)

def timeit(name, f, *args, reps=3):
    o = f(*args); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.1f} ms", flush=True)
    return best


def run(name, chunk, cull, md=1, fake_ext=False, no_attr_merge=False):
    saved = (pm.SPH_CHUNK, pm._chunk_winner, pm._dotg, pm._merge)
    try:
        pm.SPH_CHUNK = chunk
        if fake_ext:
            # kill the one-hot AND the MXU extraction dot (timing only;
            # shading consumes zeros)
            pm._chunk_winner = lambda t, c, s, l: t
            pm._dotg = lambda a, b: jnp.zeros(
                (a.shape[1],) + b.shape[1:], jnp.float32)
        if no_attr_merge:
            real_merge = saved[3]
            def merge_t_only(carry, t, ext):
                t_best, attrs = carry
                tmin = jnp.min(t, axis=0)
                take = (tmin < t_best) | (jnp.isfinite(tmin)
                                          & (tmin == t_best))
                return (jnp.where(take, tmin, t_best), attrs)
            pm._merge = merge_t_only
        c = cfg.replace(engine="mega", max_depth=md, compact_every=0,
                        cull_chunks=cull)

        @jax.jit
        def f(ro, rd, pixel):
            return pm.mega_trace(tbl, c, ro, rd, pixel,
                                 jnp.uint32(0), jnp.uint32(0))
        return timeit(name, f, ro, rd, pixel)
    finally:
        pm.SPH_CHUNK, pm._chunk_winner, pm._dotg, pm._merge = saved


# measured 2026-08-17: c128 cull=on 45.0 / cull=off 52.2 / c256 52.4;
# c512 OOMs scoped vmem (16M limit) — chunk temps [512,8,256] too big
run("d1 c128 cull=on  (base)", 128, True)
run("d1 c128 cull=on fake-ext", 128, True, fake_ext=True)
run("d1 c128 cull=on no-attr-merge", 128, True, no_attr_merge=True)
run("d1 c64  cull=on", 64, True)
run("d1 c128 cull=off fake-ext", 128, False, fake_ext=True)
