"""Isolate per-segment launch overhead and the render()-vs-mega_trace gap."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.ops import pallas_mega as pm
from rt_tpu.ops.camera import generate_rays
from rt_tpu.render.renderer import render_pixels

w, h, depth = 1920, 1080, 50
sdef, cfg = cover_scene(width=w, height=h, spp=1, max_depth=depth)
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
    print(f"{name}: {best*1e3:.0f} ms", flush=True)

def make_trace(ce, md=depth):
    c = cfg.replace(compact_every=ce, max_depth=md, engine="mega")
    @jax.jit
    def f(ro, rd, pixel):
        return pm.mega_trace(tbl, c, ro, rd, pixel, jnp.uint32(0), jnp.uint32(0))
    return f

# clean re-times after scatter fix
timeit("mega_trace ce=0 d50", make_trace(0), ro, rd, pixel)
timeit("mega_trace ce=4 d50", make_trace(4), ro, rd, pixel)
timeit("mega_trace ce=-1 d50", make_trace(-1), ro, rd, pixel)
timeit("mega_trace ce=0 d1", make_trace(0, 1), ro, rd, pixel)
timeit("mega_trace ce=0 d2", make_trace(0, 2), ro, rd, pixel)

# render_pixels (adds raygen + sample fori + accumulate) at 1 sample
c4 = cfg.replace(compact_every=4, engine="mega", rays_per_batch=1 << 25)
@jax.jit
def rp(px, py):
    return render_pixels(tbl, c4, px, py, jnp.uint32(0), 1, jnp.uint32(0), w, h)
timeit("render_pixels 1 sample ce=4", rp, px, py)

# per-segment fixed cost: 13 depth-1 segments on ALL-DEAD state
B = ro.shape[0]; Bp = -(-B // 2048) * 2048
state_dead = tuple(jnp.zeros((Bp,), jnp.float32) for _ in range(13))
sph_tab = pm._pad_rows(pm.sphere_table(tbl), 128)
z = jnp.zeros((1, 32), jnp.float32)
uvz = tuple(jnp.zeros((8, pm._U_COLS), jnp.float32) for _ in range(4))
atlas = tuple(jnp.zeros((8, 128), jnp.float32) for _ in range(3))
counts = (sph_tab.shape[0], 0, 0, 0)
pixp = jnp.zeros((Bp,), jnp.int32)
@jax.jit
def dead_segments(state):
    for i in range(13):
        state = pm.mega_segment(sph_tab, z, z, jnp.zeros((1, 64), jnp.float32),
                                jnp.zeros((1, 8), jnp.float32),
                                jnp.zeros((1, 8), jnp.float32),
                                (jnp.zeros((8, 16), jnp.float32),
                                 jnp.zeros((8, 16), jnp.float32)),
                                uvz, jnp.zeros((8, 32), jnp.float32),
                                atlas, counts, tbl.background, state,
                                pixp, jnp.uint32(0), jnp.uint32(0),
                                jnp.int32(i), max_depth=1)
    return state
timeit("13x depth-1 segments, all dead", dead_segments, state_dead)
