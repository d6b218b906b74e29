"""Decompose the compacted megakernel frame time at the bench shape."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.ops.pallas_mega import mega_trace, _compact
from rt_tpu.ops.camera import generate_rays

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
B = ro.shape[0]

def timeit(name, f, *args, reps=3):
    o = f(*args); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:.0f} ms", flush=True)
    return best

def make_trace(ce, md=depth):
    c = cfg.replace(compact_every=ce, max_depth=md, engine="mega")
    @jax.jit
    def f(ro, rd, pixel):
        return mega_trace(tbl, c, ro, rd, pixel, jnp.uint32(0), jnp.uint32(0))
    return f

timeit("mega_trace 2M ce=0 d50", make_trace(0), ro, rd, pixel)
timeit("mega_trace 2M ce=4 d50", make_trace(4), ro, rd, pixel)
timeit("mega_trace 2M ce=2 d50", make_trace(2), ro, rd, pixel)
timeit("mega_trace 2M ce=0 d1", make_trace(0, 1), ro, rd, pixel)
timeit("mega_trace 2M ce=0 d2", make_trace(0, 2), ro, rd, pixel)
timeit("mega_trace 2M ce=0 d4", make_trace(0, 4), ro, rd, pixel)

# 12 compactions alone on fresh state
from rt_tpu.ops.pallas_mega import _fresh_state
@jax.jit
def compact12(ro, rd, pixel):
    st = _fresh_state(ro, rd)
    orig = jnp.arange(B, dtype=jnp.int32)
    pix_ = pixel.astype(jnp.int32)
    def body(i, c):
        st, pix_, orig = c
        st = (st[0] + jnp.float32(i) * 0,) + st[1:]
        return _compact(st, pix_, orig)
    return jax.lax.fori_loop(0, 12, body, (st, pix_, orig))
timeit("12x _compact on 2M", compact12, ro, rd, pixel)
