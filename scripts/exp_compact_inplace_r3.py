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

c = cfg.replace(engine="mega", max_depth=50, compact_schedule=(2,3,5,10),
                compact_group=16, cull_chunks=True, compact_shrink=True)

@jax.jit
def f_base(ro, rd, pixel):
    return pm.mega_trace(tbl, c, ro, rd, pixel, jnp.uint32(0), jnp.uint32(0))
base = timeit("prod base (shrink on)   ", f_base, ro, rd, pixel)

# identity compact: prices 4x _compact inside the same trace (image WRONG
# on purpose - dead groups never pack, shrink sees full liveness)
real_compact = pm._compact
def fake_compact(state, pixel, orig_g, group=128, sort="dead", ints=(), pending=None):
    if ints:
        return state, pixel, orig_g, ints
    return state, pixel, orig_g
pm._compact = fake_compact
try:
    @jax.jit
    def f_nc(ro, rd, pixel):
        return pm.mega_trace(tbl, c, ro, rd, pixel, jnp.uint32(0), jnp.uint32(0))
    nc = timeit("prod identity-compact   ", f_nc, ro, rd, pixel)
finally:
    pm._compact = real_compact
print(f"=> 4x _compact + packing benefit delta: {(base-nc)*1e3:.1f} ms")

# element-gather variant of _compact
def compact_take(state, pixel, orig_g, group=128, sort="dead", ints=(), pending=None):
    b = state[0].shape[0]
    g = b // group
    alive = state[-1] > 0.0 if pending is None else pending
    alive_g = alive.reshape(g, group).any(-1)
    perm = jnp.argsort(~alive_g, stable=True)
    idx = (perm[:, None] * group
           + jnp.arange(group, dtype=jnp.int32)[None, :]).reshape(b)
    state = tuple(jnp.take(s, idx, axis=0) for s in state)
    pixel = jnp.take(pixel, idx, axis=0)
    ints_out = tuple(jnp.take(x, idx, axis=0) for x in ints)
    if ints:
        return state, pixel, orig_g[perm], ints_out
    return state, pixel, orig_g[perm]

pm._compact = compact_take
try:
    @jax.jit
    def f_tk(ro, rd, pixel):
        return pm.mega_trace(tbl, c, ro, rd, pixel, jnp.uint32(0), jnp.uint32(0))
    tk = timeit("prod element-take compact", f_tk, ro, rd, pixel)
    ref = f_base(ro, rd, pixel)
    out = f_tk(ro, rd, pixel)
    print("take-compact maxdiff vs base:", float(jnp.abs(ref-out).max()))
finally:
    pm._compact = real_compact
