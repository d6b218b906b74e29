import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Measure per-bounce alive structure of the cover scene at 1080p to
quantify the dead-lane waste: ray-work vs tile-work (2048-lane tiles in
the renderer's 64x32 screen-block order)."""
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.render.integrator import RayState, _bounce
from rt_tpu.ops.camera import generate_rays

w, h, depth = 1920, 1080, 50
sdef, cfg = cover_scene(width=w, height=h, spp=1, max_depth=depth)
cfg = cfg.replace(engine="xla")
tables = jax.tree_util.tree_map(jnp.asarray, build_tables(sdef))

pix = np.arange(w * h, dtype=np.int32)
px_all, py_all = pix % w, pix // w
bx, by = 64, 32
block = (py_all // by) * ((w + bx - 1) // bx) + (px_all // bx)
order = np.argsort(block, kind="stable")
px_all, py_all = px_all[order], py_all[order]
B = -(-(w * h) // 2048) * 2048   # pad to tile multiple (dead pad lanes)
T = B // 2048
pad = B - w * h
px_all = np.concatenate([px_all, np.zeros(pad, np.int32)])
py_all = np.concatenate([py_all, np.zeros(pad, np.int32)])

@jax.jit
def run(px, py):
    sample = jnp.zeros((B,), jnp.uint32)
    seed = jnp.uint32(cfg.seed)
    ro, rd = generate_rays(tables.camera, w, h, px, py, sample, seed,
                           cfg.enable_defocus)
    pixel = (py * w + px).astype(jnp.uint32)
    st = RayState(o=ro, d=rd, throughput=jnp.ones((B, 3), jnp.float32),
                  rgb=jnp.zeros((B, 3), jnp.float32),
                  alive=jnp.ones((B,), bool))
    def body(st, i):
        st = _bounce(tables, cfg, st, pixel, sample, seed, i)
        per_tile = st.alive.reshape(T, 2048).sum(-1)
        return st, per_tile
    _, per_tile = jax.lax.scan(body, st, jnp.arange(depth, dtype=jnp.uint32))
    return per_tile  # [depth, T]

t0 = time.perf_counter()
per_tile = np.asarray(run(jnp.asarray(px_all), jnp.asarray(py_all)))
print(f"measured in {time.perf_counter()-t0:.1f}s")
alive = per_tile.sum(-1)                 # [depth] total live rays
tiles_alive = (per_tile > 0).sum(-1)     # [depth] tiles with any live lane
ray_work = alive.sum()
tile_work = tiles_alive.sum() * 2048
print("bounce: alive_rays  tiles_alive (of", T, ")")
for b in range(0, depth, 5):
    print(f"  {b:2d}: {alive[b]:9d}  {tiles_alive[b]:5d}")
print(f"ray-average depth: {ray_work/B:.2f}")
print(f"tile-exit work/ray: {tile_work/B:.2f}")
print(f"perfect-compaction ceiling: {tile_work/ray_work:.2f}x")
# model compaction every k bounces: at each segment start, live rays pack
# into ceil(alive/2048) tiles; within a segment tiles die only when all
# their lanes die -- upper-bound by holding tile count constant per segment
for k in (1, 2, 4, 8, 16):
    work = 0
    for s0 in range(0, depth, k):
        n_tiles = -(-int(alive[s0]) // 2048) if alive[s0] else 0
        for b in range(s0, min(s0 + k, depth)):
            if alive[b]:
                work += min(n_tiles, tiles_alive[b]) * 2048
    print(f"compact_every={k:2d}: modeled work/ray {work/B:6.2f} "
          f"({tile_work/max(work,1):.2f}x vs now)")
