import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.render.integrator import RayState, _bounce
from rt_tpu.ops.camera import generate_rays

W, H, DEPTH = 1920, 1080, 50
TILE = 2048
sdef, cfg = cover_scene(width=W, height=H, spp=1, max_depth=DEPTH)
cfg = cfg.replace(engine="xla")
tables = jax.tree_util.tree_map(jnp.asarray, build_tables(sdef))
pix = np.arange(W * H, dtype=np.int32)
px_all, py_all = pix % W, pix // W
block = (py_all // 32) * ((W + 63) // 64) + (px_all // 64)
order = np.argsort(block, kind="stable")
px_all, py_all = px_all[order], py_all[order]
B = -(-(W * H) // TILE) * TILE
pad = B - W * H
px_all = np.concatenate([px_all, np.zeros(pad, np.int32)])
py_all = np.concatenate([py_all, np.zeros(pad, np.int32)])

import functools
@functools.partial(jax.jit, static_argnames=())
def death_counts(px, py, sample_val):
    sample = jnp.full((B,), sample_val, jnp.uint32)
    seed = jnp.uint32(cfg.seed)
    ro, rd = generate_rays(tables.camera, W, H, px, py, sample, seed, False)
    pixel = (py * W + px).astype(jnp.uint32)
    st = RayState(o=ro, d=rd, throughput=jnp.ones((B, 3), jnp.float32),
                  rgb=jnp.zeros((B, 3), jnp.float32),
                  alive=jnp.ones((B,), bool))
    def body(carry, i):
        st, d = carry
        st = _bounce(tables, cfg, st, pixel, sample, seed, i)
        return (st, d + st.alive.astype(jnp.int32)), None
    (st, d), _ = jax.lax.scan(body, (st, jnp.zeros((B,), jnp.int32)),
                              jnp.arange(DEPTH, dtype=jnp.uint32))
    return d

f0 = "/root/repo/.jax_cache/death_cover1080_d50.npy"
d0 = np.load(f0)
f1 = "/root/repo/.jax_cache/death_cover1080_d50_s1.npy"
if os.path.exists(f1):
    d1 = np.load(f1)
else:
    d1 = np.asarray(death_counts(jnp.asarray(px_all), jnp.asarray(py_all),
                                 np.uint32(1)))
    np.save(f1, d1)

print("corr(d0,d1):", np.corrcoef(d0, d1)[0, 1])

def simulate(d, schedule, group, lanes0=None):
    lanes = np.arange(B) if lanes0 is None else lanes0.copy()
    done = 0; tile_work = 0
    g = B // group
    for i, seg in enumerate(schedule):
        for b in range(done, done + seg):
            alive = d[lanes] >= b
            tile_work += int(alive.reshape(B // TILE, TILE).any(-1).sum()) * TILE
        done += seg
        if i < len(schedule) - 1:
            alive = d[lanes] >= done
            ag = alive.reshape(g, group).any(-1)
            perm = np.argsort(~ag, kind="stable")
            lanes = lanes.reshape(g, group)[perm].reshape(B)
    return tile_work / B

sched = (2, 3, 5, 10, 30)
# death BUCKET from sample-0 boundary snapshots (what mega_trace can see
# for free): bucket = number of boundaries (2,5,10,20) survived
bounds = (2, 5, 10, 20)
bucket0 = sum((d0 >= b).astype(np.int32) for b in bounds)
order_pred = np.argsort(bucket0, kind="stable")  # short-lived first

print("s1 tile-work, screen order       :", round(simulate(d1, sched, 16), 3))
print("s1 tile-work, d0-bucket order g16:", round(simulate(d1, sched, 16, order_pred), 3))
print("s1 tile-work, d0-bucket order g128:", round(simulate(d1, sched, 128, order_pred), 3))
print("s1 tile-work, ORACLE d1 order g16:", round(simulate(d1, sched, 16, np.argsort(d1, kind='stable')), 3))
print("s0 tile-work, d0-bucket order g16 (self):", round(simulate(d0, sched, 16, order_pred), 3))
