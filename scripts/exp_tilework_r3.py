"""Round-3: exact tile-work factor for the PRODUCTION compaction
schedule (bench.py: compact_schedule=(2,3,5,10), compact_group=16).

perf_report.py's roofline fraction used measure_death.py's ce=4/g128
upper-bound model (3.41 bounce-equiv/ray). bench.py now emits
roofline_frac every round, so the factor must match the schedule the
headline actually runs. This script measures each ray's death bounce
once (XLA engine scan, bit-identical liveness semantics to the
megakernel) and then SIMULATES the real compaction algorithm
(ops/pallas_mega._compact: stable argsort of `group`-lane groups,
any-live first, at each schedule boundary) to count 2048-lane kernel
tiles with >=1 live lane per bounce — the exact quantity the dead-tile
short-circuit bills.

Prints tile-work/ray for the prod schedule, plus ce=4/g128 as a
cross-check against measure_death.py's 3.41 model.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
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

# the renderer's 64x32 screen-block ray order (renderer._block_order)
pix = np.arange(W * H, dtype=np.int32)
px_all, py_all = pix % W, pix // W
block = (py_all // 32) * ((W + 63) // 64) + (px_all // 64)
order = np.argsort(block, kind="stable")
px_all, py_all = px_all[order], py_all[order]
B = -(-(W * H) // TILE) * TILE
pad = B - W * H
px_all = np.concatenate([px_all, np.zeros(pad, np.int32)])
py_all = np.concatenate([py_all, np.zeros(pad, np.int32)])
pad_dead = np.ones(B, bool)
pad_dead[W * H:] = False  # pad lanes: treated alive like the kernel pads?
# kernel pads with d=(0,0,1) rays that DO trace; keep them (they die on
# the sky after bounce 1 like any miss) — px=0,py=0 duplicates pixel 0,
# which is what renderer's padding does too.


@jax.jit
def death_counts(px, py):
    sample = jnp.zeros((B,), jnp.uint32)
    seed = jnp.uint32(cfg.seed)
    ro, rd = generate_rays(tables.camera, W, H, px, py, sample, seed,
                           cfg.enable_defocus)
    pixel = (py * W + px).astype(jnp.uint32)
    st = RayState(o=ro, d=rd, throughput=jnp.ones((B, 3), jnp.float32),
                  rgb=jnp.zeros((B, 3), jnp.float32),
                  alive=jnp.ones((B,), bool))

    def body(carry, i):
        st, d = carry
        st = _bounce(tables, cfg, st, pixel, sample, seed, i)
        return (st, d + st.alive.astype(jnp.int32)), None

    (st, d), _ = jax.lax.scan(
        body, (st, jnp.zeros((B,), jnp.int32)),
        jnp.arange(DEPTH, dtype=jnp.uint32))
    return d  # bounces alive AFTER each bounce summed = death count


_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache",
                      "death_cover1080_d50.npy")
if os.path.exists(_cache):
    d = np.load(_cache)
else:
    d = np.asarray(death_counts(jnp.asarray(px_all), jnp.asarray(py_all)))
    np.save(_cache, d)
# alive ENTERING bounce b  <=>  d >= b  (d counts alive-after flags; a
# primary ray that dies in bounce 0 has d=0 but still did bounce-0 work)


def simulate(schedule, group):
    lanes = np.arange(B)
    done = 0
    tile_work = 0
    for i, seg in enumerate(schedule):
        for b in range(done, done + seg):
            alive = d[lanes] >= b
            t_live = alive.reshape(B // TILE, TILE).any(-1)
            tile_work += int(t_live.sum()) * TILE
        done += seg
        if i < len(schedule) - 1:
            alive = d[lanes] >= done  # entering next segment
            g = B // group
            alive_g = alive.reshape(g, group).any(-1)
            perm = np.argsort(~alive_g, kind="stable")  # live groups first
            lanes = lanes.reshape(g, group)[perm].reshape(B)
    return tile_work / B


def simulate_perfect(schedule):
    """Ray-level descending-death sort at each boundary: live lanes stay
    a prefix all segment, so tile work = ceil(alive/TILE) per bounce —
    the perfect-compaction ceiling for this schedule."""
    dd = np.sort(d)[::-1].copy()
    done = 0
    tile_work = 0
    for i, seg in enumerate(schedule):
        for b in range(done, done + seg):
            alive = int((dd >= b).sum())
            tile_work += -(-alive // TILE) * TILE if alive else 0
        done += seg
        dd = np.sort(dd)[::-1]
    return tile_work / B


prod = simulate((2, 3, 5, 10, 30), 16)
ce4 = simulate(tuple([4] * 12 + [2]), 128)
every1 = simulate(tuple([1] * DEPTH), 16)
every1_g8 = simulate(tuple([1] * DEPTH), 8)
dense = simulate((1, 1, 1, 2, 2, 3, 5, 10, 25), 16)
dense2 = simulate((1, 1, 2, 2, 3, 4, 6, 8, 23), 16)
perfect = simulate_perfect((2, 3, 5, 10, 30))
perfect1 = simulate_perfect(tuple([1] * DEPTH))
ray_avg = (d + 1).clip(max=DEPTH).mean()  # work bounces per ray

rows = -(-int(tables.counts[0]) // 128) * 128
out = {
    "metric": "tile_work_bounce_equiv_per_ray",
    "prod_schedule_2_3_5_10_g16": round(prod, 3),
    "ce4_g128_crosscheck": round(ce4, 3),
    "every_bounce_g16": round(every1, 3),
    "every_bounce_g8": round(every1_g8, 3),
    "dense_early_1_1_1_2_2_3_5_10_g16": round(dense, 3),
    "dense_early_1_1_2_2_3_4_6_8_g16": round(dense2, 3),
    "perfect_pack_prod_schedule": round(perfect, 3),
    "perfect_pack_every_bounce": round(perfect1, 3),
    "ray_avg_work_bounces": round(float(ray_avg), 3),
    "padded_sphere_rows": rows,
    "note": "exact simulation of _compact group-argsort on measured "
            "per-lane death bounces, cover 1080p depth-50",
}
print(json.dumps(out))
