"""Round-3: price the per-bounce shading/RNG tail (VERDICT r2 #4).

Device-timed ablation at the bench shape (cover 1080p, 2M rays):
depth-1 full-occupancy bounce with pieces of the shading tail replaced
by constants, to locate where the ~24 ms gap between the full bounce
(~45 ms) and the standalone closest-hit kernel (~21 ms) goes:

  base            the production bounce
  fake-ball       _unit_ball returns constants (prices 3 hash chains +
                  cbrt(exp/log) + sin/cos + sqrt)
  fake-uniform    every _uniform returns 0.5 (prices ALL hash chains,
                  incl. the Schlick reflectance draw)
  shared-key      _key folds (seed,pixel,sample,bounce) once per bounce
                  and re-folds only the purpose word per draw (exact,
                  bit-identical by construction — candidate)
  cheap-ball      cbrt via exponent/mantissa split + minimax poly, and
                  sin(phi) from cos(phi) via sqrt + sign (ulp-level
                  stream change, same distribution — candidate)

Then the winning combination at depth 50 with the prod schedule.
"""
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
ro, rd = generate_rays(tbl.camera, w, h, px, py, sample, jnp.uint32(0),
                       False)


def timeit(name, f, *args, reps=3):
    o = f(*args); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:7.1f} ms", flush=True)
    return best


def run(name, md=1, schedule=(), fake_ball=False, fake_uniform=False):
    saved = (pm._unit_ball, pm._uniform)
    try:
        if fake_ball:
            pm._unit_ball = lambda seed, pix, sample, bounce: (
                jnp.full(pix.shape, 0.1, jnp.float32),
                jnp.full(pix.shape, 0.2, jnp.float32),
                jnp.full(pix.shape, 0.3, jnp.float32))
        if fake_uniform:
            pm._uniform = lambda seed, pix, sample, bounce, purpose: (
                jnp.full(pix.shape, 0.5, jnp.float32))
        c = cfg.replace(engine="mega", max_depth=md,
                        compact_schedule=schedule, compact_group=16,
                        cull_chunks=True)

        @jax.jit
        def f(ro, rd, pixel):
            return pm.mega_trace(tbl, c, ro, rd, pixel,
                                 jnp.uint32(0), jnp.uint32(0))
        return timeit(name, f, ro, rd, pixel)
    finally:
        pm._unit_ball, pm._uniform = saved


def run_g(name, schedule, group):
    c = cfg.replace(engine="mega", max_depth=50,
                    compact_schedule=schedule, compact_group=group,
                    cull_chunks=True)

    @jax.jit
    def f(ro, rd, pixel):
        return pm.mega_trace(tbl, c, ro, rd, pixel,
                             jnp.uint32(0), jnp.uint32(0))
    dt = timeit(name, f, ro, rd, pixel)
    print(f"   -> {w*h/dt/1e6:.2f}M paths/s", flush=True)
    return dt


if os.environ.get("SHADE_ABLATE", "1") == "1":
    base1 = run("d1 base        ")
    run("d1 fake-ball   ", fake_ball=True)
    run("d1 fake-uniform", fake_ball=True, fake_uniform=True)

# schedule variants at depth 50, sim-predicted tile work in comments
# (scripts/exp_tilework_r3.py): prod 6.768, dense-early 5.822/5.846,
# every-bounce g16 5.174, g8 4.195
run_g("d50 prod (2,3,5,10) g16     ", (2, 3, 5, 10), 16)
run_g("d50 dense (1,1,2,2,3,4,6,8) ", (1, 1, 2, 2, 3, 4, 6, 8), 16)
run_g("d50 every-bounce g16        ", tuple([1] * 49), 16)
run_g("d50 every-bounce g8         ", tuple([1] * 49), 8)
run_g("d50 dense g8                ", (1, 1, 2, 2, 3, 4, 6, 8), 8)
