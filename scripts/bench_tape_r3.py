"""Round-3: all-params gradient step via in-kernel capture + death-
sorted shrinking replay (VERDICT r2 #3).

Round-2 state: 12.6 s per step at 1920x1080 depth-50 (capture 2.3 s on
the hybrid per-bounce intersector, replay fwd 2.2 s, 3x-remat backward
8.7 s). This benches diff/tape.make_tape_vg: mega_capture (one kernel
launch, codes + exact deaths) + the sorted replay whose per-segment
widths track the live prefix.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.render.renderer import render
from rt_tpu.diff.tape import make_tape_vg

w, h = 1920, 1080
sdef, cfg = cover_scene(width=w, height=h, spp=1, max_depth=50)
cfg = cfg.replace(background_mode="gradient", loop="scan", engine="xla")
tables = build_tables(sdef)

t0 = time.perf_counter()
target = np.asarray(render(tables, cfg.replace(
    samples_per_pixel=8,
    engine=("mega" if jax.default_backend() == "tpu" else "xla"),
    loop="while"), device_out=True)) / 8.0
print(f"target: {time.perf_counter() - t0:.1f}s", flush=True)

tbl = jax.tree_util.tree_map(jnp.asarray, tables)
rs = np.random.RandomState(3)
real = np.asarray(tables.sph_obj) >= 0
params = {
    "sph_center": jnp.asarray(
        np.asarray(tables.sph_center)
        + np.where(real[:, None], rs.normal(0, 0.01,
                                            tables.sph_center.shape), 0.0),
        jnp.float32),
    "sph_radius": jnp.asarray(tables.sph_radius, jnp.float32),
    "tex_color": jnp.asarray(tables.tex_color, jnp.float32),
    "mat_albedo": jnp.asarray(tables.mat_albedo, jnp.float32),
    "mat_fuzz": jnp.asarray(tables.mat_fuzz, jnp.float32),
    "mat_ior": jnp.asarray(tables.mat_ior, jnp.float32),
}
n_par = sum(int(np.asarray(v).size) for v in params.values())
pix = np.arange(w * h, dtype=np.int32)
step = make_tape_vg(tbl, cfg, pix % w, pix // w,
                    target.reshape(-1, 3).astype(np.float32))

t0 = time.perf_counter()
loss, grads = jax.block_until_ready(step(params))
print(f"compile + first step: {time.perf_counter() - t0:.1f}s", flush=True)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    loss, grads = jax.block_until_ready(step(params))
    times.append(time.perf_counter() - t0)
dt = min(times)
print(f"warm all-params grad step ({n_par} params, {w}x{h} depth-50): "
      f"{dt:.2f}s  loss {float(loss):.6f}", flush=True)
for f, g in grads.items():
    gn = np.asarray(g)
    print(f"  |grad {f}|_max = {np.abs(gn).max():.3e} "
          f"finite={bool(np.isfinite(gn).all())}", flush=True)
