"""Round-3: geometry tangents through the fast path (VERDICT r2 #7).

Times the replay-VJP gradient step with geom_spec (forward-mode
tangents) at the bench shape, with the tangent replay's per-bounce
intersection as (a) the full XLA candidate pass (round-2 state) vs
(b) the taped-winner recompute fed by one in-kernel mega_capture
(geom_tape=True, the new TPU default).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.render.renderer import render
from rt_tpu.diff.inverse import _device_tables
from rt_tpu.diff.replay import make_replay_loss_fn

w, h = 1920, 1080
sdef, cfg = cover_scene(width=w, height=h, spp=1, max_depth=50)
cfg = cfg.replace(engine="mega", loop="while", rays_per_batch=1 << 25,
                  compact_schedule=(2, 3, 5, 10), compact_group=16)
tables = _device_tables(build_tables(sdef))
target = np.asarray(render(tables, cfg.replace(samples_per_pixel=4),
                           device_out=True)).reshape(-1, 3) / 4.0
pix = np.arange(w * h, dtype=np.int32)
params = {"sph_center": jnp.asarray(tables.sph_center),
          "sph_radius": jnp.asarray(tables.sph_radius),
          "tex_color": jnp.asarray(tables.tex_color)}
spec = {"sph_center": [(1, 0), (1, 1), (1, 2)], "sph_radius": [(1,)]}

for tape in (True, False):
    loss = make_replay_loss_fn(tables, cfg, 1, pix % w, pix // w, target,
                               geom_spec=spec, geom_tape=tape)
    vg = jax.jit(jax.value_and_grad(loss))
    try:
        t0 = time.perf_counter()
        l, g = jax.block_until_ready(vg(params))
        print(f"geom_tape={tape}: compile+first "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        # round-2 state: the full-intersect linearization stores [B, N]
        # candidate residuals per bounce -> OOM at 1080p x 512 rows
        print(f"geom_tape={tape}: FAILS — {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)
        continue
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        l, g = jax.block_until_ready(vg(params))
        best = min(best, time.perf_counter() - t0)
    gc = np.asarray(g["sph_center"][1])
    print(f"geom_tape={tape}: warm step {best:.2f}s  loss {float(l):.6f} "
          f"d/dcenter1 {gc}", flush=True)
