"""Round-5: training-step time with the queue engine on the forward
(VERDICT r4 #4) — the replay-VJP step re-renders every iteration, so
the 2x queue forward should show up in the full value_and_grad step.

Measures, at 1080p depth-50 spp-1 on the cover scene:
  - forward-only render (engine=mega vs queue)           [context]
  - jitted value_and_grad of make_replay_loss_fn with
    forward engine mega vs queue (adjoint-megakernel bwd on both)

Usage: python scripts/bench_grad_queue_r5.py [reps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rt_tpu.scene.builders import cover_scene
    from rt_tpu.scene.types import build_tables
    from rt_tpu.diff.replay import make_replay_loss_fn

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    w, h, d = 1920, 1080, 50
    sdef, cfg = cover_scene(width=w, height=h, spp=1, max_depth=d)
    cfg = cfg.replace(rays_per_batch=1 << 25, cull_chunks=True,
                      compact_schedule=(2, 3, 5, 10), compact_group=16,
                      loop="while")
    tables = build_tables(sdef)
    pix = np.arange(w * h, dtype=np.int32)
    px, py = pix % w, pix // w
    rs = np.random.RandomState(0)
    tgt = rs.rand(w * h, 3).astype(np.float32)
    params = {"tex_color": jnp.asarray(tables.tex_color, jnp.float32),
              "mat_albedo": jnp.asarray(tables.mat_albedo, jnp.float32)}

    out = {}
    for eng in ("mega", "queue"):
        c = cfg.replace(engine=eng)
        # bwd_depth 8: the production truncation (~0.4% bias, BASELINE
        # round-2); backward cost is then small vs the forward renders
        vg = jax.jit(jax.value_and_grad(make_replay_loss_fn(
            tables, c, 1, px, py, tgt, bwd_depth=8)))
        (l0, g0) = vg(params)
        jax.block_until_ready((l0, g0))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            lv, gv = vg(params)
            jax.block_until_ready((lv, gv))
            ts.append(time.perf_counter() - t0)
        out[f"step_{eng}_s"] = round(min(ts), 3)
        out[f"step_{eng}_med_s"] = round(float(np.median(ts)), 3)
        print(f"{eng}: best {min(ts):.3f} s  median "
              f"{np.median(ts):.3f} s  loss {float(lv):.5f}", flush=True)
    out["speedup"] = round(out["step_mega_s"] / out["step_queue_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
