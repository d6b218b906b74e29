"""Adaptive vs uniform RMSE at equal path budgets (cornell box,
noise-concentrated emissive scene) for both samplers."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from rt_tpu.render.adaptive import adaptive_mean, render_adaptive
from rt_tpu.render.renderer import render
from rt_tpu.scene.builders import cornell_spheres_scene
from rt_tpu.scene.types import build_tables

sdef, cfg0 = cornell_spheres_scene(width=96, height=96, max_depth=8)
tables = build_tables(sdef)
base = cfg0.replace(engine="xla", loop="scan")
truth = np.asarray(render(tables, base.replace(
    samples_per_pixel=2048, seed=77))) / 2048.0


def rmse(a):
    return float(np.sqrt(np.mean((a - truth) ** 2)))


for smp in ("rng", "qmc"):
    for spp in (16, 32, 64):
        c = base.replace(samples_per_pixel=spp, sampler=smp)
        uni = rmse(np.asarray(render(tables, c)) / spp)
        acc, n = render_adaptive(tables, c, spp_base=max(4, spp // 4),
                                 rounds=8, batch_samples=4)
        ada = rmse(adaptive_mean(acc, n))
        print(f"{smp} spp {spp:3d}: uniform {uni:.5f}  adaptive {ada:.5f}"
              f"  ratio {ada / uni:.3f}  (spent {n.mean():.1f} avg spp)",
              flush=True)
