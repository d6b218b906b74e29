"""Measure the QMC error win: RMSE vs a converged reference at a sweep
of spp, rng vs qmc, on the cover scene (the headline benchmark shape,
small frame) and the three-sphere scene with defocus."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from rt_tpu.config import RenderConfig
from rt_tpu.render.renderer import render
from rt_tpu.scene.builders import cover_scene, three_sphere_scene
from rt_tpu.scene.types import build_tables


def sweep(name, sdef, base):
    tables = build_tables(sdef)
    truth = np.asarray(render(tables, base.replace(
        samples_per_pixel=4096, seed=1234))) / 4096.0
    print(f"== {name} ==")
    for spp in (4, 16, 64, 256):
        row = [f"spp {spp:4d}"]
        errs = {}
        for smp in ("rng", "qmc"):
            img = np.asarray(render(tables, base.replace(
                samples_per_pixel=spp, sampler=smp))) / spp
            errs[smp] = float(np.sqrt(np.mean((img - truth) ** 2)))
            row.append(f"{smp} {errs[smp]:.5f}")
        row.append(f"ratio {errs['qmc'] / errs['rng']:.3f}")
        print("  ".join(row), flush=True)


sdef, _ = three_sphere_scene(width=96, height=54)
base = RenderConfig(width=96, height=54, max_depth=8,
                    background_mode="gradient", engine="xla", loop="scan",
                    enable_defocus=True)
sweep("three_sphere 96x54 d8 gradient-sky", sdef, base)

sdef, cfg = cover_scene(width=96, height=54, spp=4, max_depth=12)
base = cfg.replace(engine="xla", loop="scan")
sweep("cover 96x54 d12", sdef, base)
