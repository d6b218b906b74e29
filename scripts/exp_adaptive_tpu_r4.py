"""Round-4: adaptive sampling ON-CHIP — equal-budget RMSE across the
three scene classes that motivate it, plus the composed quality
headline (NEE x QMC x adaptive) at a production shape.

The reference renders a fixed spp everywhere (gpu-version/main.cu:95-101);
adaptive allocation is the counterpoint. Round 3 landed render_adaptive
with CPU-only toy numbers (VERDICT r3 weak #1); this run produces the
device-timed record:

  part A — three scenes, equal total path budget, uniform vs adaptive,
           sampler rng and qmc, engine="mega" (production settings):
     1. cornell  : the naive tracer's emissive 17-sphere box
                   (noise = small spherical lights seen through glass)
     2. defocus  : RTiOW cover scene, aperture 0.1 (noise = defocus
                   edges + glass heroes)
     3. smalllight: diffuse field lit by tiny emitters, NEE on
                   (noise = penumbras; the NEE showcase scene)
  part B — composed headline at 960x540: the reference-equivalent
           estimator (plain mega, rng, uniform) RMSE ladder vs
           NEE+QMC+adaptive; reports the equal-quality path multiplier.

Usage: python scripts/exp_adaptive_tpu_r4.py [--part A|B|AB]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from rt_tpu.config import RenderConfig
from rt_tpu.render.adaptive import adaptive_mean, render_adaptive
from rt_tpu.render.renderer import render
from rt_tpu.scene.builders import cornell_spheres_scene, cover_scene
from rt_tpu.scene.types import SceneDef, build_tables

MEGA = dict(engine="mega", compact_schedule=(2, 3, 5), compact_group=16)


def small_light_scene(w, h, depth=12):
    """Diffuse field + tiny emitters (bench_nee_r3's showcase class)."""
    import random
    rnd = random.Random(7)
    s = SceneDef(width=w, height=h, samples_per_pixel=8, max_depth=depth,
                 background=(0.01, 0.01, 0.02))
    s.add_sphere((0, -1000, 0), 1000,
                 s.add_lambertian(s.add_checker((0.2, 0.3, 0.1),
                                                (0.9, 0.9, 0.9))))
    for a in range(-6, 6):
        for b in range(-6, 6):
            center = (a + 0.9 * rnd.random(), 0.2, b + 0.9 * rnd.random())
            albedo = tuple(rnd.random() * rnd.random() for _ in range(3))
            s.add_sphere(center, 0.2, s.add_lambertian_color(albedo))
    s.add_sphere((0, 1, 0), 1.0, s.add_lambertian_color((0.4, 0.2, 0.1)))
    lm = s.add_diffuse_light_color((30.0, 28.0, 24.0))
    s.add_rect("xz_rect", -0.6, 0.6, -0.6, 0.6, 4.0, lm)
    s.add_sphere((4, 1.2, 2), 0.18,
                 s.add_diffuse_light_color((40.0, 20.0, 10.0)))
    s.set_camera(lookfrom=(13, 2, 3), lookat=(0, 0, 0), vup=(0, 1, 0),
                 vfov_deg=20.0, aperture=0.0)
    cfg = RenderConfig(width=w, height=h, samples_per_pixel=8,
                       max_depth=depth, background_mode="constant",
                       nee=True, **MEGA)
    return s, cfg


def get_scene(name):
    if name == "cornell":
        sdef, cfg = cornell_spheres_scene(width=256, height=256, max_depth=8)
        cfg = cfg.replace(**MEGA)
    elif name == "defocus":
        sdef, cfg = cover_scene(width=480, height=270, max_depth=16)
        cfg = cfg.replace(**MEGA)
    elif name == "smalllight":
        sdef, cfg = small_light_scene(480, 270)
    else:
        raise ValueError(name)
    return build_tables(sdef), cfg


def masked_rmse(img, truth, mask):
    return float(np.sqrt(np.mean(((img - truth) * mask) ** 2)))


def run_scene(name, spp_list=(16, 32, 64), truth_spp=4096):
    tables, cfg = get_scene(name)
    t0 = time.perf_counter()
    tcfg = cfg.replace(samples_per_pixel=truth_spp, sampler="qmc", seed=77)
    truth = np.asarray(render(tables, tcfg)) / truth_spp
    print(f"[{name}] truth spp{truth_spp}: {time.perf_counter()-t0:.1f}s",
          flush=True)
    # mask out firefly-dominated pixels so RMSE measures the bulk noise
    mask = (truth.max(axis=-1) < np.percentile(truth.max(axis=-1), 99.5)
            )[..., None].astype(np.float32)
    rows = []
    for smp in ("rng", "qmc"):
        for spp in spp_list:
            c = cfg.replace(samples_per_pixel=spp, sampler=smp)
            # uniform: device-timed (after warmup)
            img = render(tables, c, device_out=True)
            jax.block_until_ready(img)
            t0 = time.perf_counter()
            img = render(tables, c, device_out=True)
            jax.block_until_ready(img)
            t_uni = time.perf_counter() - t0
            uni = masked_rmse(np.asarray(img) / spp, truth, mask)
            # adaptive: wall-timed (host selection loop included), after
            # one warmup run to exclude compile time
            render_adaptive(tables, c)
            t0 = time.perf_counter()
            acc, n = render_adaptive(tables, c)
            t_ada = time.perf_counter() - t0
            ada = masked_rmse(adaptive_mean(acc, n), truth, mask)
            eq = (uni / ada) ** 2  # RMSE ~ 1/sqrt(spp): path multiplier
            rows.append((smp, spp, uni, t_uni, ada, t_ada, eq))
            print(f"[{name}] {smp} spp {spp:3d}: uniform {uni:.5f} "
                  f"({t_uni:5.2f}s)  adaptive {ada:.5f} ({t_ada:5.2f}s)  "
                  f"rmse x{uni/ada:.2f}  equal-quality paths x{eq:.2f}",
                  flush=True)
    return rows


def run_composed():
    """960x540 small-light scene: reference-equivalent estimator ladder
    vs the composed NEE+QMC+adaptive estimator at equal budgets."""
    W, H = 960, 540
    sdef, cfg = small_light_scene(W, H)
    tables = build_tables(sdef)
    truth_spp = 4096
    t0 = time.perf_counter()
    truth = np.asarray(render(tables, cfg.replace(
        samples_per_pixel=truth_spp, sampler="qmc", seed=77))) / truth_spp
    print(f"[composed] truth spp{truth_spp}: {time.perf_counter()-t0:.1f}s",
          flush=True)
    mask = (truth.max(axis=-1) < np.percentile(truth.max(axis=-1), 99.5)
            )[..., None].astype(np.float32)

    base_cfg = cfg.replace(nee=False, sampler="rng")  # reference semantics
    base = []
    for spp in (32, 128, 512):
        c = base_cfg.replace(samples_per_pixel=spp)
        img = render(tables, c, device_out=True)
        jax.block_until_ready(img)
        t0 = time.perf_counter()
        img = render(tables, c, device_out=True)
        jax.block_until_ready(img)
        dt = time.perf_counter() - t0
        e = masked_rmse(np.asarray(img) / spp, truth, mask)
        base.append((spp, e, dt))
        print(f"[composed] plain-rng-uniform spp {spp:4d}: rmse {e:.5f} "
              f"({dt:.2f}s)", flush=True)

    comp = []
    for spp in (8, 16, 32):
        c = cfg.replace(samples_per_pixel=spp, sampler="qmc")  # nee on
        render_adaptive(tables, c)
        t0 = time.perf_counter()
        acc, n = render_adaptive(tables, c)
        dt = time.perf_counter() - t0
        e = masked_rmse(adaptive_mean(acc, n), truth, mask)
        comp.append((spp, e, dt))
        print(f"[composed] NEE+QMC+adaptive   spp {spp:4d}: rmse {e:.5f} "
              f"({dt:.2f}s)", flush=True)

    # fit log-log line to the baseline ladder; solve for the uniform spp
    # that matches each composed RMSE
    ls, le = np.log([s for s, _, _ in base]), np.log([e for _, e, _ in base])
    slope, icept = np.polyfit(ls, le, 1)
    for spp, e, dt in comp:
        spp_eq = float(np.exp((np.log(e) - icept) / slope))
        print(f"[composed] spp {spp:3d} composed rmse {e:.5f} == "
              f"plain-uniform spp {spp_eq:.0f}  -> paths x{spp_eq/spp:.1f} "
              f"fewer", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="AB")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    if "A" in args.part:
        for name in ("cornell", "defocus", "smalllight"):
            run_scene(name)
    if "B" in args.part:
        run_composed()
