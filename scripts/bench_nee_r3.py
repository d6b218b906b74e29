"""Round-3: NEE (direct-light sampling) equal-quality accounting.

Reference-scene findings first (measured):
  - blue2.json: every surface is metal/glass (the declared lambertian
    material is unused) — NEE is a correct no-op (bit-identical).
  - the naive tracer's Cornell scene: all its lights sit INSIDE glass
    shells, so shadow rays are always occluded — NEE stays unbiased
    but reduces nothing.
So the showcase is the class the reference never built: a diffuse
scene lit by SMALL emitters. This renders one (cover-scene geometry +
a small rect + sphere light, dark sky) at 960x540 and reports masked
MSE + device time for plain-megakernel, NEE-IN-KERNEL (light table + shadow chunk pass inside the megakernel), and NEE-hybrid —
the honest three-way: NEE pays the hybrid-engine tax (no in-kernel
shadow pass yet), wins on variance.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from rt_tpu.config import RenderConfig
from rt_tpu.scene.types import SceneDef, build_tables
from rt_tpu.render.renderer import render

W, H, DEPTH = 960, 540, 12


def scene():
    import random
    rnd = random.Random(7)
    s = SceneDef(width=W, height=H, samples_per_pixel=8, max_depth=DEPTH,
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
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=8,
                       max_depth=DEPTH, background_mode="constant",
                       engine="mega", rays_per_batch=1 << 23,
                       compact_schedule=(2, 3, 5), compact_group=16)
    return s, cfg


sdef, cfg = scene()
tables = build_tables(sdef)
print(f"lights: {tables.n_lights}", flush=True)

REF_SPP = 1024
t0 = time.perf_counter()
ref = np.asarray(render(tables, cfg.replace(samples_per_pixel=REF_SPP,
                                            nee=True),
                        device_out=True)) / REF_SPP
print(f"ref (nee spp{REF_SPP}): {time.perf_counter()-t0:.1f}s", flush=True)
mask = (ref.max(axis=-1) < 1.0)[..., None]


def run(c, spp):
    c = c.replace(samples_per_pixel=spp)
    jax.block_until_ready(render(tables, c, device_out=True))
    t0 = time.perf_counter()
    img = render(tables, c, device_out=True)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    e = float(np.mean(((np.asarray(img) / spp) * mask - ref * mask) ** 2))
    return e, dt


for spp in (8, 32, 128):
    e_m, t_m = run(cfg, spp)                                   # plain mega
    e_k, t_k = run(cfg.replace(nee=True), spp)                 # NEE in-kernel
    e_h, t_h = run(cfg.replace(nee=True, engine="pallas"), spp)  # NEE hybrid
    print(f"spp {spp:4d}: mega {e_m:.3e} ({t_m:5.2f}s)  "
          f"NEE-kernel {e_k:.3e} ({t_k:5.2f}s)  "
          f"NEE-hybrid {e_h:.3e} ({t_h:5.2f}s)  "
          f"var x{e_m/max(e_k,1e-12):.1f} at cost "
          f"x{t_k/max(t_m,1e-9):.1f}", flush=True)
