"""Round-2 chained TPU measurements: compaction sweep after the
scatter-fix + curved-UV kernel compile check."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rt_tpu.config import RenderConfig
from rt_tpu.scene.builders import cover_scene
from rt_tpu.scene.types import build_tables, SceneDef
from rt_tpu.render.renderer import render

width, height, depth, spp = 1920, 1080, 50, 8
sdef, cfg0 = cover_scene(width=width, height=height, spp=spp, max_depth=depth)
cfg0 = cfg0.replace(rays_per_batch=1 << 25, engine="mega")
tables = build_tables(sdef)

for ce in [0, 4, 2, -1, 8, 1]:
    cfg = cfg0.replace(compact_every=ce)
    t0 = time.perf_counter()
    render(tables, cfg)
    compile_s = time.perf_counter() - t0
    dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        render(tables, cfg)
        dt = min(dt, time.perf_counter() - t0)
    pps = width * height * spp / dt
    print(json.dumps({"compact_every": ce, "paths_per_s": round(pps),
                      "frame_s": round(dt, 2),
                      "compile_s": round(compile_s, 1)}), flush=True)

# curved-primitive image textures in-kernel: compile + run on TPU
rs = np.random.RandomState(0)
s = SceneDef(width=400, height=225, samples_per_pixel=8, max_depth=8,
             background=(0.7, 0.8, 1.0))
ti = s.add_image_texture(rs.rand(16, 16, 3).astype(np.float32))
s.add_sphere((0, 0, -1), 0.5, s.add_lambertian(ti))
s.add_cylinder(0.3, -0.5, 0.5, s.add_lambertian(ti),
               rotate=((1.0, 0.0, 0.0), 60.0), translate=(1.0, 0.0, -1.5))
s.add_rect("xy_rect", -2, 2, -1, 1, -3.0, s.add_lambertian(ti))
s.add_sphere((0, -100.5, -1), 100, s.add_lambertian_color((.6, .6, .6)))
s.set_camera((0, 0, 1), (0, 0, -1), (0, 1, 0), 60, 0.0)
tb = build_tables(s)
c = RenderConfig(width=400, height=225, samples_per_pixel=8, max_depth=8,
                 engine="mega")
t0 = time.perf_counter()
img_m = render(tb, c)
print(json.dumps({"curved_uv_mega_compile_s": round(time.perf_counter()-t0, 1),
                  "finite": bool(np.isfinite(img_m).all())}), flush=True)
img_x = render(tb, c.replace(engine="xla"))
diff = np.abs(img_m / 8 - img_x / 8).max(axis=-1)
print(json.dumps({"curved_uv_outlier_frac": float((diff > 2e-3).mean()),
                  "max_diff": float(diff.max())}), flush=True)
