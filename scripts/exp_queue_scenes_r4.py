"""Round-4: queue vs segmented megakernel across the scene classes
BASELINE.md already anchors — blue2.json, the 1940-sphere big cover,
and the 8192-triangle mesh scene. Device timing (device_out +
block_until_ready), best of 3. Usage: python exp_queue_scenes_r4.py
[blue2|bigcover|mesh] ... (default: all)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, json, tempfile
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rt_tpu.scene.parser import parse_scene
from rt_tpu.scene.builders import cover_scene, mesh_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.render.renderer import render

SPP = 8


def uv_sphere_obj(path, n_lat, n_lon, r=1.6):
    """Watertight UV sphere (bench_mesh.py's generator — that module
    benchmarks at import, so the helper is duplicated here)."""
    lines = []
    for i in range(n_lat + 1):
        th = np.pi * i / n_lat
        for j in range(n_lon):
            ph = 2 * np.pi * j / n_lon
            lines.append("v %.6f %.6f %.6f" % (
                r * np.sin(th) * np.cos(ph), r * np.cos(th),
                r * np.sin(th) * np.sin(ph)))

    def vid(i, j):
        return i * n_lon + (j % n_lon) + 1

    for i in range(n_lat):
        for j in range(n_lon):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j), vid(i + 1, j + 1)
            if i > 0:
                lines.append(f"f {a} {b} {c}")
            if i < n_lat - 1:
                lines.append(f"f {b} {d} {c}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def timed(tables, cfg, label):
    jax.block_until_ready(render(tables, cfg, device_out=True))
    dt = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(render(tables, cfg, device_out=True))
        dt = min(dt, time.perf_counter() - t0)
    pps = cfg.width * cfg.height * cfg.samples_per_pixel / dt
    print(json.dumps({"scene": label, "engine": cfg.engine,
                      "paths_per_s": round(pps),
                      "frame_s": round(dt, 3)}), flush=True)


def scenes(which):
    if which == "blue2":
        sdef, cfg = parse_scene("/root/reference/gpu-version/blue2.json")
        cfg = cfg.replace(samples_per_pixel=SPP)
        yield "blue2.json 1080p d50", build_tables(sdef), cfg
    elif which == "bigcover":
        sdef, cfg = cover_scene(width=1920, height=1080, spp=SPP,
                                max_depth=50, grid=22)
        yield "cover-1940sph 1080p d50", build_tables(sdef), \
            cfg.replace(cull_chunks=True)
    elif which == "mesh":
        with tempfile.TemporaryDirectory() as td:
            obj = os.path.join(td, "s.obj")
            uv_sphere_obj(obj, 64, 64)
            sdef, cfg = mesh_scene(obj, width=1920, height=1080, spp=SPP,
                                   max_depth=8)
            yield "mesh-8064tri 1080p d8", build_tables(sdef), \
                cfg.replace(cull_chunks=True)


for which in (sys.argv[1:] or ["blue2", "bigcover", "mesh"]):
    for label, tables, cfg in scenes(which):
        base = cfg.replace(rays_per_batch=1 << 25)
        timed(tables, base.replace(engine="queue"), label)
        timed(tables, base.replace(engine="mega",
                                   compact_schedule=(2, 3, 5, 10),
                                   compact_group=16), label)
