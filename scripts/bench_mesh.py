"""Triangle chunk-culling benchmark: per-sample time vs mesh size.

Generates UV-sphere meshes (512 / 2048 / 8192 triangles), renders the
taichi-style mesh scene at 1080p depth 8, and compares the megakernel
with cull_chunks off/on. The triangle analogue of the 1940-sphere
culling row in BASELINE.md."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, tempfile, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from rt_tpu.scene.builders import mesh_scene
from rt_tpu.scene.types import build_tables
from rt_tpu.ops import pallas_mega as pm
from rt_tpu.ops.camera import generate_rays

w, h, depth = 1920, 1080, 8


def uv_sphere_obj(path, n_lat, n_lon, r=1.6):
    """Watertight UV sphere: 2*n_lon*(n_lat-1) triangles."""
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


def timeit(f, *args, reps=3):
    o = f(*args); np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


for n_lat, n_lon in ((16, 16), (32, 32), (64, 64)):
    with tempfile.TemporaryDirectory() as td:
        obj = os.path.join(td, "s.obj")
        uv_sphere_obj(obj, n_lat, n_lon)
        sdef, cfg = mesh_scene(obj, width=w, height=h, spp=1,
                               max_depth=depth)
    tables = build_tables(sdef)
    nt = int(tables.tri_v1.shape[0])
    tbl = jax.tree_util.tree_map(jnp.asarray, tables)

    pix = np.arange(w * h, dtype=np.int32)
    px_all, py_all = pix % w, pix // w
    block = (py_all // 32) * ((w + 63) // 64) + (px_all // 64)
    order = np.argsort(block, kind="stable")
    px = jnp.asarray(px_all[order]); py = jnp.asarray(py_all[order])
    pixel = jnp.asarray((py_all * w + px_all)[order].astype(np.uint32))
    sample = jnp.zeros_like(pixel)
    ro, rd = generate_rays(tbl.camera, w, h, px, py, sample,
                           jnp.uint32(0), False)

    for cull in (False, True):
        c = cfg.replace(engine="mega", compact_schedule=(2, 3),
                        compact_group=16, cull_chunks=cull)

        @jax.jit
        def f(ro, rd, pixel):
            return pm.mega_trace(tbl, c, ro, rd, pixel,
                                 jnp.uint32(0), jnp.uint32(0))
        dt = timeit(f, ro, rd, pixel)
        print(f"tris={nt:5d} cull={int(cull)}: {dt*1e3:7.1f} ms/sample "
              f"({w*h/dt/1e6:6.2f}M paths/s)", flush=True)
