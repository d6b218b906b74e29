"""Round-5 MIS measurement: equal-spp RMSE of plain / NEE / MIS on the
two light regimes (the round-3 NEE table's method, extended with the
MIS column). Reference image: 8192-spp MIS render of each scene.

Usage: python scripts/bench_mis_r5.py [spp]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _scenes():
    from rt_tpu.config import RenderConfig
    from rt_tpu.scene.types import SceneDef

    def small():
        s = SceneDef(width=320, height=180, samples_per_pixel=4,
                     max_depth=6, background=(0.0, 0.0, 0.0))
        s.add_sphere((0, 0, -2), 0.5, s.add_lambertian_color((0.6, 0.4, 0.3)))
        s.add_sphere((0, -100.5, -2), 100,
                     s.add_lambertian_color((0.5, 0.5, 0.55)))
        s.add_sphere((1.6, 0.4, -1.4), 0.08,
                     s.add_diffuse_light_color((40.0, 15.0, 15.0)))
        s.set_camera((0, 0.4, 1.2), (0, 0, -2), (0, 1, 0), 55, 0.0)
        return s

    def big():
        s = SceneDef(width=320, height=180, samples_per_pixel=4,
                     max_depth=4, background=(0.0, 0.0, 0.0))
        s.add_sphere((0, -100.5, -2), 100,
                     s.add_lambertian_color((0.6, 0.55, 0.5)))
        s.add_sphere((0, 0, -2), 0.5, s.add_lambertian_color((0.3, 0.5, 0.4)))
        s.add_rect("xz_rect", -6.0, 6.0, -8.0, 4.0, 2.2,
                   s.add_diffuse_light_color((2.5, 2.4, 2.2)))
        s.set_camera((0, 0.4, 1.2), (0, 0, -2), (0, 1, 0), 55, 0.0)
        return s

    cfg = RenderConfig(width=320, height=180, samples_per_pixel=4,
                       max_depth=6, background_mode="constant",
                       engine="queue", rays_per_batch=1 << 23)
    return [("small_light", small(), cfg),
            ("large_light", big(), cfg.replace(max_depth=4))]


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rt_tpu.scene.types import build_tables
    from rt_tpu.render.renderer import render

    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    out = {"spp": spp}
    for name, sdef, cfg in _scenes():
        t = build_tables(sdef)
        ref = np.asarray(render(
            t, cfg.replace(samples_per_pixel=8192, nee=True,
                           mis=True))) / 8192.0
        row = {}
        for est, kw in (("plain", {}), ("nee", dict(nee=True)),
                        ("mis", dict(nee=True, mis=True))):
            img = np.asarray(render(
                t, cfg.replace(samples_per_pixel=spp, **kw))) / spp
            mask = (ref.max(axis=-1) < 0.5 * ref.max())[..., None]
            row[est] = round(float(np.sqrt(
                np.mean(((img - ref) * mask) ** 2))), 5)
        out[name] = row
        print(name, row, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
