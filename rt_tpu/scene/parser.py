"""JSON scene parser — compatible with the reference's scene schema.

Schema (documented at gpu-version/parser.hpp:34-112, live examples
sample_scene.json / blue.json / blue2.json):

  top level : output_file (default "main.png", parser.hpp:567-568),
              background[3], max_depth, samples_per_pixel, width, height
  camera    : lookfrom[3], lookat[3], vup[3], vfov (deg), aperture
              (focus_dist derived as |lookfrom - lookat|, parser.hpp:124)
  object    : {"data": [...]} — sphere{center,radius,material},
              xy_rect/xz_rect/yz_rect{x0,x1,y0/z0,y1/z1,k,material},
              cylinder{radius,zmin,zmax,material,
                       rotate{axis,angle°}?, translate[3]?}
              (rotate applied before translate, parser.hpp:423-440)
  material  : {"data": [...]} — lambertian{texture}, metal{albedo,fuzz},
              dielectric{index_of_refraction}, diffuse_light{texture}
  texture   : {"data": [...]} — solid_color{color[3]}

Extensions beyond the reference parser (capability parity with the
*other* reference versions, gated on distinct "type" strings so every
reference scene file parses unchanged):
  - object "triangle" {v1,v2,v3,uv1?,uv2?,uv3?,material} (Taichi T3/T4)
  - texture "checker" {even[3], odd[3]} (texture.cuh:33-57 — the CUDA
    renderer supports checker but its JSON parser never exposed it)
  - texture "image" {file} (Taichi image textures, material.py:137-144)

The reference also tolerates {"object": [...]} directly as a list (the
schema comment at parser.hpp:49 shows that form); both are accepted.
"""

from __future__ import annotations

import json
import os
from typing import Tuple

import numpy as np

from rt_tpu.config import RenderConfig
from rt_tpu.scene.types import SceneDef, SceneTables, build_tables


def _data_list(section) -> list:
    if section is None:
        return []
    if isinstance(section, dict):
        return section.get("data", [])
    return list(section)


def parse_scene_dict(data: dict, base_dir: str = ".") -> Tuple[SceneDef, RenderConfig]:
    s = SceneDef(
        width=int(data["width"]),
        height=int(data["height"]),
        samples_per_pixel=int(data["samples_per_pixel"]),
        max_depth=int(data["max_depth"]),
        background=tuple(float(c) for c in data["background"]),
        output_file=str(data.get("output_file", "main.png")),
        # schema extension: opt-in Taichi swapped-weight triangle UVs
        # (taichi-version/hittable.py:57-60,233; see SceneDef.taichi_tri_uv)
        taichi_tri_uv=bool(data.get("taichi_tri_uv", False)),
    )

    cam = data["camera"]
    # "focus_dist" is a schema extension (like "checker"/"triangle"):
    # the reference always derives |lookfrom - lookat| (parser.hpp:124)
    fd = cam.get("focus_dist")
    s.set_camera(cam["lookfrom"], cam["lookat"], cam["vup"],
                 float(cam["vfov"]), float(cam["aperture"]),
                 focus_dist=None if fd is None else float(fd))

    for t in _data_list(data.get("texture")):
        kind = t["type"]
        if kind == "solid_color":
            s.add_solid_color(t["color"])
        elif kind == "checker":
            s.add_checker(t["even"], t["odd"])
        elif kind == "image":
            from rt_tpu.scene.assets import load_image_texture
            s.add_image_texture(
                load_image_texture(os.path.join(base_dir, t["file"]))
            )
        else:
            raise ValueError(f"unknown texture type: {kind}")

    for m in _data_list(data.get("material")):
        kind = m["type"]
        if kind == "lambertian":
            s.add_lambertian(int(m["texture"]))
        elif kind == "metal":
            s.add_metal(m["albedo"], float(m["fuzz"]))
        elif kind == "dielectric":
            s.add_dielectric(float(m["index_of_refraction"]))
        elif kind == "diffuse_light":
            s.add_diffuse_light(int(m["texture"]))
        else:
            raise ValueError(f"unknown material type: {kind}")

    for o in _data_list(data.get("object")):
        kind = o["type"]
        if kind == "sphere":
            s.add_sphere(o["center"], o["radius"], o["material"])
        elif kind == "xy_rect":
            s.add_rect("xy_rect", o["x0"], o["x1"], o["y0"], o["y1"], o["k"],
                       o["material"])
        elif kind == "xz_rect":
            s.add_rect("xz_rect", o["x0"], o["x1"], o["z0"], o["z1"], o["k"],
                       o["material"])
        elif kind == "yz_rect":
            s.add_rect("yz_rect", o["y0"], o["y1"], o["z0"], o["z1"], o["k"],
                       o["material"])
        elif kind == "cylinder":
            rot = None
            if "rotate" in o:
                rot = (o["rotate"]["axis"], o["rotate"]["angle"])
            s.add_cylinder(o["radius"], o["zmin"], o["zmax"], o["material"],
                           rotate=rot, translate=o.get("translate"))
        elif kind == "triangle":
            s.add_triangle(o["v1"], o["v2"], o["v3"], o["material"],
                           uv1=o.get("uv1", (0.0, 0.0)),
                           uv2=o.get("uv2", (0.0, 0.0)),
                           uv3=o.get("uv3", (0.0, 0.0)))
        else:
            raise ValueError(f"unknown object type: {kind}")

    cfg = RenderConfig(
        width=s.width, height=s.height,
        samples_per_pixel=s.samples_per_pixel, max_depth=s.max_depth,
    )
    return s, cfg


def parse_scene(path: str) -> Tuple[SceneDef, RenderConfig]:
    """Parse a scene JSON file (the `-f <scene.json>` surface of
    gpu-version/main.cu:454-460)."""
    with open(path) as f:
        data = json.load(f)
    return parse_scene_dict(data, base_dir=os.path.dirname(path) or ".")


def scene_to_dict(s: SceneDef) -> dict:
    """Serialize a SceneDef back to the JSON schema (the inverse surface
    the animation drivers need, cf. gpu-version/blue.py:17-22 mutating
    scene dicts in place)."""
    out = {
        "output_file": s.output_file,
        "background": list(s.background),
        "max_depth": s.max_depth,
        "samples_per_pixel": s.samples_per_pixel,
        "width": s.width,
        "height": s.height,
        "camera": _camera_to_dict(s),
        "object": {"data": [dict(o) for o in s.objects]},
        "material": {"data": [dict(m) for m in s.materials]},
        "texture": {"data": [dict(t) for t in s.textures]},
    }
    if s.taichi_tri_uv:  # schema extension; omitted when default
        out["taichi_tri_uv"] = True
    return out


def _camera_to_dict(s: SceneDef) -> dict:
    if s.camera_params is not None:
        return dict(s.camera_params)
    if s.camera is None:
        raise ValueError("scene has no camera")
    # legacy best-effort (cameras constructed without set_camera)
    c = s.camera
    return {"lookfrom": np.asarray(c.origin).tolist(), "lookat": [0, 0, 0],
            "vup": [0, 1, 0], "vfov": 20,
            "aperture": float(c.lens_radius) * 2.0}


def tables_from_file(path: str) -> Tuple[SceneTables, RenderConfig, str]:
    sdef, cfg = parse_scene(path)
    return build_tables(sdef), cfg, sdef.output_file
