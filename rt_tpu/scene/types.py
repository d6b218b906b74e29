"""Scene representation: host-side builder objects + the device SoA pytree.

The reference builds a pointer graph of virtual `hittable`/`material`/
`mytexture` objects on the host, mirrors every node with cudaMalloc/Memcpy
(gpu-version/parser.hpp:113-502) and then deep-re-news the whole graph on
device to fix vtables (gpu-version/main.cu:374-446). All of that is
deleted here: a scene *is* a pytree of flat arrays (`SceneTables`), which
jit moves to device as-is — the single source of truth. The Taichi version
already proves this SoA shape works (taichi-version/hittable.py:133-193,
material.py:89-115).

Primitive tables carry the original scene-file object index (`*_obj`) so
closest-hit tie-breaking can reproduce the reference's linear-scan
semantics exactly (object.cuh:23-37: a later object wins a t tie).

Material type ids: 0=lambertian, 1=metal, 2=dielectric, 3=diffuse_light
(mirroring the class_type tag dispatch of rtweekend.cuh:70-91 and the
Taichi integer-switch of material.py:116-145).
Texture type ids: 0=solid_color, 1=checker, 2=image.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax

from rt_tpu.ops import geometry as geom

MAT_LAMBERTIAN = 0
MAT_METAL = 1
MAT_DIELECTRIC = 2
MAT_DIFFUSE_LIGHT = 3

TEX_SOLID = 0
TEX_CHECKER = 1
TEX_IMAGE = 2

# rect axis convention: the constant coordinate's axis index.
# yz_rect -> 0 (x=k), xz_rect -> 1 (y=k), xy_rect -> 2 (z=k)
RECT_YZ = 0
RECT_XZ = 1
RECT_XY = 2


def _pad_size(n: int, minimum: int = 4) -> int:
    """Next power of two >= max(n, minimum): stabilizes jit cache keys
    across scenes of similar size. Always >= 1 even for empty tables so
    every branch of the intersector has static nonzero shapes."""
    m = max(n, minimum)
    return 1 << (m - 1).bit_length()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraDef:
    """Precomputed thin-lens camera frame (gpu-version/camera.cuh:7-48).
    All leaves are f32 arrays so camera parameters are differentiable."""

    origin: jax.Array        # [3]
    lower_left: jax.Array    # [3]
    horizontal: jax.Array    # [3]
    vertical: jax.Array      # [3]
    u: jax.Array             # [3]
    v: jax.Array             # [3]
    lens_radius: jax.Array   # []


def make_camera(
    lookfrom: Sequence[float],
    lookat: Sequence[float],
    vup: Sequence[float],
    vfov_deg: float,
    aspect_ratio: float,
    aperture: float,
    focus_dist: Optional[float] = None,
) -> CameraDef:
    """Camera constructor per gpu-version/camera.cuh:9-28. The JSON parser
    derives focus_dist = |lookfrom - lookat| (parser.hpp:124)."""
    lookfrom = np.asarray(lookfrom, dtype=np.float32)
    lookat = np.asarray(lookat, dtype=np.float32)
    vup = np.asarray(vup, dtype=np.float32)
    if focus_dist is None:
        focus_dist = float(np.linalg.norm(lookfrom - lookat))
    theta = geom.degrees_to_radians(float(vfov_deg))
    h = np.tan(theta / 2.0)
    viewport_height = 2.0 * h
    viewport_width = aspect_ratio * viewport_height

    w = lookfrom - lookat
    w = w / np.linalg.norm(w)
    u = np.cross(vup, w)
    u = u / np.linalg.norm(u)
    v = np.cross(w, u)

    origin = lookfrom
    horizontal = np.float32(focus_dist * viewport_width) * u
    vertical = np.float32(focus_dist * viewport_height) * v
    lower_left = origin - horizontal / 2 - vertical / 2 - np.float32(focus_dist) * w
    return CameraDef(
        origin=np.asarray(origin, np.float32),
        lower_left=np.asarray(lower_left, np.float32),
        horizontal=np.asarray(horizontal, np.float32),
        vertical=np.asarray(vertical, np.float32),
        u=np.asarray(u, np.float32),
        v=np.asarray(v, np.float32),
        lens_radius=np.float32(aperture / 2.0),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneTables:
    """Device-ready SoA scene. Every table is padded to a power-of-two
    length; pad rows have obj index -1 and never produce hits.

    `counts` is STATIC metadata (not a traced leaf): the true number of
    primitives of each type, letting the intersector skip entire
    primitive families at trace time when a scene has none (a sphere-only
    scene compiles no rect/cylinder/triangle code at all)."""

    # spheres (object.cuh:40-94)
    sph_center: jax.Array   # [Ns,3]
    sph_radius: jax.Array   # [Ns]
    sph_mat: jax.Array      # [Ns] i32
    sph_obj: jax.Array      # [Ns] i32, -1 = pad

    # axis-aligned rects (object.cuh:96-197), unified across xy/xz/yz
    rect_axis: jax.Array    # [Nr] i32 (constant axis)
    rect_lo: jax.Array      # [Nr,2] (a0,b0) in the rect's free-axis order
    rect_hi: jax.Array      # [Nr,2] (a1,b1)
    rect_k: jax.Array       # [Nr]
    rect_mat: jax.Array     # [Nr] i32
    rect_obj: jax.Array     # [Nr] i32

    # cylinders (object.cuh:216-297)
    cyl_radius: jax.Array   # [Nc]
    cyl_zmin: jax.Array     # [Nc]
    cyl_zmax: jax.Array     # [Nc]
    cyl_o2w: jax.Array      # [Nc,4,4]
    cyl_w2o: jax.Array      # [Nc,4,4] cached inverse (vec3.cuh:300-320)
    cyl_mat: jax.Array      # [Nc] i32
    cyl_obj: jax.Array      # [Nc] i32

    # triangles (taichi-version/hittable.py:38-71,92-114)
    tri_v1: jax.Array       # [Nt,3]
    tri_v2: jax.Array       # [Nt,3]
    tri_v3: jax.Array       # [Nt,3]
    tri_uv1: jax.Array      # [Nt,2]
    tri_uv2: jax.Array      # [Nt,2]
    tri_uv3: jax.Array      # [Nt,2]
    tri_n: jax.Array        # [Nt,3] unit geometric normal
    tri_mat: jax.Array      # [Nt] i32
    tri_obj: jax.Array      # [Nt] i32

    # materials (material.cuh:14-182)
    mat_type: jax.Array     # [Nm] i32
    mat_albedo: jax.Array   # [Nm,3] (metal albedo / fallback color)
    mat_fuzz: jax.Array     # [Nm]
    mat_ior: jax.Array      # [Nm]
    mat_tex: jax.Array      # [Nm] i32 texture id; -1 -> use mat_albedo

    # textures (texture.cuh:7-57 + taichi image textures)
    tex_type: jax.Array     # [Nx] i32
    tex_color: jax.Array    # [Nx,3] solid value / checker even
    tex_color2: jax.Array   # [Nx,3] checker odd
    tex_image: jax.Array    # [Nx] i32 index into images, -1 if none
    images: jax.Array       # [Ni,TH,TW,3] f32 RGB in [0,1]

    camera: CameraDef
    background: jax.Array   # [3]

    # threaded BVHs over the live rows of the sphere / triangle tables
    # (rt_tpu/accel/bvh.py; dummy 1-node arrays when absent — the static
    # `bvh_for` field says which are real)
    sph_bvh_obj: jax.Array = dataclasses.field(
        default_factory=lambda: np.zeros(1, np.int32))
    sph_bvh_left: jax.Array = dataclasses.field(
        default_factory=lambda: np.full(1, -1, np.int32))
    sph_bvh_next: jax.Array = dataclasses.field(
        default_factory=lambda: np.full(1, -1, np.int32))
    sph_bvh_min: jax.Array = dataclasses.field(
        default_factory=lambda: np.zeros((1, 3), np.float32))
    sph_bvh_max: jax.Array = dataclasses.field(
        default_factory=lambda: np.zeros((1, 3), np.float32))
    tri_bvh_obj: jax.Array = dataclasses.field(
        default_factory=lambda: np.zeros(1, np.int32))
    tri_bvh_left: jax.Array = dataclasses.field(
        default_factory=lambda: np.full(1, -1, np.int32))
    tri_bvh_next: jax.Array = dataclasses.field(
        default_factory=lambda: np.full(1, -1, np.int32))
    tri_bvh_min: jax.Array = dataclasses.field(
        default_factory=lambda: np.zeros((1, 3), np.float32))
    tri_bvh_max: jax.Array = dataclasses.field(
        default_factory=lambda: np.zeros((1, 3), np.float32))
    rect_bvh_obj: jax.Array = dataclasses.field(
        default_factory=lambda: np.zeros(1, np.int32))
    rect_bvh_left: jax.Array = dataclasses.field(
        default_factory=lambda: np.full(1, -1, np.int32))
    rect_bvh_next: jax.Array = dataclasses.field(
        default_factory=lambda: np.full(1, -1, np.int32))
    rect_bvh_min: jax.Array = dataclasses.field(
        default_factory=lambda: np.zeros((1, 3), np.float32))
    rect_bvh_max: jax.Array = dataclasses.field(
        default_factory=lambda: np.zeros((1, 3), np.float32))
    cyl_bvh_obj: jax.Array = dataclasses.field(
        default_factory=lambda: np.zeros(1, np.int32))
    cyl_bvh_left: jax.Array = dataclasses.field(
        default_factory=lambda: np.full(1, -1, np.int32))
    cyl_bvh_next: jax.Array = dataclasses.field(
        default_factory=lambda: np.full(1, -1, np.int32))
    cyl_bvh_min: jax.Array = dataclasses.field(
        default_factory=lambda: np.zeros((1, 3), np.float32))
    cyl_bvh_max: jax.Array = dataclasses.field(
        default_factory=lambda: np.zeros((1, 3), np.float32))

    # emissive-primitive index for NEE (cfg.nee, an opt-in extension
    # beyond the reference): light_fam holds PTYPE_* codes, light_pid
    # the row in that family's table. Dummy 1-entry arrays when the
    # scene has no NEE-sampleable lights (n_lights = 0, static).
    light_fam: jax.Array = dataclasses.field(
        default_factory=lambda: np.zeros(1, np.int32))
    light_pid: jax.Array = dataclasses.field(
        default_factory=lambda: np.zeros(1, np.int32))

    # (n_spheres, n_rects, n_cylinders, n_triangles) — static
    counts: Tuple[int, int, int, int] = dataclasses.field(
        default=(0, 0, 0, 0), metadata=dict(static=True))
    # number of NEE-sampleable lights (static) — every emissive
    # primitive of every family, triangles included
    n_lights: int = dataclasses.field(default=0, metadata=dict(static=True))
    # the megakernel's in-kernel NEE can bake this scene's light table.
    # Since round 4 every emission texture bakes — solid/checker as
    # color rows, image as an atlas id + light-point UV sampled
    # in-kernel — so this is simply "the scene has lights"
    nee_kernel_ok: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    # some NEE light's emission is an image texture (static): gates the
    # megakernel's light-point atlas sampling so solid/checker-only
    # scenes pay nothing for it
    nee_img: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    # which primitive families carry a real BVH, e.g. ("triangle",)
    bvh_for: Tuple[str, ...] = dataclasses.field(
        default=(), metadata=dict(static=True))
    # primitive families whose materials reference IMAGE textures
    # (static: lets the megakernel gate its in-kernel sampler)
    img_on: Tuple[str, ...] = dataclasses.field(
        default=(), metadata=dict(static=True))


@dataclasses.dataclass
class SceneDef:
    """Host-side mutable scene under construction. Mirrors the capability
    of the JSON schema (parser.hpp:34-112) plus the Taichi World's
    triangles/image textures. Call build_tables() to freeze."""

    width: int = 400
    height: int = 225
    samples_per_pixel: int = 16
    max_depth: int = 8
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    output_file: str = "main.png"
    camera: Optional[CameraDef] = None

    objects: List[dict] = dataclasses.field(default_factory=list)
    materials: List[dict] = dataclasses.field(default_factory=list)
    textures: List[dict] = dataclasses.field(default_factory=list)
    images: List[np.ndarray] = dataclasses.field(default_factory=list)
    camera_params: Optional[dict] = None

    # Opt-in Taichi triangle-UV quirk: the reference interpolates
    # triangle UVs with the vertex-1 / vertex-3 barycentric weights
    # SWAPPED (taichi-version/hittable.py:57-60 computes w1=area(p,v1,v2)
    # — the weight opposite v3 — yet hittable.py:233 applies it to u1,
    # and symmetrically w3 to u3). Since every weight denominator there
    # is the same 2*triangle-area, the quirk is exactly equivalent to
    # interpolating with uv1 and uv3 exchanged, so build_tables()
    # implements it by swapping the uv1/uv3 attribute columns — all
    # engines (oracle, xla, pallas, mega) and all diff estimators then
    # reproduce Taichi's textured-mesh pixels with zero kernel changes.
    # Default off: standard barycentric interpolation.
    taichi_tri_uv: bool = False

    # --- object adders (each records the original object index) -----------

    def add_sphere(self, center, radius, material: int) -> int:
        self.objects.append(
            {"type": "sphere", "center": list(map(float, center)),
             "radius": float(radius), "material": int(material)}
        )
        return len(self.objects) - 1

    def add_rect(self, kind: str, a0, a1, b0, b1, k, material: int) -> int:
        assert kind in ("xy_rect", "xz_rect", "yz_rect")
        names = {"xy_rect": ("x0", "x1", "y0", "y1"),
                 "xz_rect": ("x0", "x1", "z0", "z1"),
                 "yz_rect": ("y0", "y1", "z0", "z1")}[kind]
        obj = {"type": kind, names[0]: float(a0), names[1]: float(a1),
               names[2]: float(b0), names[3]: float(b1), "k": float(k),
               "material": int(material)}
        self.objects.append(obj)
        return len(self.objects) - 1

    def add_cylinder(self, radius, zmin, zmax, material: int,
                     rotate=None, translate=None) -> int:
        obj = {"type": "cylinder", "radius": float(radius),
               "zmin": float(zmin), "zmax": float(zmax),
               "material": int(material)}
        if rotate is not None:
            axis, angle_deg = rotate
            obj["rotate"] = {"axis": list(map(float, axis)),
                             "angle": float(angle_deg)}
        if translate is not None:
            obj["translate"] = list(map(float, translate))
        self.objects.append(obj)
        return len(self.objects) - 1

    def add_triangle(self, v1, v2, v3, material: int,
                     uv1=(0.0, 0.0), uv2=(0.0, 0.0), uv3=(0.0, 0.0)) -> int:
        self.objects.append(
            {"type": "triangle",
             "v1": list(map(float, v1)), "v2": list(map(float, v2)),
             "v3": list(map(float, v3)),
             "uv1": list(map(float, uv1)), "uv2": list(map(float, uv2)),
             "uv3": list(map(float, uv3)), "material": int(material)}
        )
        return len(self.objects) - 1

    # --- material / texture adders ----------------------------------------

    def add_lambertian(self, texture: int) -> int:
        self.materials.append({"type": "lambertian", "texture": int(texture)})
        return len(self.materials) - 1

    def add_lambertian_color(self, color) -> int:
        return self.add_lambertian(self.add_solid_color(color))

    def add_metal(self, albedo, fuzz: float) -> int:
        self.materials.append(
            {"type": "metal", "albedo": list(map(float, albedo)),
             "fuzz": float(fuzz)}
        )
        return len(self.materials) - 1

    def add_dielectric(self, ior: float) -> int:
        self.materials.append(
            {"type": "dielectric", "index_of_refraction": float(ior)}
        )
        return len(self.materials) - 1

    def add_diffuse_light(self, texture: int) -> int:
        self.materials.append({"type": "diffuse_light", "texture": int(texture)})
        return len(self.materials) - 1

    def add_diffuse_light_color(self, color) -> int:
        return self.add_diffuse_light(self.add_solid_color(color))

    def add_solid_color(self, color) -> int:
        self.textures.append(
            {"type": "solid_color", "color": list(map(float, color))}
        )
        return len(self.textures) - 1

    def add_checker(self, even, odd) -> int:
        self.textures.append(
            {"type": "checker", "even": list(map(float, even)),
             "odd": list(map(float, odd))}
        )
        return len(self.textures) - 1

    def add_image_texture(self, image_rgb: np.ndarray) -> int:
        """image_rgb: [H,W,3] float RGB in [0,1] (taichi stores 100x100
        u8 BGR and converts at sample time, material.py:137-144; we store
        converted RGB floats once)."""
        self.images.append(np.asarray(image_rgb, dtype=np.float32))
        self.textures.append(
            {"type": "image", "image": len(self.images) - 1}
        )
        return len(self.textures) - 1

    def set_camera(self, lookfrom, lookat, vup, vfov_deg, aperture,
                   focus_dist=None):
        # retain the raw parameters for exact JSON round-tripping
        # (scene_to_dict — the animation drivers mutate scene dicts).
        # focus_dist is kept only when explicitly given (a schema
        # extension: the reference derives it as |lookfrom - lookat|,
        # parser.hpp:124, so builder scenes with an explicit focus
        # distance would otherwise change blur on a round trip).
        self.camera_params = {
            "lookfrom": list(map(float, lookfrom)),
            "lookat": list(map(float, lookat)),
            "vup": list(map(float, vup)),
            "vfov": float(vfov_deg),
            "aperture": float(aperture),
        }
        if focus_dist is not None:
            self.camera_params["focus_dist"] = float(focus_dist)
        self.camera = make_camera(
            lookfrom, lookat, vup, vfov_deg,
            self.width / self.height, aperture, focus_dist,
        )

    def resize(self, width=None, height=None):
        """Change image dimensions AND re-derive the camera frame for the
        new aspect ratio from the retained parameters.

        Deliberate deviation from the reference: its CPU CLI builds the
        camera with a hard-coded 16:9 aspect no matter what -w/-h say
        (cmake-cpu-version/main.cpp:64,94), rendering stretched images on
        any other aspect. Overrides here behave like editing the scene
        JSON's width/height (parser.hpp applies them before camera
        construction)."""
        if width:
            self.width = int(width)
        if height:
            self.height = int(height)
        if self.camera_params is not None:
            p = self.camera_params
            self.set_camera(p["lookfrom"], p["lookat"], p["vup"],
                            p["vfov"], p["aperture"], p.get("focus_dist"))


def _cylinder_o2w(obj: dict) -> Tuple[np.ndarray, np.ndarray]:
    """o2w = translate * rotate * identity — the parser applies rotate
    first, then translate (parser.hpp:423-440), each left-multiplied
    (object.cuh:225-231)."""
    t = geom.identity_transform()
    if "rotate" in obj:
        axis = obj["rotate"]["axis"]
        rad = geom.degrees_to_radians(obj["rotate"]["angle"])
        t = geom.compose(geom.rotate(axis, rad), t)
    if "translate" in obj:
        t = geom.compose(geom.translate(obj["translate"]), t)
    return t


def build_tables(s: SceneDef, bvh_types: Sequence[str] = ()) -> SceneTables:
    """Freeze a SceneDef into padded device tables.

    bvh_types: primitive families ("sphere", "rect", "cylinder",
    "triangle") to build a threaded BVH over (rt_tpu/accel/bvh.py);
    traversal is enabled with RenderConfig(traversal="bvh")."""
    if s.camera is None:
        raise ValueError("scene has no camera")

    sph, rect, cyl, tri = [], [], [], []
    for idx, obj in enumerate(s.objects):
        kind = obj["type"]
        if kind == "sphere":
            sph.append((obj["center"], obj["radius"], obj["material"], idx))
        elif kind in ("xy_rect", "xz_rect", "yz_rect"):
            if kind == "xy_rect":
                axis, lo, hi = RECT_XY, (obj["x0"], obj["y0"]), (obj["x1"], obj["y1"])
            elif kind == "xz_rect":
                axis, lo, hi = RECT_XZ, (obj["x0"], obj["z0"]), (obj["x1"], obj["z1"])
            else:
                axis, lo, hi = RECT_YZ, (obj["y0"], obj["z0"]), (obj["y1"], obj["z1"])
            rect.append((axis, lo, hi, obj["k"], obj["material"], idx))
        elif kind == "cylinder":
            m, minv = _cylinder_o2w(obj)
            cyl.append((obj["radius"], obj["zmin"], obj["zmax"], m, minv,
                        obj["material"], idx))
        elif kind == "triangle":
            v1 = np.asarray(obj["v1"], np.float32)
            v2 = np.asarray(obj["v2"], np.float32)
            v3 = np.asarray(obj["v3"], np.float32)
            n = np.cross(v2 - v1, v3 - v1)
            n = (n / np.linalg.norm(n)).astype(np.float32)
            uv1, uv3 = obj["uv1"], obj["uv3"]
            if s.taichi_tri_uv:  # swap = the reference's w1/w3 quirk
                uv1, uv3 = uv3, uv1
            tri.append((v1, v2, v3, uv1, obj["uv2"], uv3, n,
                        obj["material"], idx))
        else:
            raise ValueError(f"unknown object type: {kind}")

    f32, i32 = np.float32, np.int32

    def padded(rows, builders):
        n = _pad_size(len(rows))
        outs = []
        for build, shape, dtype, fill in builders:
            arr = np.full((n,) + shape, fill, dtype=dtype)
            for i, row in enumerate(rows):
                arr[i] = build(row)
            outs.append(arr)
        return outs

    sph_center, sph_radius, sph_mat, sph_obj = padded(sph, [
        (lambda r: np.asarray(r[0], f32), (3,), f32, 0.0),
        (lambda r: r[1], (), f32, 0.0),
        (lambda r: r[2], (), i32, 0),
        (lambda r: r[3], (), i32, -1),
    ])
    rect_axis, rect_lo, rect_hi, rect_k, rect_mat, rect_obj = padded(rect, [
        (lambda r: r[0], (), i32, 0),
        (lambda r: np.asarray(r[1], f32), (2,), f32, 0.0),
        (lambda r: np.asarray(r[2], f32), (2,), f32, 0.0),
        (lambda r: r[3], (), f32, 0.0),
        (lambda r: r[4], (), i32, 0),
        (lambda r: r[5], (), i32, -1),
    ])
    cyl_radius, cyl_zmin, cyl_zmax, cyl_o2w, cyl_w2o, cyl_mat, cyl_obj = padded(
        cyl, [
            (lambda r: r[0], (), f32, 0.0),
            (lambda r: r[1], (), f32, 0.0),
            (lambda r: r[2], (), f32, 0.0),
            (lambda r: r[3], (4, 4), f32, np.eye(4, dtype=f32)),
            (lambda r: r[4], (4, 4), f32, np.eye(4, dtype=f32)),
            (lambda r: r[5], (), i32, 0),
            (lambda r: r[6], (), i32, -1),
        ])
    (tri_v1, tri_v2, tri_v3, tri_uv1, tri_uv2, tri_uv3, tri_n, tri_mat,
     tri_obj) = padded(tri, [
        (lambda r: r[0], (3,), f32, 0.0),
        (lambda r: r[1], (3,), f32, 0.0),
        (lambda r: r[2], (3,), f32, 0.0),
        (lambda r: np.asarray(r[3], f32), (2,), f32, 0.0),
        (lambda r: np.asarray(r[4], f32), (2,), f32, 0.0),
        (lambda r: np.asarray(r[5], f32), (2,), f32, 0.0),
        (lambda r: r[6], (3,), f32, np.array([0, 0, 1], f32)),
        (lambda r: r[7], (), i32, 0),
        (lambda r: r[8], (), i32, -1),
    ])

    nm = _pad_size(len(s.materials))
    mat_type = np.zeros(nm, i32)
    mat_albedo = np.zeros((nm, 3), f32)
    mat_fuzz = np.zeros(nm, f32)
    mat_ior = np.ones(nm, f32)
    mat_tex = np.full(nm, -1, i32)
    for i, m in enumerate(s.materials):
        kind = m["type"]
        if kind == "lambertian":
            mat_type[i] = MAT_LAMBERTIAN
            mat_tex[i] = m["texture"]
        elif kind == "metal":
            mat_type[i] = MAT_METAL
            mat_albedo[i] = m["albedo"]
            # fuzz clamped to <=1 at construction (material.cuh:60-61)
            mat_fuzz[i] = min(m["fuzz"], 1.0)
        elif kind == "dielectric":
            mat_type[i] = MAT_DIELECTRIC
            mat_ior[i] = m["index_of_refraction"]
            mat_albedo[i] = (1.0, 1.0, 1.0)
        elif kind == "diffuse_light":
            mat_type[i] = MAT_DIFFUSE_LIGHT
            mat_tex[i] = m["texture"]
        else:
            raise ValueError(f"unknown material type: {kind}")

    nx = _pad_size(len(s.textures))
    tex_type = np.zeros(nx, i32)
    tex_color = np.zeros((nx, 3), f32)
    tex_color2 = np.zeros((nx, 3), f32)
    tex_image = np.full(nx, -1, i32)
    for i, t in enumerate(s.textures):
        kind = t["type"]
        if kind == "solid_color":
            tex_type[i] = TEX_SOLID
            tex_color[i] = t["color"]
        elif kind == "checker":
            tex_type[i] = TEX_CHECKER
            tex_color[i] = t["even"]
            tex_color2[i] = t["odd"]
        elif kind == "image":
            tex_type[i] = TEX_IMAGE
            tex_image[i] = t["image"]
        else:
            raise ValueError(f"unknown texture type: {kind}")

    if s.images:
        th, tw = s.images[0].shape[:2]
        for img in s.images:
            if img.shape[:2] != (th, tw):
                raise ValueError("all image textures must share one size")
        images = np.stack(s.images).astype(f32)
    else:
        images = np.zeros((1, 1, 1, 3), f32)

    bvh_fields = {}
    bvh_built = []
    if "sphere" in bvh_types and sph:
        from rt_tpu.accel.bvh import build_bvh, sphere_aabbs

        lo, hi = sphere_aabbs(sph_center[:len(sph)], sph_radius[:len(sph)])
        bv = build_bvh(lo, hi)
        bvh_fields.update(sph_bvh_obj=bv.obj_id, sph_bvh_left=bv.left_id,
                          sph_bvh_next=bv.next_id, sph_bvh_min=bv.bmin,
                          sph_bvh_max=bv.bmax)
        bvh_built.append("sphere")
    if "triangle" in bvh_types and tri:
        from rt_tpu.accel.bvh import build_bvh, triangle_aabbs

        lo, hi = triangle_aabbs(tri_v1[:len(tri)], tri_v2[:len(tri)],
                                tri_v3[:len(tri)])
        bv = build_bvh(lo, hi)
        bvh_fields.update(tri_bvh_obj=bv.obj_id, tri_bvh_left=bv.left_id,
                          tri_bvh_next=bv.next_id, tri_bvh_min=bv.bmin,
                          tri_bvh_max=bv.bmax)
        bvh_built.append("triangle")
    if "rect" in bvh_types and rect:
        from rt_tpu.accel.bvh import build_bvh, rect_aabbs

        nr = len(rect)
        lo, hi = rect_aabbs(rect_axis[:nr], rect_lo[:nr], rect_hi[:nr],
                            rect_k[:nr])
        bv = build_bvh(lo, hi)
        bvh_fields.update(rect_bvh_obj=bv.obj_id, rect_bvh_left=bv.left_id,
                          rect_bvh_next=bv.next_id, rect_bvh_min=bv.bmin,
                          rect_bvh_max=bv.bmax)
        bvh_built.append("rect")
    if "cylinder" in bvh_types and cyl:
        from rt_tpu.accel.bvh import build_bvh, cylinder_aabbs

        nc = len(cyl)
        lo, hi = cylinder_aabbs(cyl_radius[:nc], cyl_zmin[:nc],
                                cyl_zmax[:nc], cyl_o2w[:nc])
        bv = build_bvh(lo, hi)
        bvh_fields.update(cyl_bvh_obj=bv.obj_id, cyl_bvh_left=bv.left_id,
                          cyl_bvh_next=bv.next_id, cyl_bvh_min=bv.bmin,
                          cyl_bvh_max=bv.bmax)
        bvh_built.append("cylinder")

    # which families use image textures (static megakernel gate)
    img_texs = {i for i, t in enumerate(s.textures)
                if t.get("type") == "image"}
    mat_uses_img = {i for i, m in enumerate(s.materials)
                    if m.get("texture") in img_texs}
    fam_of = {"sphere": "sphere", "xy_rect": "rect", "xz_rect": "rect",
              "yz_rect": "rect", "cylinder": "cylinder",
              "triangle": "triangle"}
    img_on = sorted({fam_of[o["type"]] for o in s.objects
                     if o.get("material") in mat_uses_img})

    # NEE light index (cfg.nee): emissive rows of ALL four primitive
    # tables. fam codes = ops.intersect PTYPE_* (0/1/2/3). Triangle
    # emitters are area-sampled like every other family (uniform
    # barycentric; area = |e1 x e2|/2), so a scene may mix mesh lights
    # with analytic ones and the estimator still covers every emitter —
    # no family silently disables light sampling.
    def _rows(mat_ids, obj_ids):
        live = np.asarray(obj_ids) >= 0
        is_l = np.asarray(mat_type)[np.asarray(mat_ids)] == MAT_DIFFUSE_LIGHT
        return np.nonzero(live & is_l)[0]

    l_fam, l_pid = [], []
    for fam, (mids, oids) in enumerate(
            ((sph_mat, sph_obj), (rect_mat, rect_obj),
             (cyl_mat, cyl_obj), (tri_mat, tri_obj))):
        for r in _rows(mids, oids):
            l_fam.append(fam)
            l_pid.append(int(r))
    n_lights = len(l_fam)
    if n_lights:
        light_fam = np.asarray(l_fam, np.int32)
        light_pid = np.asarray(l_pid, np.int32)
    else:
        light_fam = np.zeros(1, np.int32)
        light_pid = np.zeros(1, np.int32)

    nee_kernel_ok = bool(n_lights)

    def _light_mat(fam, pid):
        return int((sph_mat, rect_mat, cyl_mat, tri_mat)[fam][pid])

    nee_img = bool(n_lights) and any(
        int(mat_tex[_light_mat(f, p)]) >= 0
        and int(tex_type[int(mat_tex[_light_mat(f, p)])]) == TEX_IMAGE
        for f, p in zip(l_fam, l_pid))

    return SceneTables(
        **bvh_fields,
        bvh_for=tuple(bvh_built),
        img_on=tuple(img_on),
        light_fam=light_fam, light_pid=light_pid, n_lights=n_lights,
        nee_kernel_ok=nee_kernel_ok, nee_img=nee_img,
        sph_center=sph_center, sph_radius=sph_radius, sph_mat=sph_mat,
        sph_obj=sph_obj,
        rect_axis=rect_axis, rect_lo=rect_lo, rect_hi=rect_hi, rect_k=rect_k,
        rect_mat=rect_mat, rect_obj=rect_obj,
        cyl_radius=cyl_radius, cyl_zmin=cyl_zmin, cyl_zmax=cyl_zmax,
        cyl_o2w=cyl_o2w, cyl_w2o=cyl_w2o, cyl_mat=cyl_mat, cyl_obj=cyl_obj,
        tri_v1=tri_v1, tri_v2=tri_v2, tri_v3=tri_v3,
        tri_uv1=tri_uv1, tri_uv2=tri_uv2, tri_uv3=tri_uv3, tri_n=tri_n,
        tri_mat=tri_mat, tri_obj=tri_obj,
        mat_type=mat_type, mat_albedo=mat_albedo, mat_fuzz=mat_fuzz,
        mat_ior=mat_ior, mat_tex=mat_tex,
        tex_type=tex_type, tex_color=tex_color, tex_color2=tex_color2,
        tex_image=tex_image, images=images,
        camera=s.camera,
        background=np.asarray(s.background, f32),
        counts=(len(sph), len(rect), len(cyl), len(tri)),
    )
