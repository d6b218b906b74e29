"""Scalar NumPy oracle renderer — the framework's ground truth.

The reference's de-facto oracle is its CPU renderer compared by eye at a
fixed seed (SURVEY.md §4). We automate that: this module is a deliberately
independent, loop-based implementation of the same radiometric semantics
(gpu-version/main.cu:17-70 + per-primitive hit functions), sharing ONLY
the RNG module with the TPU path (both consume the counter-based stream
at identical (pixel, sample, bounce, purpose) coordinates — by design, so
every random decision matches and images agree up to float association).

It scans objects sequentially in scene order exactly like
hittable_list::hit (object.cuh:23-37), so it also pins the tie-break
semantics the vectorized path must reproduce.

Slow (Python loops over pixels/samples/bounces); use tiny images in tests.
"""

from __future__ import annotations

import numpy as np

from rt_tpu.config import RenderConfig
from rt_tpu.ops import geometry as geom
from rt_tpu.ops import rng
from rt_tpu.scene.types import SceneDef, _cylinder_o2w


def _unit(v):
    return v / np.linalg.norm(v)


def _hit_sphere(obj, ro, rd, t_min, t_max):
    center = np.asarray(obj["center"], np.float32)
    radius = np.float32(obj["radius"])
    oc = ro - center
    a = float(rd @ rd)
    hb = float(oc @ rd)
    c = float(oc @ oc) - radius * radius
    disc = hb * hb - a * c
    if disc < 0:
        return None
    sq = np.sqrt(disc)
    root = (-hb - sq) / a
    if root < t_min or t_max < root:
        root = (-hb + sq) / a
        if root < t_min or t_max < root:
            return None
    p = ro + root * rd
    outward = (p - center) / radius
    theta = np.arccos(np.clip(-outward[1], -1.0, 1.0))
    phi = np.arctan2(-outward[2], outward[0]) + np.pi
    return dict(t=root, p=p, outward=outward, u=phi / (2 * np.pi),
                v=theta / np.pi, mat=obj["material"])


_RECT_AXES = {"xy_rect": (2, 0, 1, "x0", "x1", "y0", "y1"),
              "xz_rect": (1, 0, 2, "x0", "x1", "z0", "z1"),
              "yz_rect": (0, 1, 2, "y0", "y1", "z0", "z1")}


def _hit_rect(obj, ro, rd, t_min, t_max):
    ka, f1, f2, a0k, a1k, b0k, b1k = _RECT_AXES[obj["type"]]
    if rd[ka] == 0.0:
        return None
    t = (obj["k"] - ro[ka]) / rd[ka]
    if t < t_min or t > t_max:
        return None
    x = ro[f1] + t * rd[f1]
    y = ro[f2] + t * rd[f2]
    if x < obj[a0k] or x > obj[a1k] or y < obj[b0k] or y > obj[b1k]:
        return None
    outward = np.zeros(3, np.float32)
    outward[ka] = 1.0
    return dict(t=t, p=ro + t * rd, outward=outward,
                u=(x - obj[a0k]) / (obj[a1k] - obj[a0k]),
                v=(y - obj[b0k]) / (obj[b1k] - obj[b0k]),
                mat=obj["material"])


def _hit_cylinder(obj, ro, rd, t_min, t_max):
    o2w, w2o = _cylinder_o2w(obj)
    oo = geom.apply_point(np, w2o, ro)
    od = geom.apply_vec(np, w2o, rd)
    radius, zmin, zmax = obj["radius"], obj["zmin"], obj["zmax"]
    a = od[0] * od[0] + od[1] * od[1]
    b = 2 * (od[0] * oo[0] + od[1] * oo[1])
    c = oo[0] * oo[0] + oo[1] * oo[1] - radius * radius
    if a == 0.0:
        return None
    delta = b * b - 4 * a * c
    if delta < 0:
        return None
    sq = np.sqrt(delta)
    t0 = -0.5 * (b - sq) / a
    t1 = -0.5 * (b + sq) / a
    t0, t1 = min(t0, t1), max(t0, t1)
    if t0 > t_max or t1 < t_min:
        return None
    t = t0
    if t0 < t_min:
        t = t1
        if t > t_max:
            return None
    op = oo + t * od
    if op[2] < zmin or op[2] > zmax:
        if t == t1:
            return None
        t = t1
        if t > t_max or t < t_min:
            return None
        op = oo + t * od
        if op[2] < zmin or op[2] > zmax:
            return None
    on = _unit(np.array([op[0], op[1], 0.0], np.float32))
    p = geom.apply_point(np, o2w, op)
    outward = geom.apply_normal(np, w2o, on)
    phi = np.arctan2(op[1], op[0]) + 2 * np.pi
    return dict(t=t, p=p, outward=outward, u=phi / (4 * np.pi),
                v=(op[2] - zmin) / (zmax - zmin), mat=obj["material"])


def _hit_triangle(obj, ro, rd, t_min, t_max):
    v1 = np.asarray(obj["v1"], np.float32)
    v2 = np.asarray(obj["v2"], np.float32)
    v3 = np.asarray(obj["v3"], np.float32)
    n = _unit(np.cross(v2 - v1, v3 - v1)).astype(np.float32)
    stored_n = n.copy()
    oc = ro - v1
    if oc @ n < 0:
        n = -n
    a = np.linalg.norm(rd)
    theta = (rd @ n) / a
    if theta >= 0:
        return None
    root = -(oc @ n) / theta / a
    if root < t_min or root > t_max:
        return None
    r = ro + root * rd
    s1 = np.cross(v2 - v1, r - v1) @ n
    s2 = np.cross(v3 - v2, r - v2) @ n
    s3 = np.cross(v1 - v3, r - v3) @ n
    if not ((s1 > 0 and s2 > 0 and s3 > 0) or (s1 < 0 and s2 < 0 and s3 < 0)):
        return None
    area2 = np.linalg.norm(np.cross(v2 - v1, v3 - v1))
    l1 = np.linalg.norm(np.cross(v2 - r, v3 - r)) / area2
    l2 = np.linalg.norm(np.cross(v3 - r, v1 - r)) / area2
    l3 = max(0.0, 1.0 - l1 - l2)
    uv1 = np.asarray(obj.get("uv1", (0, 0)), np.float32)
    uv2 = np.asarray(obj.get("uv2", (0, 0)), np.float32)
    uv3 = np.asarray(obj.get("uv3", (0, 0)), np.float32)
    uv = uv1 * l1 + uv2 * l2 + uv3 * l3
    return dict(t=root, p=r, outward=stored_n, u=uv[0], v=uv[1],
                mat=obj["material"])


_HITTERS = {"sphere": _hit_sphere, "xy_rect": _hit_rect, "xz_rect": _hit_rect,
            "yz_rect": _hit_rect, "cylinder": _hit_cylinder,
            "triangle": _hit_triangle}


def _scene_hit(sdef: SceneDef, ro, rd, t_min=1e-3):
    """Sequential closest-hit scan in object order (object.cuh:23-37):
    acceptance uses t <= closest, so a later object wins exact ties."""
    closest = np.inf
    best = None
    for obj in sdef.objects:
        rec = _HITTERS[obj["type"]](obj, ro, rd, t_min, closest)
        if rec is not None:
            closest = rec["t"]
            best = rec
    if best is not None:
        front = (rd @ best["outward"]) < 0
        best["front_face"] = front
        best["normal"] = best["outward"] if front else -best["outward"]
    return best


def _texture_value(sdef: SceneDef, tex_id, u, v, p):
    t = sdef.textures[tex_id]
    if t["type"] == "solid_color":
        return np.asarray(t["color"], np.float32)
    if t["type"] == "checker":
        sines = np.sin(10 * p[0]) * np.sin(10 * p[1]) * np.sin(10 * p[2])
        return np.asarray(t["odd"] if sines < 0 else t["even"], np.float32)
    if t["type"] == "image":
        img = sdef.images[t["image"]]
        th, tw = img.shape[:2]
        xi = min(int((u - np.floor(u)) * th), th - 1)
        yi = min(int((v - np.floor(v)) * tw), tw - 1)
        return img[xi, yi].astype(np.float32)
    raise ValueError(t["type"])


def _background(sdef: SceneDef, cfg: RenderConfig, d):
    if cfg.background_mode == "gradient":
        unit = _unit(d)
        t = 0.5 * (unit[1] + 1.0)
        return ((1 - t) * np.ones(3) + t * np.array([0.5, 0.7, 1.0])
                ).astype(np.float32)
    return np.asarray(sdef.background, np.float32)


def _oracle_nee(sdef: SceneDef, tables, cfg: RenderConfig, rec, atten,
                pixel, sample, bounce, seed):
    """Scalar twin of integrator._nee_direct: area-sample one light
    (same RNG coordinates, same (2/pi)cos^3 weighting), occlusion via
    the oracle's OWN sequential hit scan."""
    smp = rng.resolve(cfg.sampler)
    L = tables.n_lights
    u_pick = float(smp.uniform(np, seed, pixel, sample, bounce,
                               rng.NEE_PICK))
    li = min(int(u_pick * L), L - 1)
    fam = int(tables.light_fam[li])
    pid = int(tables.light_pid[li])
    u1 = float(smp.uniform(np, seed, pixel, sample, bounce, rng.NEE_U1))
    u2 = float(smp.uniform(np, seed, pixel, sample, bounce, rng.NEE_U2))
    phi = 2.0 * np.pi * u2
    # UV of the sampled point, per family's hit-UV convention (so
    # image/checker emission evaluates where the shadow ray lands)
    uv = (0.0, 0.0)
    if fam == 0:
        c = np.asarray(tables.sph_center[pid], np.float32)
        r = abs(float(tables.sph_radius[pid]))
        z = 1.0 - 2.0 * u1
        st = np.sqrt(max(0.0, 1.0 - z * z))
        n_l = np.array([st * np.cos(phi), st * np.sin(phi), z],
                       np.float32)
        point = c + np.float32(r) * n_l
        area = 4.0 * np.pi * r * r
        mat_id = int(tables.sph_mat[pid])
        s_phi = (np.arctan2(-n_l[2], n_l[0] if (n_l[0] or n_l[2]) else 1.0)
                 + np.pi)
        uv = (s_phi / (2 * np.pi),
              np.arccos(np.clip(-n_l[1], -1.0, 1.0)) / np.pi)
    elif fam == 1:
        ax = int(tables.rect_axis[pid])
        lo = np.asarray(tables.rect_lo[pid])
        hi = np.asarray(tables.rect_hi[pid])
        k = float(tables.rect_k[pid])
        f1 = 1 if ax == 0 else 0
        f2 = 1 if ax == 2 else 2
        point = np.zeros(3, np.float32)
        point[ax] = k
        point[f1] = lo[0] + u1 * (hi[0] - lo[0])
        point[f2] = lo[1] + u2 * (hi[1] - lo[1])
        n_l = np.zeros(3, np.float32)
        n_l[ax] = 1.0
        area = float((hi[0] - lo[0]) * (hi[1] - lo[1]))
        mat_id = int(tables.rect_mat[pid])
        uv = (u1, u2)
    elif fam == 2:
        r = abs(float(tables.cyl_radius[pid]))
        zmin = float(tables.cyl_zmin[pid])
        zmax = float(tables.cyl_zmax[pid])
        o2w = np.asarray(tables.cyl_o2w[pid], np.float32)
        zc = zmin + u1 * (zmax - zmin)
        po = np.array([r * np.cos(phi), r * np.sin(phi), zc], np.float32)
        point = (o2w[:3, :3] @ po + o2w[:3, 3]).astype(np.float32)
        n_l = (o2w[:3, :3]
               @ np.array([np.cos(phi), np.sin(phi), 0], np.float32))
        area = 2.0 * np.pi * r * (zmax - zmin)
        mat_id = int(tables.cyl_mat[pid])
        uv = ((np.arctan2(np.sin(phi), np.cos(phi)) + 2 * np.pi)
              / (4 * np.pi), u1)
    else:
        # triangle: uniform barycentric via the sqrt warp (the
        # integrator._nee_direct twin — same b2/b3 convention)
        v1 = np.asarray(tables.tri_v1[pid], np.float32)
        e1 = np.asarray(tables.tri_v2[pid], np.float32) - v1
        e2 = np.asarray(tables.tri_v3[pid], np.float32) - v1
        sq = np.sqrt(np.float32(u1))
        b2 = sq * (1.0 - np.float32(u2))
        b3 = sq * np.float32(u2)
        point = (v1 + b2 * e1 + b3 * e2).astype(np.float32)
        n_l = np.asarray(tables.tri_n[pid], np.float32)
        cr_ = np.cross(e1, e2)
        area = 0.5 * float(np.sqrt(cr_ @ cr_))
        mat_id = int(tables.tri_mat[pid])
        b1 = 1.0 - sq
        uvt = (b1 * np.asarray(tables.tri_uv1[pid])
               + b2 * np.asarray(tables.tri_uv2[pid])
               + b3 * np.asarray(tables.tri_uv3[pid]))
        uv = (float(uvt[0]), float(uvt[1]))

    wi = point - rec["p"]
    d2 = max(float(wi @ wi), 1e-8)
    dist = np.sqrt(d2)
    cos_s = float(rec["normal"] @ wi) / dist
    if cos_s <= 0.0:
        return np.zeros(3, np.float32)
    cos_l = abs(float(n_l @ wi)) / dist
    srec = _scene_hit(sdef, rec["p"], wi)
    if srec is not None and srec["t"] < 1.0 - 1e-3:
        return np.zeros(3, np.float32)
    lmat = sdef.materials[mat_id]
    le = _texture_value(sdef, lmat["texture"], uv[0], uv[1], point)
    w = (cos_s ** 3 * cos_l / d2) * area * (2.0 * L / np.pi)
    return (atten * le * np.float32(w)).astype(np.float32)


def _ray_color(sdef: SceneDef, cfg: RenderConfig, ro, rd, pixel, sample,
               seed, nee_tables=None):
    smp = rng.resolve(cfg.sampler)
    tp = np.ones(3, np.float32)
    rgb = np.zeros(3, np.float32)
    prev_diff = False
    for bounce in range(cfg.max_depth):
        if cfg.p_rr > 0.0:
            u_rr = float(smp.uniform(np, seed, pixel, sample, bounce, rng.RR))
            if u_rr > cfg.p_rr:
                return rgb
        rec = _scene_hit(sdef, ro, rd)
        if rec is None:
            return rgb + tp * _background(sdef, cfg, rd)
        mat = sdef.materials[rec["mat"]]
        em = np.zeros(3, np.float32)
        if mat["type"] == "diffuse_light":
            if nee_tables is not None and prev_diff:
                return rgb  # already counted by that bounce's light sample
            em = _texture_value(sdef, mat["texture"], rec["u"], rec["v"],
                                rec["p"])
            return rgb + tp * em

        ball = np.asarray(
            smp.in_unit_ball(np, seed, np.uint32(pixel), np.uint32(sample),
                             np.uint32(bounce)))
        n = rec["normal"]
        if mat["type"] == "lambertian":
            d = n + ball
            if np.all(np.abs(d) < 1e-8):
                d = n
            atten = _texture_value(sdef, mat["texture"], rec["u"], rec["v"],
                                   rec["p"])
        elif mat["type"] == "metal":
            d = geom.reflect(np, _unit(rd), n) + min(mat["fuzz"], 1.0) * ball
            if d @ n <= 0:
                return rgb  # absorbed (scatter false, emitted zero)
            atten = np.asarray(mat["albedo"], np.float32)
        elif mat["type"] == "dielectric":
            ir = mat["index_of_refraction"]
            ratio = (1.0 / ir) if rec["front_face"] else ir
            ud = _unit(rd)
            cos_t = min(-(ud @ n), 1.0)
            sin_t = np.sqrt(max(0.0, 1 - cos_t * cos_t))
            refl_u = float(smp.uniform(np, seed, pixel, sample, bounce,
                                       rng.DIEL_REFL))
            r0 = ((1 - ratio) / (1 + ratio)) ** 2
            schlick = r0 + (1 - r0) * (1 - cos_t) ** 5
            if ratio * sin_t > 1.0 or schlick > refl_u:
                d = geom.reflect(np, ud, n)
            else:
                d = geom.refract(np, ud[None], n[None],
                                 np.asarray([ratio], np.float32))[0]
            atten = np.ones(3, np.float32)
        else:
            raise ValueError(mat["type"])

        rgb = rgb + tp * em
        if nee_tables is not None and mat["type"] == "lambertian":
            rgb = rgb + tp * _oracle_nee(sdef, nee_tables, cfg, rec,
                                         atten, pixel, sample, bounce,
                                         seed)
            prev_diff = True
        else:
            prev_diff = False
        tp = tp * atten
        if cfg.p_rr > 0.0:
            tp = tp / cfg.p_rr
        ro, rd = rec["p"], d
    if cfg.exhaust_mode == "background":
        rgb = rgb + tp * _background(sdef, cfg, rd)
    return rgb


def render_oracle(sdef: SceneDef, cfg: RenderConfig) -> np.ndarray:
    """Full-frame scalar render. Returns raw radiance sums [H,W,3], row 0 =
    bottom scanline (same layout as render.renderer.render). cfg.nee
    runs the scalar NEE twin (light index from build_tables; occlusion
    via the oracle's own hit scan)."""
    nee_tables = None
    if bool(getattr(cfg, "nee", False)):
        from rt_tpu.scene.types import build_tables

        t = build_tables(sdef)
        if t.n_lights > 0:
            nee_tables = t
    smp = rng.resolve(cfg.sampler)
    cam = sdef.camera
    out = np.zeros((cfg.height, cfg.width, 3), np.float32)
    for y in range(cfg.height):
        for x in range(cfg.width):
            pixel = np.uint32(y * cfg.width + x)
            acc = np.zeros(3, np.float32)
            for s in range(cfg.samples_per_pixel):
                s32 = np.uint32(s)
                ru = float(smp.uniform(np, cfg.seed, pixel, s32, 0,
                                       rng.PIXEL_U))
                rv = float(smp.uniform(np, cfg.seed, pixel, s32, 0,
                                       rng.PIXEL_V))
                u = (x + ru) / (cfg.width - 1)
                v = (y + rv) / (cfg.height - 1)
                if cfg.enable_defocus:
                    disk = np.asarray(
                        smp.in_unit_disk(np, cfg.seed, pixel, s32, 0))
                    rd_lens = float(cam.lens_radius) * disk
                    offset = (np.asarray(cam.u) * rd_lens[0]
                              + np.asarray(cam.v) * rd_lens[1])
                else:
                    offset = np.zeros(3, np.float32)
                ro = np.asarray(cam.origin) + offset
                rd = (np.asarray(cam.lower_left) + u * np.asarray(cam.horizontal)
                      + v * np.asarray(cam.vertical) - np.asarray(cam.origin)
                      - offset).astype(np.float32)
                acc += _ray_color(sdef, cfg, ro.astype(np.float32), rd,
                                  pixel, s32, np.uint32(cfg.seed),
                                  nee_tables=nee_tables)
            out[y, x] = acc
    return out
