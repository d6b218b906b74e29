"""Vectorized closest-hit over the flat SoA scene tables.

TPU-native replacement for the reference's virtual-dispatch linear scan
(hittable_list::hit, gpu-version/object.cuh:23-37 + per-type `hit`
methods): instead of one ray walking an object list, a whole ray batch
intersects every primitive of each type at once. The ray x primitive
bilinear terms are deliberately phrased as matmuls ([B,3] @ [3,N]) so XLA
places them on the MXU; everything else is fused VPU elementwise work.

Closest-hit semantics exactly reproduce the reference scan, including the
tie-break: the scan accepts a new hit when `t <= closest_so_far` (the
range check `t_max < root` rejects only strictly-greater roots), so on an
exact t tie the LATER object wins. We therefore reduce with
"min t, ties -> larger original object index".

The hit *attributes* (p, normal, uv, material) are recomputed only for
the winning primitive per ray — a gather of O(1) params per ray — never
materialized per (ray, primitive).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from rt_tpu.ops import geometry as geom
from rt_tpu.scene.types import SceneTables

INF = np.float32(np.inf)

PTYPE_SPHERE = 0
PTYPE_RECT = 1
PTYPE_CYLINDER = 2
PTYPE_TRIANGLE = 3


class Hit(NamedTuple):
    hit: jnp.ndarray         # [B] bool
    t: jnp.ndarray           # [B] f32 (inf on miss)
    ptype: jnp.ndarray       # [B] i32
    pid: jnp.ndarray         # [B] i32 index within the type table
    obj: jnp.ndarray         # [B] i32 original scene object index
    p: jnp.ndarray           # [B,3] hit point
    normal: jnp.ndarray      # [B,3] face normal (flipped toward the ray)
    front_face: jnp.ndarray  # [B] bool
    u: jnp.ndarray           # [B]
    v: jnp.ndarray           # [B]
    mat: jnp.ndarray         # [B] i32 material id


def _last_argmin(t):
    """argmin along axis -1, ties -> LARGEST index (see module docstring)."""
    n = t.shape[-1]
    idx_rev = jnp.argmin(t[..., ::-1], axis=-1)
    return (n - 1) - idx_rev


def _sphere_t(tables: SceneTables, ro, rd, t_min):
    """Candidate t per (ray, sphere): half-b quadratic, nearer root first
    (object.cuh:47-75). Returns ([B,N] t, valid via t<inf)."""
    c = tables.sph_center                      # [N,3]
    r = tables.sph_radius                      # [N]
    a = geom.length_squared(jnp, rd)[:, None]  # [B,1]
    # hb[b,n] = rd.(ro - c) ; c_term[b,n] = |ro - c|^2 - r^2, expanded so the
    # cross terms are [B,3]@[3,N] matmuls (MXU) instead of a [B,N,3] blowup.
    rd_dot_ro = geom.dot(jnp, rd, ro)[:, None]
    hb = rd_dot_ro - geom.einsum(jnp, "bi,ni->bn", rd, c)
    ro_sq = geom.length_squared(jnp, ro)[:, None]
    c_term = (ro_sq - 2.0 * geom.einsum(jnp, "bi,ni->bn", ro, c)
              + (geom.length_squared(jnp, c) - r * r)[None, :])

    disc = hb * hb - a * c_term
    # safe_sqrt: sqrt(max(disc,0)) with grad 0 (not NaN) at disc<=0 —
    # every missed lane otherwise poisons upstream gradients (0 x inf).
    sqrtd = geom.safe_sqrt(jnp, disc)
    root1 = (-hb - sqrtd) / a
    root2 = (-hb + sqrtd) / a
    t = jnp.where(root1 >= t_min, root1, jnp.where(root2 >= t_min, root2, INF))
    t = jnp.where(disc >= 0.0, t, INF)
    t = jnp.where((tables.sph_obj >= 0)[None, :], t, INF)
    return t


def _rect_t(tables: SceneTables, ro, rd, t_min):
    """Candidate t per (ray, rect) for all three orientations at once
    (object.cuh:96-197). Axis selection via one-hot matmuls."""
    axis = tables.rect_axis                    # [N]
    n_r = axis.shape[0]
    onehot_k = jnp.zeros((n_r, 3), jnp.float32).at[jnp.arange(n_r), axis].set(1.0)
    # free axes in stored (lo,hi) order: for const-axis a the free axes are
    # the other two in ascending order (matches types.py packing).
    free = _rect_free_axes(axis)               # [N,2]
    oh_f1 = jnp.zeros((n_r, 3), jnp.float32).at[jnp.arange(n_r), free[:, 0]].set(1.0)
    oh_f2 = jnp.zeros((n_r, 3), jnp.float32).at[jnp.arange(n_r), free[:, 1]].set(1.0)

    ro_k = geom.einsum(jnp, "bi,ni->bn", ro, onehot_k)
    rd_k = geom.einsum(jnp, "bi,ni->bn", rd, onehot_k)
    t = geom.safe_div(jnp, tables.rect_k[None, :] - ro_k, rd_k)
    x = (geom.einsum(jnp, "bi,ni->bn", ro, oh_f1)
         + t * geom.einsum(jnp, "bi,ni->bn", rd, oh_f1))
    y = (geom.einsum(jnp, "bi,ni->bn", ro, oh_f2)
         + t * geom.einsum(jnp, "bi,ni->bn", rd, oh_f2))
    valid = (
        (t >= t_min)
        & (x >= tables.rect_lo[None, :, 0]) & (x <= tables.rect_hi[None, :, 0])
        & (y >= tables.rect_lo[None, :, 1]) & (y <= tables.rect_hi[None, :, 1])
        & (tables.rect_obj >= 0)[None, :]
        & (rd_k != 0.0)
    )
    return jnp.where(valid, t, INF)


def _rect_free_axes(axis):
    """Const axis -> (free1, free2) ascending: 0->(1,2), 1->(0,2), 2->(0,1)."""
    f1 = jnp.where(axis == 0, 1, 0)
    f2 = jnp.where(axis == 2, 1, 2)
    return jnp.stack([f1, f2], axis=-1)


def _cylinder_t(tables: SceneTables, ro, rd, t_min):
    """Candidate t per (ray, cylinder): transform to object space, radial
    quadratic on (x,y), z-slab clip with root promotion
    (object.cuh:233-290). Root selection is the branchless equivalent of
    the reference's t0-then-t1 fallback chain."""
    w2o = tables.cyl_w2o                       # [N,4,4]
    oo = geom.einsum(jnp, "nij,bj->bni", w2o[:, :3, :3], ro) + w2o[None, :, :3, 3]
    od = geom.einsum(jnp, "nij,bj->bni", w2o[:, :3, :3], rd)   # [B,N,3]

    a = od[..., 0] ** 2 + od[..., 1] ** 2
    b = 2.0 * (od[..., 0] * oo[..., 0] + od[..., 1] * oo[..., 1])
    c = oo[..., 0] ** 2 + oo[..., 1] ** 2 - tables.cyl_radius[None, :] ** 2
    delta = b * b - 4.0 * a * c
    sq = geom.safe_sqrt(jnp, delta)
    t0 = geom.safe_div(jnp, -0.5 * (b - sq), a)
    t1 = geom.safe_div(jnp, -0.5 * (b + sq), a)
    t0, t1 = jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    def zok(t):
        pz = oo[..., 2] + t * od[..., 2]
        return (pz >= tables.cyl_zmin[None, :]) & (pz <= tables.cyl_zmax[None, :])

    ok0 = (t0 >= t_min) & zok(t0) & (a != 0.0)
    ok1 = (t1 >= t_min) & zok(t1) & (a != 0.0)
    t = jnp.where(ok0, t0, jnp.where(ok1, t1, INF))
    t = jnp.where((delta >= 0.0) & (tables.cyl_obj >= 0)[None, :], t, INF)
    return t


def _triangle_t(tables: SceneTables, ro, rd, t_min):
    """Candidate t per (ray, triangle): double-sided plane hit + inside
    test (taichi-version/hittable.py:38-71). The geometric normal is
    flipped toward the ray origin's side; a hit requires the ray to head
    toward the plane."""
    v1, v2, v3 = tables.tri_v1, tables.tri_v2, tables.tri_v3   # [N,3]
    n0 = tables.tri_n                                          # [N,3] unit

    oc_n = (geom.einsum(jnp, "bi,ni->bn", ro, n0)
            - geom.dot(jnp, v1, n0)[None, :])
    sign = jnp.where(oc_n < 0.0, -1.0, 1.0)                    # flip n toward ro
    d_n = geom.einsum(jnp, "bi,ni->bn", rd, n0) * sign         # [B,N]
    oc_n = oc_n * sign
    a = geom.length(jnp, rd)[:, None]
    theta = d_n / a
    root = geom.safe_div(jnp, -oc_n, theta * a)
    # inside test at r = ro + root*rd, via edge cross-products against the
    # plane normal (sign-consistent with the reference's 4 cross-dot tests)
    r_pt = ro[:, None, :] + root[..., None] * rd[:, None, :]   # [B,N,3]
    e = _edge_inside(r_pt, v1, v2, v3, n0)
    valid = (theta < 0.0) & e & (root >= t_min)
    valid &= (tables.tri_obj >= 0)[None, :]
    return jnp.where(valid, root, INF)


def _edge_inside(r_pt, v1, v2, v3, n):
    """Point-in-triangle: cross(edge, r-vi) . n same sign for all edges.
    Strict interior (edges excluded), matching the reference's `> 0`."""
    def side(va, vb):
        e = (vb - va)[None, :, :]
        w = r_pt - va[None, :, :]
        return geom.dot(jnp, geom.cross(jnp, e, w), n[None, :, :])

    s1 = side(v1, v2)
    s2 = side(v2, v3)
    s3 = side(v3, v1)
    return ((s1 > 0) & (s2 > 0) & (s3 > 0)) | ((s1 < 0) & (s2 < 0) & (s3 < 0))


def _best_of(t, obj_table):
    """Per-ray (t, pid, obj) of the best candidate in one type table."""
    pid = _last_argmin(t)
    tb = jnp.take_along_axis(t, pid[:, None], axis=1)[:, 0]
    return tb, pid.astype(jnp.int32), obj_table[pid]


def _sphere_best_pallas(tables: SceneTables, ro, rd, t_min):
    """Sphere candidates via the VMEM-tiled Pallas kernel
    (ops/pallas_intersect.py) — same (t, pid, obj) as
    _best_of(_sphere_t(...)), O(B+N) HBM traffic instead of O(B*N)."""
    import jax

    from rt_tpu.ops.pallas_intersect import RAY_TILE, sphere_closest_hit

    b = ro.shape[0]
    pad = (-b) % RAY_TILE
    if pad:
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)])
        rd = jnp.concatenate(
            [rd, jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], rd.dtype),
                                  (pad, 3))])
    t, pid = sphere_closest_hit(
        tables.sph_center, tables.sph_radius, tables.sph_obj >= 0, ro, rd,
        t_min=float(t_min), interpret=jax.default_backend() != "tpu")
    t, pid = t[:b], pid[:b]
    return t, pid, tables.sph_obj[pid]


def occluded(tables: SceneTables, ro, rd, t_max, t_min=1e-3,
             engine: str = "xla"):
    """Any-hit query: is there ANY hit with t in (t_min, t_max)?

    The shadow-ray classifier of the naive tracer (hit_shadow,
    朴素光线追踪/ray_tracing_models.py:118-143 — it scans all objects for
    an occluder closer than the light). Returns [B] bool. rd need not be
    normalized; t_max is in units of |rd| like every other t here."""
    h = intersect(tables, ro, rd, t_min=t_min, engine=engine)
    return h.hit & (h.t < t_max)


def _sphere_leaf_test(tables: SceneTables):
    """Single-primitive sphere test for BVH leaves (object.cuh:47-75)."""
    def leaf(pid, ro, rd, t_min):
        c = jnp.asarray(tables.sph_center)[pid]
        r = jnp.asarray(tables.sph_radius)[pid]
        oc = ro - c
        a = geom.length_squared(jnp, rd)
        hb = geom.dot(jnp, oc, rd)
        ct = geom.length_squared(jnp, oc) - r * r
        disc = hb * hb - a * ct
        sqrtd = geom.safe_sqrt(jnp, disc)
        root1 = (-hb - sqrtd) / a
        root2 = (-hb + sqrtd) / a
        t = jnp.where(root1 >= t_min, root1,
                      jnp.where(root2 >= t_min, root2, INF))
        return jnp.where(disc >= 0.0, t, INF)

    return leaf


def _triangle_leaf_test(tables: SceneTables):
    """Single-triangle test for BVH leaves (hittable.py:38-71)."""
    def leaf(pid, ro, rd, t_min):
        v1 = jnp.asarray(tables.tri_v1)[pid]
        v2 = jnp.asarray(tables.tri_v2)[pid]
        v3 = jnp.asarray(tables.tri_v3)[pid]
        n0 = jnp.asarray(tables.tri_n)[pid]
        oc_n = geom.dot(jnp, ro - v1, n0)
        sign = jnp.where(oc_n < 0.0, -1.0, 1.0)
        d_n = geom.dot(jnp, rd, n0) * sign
        oc_n = oc_n * sign
        a = geom.length(jnp, rd)
        theta = d_n / a
        root = geom.safe_div(jnp, -oc_n, theta * a)
        r_pt = ro + root[:, None] * rd

        def side(va, vb):
            return geom.dot(jnp, geom.cross(jnp, vb - va, r_pt - va), n0)

        s1, s2, s3 = side(v1, v2), side(v2, v3), side(v3, v1)
        inside = (((s1 > 0) & (s2 > 0) & (s3 > 0))
                  | ((s1 < 0) & (s2 < 0) & (s3 < 0)))
        valid = (theta < 0.0) & inside & (root >= t_min)
        return jnp.where(valid, root, INF)

    return leaf


def _rect_leaf_test(tables: SceneTables):
    """Single-rect test for BVH leaves (object.cuh:105-197), with the
    constant/free axes selected per lane by index."""
    axis = jnp.asarray(tables.rect_axis)

    def take(v, idx):
        return jnp.take_along_axis(v, idx[:, None], axis=1)[:, 0]

    def leaf(pid, ro, rd, t_min):
        a = axis[pid]
        k = jnp.asarray(tables.rect_k)[pid]
        lo = jnp.asarray(tables.rect_lo)[pid]
        hi = jnp.asarray(tables.rect_hi)[pid]
        f1 = jnp.where(a == 0, 1, 0)
        f2 = jnp.where(a == 2, 1, 2)
        ro_k = take(ro, a)
        rd_k = take(rd, a)
        t = geom.safe_div(jnp, k - ro_k, rd_k)
        x = take(ro, f1) + t * take(rd, f1)
        y = take(ro, f2) + t * take(rd, f2)
        valid = ((t >= t_min) & (rd_k != 0.0)
                 & (x >= lo[:, 0]) & (x <= hi[:, 0])
                 & (y >= lo[:, 1]) & (y <= hi[:, 1]))
        return jnp.where(valid, t, INF)

    return leaf


def _cylinder_leaf_test(tables: SceneTables):
    """Single-cylinder test for BVH leaves (object.cuh:233-290)."""
    def leaf(pid, ro, rd, t_min):
        w2o = jnp.asarray(tables.cyl_w2o)[pid]
        rot = w2o[:, :3, :3]
        oo = jnp.einsum("bij,bj->bi", rot, ro) + w2o[:, :3, 3]
        od = jnp.einsum("bij,bj->bi", rot, rd)
        r = jnp.asarray(tables.cyl_radius)[pid]
        zmin = jnp.asarray(tables.cyl_zmin)[pid]
        zmax = jnp.asarray(tables.cyl_zmax)[pid]
        a = od[:, 0] ** 2 + od[:, 1] ** 2
        b = 2.0 * (od[:, 0] * oo[:, 0] + od[:, 1] * oo[:, 1])
        c = oo[:, 0] ** 2 + oo[:, 1] ** 2 - r * r
        delta = b * b - 4.0 * a * c
        sq = geom.safe_sqrt(jnp, delta)
        t0 = geom.safe_div(jnp, -0.5 * (b - sq), a)
        t1 = geom.safe_div(jnp, -0.5 * (b + sq), a)
        t0, t1 = jnp.minimum(t0, t1), jnp.maximum(t0, t1)

        def zok(t):
            pz = oo[:, 2] + t * od[:, 2]
            return (pz >= zmin) & (pz <= zmax)

        ok0 = (t0 >= t_min) & zok(t0) & (a != 0.0)
        ok1 = (t1 >= t_min) & zok(t1) & (a != 0.0)
        t = jnp.where(ok0, t0, jnp.where(ok1, t1, INF))
        return jnp.where(delta >= 0.0, t, INF)

    return leaf


def _best_bvh(tables: SceneTables, prefix: str, leaf_test, ro, rd, t_min,
              obj_table):
    from rt_tpu.accel.bvh import traverse

    arrays = {
        "obj_id": jnp.asarray(getattr(tables, f"{prefix}_bvh_obj")),
        "left_id": jnp.asarray(getattr(tables, f"{prefix}_bvh_left")),
        "next_id": jnp.asarray(getattr(tables, f"{prefix}_bvh_next")),
        "bmin": jnp.asarray(getattr(tables, f"{prefix}_bvh_min")),
        "bmax": jnp.asarray(getattr(tables, f"{prefix}_bvh_max")),
    }
    t, pid = traverse(arrays, ro, rd, t_min, leaf_test)
    return t, pid, jnp.asarray(obj_table)[pid]


def intersect(tables: SceneTables, ro, rd, t_min=1e-3,
              engine: str = "xla", traversal: str = "linear") -> Hit:
    """Closest hit of rays (ro, rd) [B,3] against the whole scene.

    t_min defaults to the reference's shadow-acne epsilon 0.001
    (gpu-version/main.cu:45).

    engine="pallas" routes the sphere pass through the VMEM-tiled Pallas
    kernel (forward-only); "xla" is the differentiable default.
    traversal="bvh" walks the threaded BVH for families that carry one
    (tables.bvh_for) instead of testing every primitive.

    Primitive families the scene doesn't use (static tables.counts) are
    skipped at trace time — a sphere-only scene compiles only the sphere
    candidate pass."""
    n_sph, n_rect, n_cyl, n_tri = tables.counts
    cands = []
    if n_sph:
        if traversal == "bvh" and "sphere" in tables.bvh_for:
            cands.append((PTYPE_SPHERE,) + _best_bvh(
                tables, "sph", _sphere_leaf_test(tables), ro, rd, t_min,
                tables.sph_obj))
        elif engine == "pallas":
            cands.append((PTYPE_SPHERE,)
                         + _sphere_best_pallas(tables, ro, rd, t_min))
        else:
            t_s = _sphere_t(tables, ro, rd, t_min)
            cands.append((PTYPE_SPHERE,) + _best_of(t_s, tables.sph_obj))
    if n_rect:
        if traversal == "bvh" and "rect" in tables.bvh_for:
            cands.append((PTYPE_RECT,) + _best_bvh(
                tables, "rect", _rect_leaf_test(tables), ro, rd, t_min,
                tables.rect_obj))
        else:
            t_r = _rect_t(tables, ro, rd, t_min)
            cands.append((PTYPE_RECT,) + _best_of(t_r, tables.rect_obj))
    if n_cyl:
        if traversal == "bvh" and "cylinder" in tables.bvh_for:
            cands.append((PTYPE_CYLINDER,) + _best_bvh(
                tables, "cyl", _cylinder_leaf_test(tables), ro, rd, t_min,
                tables.cyl_obj))
        else:
            t_c = _cylinder_t(tables, ro, rd, t_min)
            cands.append((PTYPE_CYLINDER,) + _best_of(t_c, tables.cyl_obj))
    if n_tri:
        if traversal == "bvh" and "triangle" in tables.bvh_for:
            cands.append((PTYPE_TRIANGLE,) + _best_bvh(
                tables, "tri", _triangle_leaf_test(tables), ro, rd, t_min,
                tables.tri_obj))
        else:
            t_t = _triangle_t(tables, ro, rd, t_min)
            cands.append((PTYPE_TRIANGLE,) + _best_of(t_t, tables.tri_obj))

    b = ro.shape[0]
    best_t = jnp.full((b,), INF)
    best_ptype = jnp.zeros((b,), jnp.int32)
    best_pid = jnp.zeros((b,), jnp.int32)
    best_obj = jnp.full((b,), -1, jnp.int32)
    for ptype, t, pid, obj in cands:
        take = (t < best_t) | ((t == best_t) & (obj > best_obj))
        best_t = jnp.where(take, t, best_t)
        best_ptype = jnp.where(take, ptype, best_ptype)
        best_pid = jnp.where(take, pid, best_pid)
        best_obj = jnp.where(take, obj, best_obj)

    hit = jnp.isfinite(best_t)
    return _attributes(tables, ro, rd, hit, best_t, best_ptype, best_pid,
                       best_obj)


def _attributes(tables: SceneTables, ro, rd, hit, t, ptype, pid, obj) -> Hit:
    """Recompute hit-record fields for each ray's winning primitive only.
    Families absent from the scene (static counts) are skipped."""
    n_sph, n_rect, n_cyl, n_tri = tables.counts
    t_safe = jnp.where(hit, t, 1.0)
    p_lin = ro + t_safe[:, None] * rd  # default hit point (ray.at)

    branches = []  # (ptype, outward, p, uv, mat)

    def packed(*cols):
        """Concat f32 column views [N,k_i] -> one one-hot gather [B,K]
        (geom.onehot_gather: MXU instead of slow vector gathers)."""
        tab = jnp.concatenate(
            [jnp.asarray(c, jnp.float32).reshape(c.shape[0], -1)
             for c in cols], axis=-1)
        return geom.onehot_gather(jnp, tab, pid)

    if n_sph:
        # sphere (object.cuh:67-73, UV at :87-93)
        sp = packed(tables.sph_center, tables.sph_radius, tables.sph_mat)
        sc = sp[:, 0:3]
        sr = sp[:, 3]
        s_out = (p_lin - sc) / jnp.where(sr == 0.0, 1.0, sr)[:, None]
        # pole/azimuth guards: arccos'(+-1) and arctan2 at (0,0) are
        # inf/NaN; forward values unchanged, masked-lane grads zeroed.
        cos_t = jnp.clip(-s_out[:, 1], -1.0, 1.0)
        interior = jnp.abs(cos_t) < 1.0
        s_theta = jnp.where(
            interior,
            jnp.arccos(jnp.where(interior, cos_t, 0.0)),
            jnp.where(cos_t > 0.0, 0.0, np.pi))
        az_deg = (s_out[:, 2] == 0.0) & (s_out[:, 0] == 0.0)
        s_phi = jnp.arctan2(-s_out[:, 2],
                            jnp.where(az_deg, 1.0, s_out[:, 0])) + np.pi
        s_uv = jnp.stack([s_phi / (2 * np.pi), s_theta / np.pi], axis=-1)
        branches.append((PTYPE_SPHERE, s_out, p_lin, s_uv,
                         sp[:, 4].astype(jnp.int32)))

    if n_rect:
        # rect (object.cuh:105-197) — axis selection via one-hot rows
        n_r = tables.rect_axis.shape[0]
        rows = np.arange(n_r)
        axis_np = tables.rect_axis
        oh_k = jnp.zeros((n_r, 3), jnp.float32).at[rows, axis_np].set(1.0)
        free = _rect_free_axes(jnp.asarray(axis_np))
        oh1 = jnp.zeros((n_r, 3), jnp.float32).at[rows, free[:, 0]].set(1.0)
        oh2 = jnp.zeros((n_r, 3), jnp.float32).at[rows, free[:, 1]].set(1.0)
        rp = packed(oh_k, oh1, oh2, tables.rect_lo, tables.rect_hi,
                    tables.rect_mat)
        r_out = rp[:, 0:3]
        x = (p_lin * rp[:, 3:6]).sum(-1)
        y = (p_lin * rp[:, 6:9]).sum(-1)
        lo = rp[:, 9:11]
        hi = rp[:, 11:13]
        r_uv = jnp.stack(
            [(x - lo[:, 0]) / (hi[:, 0] - lo[:, 0]),
             (y - lo[:, 1]) / (hi[:, 1] - lo[:, 1])], axis=-1)
        branches.append((PTYPE_RECT, r_out, p_lin, r_uv,
                         rp[:, 13].astype(jnp.int32)))

    if n_cyl:
        # cylinder (object.cuh:261-289) — packed [B,3,4] affine rows
        cp = packed(tables.cyl_w2o[:, :3, :].reshape(-1, 12),
                    tables.cyl_o2w[:, :3, :].reshape(-1, 12),
                    tables.cyl_zmin, tables.cyl_zmax, tables.cyl_mat)
        w2o = cp[:, 0:12].reshape(-1, 3, 4)
        o2w = cp[:, 12:24].reshape(-1, 3, 4)
        c_oo = geom.apply_point(jnp, w2o, ro)
        c_od = geom.apply_vec(jnp, w2o, rd)
        op = c_oo + t_safe[:, None] * c_od
        on = jnp.concatenate([op[:, :2], jnp.zeros_like(op[:, :1])], axis=-1)
        on_len = geom.safe_length(jnp, on)
        on = on / jnp.where(on_len == 0.0, 1.0, on_len)[:, None]
        c_p = geom.apply_point(jnp, o2w, op)
        # o2w.apply_normal uses o2w's inverse (= w2o) transposed
        # (vec3.cuh:376)
        c_out = geom.apply_normal(jnp, w2o, on)
        zmin = cp[:, 24]
        zmax = cp[:, 25]
        cyl_deg = (op[:, 1] == 0.0) & (op[:, 0] == 0.0)
        c_phi = jnp.arctan2(op[:, 1],
                            jnp.where(cyl_deg, 1.0, op[:, 0])) + 2 * np.pi
        c_uv = jnp.stack(
            [c_phi / (4 * np.pi),
             (op[:, 2] - zmin) / jnp.where(zmax == zmin, 1.0, zmax - zmin)],
            axis=-1)
        branches.append((PTYPE_CYLINDER, c_out, c_p, c_uv,
                         cp[:, 26].astype(jnp.int32)))

    if n_tri:
        # triangle (hittable.py:258-262 normal; uv via barycentric
        # interp; the reference's swapped-weight uv quirk at
        # hittable.py:57-60 is NOT replicated — we interpolate with the
        # standard barycentrics)
        tp2 = packed(tables.tri_v1, tables.tri_v2, tables.tri_v3,
                     tables.tri_n, tables.tri_uv1, tables.tri_uv2,
                     tables.tri_uv3, tables.tri_mat)
        tv1 = tp2[:, 0:3]
        tv2 = tp2[:, 3:6]
        tv3 = tp2[:, 6:9]
        t_out = tp2[:, 9:12]
        area2 = geom.safe_length(jnp, geom.cross(jnp, tv2 - tv1, tv3 - tv1))
        area2 = jnp.where(area2 == 0.0, 1.0, area2)
        l1 = geom.safe_length(
            jnp, geom.cross(jnp, tv2 - p_lin, tv3 - p_lin)) / area2
        l2 = geom.safe_length(
            jnp, geom.cross(jnp, tv3 - p_lin, tv1 - p_lin)) / area2
        l3 = jnp.maximum(0.0, 1.0 - l1 - l2)
        t_uv = (tp2[:, 12:14] * l1[:, None]
                + tp2[:, 14:16] * l2[:, None]
                + tp2[:, 16:18] * l3[:, None])
        branches.append((PTYPE_TRIANGLE, t_out, p_lin, t_uv,
                         tp2[:, 18].astype(jnp.int32)))

    if not branches:
        # empty scene: every ray misses
        zeros3 = jnp.zeros_like(p_lin)
        return Hit(hit=jnp.zeros_like(hit), t=t, ptype=ptype, pid=pid,
                   obj=obj, p=p_lin, normal=zeros3.at[:, 2].set(1.0),
                   front_face=jnp.ones_like(hit), u=jnp.zeros_like(t_safe),
                   v=jnp.zeros_like(t_safe),
                   mat=jnp.zeros_like(pid))

    # fold the present branches: last one is the default, earlier ones
    # selected by ptype match
    pt_last, outward, p, uv, mat = branches[-1]
    for pt, o_, p_, uv_, m_ in reversed(branches[:-1]):
        is_pt = ptype == pt
        outward = jnp.where(is_pt[:, None], o_, outward)
        p = jnp.where(is_pt[:, None], p_, p)
        uv = jnp.where(is_pt[:, None], uv_, uv)
        mat = jnp.where(is_pt, m_, mat)

    # set_face_normal (hittable.cuh:16-23): flip toward the incoming ray
    front = geom.dot(jnp, rd, outward) < 0.0
    normal = jnp.where(front[:, None], outward, -outward)

    return Hit(hit=hit, t=t, ptype=ptype, pid=pid, obj=obj, p=p,
               normal=normal, front_face=front, u=uv[:, 0], v=uv[:, 1],
               mat=jnp.where(hit, mat, 0).astype(jnp.int32))
