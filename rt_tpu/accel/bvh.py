"""BVH acceleration structure: host build, flat arrays, stackless walk.

Reimplements the Taichi version's acceleration layer (SURVEY.md L3):
median-split over the longest centroid axis, flattened pre-order with
threaded escape ("next") links so GPU/TPU traversal needs ONE integer of
state per ray (taichi-version/bvh.py:24-162; escape link at :93-105;
slab test at :170-193; stackless walk in hittable.py:212-250).

Build runs on the host — in C++ when the native library is available
(rt_tpu/native/rt_native.cpp, ~100x the Python builder; rebuilt per
frame for animated meshes exactly like world.update() re-commits in
taichi-version/hittable.py:176-193) with a NumPy fallback.

Traversal here is the vectorized XLA form: every ray carries its own
`cur` node pointer through a lax.while_loop; inner nodes descend on a
slab hit and take the escape link otherwise; leaves run the caller's
primitive test. Divergence note (SURVEY.md §7 hard parts): lanes visit
different node counts, so the loop runs until the LAST lane finishes —
profitable once the primitive count is well past the brute-force
crossover (hundreds for triangles).

Tie semantics: the BVH accepts strictly-closer hits only (t <
closest), matching the Taichi walk — on an exact t tie the FIRST hit in
traversal order wins, which can differ from the linear scan's
later-object-wins rule on measure-zero cases.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class BVH(NamedTuple):
    """Flat threaded BVH; all arrays have 2n-1 rows (pre-order)."""

    obj_id: np.ndarray   # [M] i32, primitive id at leaves, -1 inner
    left_id: np.ndarray  # [M] i32 (== i+1 for inner nodes)
    next_id: np.ndarray  # [M] i32 escape link, -1 = done
    bmin: np.ndarray     # [M,3] f32
    bmax: np.ndarray     # [M,3] f32


def build_bvh(bmin: np.ndarray, bmax: np.ndarray) -> BVH:
    """Build from primitive AABBs [n,3]; native C++ when available."""
    bmin = np.asarray(bmin, np.float32)
    bmax = np.asarray(bmax, np.float32)
    from rt_tpu.io.native import native_build_bvh

    res = native_build_bvh(bmin, bmax)
    if res is None:
        res = _python_build(bmin, bmax)
    return BVH(obj_id=res["obj_id"], left_id=res["left_id"],
               next_id=res["next_id"], bmin=res["bmin"], bmax=res["bmax"])


def _python_build(bmin: np.ndarray, bmax: np.ndarray) -> dict:
    """NumPy fallback, same layout/semantics as rt_native.cpp."""
    n = bmin.shape[0]
    m = 2 * n - 1
    centers = 0.5 * (bmin + bmax)
    obj_id = np.full(m, -1, np.int32)
    left_id = np.full(m, -1, np.int32)
    right_id = np.full(m, -1, np.int32)
    next_id = np.full(m, -1, np.int32)
    bmin_o = np.zeros((m, 3), np.float32)
    bmax_o = np.zeros((m, 3), np.float32)

    # (first, count, parent_next, slot) — iterative pre-order
    stack = [(np.arange(n), -1, 0)]
    while stack:
        idx, parent_next, s = stack.pop()
        bmin_o[s] = bmin[idx].min(0)
        bmax_o[s] = bmax[idx].max(0)
        next_id[s] = parent_next
        if idx.size == 1:
            obj_id[s] = idx[0]
            continue
        c = centers[idx]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        half = idx.size // 2
        part = idx[np.argpartition(c[:, axis], half)]
        left_slot = s + 1
        right_slot = s + 1 + (2 * half - 1)
        left_id[s] = left_slot
        right_id[s] = right_slot
        stack.append((part[half:], parent_next, right_slot))
        stack.append((part[:half], right_slot, left_slot))
    return dict(obj_id=obj_id, left_id=left_id, right_id=right_id,
                next_id=next_id, bmin=bmin_o, bmax=bmax_o)


def traverse(bvh_arrays, ro, rd, t_min, leaf_test):
    """Vectorized stackless walk, two-phase.

    bvh_arrays: dict/pytree of jnp arrays (obj_id, left_id, next_id,
    bmin [M,3], bmax [M,3]).
    leaf_test(prim_id [B] i32, ro, rd, t_min) -> t [B] (inf on miss):
    candidate t of primitive prim_id for each ray.

    Each outer iteration (a) ADVANCES every lane through inner nodes /
    box-missed leaves with pure slab tests until it stands on a box-hit
    leaf (or exhausts the tree), then (b) runs ONE batched leaf test.
    The single-phase walk ran the (much costlier: per-lane primitive
    gathers + quadratic) leaf test once per NODE visit for every lane;
    here it runs once per LEAF visit — the VERDICT r1 #8 fix.

    Returns (t_best [B] f32 inf-on-miss, pid_best [B] i32).
    """
    b = ro.shape[0]
    # +-inf where a direction component is 0. NaN hazard: when the origin
    # sits exactly ON a node's bounding plane for that axis,
    # 0 * inf = NaN would make the comparisons false and wrongly cull the
    # subtree (axis-aligned rays on axis-aligned scenes hit this). The
    # slab helper substitutes explicit +-BIG bounds for zero components.
    inv_d = 1.0 / rd
    zero_d = rd == 0.0
    _BIG = np.float32(3.0e38)
    obj_id = bvh_arrays["obj_id"]
    left_id = bvh_arrays["left_id"]
    next_id = bvh_arrays["next_id"]
    bmin = bvh_arrays["bmin"]
    bmax = bvh_arrays["bmax"]

    def box_hit(node, t_best):
        """Slab test vs current best (bvh.py:170-193 uses the running
        closest as t_max). Zero-direction axes constrain nothing when the
        origin is inside that slab and reject everything otherwise; the
        sentinel interval is applied AFTER the per-axis sort (an empty
        (+BIG,-BIG) interval fed through min/max would re-sort into an
        everything interval), which also discards any 0*inf NaNs."""
        nb_min = bmin[node]
        nb_max = bmax[node]
        t0 = (nb_min - ro) * inv_d
        t1 = (nb_max - ro) * inv_d
        near = jnp.minimum(t0, t1)
        far = jnp.maximum(t0, t1)
        inside = (ro >= nb_min) & (ro <= nb_max)
        near = jnp.where(zero_d, jnp.where(inside, -_BIG, _BIG), near)
        far = jnp.where(zero_d, jnp.where(inside, _BIG, -_BIG), far)
        tn = near.max(axis=-1)
        tf = far.min(axis=-1)
        return (tf >= jnp.maximum(tn, t_min)) & (tn <= t_best)

    def cond(state):
        cur, t_best, pid = state
        return jnp.any(cur >= 0)

    def body(state):
        cur, t_best, pid = state

        # phase A: pure-AABB advance until every live lane stands on a
        # box-hit leaf (settled=True also covers exhausted lanes)
        def adv_cond(c):
            cur2, settled = c
            return jnp.any(~settled)

        def adv_body(c):
            cur2, settled = c
            node = jnp.maximum(cur2, 0)
            live = cur2 >= 0
            is_leaf = obj_id[node] >= 0
            hit = box_hit(node, t_best)
            at_stop = is_leaf & hit
            nxt = jnp.where(hit & ~is_leaf, left_id[node], next_id[node])
            cur2 = jnp.where(live & ~at_stop, nxt, cur2)
            live2 = cur2 >= 0
            node2 = jnp.maximum(cur2, 0)
            settled2 = ~live2 | ((obj_id[node2] >= 0)
                                 & box_hit(node2, t_best))
            return cur2, settled2

        cur, _ = jax.lax.while_loop(adv_cond, adv_body,
                                    (cur, jnp.zeros((b,), bool)))

        # phase B: one batched leaf test for every settled lane
        node = jnp.maximum(cur, 0)
        live = cur >= 0
        prim = jnp.maximum(obj_id[node], 0)
        t_cand = leaf_test(prim, ro, rd, t_min)
        better = live & (t_cand < t_best)
        t_best = jnp.where(better, t_cand, t_best)
        pid = jnp.where(better, prim, pid)
        cur = jnp.where(live, next_id[node], cur)
        return cur, t_best, pid

    cur0 = jnp.zeros((b,), jnp.int32)
    t0 = jnp.full((b,), np.float32(np.inf))
    pid0 = jnp.zeros((b,), jnp.int32)
    _, t_best, pid = jax.lax.while_loop(cond, body, (cur0, t0, pid0))
    return t_best, pid


# ---------------------------------------------------------------------------
# per-primitive-type AABBs (for building scene BVHs)
# ---------------------------------------------------------------------------


def sphere_aabbs(centers: np.ndarray, radii: np.ndarray):
    r = np.abs(np.asarray(radii, np.float32))[:, None]
    c = np.asarray(centers, np.float32)
    return c - r, c + r


def triangle_aabbs(v1: np.ndarray, v2: np.ndarray, v3: np.ndarray):
    vs = np.stack([v1, v2, v3], axis=0).astype(np.float32)
    return vs.min(0), vs.max(0)


def rect_aabbs(axis: np.ndarray, lo: np.ndarray, hi: np.ndarray,
               k: np.ndarray, pad: float = 1e-4):
    """Axis-aligned rect boxes: the constant axis gets k +- pad (the
    reference pads flat aabbs the same way a bvh over rects would need;
    aabb.hpp's slab test degenerates on zero-thickness boxes)."""
    n = axis.shape[0]
    bmin = np.zeros((n, 3), np.float32)
    bmax = np.zeros((n, 3), np.float32)
    # free-axis mapping mirrors ops/intersect._rect_free_axes:
    # axis 0 (yz_rect) -> free (1,2); 1 (xz) -> (0,2); 2 (xy) -> (0,1)
    f1 = np.where(axis == 0, 1, 0)
    f2 = np.where(axis == 2, 1, 2)
    rows = np.arange(n)
    bmin[rows, axis] = k - pad
    bmax[rows, axis] = k + pad
    bmin[rows, f1] = lo[:, 0]
    bmax[rows, f1] = hi[:, 0]
    bmin[rows, f2] = lo[:, 1]
    bmax[rows, f2] = hi[:, 1]
    return bmin, bmax


def cylinder_aabbs(radius: np.ndarray, zmin: np.ndarray, zmax: np.ndarray,
                   o2w: np.ndarray):
    """World-space cylinder boxes: transform the 8 object-space box
    corners [-r,r]x[-r,r]x[zmin,zmax] by each o2w affine."""
    n = radius.shape[0]
    r = np.abs(np.asarray(radius, np.float32))
    corners = np.empty((n, 8, 3), np.float32)
    idx = 0
    for sx in (-1.0, 1.0):
        for sy in (-1.0, 1.0):
            for z in (0, 1):
                corners[:, idx, 0] = sx * r
                corners[:, idx, 1] = sy * r
                corners[:, idx, 2] = np.where(z, zmax, zmin)
                idx += 1
    rot = np.asarray(o2w, np.float32)[:, :3, :3]
    trans = np.asarray(o2w, np.float32)[:, :3, 3]
    world = np.einsum("nij,nkj->nki", rot, corners) + trans[:, None, :]
    return world.min(1), world.max(1)
