"""Vector math and affine transforms as plain array ops.

TPU-native replacement for the reference's pointer-free value-type layer
(gpu-version/vec3.cuh:9-427): vectors are trailing-dim-3 arrays, 4x4
transforms are [...,4,4] arrays with a cached inverse carried alongside
(the reference's `transform` caches m_inv the same way, vec3.cuh:300-385).

Everything is f32 and shape-polymorphic over leading batch dims so the
same functions serve the scalar NumPy oracle and the vectorized TPU path.
"""

from __future__ import annotations

import numpy as np


def einsum(xp, subs, *ops):
    """einsum that forces full-f32 accumulation on TPU: the MXU's default
    matmul precision is a single bf16 pass (~1e-3 relative error), which
    visibly corrupts hit distances. Geometry always uses HIGHEST."""
    if xp is np:
        return np.einsum(subs, *ops)
    return xp.einsum(subs, *ops, precision="highest")


def dot(xp, a, b):
    return xp.sum(a * b, axis=-1)


def length_squared(xp, v):
    return dot(xp, v, v)


def length(xp, v):
    return xp.sqrt(length_squared(xp, v))


def unit(xp, v):
    return v / length(xp, v)[..., None]


def onehot_gather(xp, table, idx):
    """Row gather table[idx] as a one-hot matmul.

    On TPU, vector gathers are slow scalar-unit operations (~0.6 ms per
    [131k] gather) while the MXU sits idle; a {0,1} one-hot times the
    table is ~2x faster AND bit-exact under precision=HIGHEST (the
    bf16x3 decomposition represents every f32 input exactly, and each
    output row is 1.0 x one row + zeros). table [N,K] f32, idx [B] i32
    -> [B,K]. NumPy path stays a plain gather."""
    if xp is np:
        return table[idx]
    n = table.shape[0]
    oh = (idx[:, None] == xp.arange(n, dtype=idx.dtype)[None, :]).astype(
        xp.float32)
    return einsum(xp, "bn,nk->bk", oh, table.astype(xp.float32))


def safe_length(xp, v):
    """|v| with a NaN-free gradient at v=0 (returns 0 there).

    sqrt'(0) = inf, and reverse-mode's `0-cotangent x inf` products poison
    gradients of everything upstream (the masked-lane NaN problem); every
    length taken of possibly-degenerate data (pad rows, non-selected
    primitive branches) must use this form.
    """
    l2 = length_squared(xp, v)
    pos = l2 > 0.0
    return xp.where(pos, xp.sqrt(xp.where(pos, l2, 1.0)), 0.0)


def safe_sqrt(xp, x):
    """sqrt(max(x,0)) whose gradient is 0 (not inf/NaN) for x <= 0."""
    pos = x > 0.0
    return xp.where(pos, xp.sqrt(xp.where(pos, x, 1.0)), 0.0)


def safe_div(xp, num, den):
    """num/den with gradient-safe zero when den == 0."""
    ok = den != 0.0
    return xp.where(ok, num / xp.where(ok, den, 1.0), 0.0)


def cross(xp, a, b):
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return xp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def reflect(xp, v, n):
    """v - 2*dot(v,n)*n   (gpu-version/vec3.cuh:119)."""
    return v - 2.0 * dot(xp, v, n)[..., None] * n


def refract(xp, uv, n, etai_over_etat):
    """Snell refraction of the *unit* vector uv (gpu-version/vec3.cuh:125-131)."""
    cos_theta = xp.minimum(dot(xp, -uv, n), 1.0)
    r_out_perp = etai_over_etat[..., None] * (uv + cos_theta[..., None] * n)
    r_out_parallel = (
        -safe_sqrt(xp, xp.abs(1.0 - length_squared(xp, r_out_perp)))[..., None]
        * n
    )
    return r_out_perp + r_out_parallel


def degrees_to_radians(deg):
    return deg * (np.pi / 180.0)


# ---------------------------------------------------------------------------
# Affine transforms: (m, m_inv) pairs of [...,4,4] f32 arrays.
# Factories mirror gpu-version/vec3.cuh:388-427 (translate/rotate/scale each
# construct the analytic inverse rather than Gauss-Jordan inverting).
# ---------------------------------------------------------------------------


def identity_transform():
    m = np.eye(4, dtype=np.float32)
    return m, m.copy()


def translate(delta):
    m = np.eye(4, dtype=np.float32)
    minv = np.eye(4, dtype=np.float32)
    m[:3, 3] = np.asarray(delta, dtype=np.float32)
    minv[:3, 3] = -np.asarray(delta, dtype=np.float32)
    return m, minv


def rotate(axis, theta):
    """Rotation by theta radians about `axis` (gpu-version/vec3.cuh:396-418);
    inverse = transpose."""
    a = np.asarray(axis, dtype=np.float64)
    a = a / np.linalg.norm(a)
    x, y, z = a
    s, c = np.sin(theta), np.cos(theta)
    m = np.eye(4, dtype=np.float32)
    m[0, 0] = x * x + (1 - x * x) * c
    m[0, 1] = x * y * (1 - c) - z * s
    m[0, 2] = x * z * (1 - c) + y * s
    m[1, 0] = x * y * (1 - c) + z * s
    m[1, 1] = y * y + (1 - y * y) * c
    m[1, 2] = y * z * (1 - c) - x * s
    m[2, 0] = x * z * (1 - c) - y * s
    m[2, 1] = y * z * (1 - c) + x * s
    m[2, 2] = z * z + (1 - z * z) * c
    return m, m.T.copy()


def scale(sx, sy, sz):
    m = np.diag(np.array([sx, sy, sz, 1.0], dtype=np.float32))
    minv = np.diag(np.array([1.0 / sx, 1.0 / sy, 1.0 / sz, 1.0], dtype=np.float32))
    return m, minv


def compose(t2, t1):
    """Returns t2 @ t1 as a (m, minv) pair — apply t1 first, then t2
    (matches transform::operator* at gpu-version/vec3.cuh:345-347)."""
    m2, m2i = t2
    m1, m1i = t1
    return np.asarray(m2) @ np.asarray(m1), np.asarray(m1i) @ np.asarray(m2i)


def apply_point(xp, m, p):
    """Transform points [...,3] by matrices [...,4,4] (vec3.cuh:350-360).
    Affine-only fast path: the reference's transforms never set a
    projective bottom row, so w==1 always."""
    rot = einsum(xp, "...ij,...j->...i", m[..., :3, :3], p)
    return rot + m[..., :3, 3]


def apply_vec(xp, m, v):
    return einsum(xp, "...ij,...j->...i", m[..., :3, :3], v)


def apply_normal(xp, minv, n):
    """Normals transform by the inverse-transpose (vec3.cuh:376-381);
    note: NOT renormalized, matching the reference."""
    return einsum(xp, "...ji,...j->...i", minv[..., :3, :3], n)


def apply_ray(xp, m, ro, rd):
    """Transform a ray: origin as point, direction as vector (ray.cuh:25)."""
    return apply_point(xp, m, ro), apply_vec(xp, m, rd)
