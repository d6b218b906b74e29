"""Materials and textures: SoA parameter tables + integer-switch dispatch.

Replaces the reference's virtual material/texture hierarchies
(gpu-version/material.cuh:14-182, texture.cuh:7-57) with vectorized
all-lane evaluation selected by material type id — the same shape the
Taichi version proves out (taichi-version/material.py:89-145), but
differentiable: albedo/fuzz/ior/emission are pytree leaves.

TPU shape: all per-material and per-texture parameters are fetched with
ONE packed one-hot matmul each (geometry.onehot_gather — bit-exact, MXU
instead of slow vector gathers); the image-texture atlas lookup is the
only true gather. `shade()` evaluates texture + emission + scatter in a
single pass per bounce (the materials' texture value is computed once,
not once for emitted() and again for scatter()).

Scatter semantics per material (all radiometric terms differentiable;
random directions are sampled from the detached geometry — "detached
sampling" — so gradients stay unbiased without differentiating the
sampler):
  lambertian    — dir = normal + unit-ball sample; degenerate -> normal
                  (material.cuh:37-52)
  metal         — dir = reflect(unit(in), n) + fuzz*ball; absorbed when
                  scattered below the horizon (material.cuh:63-70)
  dielectric    — Schlick reflectance vs refraction with total internal
                  reflection; attenuation = 1 (material.cuh:94-148)
  diffuse_light — never scatters; emits its texture value
                  (material.cuh:161-182)
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from rt_tpu.ops import geometry as geom
from rt_tpu.scene.types import (
    MAT_DIELECTRIC,
    MAT_DIFFUSE_LIGHT,
    MAT_LAMBERTIAN,
    MAT_METAL,
    SceneTables,
    TEX_CHECKER,
    TEX_IMAGE,
    TEX_SOLID,
)


class Scatter(NamedTuple):
    ok: jnp.ndarray           # [B] bool — False = absorbed / pure emitter
    direction: jnp.ndarray    # [B,3] scattered direction (unnormalized)
    attenuation: jnp.ndarray  # [B,3]


def _mat_packed(tables: SceneTables):
    """[Nm, 8]: type, fuzz, ior, tex, albedo(3), pad."""
    f32 = jnp.float32
    return jnp.stack([
        jnp.asarray(tables.mat_type, f32),
        jnp.asarray(tables.mat_fuzz, f32),
        jnp.asarray(tables.mat_ior, f32),
        jnp.asarray(tables.mat_tex, f32),
        jnp.asarray(tables.mat_albedo[:, 0], f32),
        jnp.asarray(tables.mat_albedo[:, 1], f32),
        jnp.asarray(tables.mat_albedo[:, 2], f32),
        jnp.zeros_like(jnp.asarray(tables.mat_fuzz, f32)),
    ], axis=-1)


def _tex_packed(tables: SceneTables):
    """[Nx, 8]: type, image, color(3), color2(3)."""
    f32 = jnp.float32
    return jnp.stack([
        jnp.asarray(tables.tex_type, f32),
        jnp.asarray(tables.tex_image, f32),
        jnp.asarray(tables.tex_color[:, 0], f32),
        jnp.asarray(tables.tex_color[:, 1], f32),
        jnp.asarray(tables.tex_color[:, 2], f32),
        jnp.asarray(tables.tex_color2[:, 0], f32),
        jnp.asarray(tables.tex_color2[:, 1], f32),
        jnp.asarray(tables.tex_color2[:, 2], f32),
    ], axis=-1)


def _texture_eval(tables: SceneTables, tex_id, u, v, p):
    """Evaluate textures [B] -> [B,3] via one packed gather.

    solid_color: constant (texture.cuh:14-31)
    checker: sin(10x)sin(10y)sin(10z) parity (texture.cuh:44-52)
    image: wrap uv to [0,1), nearest texel — u indexes the first image
           dim, v the second, as in taichi material.py:137-144 (the BGR
           swap there is baked into our RGB-stored atlas).
    """
    tex_id = jnp.where(tex_id >= 0, tex_id, 0)
    tp = geom.onehot_gather(jnp, _tex_packed(tables), tex_id)
    ttype = tp[:, 0].astype(jnp.int32)
    solid = tp[:, 2:5]
    color2 = tp[:, 5:8]

    sines = (jnp.sin(10.0 * p[:, 0]) * jnp.sin(10.0 * p[:, 1])
             * jnp.sin(10.0 * p[:, 2]))
    checker = jnp.where((sines < 0.0)[:, None], color2, solid)

    out = jnp.where((ttype == TEX_CHECKER)[:, None], checker, solid)

    # image atlas: a true gather, only compiled when the scene has images
    if tables.images.shape[:3] != (1, 1, 1):
        img_id = jnp.maximum(tp[:, 1].astype(jnp.int32), 0)
        th, tw = tables.images.shape[1], tables.images.shape[2]
        xi = jnp.clip(((u - jnp.floor(u)) * th).astype(jnp.int32), 0, th - 1)
        yi = jnp.clip(((v - jnp.floor(v)) * tw).astype(jnp.int32), 0, tw - 1)
        image = jnp.asarray(tables.images)[img_id, xi, yi]
        out = jnp.where((ttype == TEX_IMAGE)[:, None], image, out)
    return out


def texture_value(tables: SceneTables, tex_id, u, v, p):
    return _texture_eval(tables, tex_id, u, v, p)


def material_albedo(tables: SceneTables, mat_id, u, v, p):
    """Albedo/emit color: texture if the material references one, else the
    inline color (lambertian(texture*) vs metal(color), material.cuh)."""
    mp = geom.onehot_gather(jnp, _mat_packed(tables), mat_id)
    return _albedo_from_packed(tables, mp, u, v, p)


def _albedo_from_packed(tables, mp, u, v, p):
    tex = mp[:, 3].astype(jnp.int32)
    from_tex = _texture_eval(tables, tex, u, v, p)
    return jnp.where((tex >= 0)[:, None], from_tex, mp[:, 4:7])


def emitted(tables: SceneTables, mat_id, u, v, p):
    """diffuse_light::emitted (material.cuh:175-178); 0 for the rest."""
    mp = geom.onehot_gather(jnp, _mat_packed(tables), mat_id)
    is_light = mp[:, 0].astype(jnp.int32) == MAT_DIFFUSE_LIGHT
    return jnp.where(is_light[:, None],
                     _albedo_from_packed(tables, mp, u, v, p),
                     jnp.zeros_like(p))


def schlick(cosine, ref_idx):
    """Schlick reflectance (material.cuh:154-158)."""
    r0 = (1.0 - ref_idx) / (1.0 + ref_idx)
    r0 = r0 * r0
    return r0 + (1.0 - r0) * (1.0 - cosine) ** 5


def shade(
    tables: SceneTables,
    mat_id,
    rd,
    normal,
    front_face,
    u,
    v,
    p,
    ball_sample,
    refl_u,
):
    """One-pass material evaluation: (Scatter, emitted [B,3]).

    ball_sample: [B,3] uniform unit-ball draw (shared by lambertian and
    metal — the two are exclusive per lane).
    refl_u: [B] U[0,1) draw for the dielectric reflect/refract choice.
    """
    mp = geom.onehot_gather(jnp, _mat_packed(tables), mat_id)
    mtype = mp[:, 0].astype(jnp.int32)
    fuzz = mp[:, 1]
    ir = mp[:, 2]
    albedo = _albedo_from_packed(tables, mp, u, v, p)

    # lambertian
    lam_dir = normal + ball_sample
    degenerate = jnp.all(jnp.abs(lam_dir) < 1e-8, axis=-1)
    lam_dir = jnp.where(degenerate[:, None], normal, lam_dir)

    # metal
    unit_in = geom.unit(jnp, rd)
    met_dir = geom.reflect(jnp, unit_in, normal) + fuzz[:, None] * ball_sample
    met_ok = geom.dot(jnp, met_dir, normal) > 0.0

    # dielectric
    ratio = jnp.where(front_face, 1.0 / jnp.where(ir == 0.0, 1.0, ir), ir)
    cos_theta = jnp.minimum(geom.dot(jnp, -unit_in, normal), 1.0)
    sin_theta = geom.safe_sqrt(jnp, 1.0 - cos_theta * cos_theta)
    cannot_refract = ratio * sin_theta > 1.0
    reflect_choice = cannot_refract | (schlick(cos_theta, ratio) > refl_u)
    die_dir = jnp.where(
        reflect_choice[:, None],
        geom.reflect(jnp, unit_in, normal),
        geom.refract(jnp, unit_in, normal, ratio),
    )

    is_lam = mtype == MAT_LAMBERTIAN
    is_met = mtype == MAT_METAL
    is_die = mtype == MAT_DIELECTRIC
    is_light = mtype == MAT_DIFFUSE_LIGHT

    direction = jnp.where(
        is_lam[:, None], lam_dir,
        jnp.where(is_met[:, None], met_dir,
                  jnp.where(is_die[:, None], die_dir, normal)))
    attenuation = jnp.where(
        is_die[:, None], jnp.ones_like(albedo),
        jnp.where(is_light[:, None], jnp.zeros_like(albedo), albedo))
    ok = jnp.where(is_met, met_ok, ~is_light)
    em = jnp.where(is_light[:, None], albedo, jnp.zeros_like(albedo))
    return Scatter(ok=ok, direction=direction, attenuation=attenuation), em


def scatter(tables, mat_id, rd, normal, front_face, u, v, p, ball_sample,
            refl_u) -> Scatter:
    """Back-compat wrapper around shade()."""
    sc, _ = shade(tables, mat_id, rd, normal, front_face, u, v, p,
                  ball_sample, refl_u)
    return sc
