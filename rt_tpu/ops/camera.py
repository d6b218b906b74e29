"""Camera ray generation as a pure function (gpu-version/camera.cuh:31-39).

The thin-lens frame is precomputed in scene.types.make_camera; here we
only turn (pixel, sample) coordinates plus the RNG stream into primary
rays. Defocus (lens-disk sampling) follows the CPU/Taichi versions
(cmake-cpu-version/camera.h:33-37); the CUDA reference pins rd=(0,0,0)
(camera.cuh:33-34), which `enable_defocus=False` reproduces.
"""

from __future__ import annotations

import jax.numpy as jnp

from rt_tpu.ops import rng
from rt_tpu.scene.types import CameraDef


def make_camera_jnp(lookfrom, lookat, vup, vfov_deg, aspect_ratio,
                    aperture, focus_dist=None) -> CameraDef:
    """Differentiable (traced) twin of scene.types.make_camera
    (gpu-version/camera.cuh:9-28): same math on jnp values, so camera
    POSE parameters (lookfrom/lookat/vup/vfov/aperture) can be
    optimized by gradient descent — chain it in front of a loss whose
    params include the derived "camera" CameraDef (diff/tape.py
    TAPE_FIELDS). The host make_camera stays NumPy for scene building;
    this one exists for inverse rendering."""
    lookfrom = jnp.asarray(lookfrom, jnp.float32)
    lookat = jnp.asarray(lookat, jnp.float32)
    vup = jnp.asarray(vup, jnp.float32)
    if focus_dist is None:
        focus_dist = jnp.linalg.norm(lookfrom - lookat)
    focus_dist = jnp.asarray(focus_dist, jnp.float32)
    theta = jnp.asarray(vfov_deg, jnp.float32) * (jnp.pi / 180.0)
    h = jnp.tan(theta / 2.0)
    viewport_height = 2.0 * h
    viewport_width = aspect_ratio * viewport_height

    w = lookfrom - lookat
    w = w / jnp.linalg.norm(w)
    u = jnp.cross(vup, w)
    u = u / jnp.linalg.norm(u)
    v = jnp.cross(w, u)

    origin = lookfrom
    horizontal = focus_dist * viewport_width * u
    vertical = focus_dist * viewport_height * v
    lower_left = origin - horizontal / 2 - vertical / 2 - focus_dist * w
    return CameraDef(origin=origin, lower_left=lower_left,
                     horizontal=horizontal, vertical=vertical,
                     u=u, v=v,
                     lens_radius=jnp.asarray(aperture, jnp.float32) / 2.0)


def generate_rays(cam: CameraDef, width, height, px, py, sample_idx, seed,
                  enable_defocus: bool, sampler: str = "rng"):
    """px, py: [B] integer pixel coords (x right, y up from bottom — the
    reference's (i, j) with v measured up, main.cu:95-99).
    Returns (ro [B,3], rd [B,3])."""
    smp = rng.resolve(sampler)
    pixel = (py * width + px).astype(jnp.uint32)
    ru = smp.uniform(jnp, seed, pixel, sample_idx, 0, rng.PIXEL_U)
    rv = smp.uniform(jnp, seed, pixel, sample_idx, 0, rng.PIXEL_V)
    # ((w-1) or 1): a 1-pixel-wide/tall frame would otherwise divide by
    # zero and poison every ray direction with NaN (single-scanline
    # debug renders)
    s = (px.astype(jnp.float32) + ru) / ((width - 1) or 1)
    t = (py.astype(jnp.float32) + rv) / ((height - 1) or 1)

    if enable_defocus:
        disk = smp.in_unit_disk(jnp, seed, pixel, sample_idx, 0)
        rd_lens = cam.lens_radius * disk
        offset = (cam.u[None, :] * rd_lens[:, :1]
                  + cam.v[None, :] * rd_lens[:, 1:2])
    else:
        offset = jnp.zeros((px.shape[0], 3), jnp.float32)

    origin = cam.origin[None, :] + offset
    direction = (cam.lower_left[None, :]
                 + s[:, None] * cam.horizontal[None, :]
                 + t[:, None] * cam.vertical[None, :]
                 - cam.origin[None, :] - offset)
    return origin, direction
