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


def generate_rays(cam: CameraDef, width, height, px, py, sample_idx, seed,
                  enable_defocus: bool):
    """px, py: [B] integer pixel coords (x right, y up from bottom — the
    reference's (i, j) with v measured up, main.cu:95-99).
    Returns (ro [B,3], rd [B,3])."""
    pixel = (py * width + px).astype(jnp.uint32)
    ru = rng.uniform(jnp, seed, pixel, sample_idx, 0, rng.PIXEL_U)
    rv = rng.uniform(jnp, seed, pixel, sample_idx, 0, rng.PIXEL_V)
    s = (px.astype(jnp.float32) + ru) / (width - 1)
    t = (py.astype(jnp.float32) + rv) / (height - 1)

    if enable_defocus:
        disk = rng.in_unit_disk(jnp, seed, pixel, sample_idx, 0)
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
