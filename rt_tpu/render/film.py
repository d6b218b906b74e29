"""Film: accumulated radiance sums -> displayable images.

Reproduces both reference output paths exactly:
  - PPM path (write_color, gpu-version/color.cuh:43-95): scale by 1/spp,
    gamma via sqrt, clamp to [0, 0.999], * 256, top row first.
  - PNG path (write_image, color.cuh:15-35): scale by 1/spp, clamp,
    * 256 — NOTE the reference's PNG writer applies NO gamma; that quirk
    is preserved behind gamma=False (the default for to_png_u8) so images
    byte-match what the reference pipeline would produce.

Negative-radiance detection mirrors the write_color sentinel
(color.cuh:49-52).
"""

from __future__ import annotations

import numpy as np


def negative_pixels(image_sum: np.ndarray) -> int:
    """Count of pixels with any negative channel (reference warns per
    write; we surface the count)."""
    return int(np.sum(np.any(np.asarray(image_sum) < 0.0, axis=-1)))


def finalize(image_sum: np.ndarray, spp: int, gamma: bool) -> np.ndarray:
    """1/spp scale (+ sqrt gamma) -> u8, rows flipped so row 0 = top
    scanline (the reference writes j = height-1 .. 0, main.cu:332-336)."""
    img = np.asarray(image_sum, np.float64) / float(spp)
    if gamma:
        img = np.sqrt(np.maximum(img, 0.0))
    u8 = (256.0 * np.clip(img, 0.0, 0.999)).astype(np.uint8)
    return u8[::-1]  # bottom-up storage -> top-down image


def to_ppm(image_sum: np.ndarray, spp: int, gamma: bool = True) -> str:
    """ASCII P3 PPM matching output_image + write_color
    (gpu-version/main.cu:359-372, color.cuh:70-95)."""
    u8 = finalize(image_sum, spp, gamma=gamma)
    h, w, _ = u8.shape
    lines = [f"P3\n{w} {h}\n255\n"]
    flat = u8.reshape(-1, 3)
    lines.extend(f"{r} {g} {b}\n" for r, g, b in flat)
    return "".join(lines)


def to_png_u8(image_sum: np.ndarray, spp: int, gamma: bool = False) -> np.ndarray:
    """u8 image for the PNG writer. gamma=False matches the reference's
    write_image (no sqrt, color.cuh:21-29)."""
    return finalize(image_sum, spp, gamma=gamma)
