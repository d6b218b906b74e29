"""Device meshes for distributed rendering.

The reference's only multi-device strategy is process-level frame
farming: 8 renderer processes pinned via CUDA_VISIBLE_DEVICES, joined by
shell `wait` (gpu-version/blue.py:23-35) — zero communication. The
TPU-native replacement is a jax.sharding.Mesh over the slice with two
named axes:

  "tile"   — pixel tiles, the data-parallel axis (each device owns a
             contiguous slab of the flat pixel list)
  "sample" — sample batches, for very high spp (each device renders a
             disjoint slice of the per-pixel sample indices; the image is
             the psum over this axis — the gradient-accumulation analogue)

Scene tables (SoA pytrees, SURVEY.md §2.7) are tiny relative to the ray
state, so they are replicated; no collective ever moves scene data. The
only collectives are the psum of image accumulators over "sample" and the
psum of parameter gradients in the inverse-rendering step — both ride ICI
within a slice (scaling-book recipe: annotate shardings, let XLA place
collectives).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh

TILE_AXIS = "tile"
SAMPLE_AXIS = "sample"


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh with ("tile", "sample") axes.

    shape defaults to (n_devices, 1): all-data-parallel over pixel tiles,
    which is communication-free (rays are independent — SURVEY.md §5.7)
    and therefore the right default; pass (n//k, k) to shard very high
    spp renders over the sample axis too.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, (TILE_AXIS, SAMPLE_AXIS))


def default_mesh() -> Mesh:
    return make_mesh()
