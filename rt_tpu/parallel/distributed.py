"""Multi-host runtime glue.

The reference has no communication backend at all — its multi-device
story is 8 processes pinned to GPUs by CUDA_VISIBLE_DEVICES and a shell
`wait` (gpu-version/blue.py:23-35). Here multi-host is the standard JAX
runtime: jax.distributed.initialize() joins the pod slice, after which
jax.devices() spans every host and the (tile, sample) mesh of
parallel/mesh.py shards one render across all of them; collectives ride
ICI within a slice and DCN across slices with no further code changes
(the scaling-book model: the program is written once against the mesh).

Frame-level farming (animation) stays embarrassingly parallel: partition
the frame range per host with `frame_range` — the exact analogue of the
reference's per-GPU process split, but with each frame itself rendered
data-parallel over the local devices.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Join (or no-op on single-process) the multi-host JAX runtime.

    With no arguments, relies on the environment (TPU pod metadata or
    JAX_COORDINATOR_ADDRESS etc.); explicit args override. Safe to call
    when already initialized."""
    import jax

    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if num_processes in (None, 1) and coordinator_address is None:
        return  # single process — nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def frame_range(total_frames: int, num_hosts: int, host_index: int,
                start: int = 0) -> Tuple[int, int]:
    """Contiguous [lo, hi) frame slice for one host of a farm.

    Mirrors blue.py's per-GPU partitioning (8 frames per wave,
    blue.py:24-32) but as a static contiguous split: idempotent per-frame
    outputs make any crashed host's slice re-runnable independently."""
    if not (0 <= host_index < num_hosts):
        raise ValueError(f"host_index {host_index} not in [0, {num_hosts})")
    per = -(-total_frames // num_hosts)
    lo = start + host_index * per
    hi = min(start + total_frames, lo + per)
    return lo, max(lo, hi)
