"""Progressive rendering with exact checkpoint / resume.

The reference's nearest mechanisms (SURVEY.md §5.4): the Taichi
accumulator fields that grow across wavefront launches
(taichi-version/main.py:195-201), the naive tracer re-writing
sqrt(canvas/cnt) every pass (朴素光线追踪/4_0_path_tracing.py:141-143),
and animation drivers persisting per-frame scene JSONs so a crashed
batch resumes at the last frame (gpu-version/blue.py:20-22).

Here resume is EXACT, not approximate: the accumulator state is
(pixel_sum, samples_done), and because every random draw is a pure
function of (pixel, sample, bounce, purpose) (ops/rng.py), rendering
samples [k, spp) after a restart produces bit-identical radiance to the
uninterrupted run — no RNG state to save. A fingerprint of the scene +
config guards against resuming with mismatched inputs.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Callable, Optional

import numpy as np
import jax

from rt_tpu.config import RenderConfig
from rt_tpu.scene.types import SceneTables


def _fingerprint(tables: SceneTables, cfg: RenderConfig) -> str:
    h = hashlib.sha256()
    h.update(json.dumps({
        "width": cfg.width, "height": cfg.height,
        "max_depth": cfg.max_depth, "seed": cfg.seed,
        "background_mode": cfg.background_mode,
        "exhaust_mode": cfg.exhaust_mode, "p_rr": cfg.p_rr,
        "enable_defocus": cfg.enable_defocus,
        # estimator-identity knobs: resuming a checkpoint under a
        # different sample sequence (rng vs qmc) or a different
        # estimator (nee on/off) would silently mix two distinct sample
        # streams in one accumulator — invalidate instead
        "sampler": cfg.sampler, "nee": cfg.nee,
    }, sort_keys=True).encode())
    for leaf in jax.tree_util.tree_leaves(tables):
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return h.hexdigest()[:32]


@dataclasses.dataclass
class Checkpoint:
    pixel_sum: np.ndarray   # [H,W,3] raw radiance sums (bottom-up rows)
    samples_done: int
    fingerprint: str

    def save(self, path: str) -> None:
        # write to a deterministic temp name (an open file handle stops
        # numpy from appending ".npz"), then atomically replace — never
        # probe the filesystem, so a stale leftover temp file can't be
        # promoted over fresh data
        tmp = path + ".tmp.npz"
        with open(tmp, "wb") as f:
            np.savez_compressed(f,
                                pixel_sum=self.pixel_sum,
                                samples_done=self.samples_done,
                                fingerprint=self.fingerprint)
        os.replace(tmp, path)

    @staticmethod
    def load(path: str) -> "Checkpoint":
        with np.load(path, allow_pickle=False) as z:
            return Checkpoint(pixel_sum=z["pixel_sum"],
                              samples_done=int(z["samples_done"]),
                              fingerprint=str(z["fingerprint"]))


def render_progressive(
    tables: SceneTables,
    cfg: RenderConfig,
    checkpoint_path: Optional[str] = None,
    checkpoint_every: int = 16,
    samples_per_pass: Optional[int] = None,
    callback: Optional[Callable[[np.ndarray, int], None]] = None,
    progress: bool = False,
):
    """Render cfg.samples_per_pixel samples in passes, checkpointing.

    callback(image_sum, samples_done) fires after every pass — the hook
    for progressive previews (the naive tracer's per-pass image write).
    Returns (pixel_sum [H,W,3], samples_done)."""
    from rt_tpu.render.renderer import render

    fp = _fingerprint(tables, cfg)
    start = 0
    acc = np.zeros((cfg.height, cfg.width, 3), np.float32)

    if checkpoint_path and os.path.exists(checkpoint_path):
        ck = Checkpoint.load(checkpoint_path)
        if ck.fingerprint != fp:
            raise ValueError(
                "checkpoint does not match scene/config "
                f"({ck.fingerprint} != {fp})")
        acc = ck.pixel_sum.astype(np.float32)
        start = ck.samples_done

    spp = cfg.samples_per_pixel
    if samples_per_pass is None:
        samples_per_pass = min(checkpoint_every, max(1, spp // 8))

    s = start
    since_ck = 0
    while s < spp:
        k = min(samples_per_pass, spp - s)
        # render only samples [s, s+k): same stream coordinates as the
        # uninterrupted run
        pass_cfg = cfg.replace(samples_per_pixel=k)
        part = render(tables, pass_cfg, sample_offset=s)
        acc = acc + part
        s += k
        since_ck += k
        if progress:
            print(f"\rsamples {s}/{spp}", end="", flush=True)
        if callback is not None:
            callback(acc, s)
        if checkpoint_path and (since_ck >= checkpoint_every or s >= spp):
            Checkpoint(acc, s, fp).save(checkpoint_path)
            since_ck = 0
    if progress:
        print()
    return acc, s
