"""Top-level render driver: pixel tiling, sample batching, accumulation.

Execution model (contrast with the reference):
  - CUDA renders one thread per pixel with an spp loop inside the thread
    (gpu-version/main.cu:72-105, 8x8 blocks at :277-279).
  - Here a "tile" is a flat batch of pixels; each jit step traces
    (tile x samples_per_launch) rays through the full bounce loop and adds
    into a per-pixel accumulator that lives on device. Host<->device
    traffic is one image download at the end.

The accumulator is (pixel_sum, n_samples) — the progressive-accumulation
shape of the Taichi versions (taichi main.py:195-201, 朴素
4_0_path_tracing.py:141-143) — so renders are checkpointable and exactly
resumable (counter-based RNG: sample indices already consumed are simply
not re-drawn).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from rt_tpu.config import RenderConfig
from rt_tpu.ops.camera import generate_rays
from rt_tpu.render.integrator import trace
from rt_tpu.scene.types import SceneTables


def render_block(tables: SceneTables, cfg: RenderConfig, px, py,
                 sample_start, n_samples: int, seed, width: int,
                 height: int):
    """Trace n_samples samples for the pixel batch (px, py) [B] and return
    the radiance SUM [B,3] (not yet divided by spp — the reference also
    accumulates raw sums and scales in write_color, color.cuh:54-57).

    Pure and un-jitted so it can be embedded in jit, shard_map, or grad
    contexts (the sharded renderer and the inverse-rendering loss both
    reuse it)."""

    def body(i, acc):
        # sample_start may be a scalar (uniform launch) or a [B] vector
        # of per-lane sample indices (adaptive sampling's per-pixel
        # stream continuation). Keep the scalar a scalar: the megakernel
        # then skips materializing + permuting a per-lane vector.
        sample = (jnp.asarray(sample_start) + i).astype(jnp.uint32)
        ro, rd = generate_rays(tables.camera, width, height, px, py, sample,
                               seed, cfg.enable_defocus, cfg.sampler)
        rgb = trace(tables, cfg, ro, rd,
                    (py * width + px).astype(jnp.uint32), sample, seed)
        return acc + rgb

    acc0 = jnp.zeros((px.shape[0], 3), jnp.float32)
    return jax.lax.fori_loop(0, n_samples, body, acc0)


render_pixels = jax.jit(
    render_block, static_argnames=("cfg", "width", "height", "n_samples"))


@functools.lru_cache(maxsize=8)
def _block_order(w: int, h: int, bx: int = 64, by: int = 32):
    """Pixels ordered in bx*by screen blocks (= one 2048-ray megakernel
    tile) instead of scanlines: path termination is spatially coherent
    in 2D, so square tiles die together and the kernel's dead-tile
    short-circuit + group compaction fire far more often. The counter
    RNG keys on the absolute pixel id, so ordering cannot change the
    image. Cached: the 2M-element argsort costs ~150 ms per call at
    1080p — a per-frame host tax when animating."""
    pix = np.arange(w * h, dtype=np.int32)
    px_all = (pix % w).astype(np.int32)
    py_all = (pix // w).astype(np.int32)
    block = (py_all // by) * ((w + bx - 1) // bx) + (px_all // bx)
    order = np.argsort(block, kind="stable")
    return px_all[order], py_all[order], pix[order]


@functools.lru_cache(maxsize=4096)  # >= tiles/frame even at 8K frames
def _device_tile(w: int, h: int, tile: int, ti: int):
    px_all, py_all, _ = _block_order(w, h)
    n_tiles = -(-(w * h) // tile)
    pad = n_tiles * tile - w * h
    if pad:
        px_all = np.concatenate([px_all, np.zeros(pad, np.int32)])
        py_all = np.concatenate([py_all, np.zeros(pad, np.int32)])
    return (jnp.asarray(px_all[ti * tile:(ti + 1) * tile]),
            jnp.asarray(py_all[ti * tile:(ti + 1) * tile]))


def render(tables: SceneTables, cfg: RenderConfig,
           samples_per_launch: Optional[int] = None,
           progress: bool = False, sample_offset: int = 0,
           device_out: bool = False) -> np.ndarray:
    """Render the full frame. Returns the raw radiance sum [H,W,3] with
    row 0 = BOTTOM scanline (the reference's j index; writers flip).

    sample_offset shifts the absolute sample indices (progressive /
    resumed renders draw exactly the stream coordinates an uninterrupted
    run would, ops/rng.py).

    device_out=True keeps the result on device (a jax.Array; the
    block-order unpermute runs as a device gather) instead of
    downloading it. Callers that composite / reduce / re-consume frames
    on device — and benchmarks that must time the chip rather than the
    host link (BASELINE.md: this environment's tunnel moves ~4-16 MB/s,
    so a 24 MB 1080p accumulator download costs seconds; a production
    host's PCIe moves it in ~2 ms) — use this and download when needed."""
    w, h = cfg.width, cfg.height
    spp = cfg.samples_per_pixel
    n_pix = w * h
    _, _, pix = _block_order(w, h)

    use_regen = (bool(getattr(cfg, "regen", False))
                 and cfg.engine == "mega"
                 and not bool(getattr(cfg, "nee", False)))
    if use_regen:
        from rt_tpu.ops.pallas_mega import mega_supported
        use_regen = mega_supported(tables)

    # pick tile size so tile*samples_per_launch ~ rays_per_batch
    if use_regen:
        # the spp loop runs IN-kernel: rays in flight = tile, regardless
        # of how many samples a launch covers — take the whole budget
        if samples_per_launch is None:
            samples_per_launch = spp
        tile = min(n_pix, cfg.rays_per_batch)
    elif samples_per_launch is None:
        samples_per_launch = max(1, min(spp, cfg.rays_per_batch // max(n_pix, 1)))
    if not use_regen:
        tile = min(n_pix, max(1, cfg.rays_per_batch // samples_per_launch))
    # pixel list is padded to a multiple of tile for a single jit
    # signature (_device_tile)
    n_tiles = -(-n_pix // tile)

    acc = None if device_out else np.zeros((n_tiles * tile, 3), np.float32)
    parts = []
    seed = np.uint32(cfg.seed)
    for ti in range(n_tiles):
        # cached device tiles: re-uploading 2x8 MB per frame through the
        # tunnel is a real per-frame tax when animating
        px, py = _device_tile(w, h, tile, ti)
        tile_acc = None
        s = 0
        while s < spp:
            k = min(samples_per_launch, spp - s)
            if use_regen:
                from rt_tpu.ops.pallas_mega import mega_trace_regen
                part = mega_trace_regen(
                    tables, cfg, (py * w + px).astype(jnp.int32),
                    py.astype(jnp.int32), seed, int(k),
                    sample_base=int(sample_offset + s), width=w, height=h)
            else:
                part = render_pixels(tables, cfg, px, py,
                                     np.uint32(sample_offset + s), int(k),
                                     seed, w, h)
            tile_acc = part if tile_acc is None else tile_acc + part
            s += k
        if device_out:
            parts.append(tile_acc)
        else:
            acc[ti * tile:(ti + 1) * tile] = np.asarray(tile_acc)
        if progress:
            print(f"\rtile {ti + 1}/{n_tiles}", end="", flush=True)
    if progress:
        print()
    if device_out:
        full = parts[0] if n_tiles == 1 else jnp.concatenate(parts, axis=0)
        return _device_unpermute(w, h)(full)
    out = np.zeros((n_pix, 3), np.float32)
    out[pix] = acc[:n_pix]  # undo the block ordering
    return out.reshape(h, w, 3)


@functools.lru_cache(maxsize=8)
def _device_unpermute(w: int, h: int):
    """Jitted inverse of the screen-block pixel ordering: a device-side
    gather producing the [h,w,3] image (out[pix[i]] = acc[i])."""
    _, _, pix = _block_order(w, h)
    inv = np.empty(w * h, np.int32)
    inv[pix] = np.arange(w * h, dtype=np.int32)
    inv_dev = jnp.asarray(inv)

    @jax.jit
    def unpermute(acc):
        return jnp.take(acc[:w * h], inv_dev, axis=0).reshape(h, w, 3)

    return unpermute
