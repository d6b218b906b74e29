"""Round-4 probe: cost of the in-kernel persistent-queue mechanics.

BASELINE.md round-3 proved the megakernel's remaining 2.59x is group-
packing waste floored by HBM-granularity moves, and named the only
crossing mechanism: in-kernel persistent ray queues — lane-granular
repacking in VMEM between bounces, 128-lane-granular (row) DMA appends,
no HBM gather round trip. Before building it into the megakernel, this
probe measures the queue-step mechanics IN ISOLATION with a fake
bounce, per 2048-lane step:

  - consume: 16-row DMA from an HBM ring at a dynamic row offset
  - pack: lane-granular survivor compaction via 16 one-hot MXU matmuls
    ([17,128] @ [128,128] per source row, exact in f32) + dynamic
    lane-roll placement into a VMEM staging buffer
  - append: aligned 16-row DMA flushes to the HBM ring at a cursor

Budget: the real live tile-bounce costs ~18.7 us; the mechanics must
stay well under ~5 us/step for the projected 2.59x packing win to
survive as a >=1.7x end-to-end win.

Variants: noop (grid-step floor), dma (consume+append only),
pack (dma + survivor pack), full (pack + completed-lane pack).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

COLS = 17          # 13 f32 state cols + pix/samp/slot/bounce as exact f32
CCOLS = 5          # completed record: slot, r, g, b, valid
ROWS = 8           # 2048-lane tile = 8 rows x 256 lanes (mega layout)
LANES = 256
STAGE = 16


def _tril():
    r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    return (r <= c).astype(jnp.float32)


def _pack_into(vals, alive, fill, stage_ref, ncols):
    """Pack alive lanes of vals [ncols, 16, 128] into stage_ref
    [ncols, 32, 128] starting at lane offset `fill` (traced scalar).
    Returns new fill. 16 one-hot MXU matmuls + dynamic roll + 2
    dynamic-row RMW stores per source row."""
    tril = _tril()
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    # ranks: exclusive within-row cumsum of alive (exact: small ints)
    cums = jax.lax.dot_general(
        alive, tril, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)            # [16, 128] inclusive
    rank = cums - alive
    counts = cums[:, LANES - 1]                        # [16]
    base = fill
    for i in range(ROWS):
        vals_i = vals[:, i, :]                         # [ncols, 128]
        alive_i = alive[i:i + 1, :]                    # [1, 128]
        rank_i = rank[i:i + 1, :]
        # one-hot P[s, d] = alive_s & (rank_s == d)
        dcol = jax.lax.broadcasted_iota(
            jnp.int32, (LANES, LANES), 1).astype(jnp.float32)
        P = ((rank_i.T == dcol) & (alive_i.T > 0.0)).astype(jnp.float32)
        packed = jax.lax.dot_general(
            vals_i, P, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)        # [ncols, 128]
        o = base.astype(jnp.int32)
        r0 = o // LANES
        sft = o - r0 * LANES
        rolled = pltpu.roll(packed, sft, axis=1)
        mask_a = (lane >= sft).astype(jnp.float32)
        cur = stage_ref[:, pl.ds(r0, 1), :]
        stage_ref[:, pl.ds(r0, 1), :] = cur + (rolled * mask_a)[:, None, :]
        cur = stage_ref[:, pl.ds(r0 + 1, 1), :]
        stage_ref[:, pl.ds(r0 + 1, 1), :] = (
            cur + (rolled * (1.0 - mask_a))[:, None, :])
        base = base + counts[i]
    return base


def _kernel(mode_smem, qin_hbm, qout_hbm, done_hbm, out_cur, state_vmem,
            stage_vmem, cstage_vmem, cur_smem, sem_in, sem_out, sem_done,
            *, mode: str, n_rows: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        cur_smem[0] = 0   # head (rows consumed)
        cur_smem[1] = 0   # tail (rows appended)
        cur_smem[2] = 0   # staging fill (lanes)
        cur_smem[3] = 0   # completed rows
        cur_smem[4] = 0   # completed staging fill (lanes)
        stage_vmem[...] = jnp.zeros_like(stage_vmem)
        cstage_vmem[...] = jnp.zeros_like(cstage_vmem)

    if mode == "noop":
        @pl.when(step == n_rows // ROWS - 1)
        def _fin():
            out_cur[0, 0] = cur_smem[1]
        return

    # cursors are kept in BLOCK units and multiplied by ROWS at slice
    # time so Mosaic can prove the sublane-tiling divisibility of the
    # dynamic HBM offsets
    head = cur_smem[0]
    dma_in = pltpu.make_async_copy(
        qin_hbm.at[:, pl.ds(head * ROWS, ROWS), :], state_vmem, sem_in)
    dma_in.start()
    dma_in.wait()
    cur_smem[0] = head + 1

    vals = state_vmem[...]
    # fake bounce: deterministic hash-ish survival ~72% per step
    h = (vals[0] * 0.12345 + vals[1] * 0.543
         + jnp.float32(step) * 0.917)
    frac = h - jnp.floor(h)
    alive = (frac[...] < 0.72).astype(jnp.float32)     # [16, 128]

    if mode == "dma":
        tail = cur_smem[1]
        dma_out = pltpu.make_async_copy(
            state_vmem, qout_hbm.at[:, pl.ds(tail * ROWS, ROWS), :],
            sem_out)
        dma_out.start()
        dma_out.wait()
        cur_smem[1] = tail + 1
        out_cur[0, 0] = cur_smem[1]
        return

    # ---- survivor pack into staging ----
    fill = cur_smem[2].astype(jnp.float32)
    new_fill = _pack_into(vals, alive, fill, stage_vmem, COLS)
    cur_smem[2] = new_fill.astype(jnp.int32)

    if mode == "full":
        # completed-lane pack (complement), CCOLS columns
        cvals = jnp.concatenate([vals[:CCOLS - 1],
                                 jnp.ones((1, ROWS, LANES), jnp.float32)], 0)
        cfill = cur_smem[4].astype(jnp.float32)
        ncf = _pack_into(cvals, 1.0 - alive, cfill, cstage_vmem, CCOLS)
        cur_smem[4] = ncf.astype(jnp.int32)

        @pl.when(cur_smem[4] >= ROWS * LANES)
        def _cflush():
            crow = cur_smem[3]
            d = pltpu.make_async_copy(
                cstage_vmem.at[:, pl.ds(0, ROWS), :],
                done_hbm.at[:, pl.ds(crow * ROWS, ROWS), :], sem_done)
            d.start()
            d.wait()
            cstage_vmem[:, 0:ROWS, :] = cstage_vmem[:, ROWS:2 * ROWS, :]
            cstage_vmem[:, ROWS:2 * ROWS, :] = jnp.zeros(
                (CCOLS, ROWS, LANES), jnp.float32)
            cur_smem[3] = crow + 1
            cur_smem[4] = cur_smem[4] - ROWS * LANES

    # ---- flush full 16-row block of staging to the out ring ----
    @pl.when(cur_smem[2] >= ROWS * LANES)
    def _flush():
        tail = cur_smem[1]
        d = pltpu.make_async_copy(
            stage_vmem.at[:, pl.ds(0, ROWS), :],
            qout_hbm.at[:, pl.ds(tail * ROWS, ROWS), :], sem_out)
        d.start()
        d.wait()
        stage_vmem[:, 0:ROWS, :] = stage_vmem[:, ROWS:2 * ROWS, :]
        stage_vmem[:, ROWS:2 * ROWS, :] = jnp.zeros(
            (COLS, ROWS, LANES), jnp.float32)
        cur_smem[1] = tail + 1
        cur_smem[2] = cur_smem[2] - ROWS * LANES

    @pl.when(step == n_rows // ROWS - 1)
    def _fin():
        out_cur[0, 0] = cur_smem[1]
        out_cur[0, 1] = cur_smem[2]
        out_cur[0, 2] = cur_smem[3]


@functools.partial(jax.jit, static_argnames=("mode", "n_rows"))
def run(qin, mode: str, n_rows: int):
    n_steps = n_rows // ROWS
    kern = functools.partial(_kernel, mode=mode, n_rows=n_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.ANY),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((COLS, ROWS, LANES), jnp.float32),
            pltpu.VMEM((COLS, STAGE, LANES), jnp.float32),
            pltpu.VMEM((CCOLS, STAGE, LANES), jnp.float32),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((COLS, n_rows + STAGE, LANES), jnp.float32),
            jax.ShapeDtypeStruct((CCOLS, n_rows + STAGE, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.int32),
        ],
    )(jnp.zeros((1,), jnp.int32), qin)


def bench(mode, n_rows, reps=3):
    qin = jnp.asarray(
        np.random.RandomState(0).rand(COLS, n_rows + STAGE, LANES)
        .astype(np.float32))
    out = run(qin, mode, n_rows)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(qin, mode, n_rows)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    n_steps = n_rows // ROWS
    print(f"{mode:5s}: {dt*1e3:8.2f} ms total, {dt/n_steps*1e6:7.2f} us/step"
          f"  (cursors {np.asarray(out[2])[0, :5]})", flush=True)
    return dt / n_steps


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    N_ROWS = 4096  # 512K lanes, 256 steps
    base = None
    for mode in ("noop", "dma", "pack", "full"):
        t = bench(mode, N_ROWS)
        if mode == "noop":
            base = t
    print(f"(real live tile-bounce for scale: ~18.7 us)", flush=True)
