"""In-kernel persistent ray-queue megakernel (round 4).

BASELINE.md round-3 proved the segmented megakernel's remaining 2.59x
is group-packing waste floored by HBM data-movement granularity (live
rays regroup through HBM at 16-lane granularity between segments), and
named the only crossing mechanism: in-kernel persistent ray queues.
This module is that mechanism:

  - Live rays sit in a VMEM staging pool ([19, 24, 256] f32 — ray
    state + per-lane pix/samp/bounce RNG coordinates, a 2-column
    exact lane slot, and the alive flag that carries NEE's
    diffuse-bounce encoding). Pixel ids ride as a 2-column hi/lo
    split (like the slot key) so they stay f32-exact through the
    one-hot pack matmuls up to 2^31 — an 8K frame's 33M pixel ids
    would corrupt in a single f32 column (> 2^24).
  - Every kernel step consumes one 2048-lane tile: the OLDEST pool
    survivors when >= 2048 are pooled (FIFO keeps rough screen order),
    else a fresh primary tile DMA'd from the pre-generated ray arrays
    in HBM (fresh tiles are whole screen-coherent blocks, so bounce-0
    chunk culling keeps its bite).
  - The tile advances ONE bounce through the exact same `do_bounce`
    closure as the segmented/regen drivers (identical per-lane RNG
    stream coordinates -> identical per-lane radiance).
  - Survivors repack into the pool at LANE granularity: 8 one-hot MXU
    matmuls (exact in f32) + a dynamic lane-roll (the mechanics the
    round-4 queue probe measured at ~0.2 us/step against the ~19 us
    live tile-bounce).
  - Completed lanes (slot, rgb) pack into a completion staging and
    flush to an HBM ring in aligned 8-row blocks; the frame assembles
    with ONE slot-keyed sort (no scatter: a 33.5M-record scatter-add
    measured 2.75 s on v5e, the 4-operand sort ~0.19 s).

Occupancy therefore never decays: every tile-bounce retires ~2048 live
lanes until the frame's whole work pool is drained — the wavefront
equivalent of a persistent-thread GPU path tracer (the reference's
per-thread ray loop, gpu-version/main.cu:17-105), built the TPU way.

The driver wraps the kernel in a jitted `lax.while_loop` whose carry
(staging pools, cursors, completion ring) threads through
`input_output_aliases`, so the whole frame runs without a host sync.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rt_tpu.ops.pallas_mega import (
    RAY_TILE, LANES, SPH_CHUNK, AUX_CHUNK,
    _make_do_bounce, _make_background, _prep_scene, nee_light_table,
)

ROWS = RAY_TILE // LANES        # 8 rows of 256 lanes = one tile
NCOLS = 19          # ro3 rd3 tp3 c3 pixh pixl samp bvec hi lo alive
(_PIXH, _PIXL, _SAMP, _BVEC, _HI, _LO,
 _ALIVE) = 12, 13, 14, 15, 16, 17, 18
CCOLS = 5                       # hi lo r g b
S_ROWS = 24                     # staging pool rows (fill <= 4095 + slack)
SLOT_SPLIT = 4096               # slot = hi * 4096 + lo, each half f32-exact

# cursor slots in the SMEM cursor vector
_C_FILL, _C_PRIM, _C_CROW, _C_CFILL, _C_DONE = 0, 1, 2, 3, 7


def _tril():
    r = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    return (r <= c).astype(jnp.float32)


def _pack_into(vals, alive, fill, stage_ref, ncols):
    """Append the alive lanes of vals [ncols, 8, 256] to stage_ref
    [ncols, S_ROWS, 256] starting at lane offset `fill` (traced i32),
    preserving lane order. Returns the new fill.

    Mechanics (round-4 queue probe, scripts/exp_queue_probe_r4.py):
    per source row, a [256, 256] one-hot P[s, d] = alive_s & (rank_s
    == d) contracts vals against the MXU (exact in f32 — one-hot
    weights), the packed row rolls to the intra-row lane offset, and
    two dynamic-row read-modify-write stores splice it in. Rank comes
    from an exclusive prefix sum of `alive` via a triangular MXU
    matmul (exact: small integers). vals MUST be zero on dead lanes
    (NaN x 0 = NaN on the MXU would poison the pack)."""
    tril = _tril()
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    cums = jax.lax.dot_general(
        alive, tril, dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)            # [8,256] inclusive
    rank = cums - alive
    counts = cums[:, LANES - 1]                        # [8]
    base = fill.astype(jnp.float32)
    for i in range(ROWS):
        vals_i = vals[:, i, :]                         # [ncols, 256]
        alive_i = alive[i:i + 1, :]                    # [1, 256]
        rank_i = rank[i:i + 1, :]
        dcol = jax.lax.broadcasted_iota(
            jnp.int32, (LANES, LANES), 1).astype(jnp.float32)
        P = ((rank_i.T == dcol) & (alive_i.T > 0.0)).astype(jnp.float32)
        packed = jax.lax.dot_general(
            vals_i, P, dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)        # [ncols, 256]
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
    return base.astype(jnp.int32)


def _queue_kernel(scal_i_ref,
                  scal_f_ref, sph_ref, rect_ref, cyl_ref, tri_ref,
                  sbnd_ref, tbnd_ref, hbco_ref, ctco_ref,
                  suv_ref, ruv_ref, yuv_ref, tuv_ref, nee_ref,
                  atr_ref, atg_ref, atb_ref,
                  scode_ref, rcode_ref, ycode_ref, tcode_ref,
                  rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
                  pixh_ref, pixl_ref, sampp_ref,
                  stage_in, cstage_in, cur_in, ring_in,
                  stage_ref, cstage_ref, cur_out, ring_ref,
                  work, cur, sem_in, sem_out, *,
                  n_blocks: int, n_steps: int,
                  ns: int, nr: int, ny_: int, nt: int,
                  s_chunk: int, r_chunk: int, y_chunk: int, t_chunk: int,
                  max_depth: int, t_min: float, p_rr: float,
                  grad_bg: bool, exhaust_bg: bool,
                  has_img: bool, img_th: int, img_tw: int,
                  cull: bool, cull_t: bool, mxu: bool,
                  nee: bool, n_lights: int, nee_img: bool,
                  mis: bool, nee_glossy: bool, qmc: bool):
    """One launch = n_steps queue steps (sequential TPU grid; SMEM/VMEM
    persists across steps). stage/cstage/ring/cursors alias in->out, so
    consecutive launches resume exactly (the driver's while loop)."""
    step = pl.program_id(0)
    seed = scal_i_ref[0]
    tile = jnp.int32(RAY_TILE)

    @pl.when(step == 0)
    def _init():
        for i in range(8):
            cur[i] = cur_in[0, i]

    fill = cur[_C_FILL]
    prim = cur[_C_PRIM]
    have_prim = prim < n_blocks
    active = (fill > 0) | have_prim

    @pl.when(active)
    def _step():
        use_surv = fill >= tile
        use_prim = jnp.logical_not(use_surv) & have_prim
        drain = jnp.logical_not(use_surv) & jnp.logical_not(use_prim)

        @pl.when(use_prim)
        def _load_prim():
            srcs = (rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
                    pixh_ref, pixl_ref, sampp_ref)
            dsts = (0, 1, 2, 3, 4, 5, _PIXH, _PIXL, _SAMP)
            sl = pl.ds(prim * ROWS, ROWS)
            for s_, d_ in zip(srcs, dsts):
                dma = pltpu.make_async_copy(
                    s_.at[sl, :], work.at[d_], sem_in)
                dma.start()
                dma.wait()

        @pl.when(jnp.logical_not(use_prim))
        def _load_surv():
            work[...] = stage_ref[:, 0:ROWS, :]
            # FIFO shift: consumed rows leave, the pool slides down
            stage_ref[:, 0:S_ROWS - ROWS, :] = stage_ref[:, ROWS:S_ROWS, :]
            stage_ref[:, S_ROWS - ROWS:S_ROWS, :] = jnp.zeros(
                (NCOLS, ROWS, LANES), jnp.float32)

        t = work[...]
        lane_g = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
                  * LANES
                  + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1))
        # fresh primaries: slot from the primary cursor, state reset
        slot = prim * tile + lane_g
        hi_p = (slot // SLOT_SPLIT).astype(jnp.float32)
        lo_p = (slot % SLOT_SPLIT).astype(jnp.float32)
        onef = jnp.ones((ROWS, LANES), jnp.float32)
        zf = jnp.zeros((ROWS, LANES), jnp.float32)

        def sel_p(p_val, s_val):
            # where, not multiply-select: the non-taken side can be
            # uninitialized scratch (first primary step) = NaN
            return jnp.where(use_prim, p_val, s_val)

        ox, oy, oz = t[0], t[1], t[2]
        dx, dy, dz = t[3], t[4], t[5]
        tpr = sel_p(onef, t[6])
        tpg = sel_p(onef, t[7])
        tpb = sel_p(onef, t[8])
        cr = sel_p(zf, t[9])
        cg = sel_p(zf, t[10])
        cb = sel_p(zf, t[11])
        bvec_f = sel_p(zf, t[_BVEC])
        hi = sel_p(hi_p, t[_HI])
        lo = sel_p(lo_p, t[_LO])
        # alive carries NEE's diffuse-bounce encoding (0.5) through the
        # pool, not just liveness — fresh primaries enter at 1.0
        alive_in = sel_p(onef, t[_ALIVE])
        pix = (t[_PIXH].astype(jnp.int32) * SLOT_SPLIT
               + t[_PIXL].astype(jnp.int32))
        samp = t[_SAMP].astype(jnp.int32)
        bvec = bvec_f.astype(jnp.int32)

        # drain tiles carry garbage above the fill line: mask it dead
        # (their values are zeroed before any pack — see vals below)
        mask = jnp.where(drain,
                         jnp.where(lane_g < fill, alive_in, 0.0),
                         alive_in)
        background = _make_background(scal_f_ref, grad_bg)
        do_bounce = _make_do_bounce(
            seed, pix, background, sph_ref, rect_ref, cyl_ref, tri_ref,
            sbnd_ref, tbnd_ref, hbco_ref, ctco_ref, suv_ref, ruv_ref,
            yuv_ref, tuv_ref, atr_ref, atg_ref, atb_ref,
            nee=nee, nee_ref=nee_ref, n_lights=n_lights, nee_img=nee_img,
            mis=mis, nee_glossy=nee_glossy,
            code_refs=(scode_ref, rcode_ref, ycode_ref, tcode_ref),
            ns=ns, nr=nr, ny_=ny_, nt=nt, s_chunk=s_chunk,
            r_chunk=r_chunk, y_chunk=y_chunk, t_chunk=t_chunk,
            t_min=t_min, p_rr=p_rr, has_img=has_img, img_th=img_th,
            img_tw=img_tw, cull=cull, cull_t=cull_t, mxu=mxu, qmc=qmc)

        st = do_bounce(bvec, samp,
                       (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb,
                        cr, cg, cb, mask))
        (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, cr, cg, cb, alive) = st
        bv2 = bvec + 1
        # per-lane depth exhaustion (the segmented driver applies this
        # after its loop; _regen_kernel per-lane — same semantics)
        exh = (alive > 0.0) & (bv2 >= max_depth)
        if exhaust_bg:
            bgr, bgg, bgb = background(dx, dy, dz)
            cr = cr + jnp.where(exh, tpr * bgr, 0.0)
            cg = cg + jnp.where(exh, tpg * bgg, 0.0)
            cb = cb + jnp.where(exh, tpb * bgb, 0.0)
        alive = jnp.where(exh, 0.0, alive)
        surv = alive > 0.0
        comp = (mask > 0.0) & jnp.logical_not(surv)

        sf = surv.astype(jnp.float32)
        # sanitize via where, NOT multiply: drain-tile garbage can be
        # NaN and NaN * 0 = NaN would ride the pack matmul
        vals19 = jnp.where(
            surv[None, :, :],
            jnp.stack(
                [ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, cr, cg, cb,
                 t[_PIXH], t[_PIXL], t[_SAMP],
                 bv2.astype(jnp.float32), hi, lo, alive],
                axis=0), 0.0)
        fill_after = jnp.where(use_prim, fill,
                               jnp.where(use_surv, fill - tile,
                                         jnp.int32(0)))
        new_fill = _pack_into(vals19, sf, fill_after, stage_ref, NCOLS)
        cur[_C_FILL] = new_fill
        cur[_C_PRIM] = prim + jnp.where(use_prim, 1, 0)

        cf = comp.astype(jnp.float32)
        vals5 = jnp.where(comp[None, :, :],
                          jnp.stack([hi, lo, cr, cg, cb], axis=0), 0.0)
        new_cfill = _pack_into(vals5, cf, cur[_C_CFILL], cstage_ref,
                               CCOLS)
        cur[_C_CFILL] = new_cfill

        @pl.when(new_cfill >= tile)
        def _flush():
            crow = cur[_C_CROW]
            d = pltpu.make_async_copy(
                cstage_ref.at[:, pl.ds(0, ROWS), :],
                ring_ref.at[:, pl.ds(crow * ROWS, ROWS), :], sem_out)
            d.start()
            d.wait()
            cstage_ref[:, 0:S_ROWS - ROWS, :] = \
                cstage_ref[:, ROWS:S_ROWS, :]
            cstage_ref[:, S_ROWS - ROWS:S_ROWS, :] = jnp.zeros(
                (CCOLS, ROWS, LANES), jnp.float32)
            cur[_C_CROW] = crow + 1
            cur[_C_CFILL] = new_cfill - tile

    @pl.when(step == n_steps - 1)
    def _fin():
        done = ((cur[_C_PRIM] >= n_blocks)
                & (cur[_C_FILL] == 0)).astype(jnp.int32)
        cur[_C_DONE] = done
        for i in range(8):
            cur_out[0, i] = cur[i]


@functools.partial(
    jax.jit,
    static_argnames=("counts", "n_steps", "max_depth", "t_min", "p_rr",
                     "grad_bg", "exhaust_bg", "has_img", "img_th",
                     "img_tw", "cull", "cull_t", "mxu", "qmc",
                     "interpret", "nee", "n_lights", "nee_img", "mis",
                     "nee_glossy"))
def queue_launch(sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd, sph_co,
                 uv_tabs, nee_tab, atlas, counts, background,
                 prim_cols, stage, cstage, cur, ring, seed,
                 n_steps: int, max_depth: int,
                 t_min: float = 1e-3, p_rr: float = 0.0,
                 grad_bg: bool = False, exhaust_bg: bool = False,
                 has_img: bool = False, img_th: int = 1, img_tw: int = 1,
                 cull: bool = False, cull_t: bool = False,
                 mxu: bool = False, qmc: bool = False,
                 interpret: bool = False,
                 nee: bool = False, n_lights: int = 0,
                 nee_img: bool = False, mis: bool = False,
                 nee_glossy: bool = False,
                 code_tabs=None):
    """Run n_steps queue steps; returns (stage, cstage, cur, ring)."""
    ns, nr, ny_, nt = counts
    n_blocks = prim_cols[0].shape[0] // ROWS
    scal_i = jnp.asarray(seed).astype(jnp.int32).reshape(1)
    scal_f = jnp.asarray(background, jnp.float32).reshape(1, 3)

    kernel = functools.partial(
        _queue_kernel, n_blocks=n_blocks, n_steps=n_steps,
        ns=ns, nr=nr, ny_=ny_, nt=nt,
        s_chunk=min(max(ns, 1), SPH_CHUNK),
        r_chunk=min(max(nr, 1), AUX_CHUNK),
        y_chunk=min(max(ny_, 1), AUX_CHUNK),
        t_chunk=min(max(nt, 1), SPH_CHUNK),
        max_depth=int(max_depth), t_min=float(t_min), p_rr=float(p_rr),
        grad_bg=bool(grad_bg), exhaust_bg=bool(exhaust_bg),
        has_img=bool(has_img), img_th=int(img_th), img_tw=int(img_tw),
        cull=bool(cull), cull_t=bool(cull_t), mxu=bool(mxu),
        nee=bool(nee), n_lights=int(n_lights), nee_img=bool(nee_img),
        mis=bool(mis), nee_glossy=bool(nee_glossy), qmc=bool(qmc))
    if code_tabs is None:
        code_tabs = tuple(jnp.zeros((8, 1), jnp.float32)
                          for _ in range(4))

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            smem,                 # scal_f
            vmem, vmem, vmem, vmem,   # sphere/rect/cyl/tri tables
            smem, smem,           # sphere / triangle chunk AABBs
            vmem, vmem,           # sphere hb / ct coeffs
            vmem, vmem, vmem, vmem,   # UV param tables
            vmem,                 # NEE light table
            vmem, vmem, vmem,     # atlas R/G/B
            vmem, vmem, vmem, vmem,  # per-family tape-code tables (mis)
            hbm, hbm, hbm, hbm, hbm, hbm,  # primary ro/rd columns
            hbm, hbm, hbm,        # primary pix hi/lo + samp (f32-exact)
            vmem,                 # stage in
            vmem,                 # cstage in
            smem,                 # cursors in
            hbm,                  # completion ring in
        ],
        out_specs=[vmem, vmem, smem, hbm],
        scratch_shapes=[
            pltpu.VMEM((NCOLS, ROWS, LANES), jnp.float32),  # work tile
            pltpu.SMEM((8,), jnp.int32),                    # cursors
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    ring_rows = ring.shape[1]
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NCOLS, S_ROWS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((CCOLS, S_ROWS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.int32),
            jax.ShapeDtypeStruct((CCOLS, ring_rows, LANES), jnp.float32),
        ],
        # stage/cstage/cur/ring thread through launches in place
        # (indices count the scalar-prefetch operand: scal_i=0,
        # scal_f=1, 20 table refs, 9 primary columns, then the carry)
        input_output_aliases={31: 0, 32: 1, 33: 2, 34: 3},
        interpret=interpret,
    )(
        scal_i, scal_f, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd,
        sph_co[0], sph_co[1],
        uv_tabs[0], uv_tabs[1], uv_tabs[2], uv_tabs[3], nee_tab,
        atlas[0], atlas[1], atlas[2],
        code_tabs[0], code_tabs[1], code_tabs[2], code_tabs[3],
        *prim_cols,
        stage, cstage, cur, ring,
    )
    return outs


def queue_trace(tables, cfg, ro, rd, pixel, sample_idx, seed):
    """Full-path trace via the persistent-queue kernel. Same contract
    as mega_trace: returns the [b, 3] per-lane radiance sum.

    Consumes the SAME pre-generated camera rays as the other engines
    (per-lane RNG stream coordinates identical), so per-lane radiance
    matches the megakernel up to compiler fusion ulps.
    Pre-condition: mega_supported(tables)."""
    b = ro.shape[0]
    pad = (-b) % RAY_TILE
    if pad:
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), jnp.float32)])
        rd = jnp.concatenate(
            [rd, jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (pad, 3))])
        pixel = jnp.concatenate([pixel, jnp.zeros((pad,), pixel.dtype)])
        if jnp.ndim(sample_idx):
            sample_idx = jnp.concatenate(
                [jnp.asarray(sample_idx).astype(jnp.int32),
                 jnp.zeros((pad,), jnp.int32)])
    bp = b + pad
    # slot capacity: hi = slot // 4096 must stay f32-exact (< 2^24) and
    # the assembly key hi*4096+lo an i32 — so ~2^31 lanes per call; an
    # 8K frame's 33M-lane tile is fine
    assert bp <= (1 << 31) - 2, bp  # keep int32-max free as sentinel

    nee_on = bool(getattr(cfg, "nee", False)) and tables.n_lights > 0
    mis_on = nee_on and bool(getattr(cfg, "mis", False))
    glossy_on = nee_on and bool(getattr(cfg, "nee_glossy", False))
    if mis_on or glossy_on:
        (tbl, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd, sph_co,
         uv_tabs, code_tabs, atlas, counts, kw) = _prep_scene(
             tables, cfg, want_codes=True)
    else:
        (tbl, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd, sph_co,
         uv_tabs, atlas, counts, kw) = _prep_scene(tables, cfg)
        code_tabs = None
    nee_tab = (nee_light_table(tbl) if nee_on
               else jnp.zeros((8, 33), jnp.float32))

    n_blocks = bp // RAY_TILE
    rows = n_blocks * ROWS

    def col(x):
        return jnp.asarray(x, jnp.float32).reshape(rows, LANES)

    samp = (jnp.asarray(sample_idx).astype(jnp.int32)
            if jnp.ndim(sample_idx)
            else jnp.full((bp,), jnp.asarray(sample_idx), jnp.int32))
    pix_i = pixel.astype(jnp.int32)
    prim_cols = (col(ro[:, 0]), col(ro[:, 1]), col(ro[:, 2]),
                 col(rd[:, 0]), col(rd[:, 1]), col(rd[:, 2]),
                 col(pix_i // SLOT_SPLIT), col(pix_i % SLOT_SPLIT),
                 col(samp))

    stage0 = jnp.zeros((NCOLS, S_ROWS, LANES), jnp.float32)
    cstage0 = jnp.zeros((CCOLS, S_ROWS, LANES), jnp.float32)
    cur0 = jnp.zeros((1, 8), jnp.int32)
    ring0 = jnp.zeros((CCOLS, rows, LANES), jnp.float32)

    # per-launch step budget: ~2-4K is the bench-shape sweet spot
    # (28.25M at 2048 vs 26.46M at 49152 — idle post-drain steps are
    # not free in the full kernel; scripts/exp_queue_bench_r4.py)
    n_steps = int(getattr(cfg, "queue_steps", 0)) or max(
        16, min(2 * n_blocks, 4096))
    launch = functools.partial(
        queue_launch, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd,
        sph_co, uv_tabs, nee_tab, atlas, counts, tbl.background,
        prim_cols,
        n_steps=n_steps, max_depth=int(cfg.max_depth),
        exhaust_bg=cfg.exhaust_mode == "background",
        nee=nee_on, n_lights=tables.n_lights,
        nee_img=nee_on and tables.nee_img,
        mis=mis_on, nee_glossy=glossy_on, code_tabs=code_tabs,
        **kw)

    def cond(c):
        return c[2][0, _C_DONE] == 0

    def body(c):
        stage, cstage, cur, ring = c
        return launch(stage, cstage, cur, ring, jnp.asarray(seed))

    stage, cstage, cur, ring = jax.lax.while_loop(
        cond, body, (stage0, cstage0, cur0, ring0))

    # assembly: every input lane completed exactly once; records sort
    # back to lane order by their exact 2-column slot key (no scatter)
    nrec = cur[0, _C_CROW] * RAY_TILE
    cfill = cur[0, _C_CFILL]

    def flat(x):
        return x.reshape(CCOLS, -1)

    rr = flat(ring)
    cs = flat(cstage)
    val_r = jnp.arange(rr.shape[1], dtype=jnp.int32) < nrec
    val_c = jnp.arange(cs.shape[1], dtype=jnp.int32) < cfill
    # invalid-record sentinel must sort AFTER every valid slot key
    # (max valid key is bp-1 <= 2^31-2 by the capacity assert above);
    # SLOT_SPLIT**2 = 2^24 would under-sort batches > 16.7M lanes
    big = jnp.int32(jnp.iinfo(jnp.int32).max)

    def keys(rec, valid):
        k = (rec[0].astype(jnp.int32) * SLOT_SPLIT
             + rec[1].astype(jnp.int32))
        return jnp.where(valid, k, big)

    key = jnp.concatenate([keys(rr, val_r), keys(cs, val_c)])
    r_ = jnp.concatenate([rr[2], cs[2]])
    g_ = jnp.concatenate([rr[3], cs[3]])
    b_ = jnp.concatenate([rr[4], cs[4]])
    _, rs, gs, bs = jax.lax.sort((key, r_, g_, b_), num_keys=1)
    return jnp.stack([rs[:b], gs[:b], bs[:b]], axis=-1)


# ---------------------------------------------------------------------------
# Queue-ADJOINT: the path-replay radiometric backward in the persistent
# ray-queue loop (round 5). The segmented adjoint megakernel
# (pallas_mega._adjoint_kernel) inherits the forward's 2.59x
# group-packing waste; this kernel replays each lane's bounces at the
# queue's ~perfect packing instead. Differences vs the forward queue:
#   - pool carries 6 extra per-lane columns (the sample radiance L and
#     loss cotangent g, the suffix identity's residuals) and NO slot
#     hi/lo: gradients are the only output, so there is no completion
#     staging, no HBM ring, and no assembly sort at all;
#   - the adjoint do_bounce's per-step slab/atlas contributions add
#     into persistent accumulators ([8, n_slots] + 3 atlas planes)
#     that alias through launches like the pool does;
#   - per-lane depth exhaustion credits the background adjoint
#     (d(g.L)/dbg += g*P) the moment a lane exhausts — the per-lane
#     form of _adjoint_kernel's after-the-final-segment block.
# ---------------------------------------------------------------------------

ACOLS = 23      # ro3 rd3 tp3 c3 pixh pixl samp bvec L3 g3 alive
(_A_PIXH, _A_PIXL, _A_SAMP, _A_BVEC, _A_LR, _A_LG, _A_LB,
 _A_GR, _A_GG, _A_GB, _A_ALIVE) = 12, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22


def _queue_adjoint_kernel(scal_i_ref,
                          scal_f_ref, sph_ref, rect_ref, cyl_ref, tri_ref,
                          sbnd_ref, tbnd_ref, hbco_ref, ctco_ref,
                          suv_ref, ruv_ref, yuv_ref, tuv_ref, nee_ref,
                          atr_ref, atg_ref, atb_ref,
                          rox_ref, roy_ref, roz_ref,
                          rdx_ref, rdy_ref, rdz_ref,
                          pixh_ref, pixl_ref, sampp_ref,
                          lr_ref, lg_ref, lb_ref, gr_ref, gg_ref, gb_ref,
                          stage_in, cur_in, acc_in, imr_in, img_in, imb_in,
                          stage_ref, cur_out, acc_ref, imr_ref, img_ref,
                          imb_ref,
                          work, cur, sem_in, *,
                          n_blocks: int, n_steps: int, n_slots: int,
                          ns: int, nr: int, ny_: int, nt: int,
                          s_chunk: int, r_chunk: int, y_chunk: int,
                          t_chunk: int,
                          max_depth: int, t_min: float, p_rr: float,
                          grad_bg: bool, exhaust_bg: bool,
                          has_img: bool, img_th: int, img_tw: int,
                          cull: bool, cull_t: bool, mxu: bool,
                          nee: bool, n_lights: int, nee_img: bool,
                          qmc: bool):
    from rt_tpu.ops.pallas_mega import _SLOT_SLAB

    step = pl.program_id(0)
    seed = scal_i_ref[0]
    tile = jnp.int32(RAY_TILE)

    @pl.when(step == 0)
    def _init():
        for i in range(8):
            cur[i] = cur_in[0, i]

    fill = cur[_C_FILL]
    prim = cur[_C_PRIM]
    have_prim = prim < n_blocks
    active = (fill > 0) | have_prim

    @pl.when(active)
    def _step():
        use_surv = fill >= tile
        use_prim = jnp.logical_not(use_surv) & have_prim
        drain = jnp.logical_not(use_surv) & jnp.logical_not(use_prim)

        @pl.when(use_prim)
        def _load_prim():
            srcs = (rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
                    pixh_ref, pixl_ref, sampp_ref,
                    lr_ref, lg_ref, lb_ref, gr_ref, gg_ref, gb_ref)
            dsts = (0, 1, 2, 3, 4, 5, _A_PIXH, _A_PIXL, _A_SAMP,
                    _A_LR, _A_LG, _A_LB, _A_GR, _A_GG, _A_GB)
            sl = pl.ds(prim * ROWS, ROWS)
            for s_, d_ in zip(srcs, dsts):
                dma = pltpu.make_async_copy(
                    s_.at[sl, :], work.at[d_], sem_in)
                dma.start()
                dma.wait()

        @pl.when(jnp.logical_not(use_prim))
        def _load_surv():
            work[...] = stage_ref[:, 0:ROWS, :]
            stage_ref[:, 0:S_ROWS - ROWS, :] = stage_ref[:, ROWS:S_ROWS, :]
            stage_ref[:, S_ROWS - ROWS:S_ROWS, :] = jnp.zeros(
                (ACOLS, ROWS, LANES), jnp.float32)

        t = work[...]
        lane_g = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
                  * LANES
                  + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1))
        onef = jnp.ones((ROWS, LANES), jnp.float32)
        zf = jnp.zeros((ROWS, LANES), jnp.float32)

        def sel_p(p_val, s_val):
            return jnp.where(use_prim, p_val, s_val)

        ox, oy, oz = t[0], t[1], t[2]
        dx, dy, dz = t[3], t[4], t[5]
        tpr = sel_p(onef, t[6])
        tpg = sel_p(onef, t[7])
        tpb = sel_p(onef, t[8])
        cr = sel_p(zf, t[9])
        cg = sel_p(zf, t[10])
        cb = sel_p(zf, t[11])
        bvec_f = sel_p(zf, t[_A_BVEC])
        alive_in = sel_p(onef, t[_A_ALIVE])
        pix = (t[_A_PIXH].astype(jnp.int32) * SLOT_SPLIT
               + t[_A_PIXL].astype(jnp.int32))
        samp = t[_A_SAMP].astype(jnp.int32)
        bvec = bvec_f.astype(jnp.int32)
        # L/g ride the pool unchanged; sanitize drain garbage through
        # where (NaN * 0 = NaN would poison the slab contractions)
        # logical ops, not where: Mosaic can't legalize an i1-on-i1
        # vector select
        dead_ok = jnp.logical_not(drain) | (lane_g < fill)
        Lr = jnp.where(dead_ok, t[_A_LR], 0.0)
        Lg = jnp.where(dead_ok, t[_A_LG], 0.0)
        Lb = jnp.where(dead_ok, t[_A_LB], 0.0)
        gr = jnp.where(dead_ok, t[_A_GR], 0.0)
        gg = jnp.where(dead_ok, t[_A_GG], 0.0)
        gb = jnp.where(dead_ok, t[_A_GB], 0.0)

        mask = jnp.where(drain,
                         jnp.where(lane_g < fill, alive_in, 0.0),
                         alive_in)
        background = _make_background(scal_f_ref, grad_bg)
        do_bounce = _make_do_bounce(
            seed, pix, background, sph_ref, rect_ref, cyl_ref, tri_ref,
            sbnd_ref, tbnd_ref, hbco_ref, ctco_ref, suv_ref, ruv_ref,
            yuv_ref, tuv_ref, atr_ref, atg_ref, atb_ref,
            adjoint=True, n_slots=n_slots,
            Lrgb=(Lr, Lg, Lb), grgb=(gr, gg, gb),
            nee=nee, nee_ref=nee_ref, n_lights=n_lights, nee_img=nee_img,
            ns=ns, nr=nr, ny_=ny_, nt=nt, s_chunk=s_chunk,
            r_chunk=r_chunk, y_chunk=y_chunk, t_chunk=t_chunk,
            t_min=t_min, p_rr=p_rr, grad_bg=grad_bg, has_img=has_img,
            img_th=img_th, img_tw=img_tw, cull=cull, cull_t=cull_t,
            mxu=mxu, qmc=qmc)

        nsl = n_slots // _SLOT_SLAB
        zvec = tuple(jnp.zeros((_SLOT_SLAB,), jnp.float32)
                     for _ in range(nsl))
        z1 = jnp.float32(0.0)
        zimg = jnp.zeros(atr_ref.shape, jnp.float32)
        st0 = ((ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, cr, cg, cb,
                mask),
               (zvec, zvec, zvec), (zvec, zvec, zvec), (z1, z1, z1),
               (zimg, zimg, zimg))
        st, accA, accA2, accbg, accImg = do_bounce(bvec, samp, st0)
        (ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, cr, cg, cb, alive) = st
        bv2 = bvec + 1
        exh = (alive > 0.0) & (bv2 >= max_depth)
        if exhaust_bg and not grad_bg:
            # exhaust-to-background credit, per-lane at the exhausting
            # bounce (the segmented kernel's after-final-segment block)
            accbg = (accbg[0] + jnp.sum(jnp.where(exh, gr * tpr, 0.0)),
                     accbg[1] + jnp.sum(jnp.where(exh, gg * tpg, 0.0)),
                     accbg[2] + jnp.sum(jnp.where(exh, gb * tpb, 0.0)))
        alive = jnp.where(exh, 0.0, alive)
        surv = alive > 0.0

        # fold this step's contributions into the persistent slabs
        for k in range(nsl):
            sl = pl.ds(k * _SLOT_SLAB, _SLOT_SLAB)
            blk = jnp.stack(
                [accA[0][k], accA[1][k], accA[2][k],
                 accA2[0][k], accA2[1][k], accA2[2][k],
                 jnp.zeros((_SLOT_SLAB,), jnp.float32),
                 jnp.zeros((_SLOT_SLAB,), jnp.float32)], axis=0)
            acc_ref[:, sl] = acc_ref[:, sl] + blk
        lanev = jax.lax.broadcasted_iota(jnp.int32, (_SLOT_SLAB,), 0)
        bgrow = (jnp.where(lanev == 0, accbg[0], 0.0)
                 + jnp.where(lanev == 1, accbg[1], 0.0)
                 + jnp.where(lanev == 2, accbg[2], 0.0))
        acc_ref[6:7, pl.ds(0, _SLOT_SLAB)] = (
            acc_ref[6:7, pl.ds(0, _SLOT_SLAB)] + bgrow[None, :])
        if has_img:
            imr_ref[...] = imr_ref[...] + accImg[0]
            img_ref[...] = img_ref[...] + accImg[1]
            imb_ref[...] = imb_ref[...] + accImg[2]

        sf = surv.astype(jnp.float32)
        vals23 = jnp.where(
            surv[None, :, :],
            jnp.stack(
                [ox, oy, oz, dx, dy, dz, tpr, tpg, tpb, cr, cg, cb,
                 t[_A_PIXH], t[_A_PIXL], t[_A_SAMP],
                 bv2.astype(jnp.float32),
                 Lr, Lg, Lb, gr, gg, gb, alive],
                axis=0), 0.0)
        fill_after = jnp.where(use_prim, fill,
                               jnp.where(use_surv, fill - tile,
                                         jnp.int32(0)))
        new_fill = _pack_into(vals23, sf, fill_after, stage_ref, ACOLS)
        cur[_C_FILL] = new_fill
        cur[_C_PRIM] = prim + jnp.where(use_prim, 1, 0)

    @pl.when(step == n_steps - 1)
    def _fin():
        done = ((cur[_C_PRIM] >= n_blocks)
                & (cur[_C_FILL] == 0)).astype(jnp.int32)
        cur[_C_DONE] = done
        for i in range(8):
            cur_out[0, i] = cur[i]


@functools.partial(
    jax.jit,
    static_argnames=("counts", "n_steps", "n_slots", "max_depth",
                     "t_min", "p_rr", "grad_bg", "exhaust_bg",
                     "has_img", "img_th", "img_tw", "cull", "cull_t",
                     "mxu", "qmc", "interpret", "nee", "n_lights",
                     "nee_img"))
def queue_adjoint_launch(sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd,
                         sph_co, uv_tabs, nee_tab, atlas, counts,
                         background, prim_cols, stage, cur, acc, img3,
                         seed, n_steps: int, n_slots: int, max_depth: int,
                         t_min: float = 1e-3, p_rr: float = 0.0,
                         grad_bg: bool = False, exhaust_bg: bool = False,
                         has_img: bool = False, img_th: int = 1,
                         img_tw: int = 1,
                         cull: bool = False, cull_t: bool = False,
                         mxu: bool = False, qmc: bool = False,
                         interpret: bool = False,
                         nee: bool = False, n_lights: int = 0,
                         nee_img: bool = False):
    """Run n_steps adjoint queue steps; returns (stage, cur, acc, img3).
    stage/cur/acc/img3 alias in->out for the driver's while loop."""
    ns, nr, ny_, nt = counts
    n_blocks = prim_cols[0].shape[0] // ROWS
    scal_i = jnp.asarray(seed).astype(jnp.int32).reshape(1)
    scal_f = jnp.asarray(background, jnp.float32).reshape(1, 3)

    kernel = functools.partial(
        _queue_adjoint_kernel, n_blocks=n_blocks, n_steps=n_steps,
        n_slots=int(n_slots),
        ns=ns, nr=nr, ny_=ny_, nt=nt,
        s_chunk=min(max(ns, 1), SPH_CHUNK),
        r_chunk=min(max(nr, 1), AUX_CHUNK),
        y_chunk=min(max(ny_, 1), AUX_CHUNK),
        t_chunk=min(max(nt, 1), SPH_CHUNK),
        max_depth=int(max_depth), t_min=float(t_min), p_rr=float(p_rr),
        grad_bg=bool(grad_bg), exhaust_bg=bool(exhaust_bg),
        has_img=bool(has_img), img_th=int(img_th), img_tw=int(img_tw),
        cull=bool(cull), cull_t=bool(cull_t), mxu=bool(mxu),
        nee=bool(nee), n_lights=int(n_lights), nee_img=bool(nee_img),
        qmc=bool(qmc))

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            smem,                 # scal_f
            vmem, vmem, vmem, vmem,   # sphere/rect/cyl/tri tables
            smem, smem,           # sphere / triangle chunk AABBs
            vmem, vmem,           # sphere hb / ct coeffs
            vmem, vmem, vmem, vmem,   # UV param tables
            vmem,                 # NEE light table
            vmem, vmem, vmem,     # atlas R/G/B
            hbm, hbm, hbm, hbm, hbm, hbm,  # primary ro/rd columns
            hbm, hbm, hbm,        # pix hi/lo + samp
            hbm, hbm, hbm, hbm, hbm, hbm,  # per-lane L rgb + g rgb
            vmem,                 # stage in
            smem,                 # cursors in
            vmem,                 # acc slabs in
            vmem, vmem, vmem,     # atlas-plane grads in
        ],
        out_specs=[vmem, smem, vmem, vmem, vmem, vmem],
        scratch_shapes=[
            pltpu.VMEM((ACOLS, ROWS, LANES), jnp.float32),  # work tile
            pltpu.SMEM((8,), jnp.int32),                    # cursors
            pltpu.SemaphoreType.DMA,
        ],
    )
    rows = n_blocks * ROWS
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ACOLS, S_ROWS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, 8), jnp.int32),
            jax.ShapeDtypeStruct((8, n_slots), jnp.float32),
            jax.ShapeDtypeStruct(img3[0].shape, jnp.float32),
            jax.ShapeDtypeStruct(img3[1].shape, jnp.float32),
            jax.ShapeDtypeStruct(img3[2].shape, jnp.float32),
        ],
        # stage/cur/acc/img planes thread through launches in place
        # (indices count the scalar-prefetch operand: scal_i=0,
        # scal_f=1, 16 table refs, 15 primary columns, then the carry)
        input_output_aliases={33: 0, 34: 1, 35: 2, 36: 3, 37: 4, 38: 5},
        interpret=interpret,
    )(
        scal_i, scal_f, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd,
        sph_co[0], sph_co[1],
        uv_tabs[0], uv_tabs[1], uv_tabs[2], uv_tabs[3], nee_tab,
        atlas[0], atlas[1], atlas[2],
        *prim_cols,
        stage, cur, acc, img3[0], img3[1], img3[2],
    )
    del rows
    return outs


def queue_trace_adjoint(tables, cfg, ro, rd, pixel, sample_idx, seed,
                        L, gcot, depth_bwd: int, exhaust: bool):
    """Radiometric backward of the path-replay VJP on the persistent
    ray-queue loop — mega_trace_adjoint's contract (same gradient
    dict), the queue engine's packing. No completion ring, no assembly
    sort: the only outputs are the gradient slabs + atlas planes.

    Replaces the segmented backward the reference-scale training step
    still ran (BASELINE.md round-5 'gradients ride the queue engine'
    measured the forward-only 1.28x; this closes the backward)."""
    b = ro.shape[0]
    pad = (-b) % RAY_TILE
    if pad:
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), jnp.float32)])
        rd = jnp.concatenate(
            [rd, jnp.broadcast_to(
                jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (pad, 3))])
        pixel = jnp.concatenate([pixel, jnp.zeros((pad,), pixel.dtype)])
        L = jnp.concatenate([L, jnp.zeros((pad, 3), jnp.float32)])
        gcot = jnp.concatenate([gcot, jnp.zeros((pad, 3), jnp.float32)])
    bp = b + pad
    assert bp <= (1 << 31) - 2, bp

    (tbl, sph_tab, rect_tab, cyl_tab, tri_tab, sbnd, tbnd, sph_co,
     uv_tabs, atlas, counts, kw) = _prep_scene(tables, cfg)
    from rt_tpu.ops.pallas_mega import nee_light_table as _nlt

    n_tex = tables.tex_color.shape[0]
    n_mat = tables.mat_albedo.shape[0]
    n_slots = -(-(n_tex + n_mat) // LANES) * LANES
    grad_bg = kw.get("grad_bg", False)
    nee_on = bool(getattr(cfg, "nee", False)) and tables.n_lights > 0
    nee_tab = (_nlt(tbl) if nee_on
               else jnp.zeros((8, 33), jnp.float32))

    n_blocks = bp // RAY_TILE
    rows = n_blocks * ROWS

    def col(x):
        return jnp.asarray(x, jnp.float32).reshape(rows, LANES)

    samp = (jnp.asarray(sample_idx).astype(jnp.int32)
            if jnp.ndim(sample_idx)
            else jnp.full((bp,), jnp.asarray(sample_idx), jnp.int32))
    pix_i = pixel.astype(jnp.int32)
    prim_cols = (col(ro[:, 0]), col(ro[:, 1]), col(ro[:, 2]),
                 col(rd[:, 0]), col(rd[:, 1]), col(rd[:, 2]),
                 col(pix_i // SLOT_SPLIT), col(pix_i % SLOT_SPLIT),
                 col(samp),
                 col(L[:, 0]), col(L[:, 1]), col(L[:, 2]),
                 col(gcot[:, 0]), col(gcot[:, 1]), col(gcot[:, 2]))

    stage0 = jnp.zeros((ACOLS, S_ROWS, LANES), jnp.float32)
    cur0 = jnp.zeros((1, 8), jnp.int32)
    acc0 = jnp.zeros((8, n_slots), jnp.float32)
    img30 = tuple(jnp.zeros(a.shape, jnp.float32) for a in atlas)

    n_steps = int(getattr(cfg, "queue_steps", 0)) or max(
        16, min(2 * n_blocks, 4096))
    launch = functools.partial(
        queue_adjoint_launch, sph_tab, rect_tab, cyl_tab, tri_tab,
        sbnd, tbnd, sph_co, uv_tabs, nee_tab, atlas, counts,
        tbl.background, prim_cols,
        n_steps=n_steps, n_slots=int(n_slots),
        max_depth=int(depth_bwd),
        exhaust_bg=bool(exhaust),
        nee=nee_on, n_lights=tables.n_lights,
        nee_img=nee_on and tables.nee_img,
        **kw)

    def cond(c):
        return c[1][0, _C_DONE] == 0

    def body(c):
        stage, cur, acc, img3 = c
        outs = launch(stage, cur, acc, img3, jnp.asarray(seed))
        return (outs[0], outs[1], outs[2], tuple(outs[3:6]))

    stage, cur, acc, img3 = jax.lax.while_loop(
        cond, body, (stage0, cur0, acc0, img30))

    out = {
        "tex_color": acc[0:3, :n_tex].T,
        "tex_color2": acc[3:6, :n_tex].T,
        "mat_albedo": acc[0:3, n_tex:n_tex + n_mat].T,
        "background": (jnp.zeros((3,), jnp.float32) if grad_bg
                       else acc[6, 0:3]),
    }
    if kw.get("has_img"):
        ni, th, tw = tables.images.shape[:3]
        out["images"] = jnp.stack(
            [p[:ni * th, :tw].reshape(ni, th, tw) for p in img3],
            axis=-1)
    return out
