"""Differentiable rendering + inverse-rendering optimization.

The reference renderer is not differentiable — this is the capability the
TPU redesign adds on top of parity (BASELINE.json north star): the whole
pipeline is differentiable w.r.t. material albedo/fuzz/IOR, emission
colors, sphere centers/radii and the background, via JAX reverse-mode
through the scan-form bounce loop with a detached-sampling estimator:

  - every random draw (pixel jitter, unit-ball scatter, Schlick coin) is
    a pure function of integer stream coordinates (ops/rng.py), so it
    carries no gradient — the sampler is detached by construction;
  - the radiometric terms it feeds (hit distances, normals, albedo
    lookups, Schlick blend, emission) stay differentiable, giving the
    standard unbiased-for-continuous-terms estimator (visibility
    discontinuities are not handled — no edge sampling — matching the
    scope of "recover albedo/positions from a target image").

Scene parameters are just leaves of the SceneTables pytree; a "parameter
set" is a dict of selected field names, swapped in with
dataclasses.replace. Gradients across the mesh are psum'd over ICI
(parallel/mesh.py), the DP gradient all-reduce analogue.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rt_tpu.config import RenderConfig
from rt_tpu.render.renderer import render_block
from rt_tpu.scene.types import SceneTables
from rt_tpu.parallel.mesh import SAMPLE_AXIS, TILE_AXIS
from rt_tpu.parallel.sharded import _padded_pixel_list

# Differentiable table fields (BASELINE.json: albedo, fuzz, IOR, emission
# — emission lives in tex_color via diffuse_light textures — geometry).
PARAM_FIELDS = (
    "mat_albedo", "mat_fuzz", "mat_ior",
    "tex_color", "tex_color2",
    "sph_center", "sph_radius",
    "background",
)


def extract_params(tables: SceneTables,
                   fields: Sequence[str] = PARAM_FIELDS) -> Dict[str, jax.Array]:
    return {f: getattr(tables, f) for f in fields}


def apply_params(tables: SceneTables, params: Dict[str, jax.Array]) -> SceneTables:
    return dataclasses.replace(tables, **params)


def _flatten_fd_components(fd_params) -> list:
    """[(field, component_tuple), ...] for the CRN-FD estimators, with
    bare-int components normalized to 1-tuples so 1-D fields read
    naturally ({"sph_radius": [0]} as valid as {"sph_center": [(0, 0)]})."""
    out = []
    for f, idxs in fd_params.items():
        for idx in idxs:
            out.append((f, tuple(idx)
                        if isinstance(idx, (tuple, list, np.ndarray))
                        else (int(idx),)))
    return out


def _stack_fd_probes(params, flat_idx, eps, base_row: bool):
    """Probe pytree for one batched `lax.map` FD dispatch: rows 2j/2j+1
    are +-eps on component j of its field; base_row appends the
    unperturbed parameters as a final row (for the loss history).
    Shared by fit_fd and fit_hybrid — the single place probe
    construction lives."""
    k = len(flat_idx)
    n_rows = 2 * k + (1 if base_row else 0)
    out = {}
    for f, v in params.items():
        rows = jnp.broadcast_to(v, (n_rows,) + v.shape)
        for j, (f2, idx) in enumerate(flat_idx):
            if f2 == f:
                rows = rows.at[(2 * j,) + idx].add(eps)
                rows = rows.at[(2 * j + 1,) + idx].add(-eps)
        out[f] = rows
    return out


def _diff_cfg(cfg: RenderConfig) -> RenderConfig:
    """PLAIN reverse-mode needs the fixed-trip scan loop (lax.while_loop
    has no transpose rule) and the XLA intersector. This constraint
    applies only to method="ad"; the path-replay VJP (diff/replay.py,
    fit(method="replay")) runs any engine/loop at O(B) memory."""
    if cfg.loop != "scan" or cfg.engine != "xla":
        cfg = cfg.replace(loop="scan", engine="xla")
    return cfg


def _device_tables(tables: SceneTables) -> SceneTables:
    """Tables enter grad/shard_map traces as closure constants; make the
    leaves jnp arrays so tracer-indexed gathers work."""
    return jax.tree_util.tree_map(jnp.asarray, tables)


def make_loss_fn(tables: SceneTables, cfg: RenderConfig, spp: int,
                 n_valid: Optional[int] = None):
    """(params, px, py, target) -> scalar MSE of the spp-sample render
    estimate against target rows [B,3]. Single-device form.

    n_valid masks rows >= n_valid out of the mean: sharded pixel lists
    are padded to lane/device multiples with copies of pixel 0
    (_padded_pixel_list), and without the mask those duplicates
    overweight pixel 0 in the objective — the sharded loss would not
    equal the unpadded single-device loss."""
    cfg = _diff_cfg(cfg)
    tables = _device_tables(tables)

    def loss_fn(params, px, py, target, sample_base=0.0):
        tbl = apply_params(tables, params)
        s0 = jnp.asarray(sample_base, jnp.float32).astype(jnp.uint32)
        acc = render_block(tbl, cfg, px, py, s0, spp,
                           jnp.uint32(cfg.seed), cfg.width, cfg.height)
        img = acc / jnp.float32(spp)
        se = (img - target) ** 2
        if n_valid is None or n_valid == px.shape[0]:
            return jnp.mean(se)
        keep = (jnp.arange(se.shape[0]) < n_valid)[:, None]
        return jnp.sum(jnp.where(keep, se, 0.0)) / jnp.float32(3 * n_valid)

    return loss_fn


def make_train_step(
    tables: SceneTables,
    cfg: RenderConfig,
    spp: int,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    n_valid: Optional[int] = None,
):
    """Build the jitted SPMD training step.

    Sharding is GSPMD-style: params/opt_state are replicated, the pixel
    batch (px, py, target) is sharded over every mesh device (the caller
    device_puts with `pixel_sharding(mesh)`), and jax.grad runs through
    the sharded computation — XLA propagates the data sharding through
    the bounce loop and inserts the parameter-gradient all-reduce over
    ICI by itself (the scaling-book recipe: annotate shardings, let XLA
    place collectives). This is exactly the data-parallel training-step
    shape, with pixels in the role of the batch.

    Returns step(params, opt_state, px, py, target) ->
    (params, opt_state, loss)."""
    cfg = _diff_cfg(cfg)
    tables = _device_tables(tables)

    def step(params, opt_state, px, py, target, sample_base=0.0):
        loss, grads = jax.value_and_grad(
            make_loss_fn(tables, cfg, spp, n_valid))(params, px, py,
                                                     target, sample_base)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step)
    return jax.jit(
        step,
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P()),
                       NamedSharding(mesh, P())),
    )


def pixel_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for training-step pixel batches: split over all mesh
    devices (both named axes act as one flat data axis here)."""
    return NamedSharding(mesh, P((TILE_AXIS, SAMPLE_AXIS)))


def fit(
    tables: SceneTables,
    cfg: RenderConfig,
    target_image: np.ndarray,
    fields: Sequence[str] = ("mat_albedo",),
    spp: int = 4,
    steps: int = 50,
    learning_rate: float = 5e-2,
    mesh: Optional[Mesh] = None,
    init_params: Optional[Dict[str, jax.Array]] = None,
    method: str = "ad",
    geom_spec: Optional[Dict[str, Sequence[tuple]]] = None,
    bwd_depth: Optional[int] = None,
    resample: bool = False,
) -> Tuple[Dict[str, np.ndarray], list]:
    """Inverse-rendering loop: recover `fields` of the scene from a
    target mean-radiance image [H,W,3] (row 0 = bottom scanline).

    method:
      "ad"     — reverse-mode through the scan loop (full interior
                 chain incl. geometry; O(B*depth) residual memory).
      "replay" — path-replay custom VJP (diff/replay.py): O(B) memory,
                 forward pass on cfg.engine (megakernel allowed);
                 radiometric fields analytically, plus geometry /
                 fuzz / IOR components listed in `geom_spec`
                 ({field: [component_index_tuple, ...]}) via the
                 forward-mode tangent replay. With a mesh, the pixel
                 batch is sharded over all devices and GSPMD inserts
                 the gradient all-reduce.
      "tape"   — winner-tape reverse mode (diff/tape.py): capture each
                 bounce's closest-hit winner, differentiate the smooth
                 replay with plain AD under two-level remat — EVERY
                 continuous field (geometry tables included, whole-table
                 at once) in one backward pass at O(B*sqrt(depth))
                 memory. Same detached-sampling scope as "ad".

    Returns (recovered params, per-step loss history)."""
    if method not in ("ad", "replay", "tape"):
        raise ValueError(
            f"method must be 'ad', 'replay' or 'tape'; got {method!r} "
            "(camera pose recovery is fit_camera; geometry FD is fit_fd)")
    optimizer = optax.adam(learning_rate)
    params = (dict(init_params) if init_params is not None
              else extract_params(tables, fields))
    # tree_map, not bare asarray: "camera" (tape) is a CameraDef pytree
    params = {k: jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), v)
        for k, v in params.items()}
    opt_state = optimizer.init(params)

    if method in ("replay", "tape"):
        flat_tgt = np.asarray(target_image, np.float32).reshape(-1, 3)
        if mesh is None:
            n_pix = cfg.width * cfg.height
            pix = np.arange(n_pix, dtype=np.int32)
            rpx = jnp.asarray(pix % cfg.width)
            rpy = jnp.asarray(pix // cfg.width)
            tgt = jnp.asarray(flat_tgt)
        else:
            # GSPMD shards the replay VJP like any other computation:
            # the pixel batch (closed over) carries the sharding, XLA
            # propagates it through the replay loops and inserts the
            # parameter-gradient all-reduce (tested equal to the
            # single-device grads in test_diff). Pad to the device
            # count the same way the "ad" branch below does.
            n_shards = int(np.prod(list(mesh.shape.values())))
            px_, py_, n_pix = _padded_pixel_list(cfg.width, cfg.height,
                                                 n_shards)
            pad = px_.shape[0] - n_pix
            if pad:
                flat_tgt = np.concatenate(
                    [flat_tgt,
                     np.broadcast_to(flat_tgt[:1], (pad, 3))])
            sh = pixel_sharding(mesh)
            rpx, rpy, tgt = (jax.device_put(jnp.asarray(x), sh)
                             for x in (px_, py_, flat_tgt))
        if method == "tape":
            from rt_tpu.ops.pallas_mega import mega_supported
            from rt_tpu.diff.tape import make_tape_loss_fn, make_tape_vg

            if mega_supported(tables):
                # fast path (round 3): in-kernel capture + death-sorted
                # shrinking replay — 12.6 s -> 1.45 s per all-params
                # step at 1080p depth-50 (BASELINE.md). The vg step is
                # two jits with a tiny host width sync between; Adam
                # update runs in its own small jit. With a mesh the
                # pixel batch (rpx/rpy/tgt above) is device_put-sharded
                # and GSPMD propagates the sharding through capture,
                # death-sort, and replay, inserting the gradient
                # all-reduce (test_shard_bwd.py pins equality with the
                # single-device grads).
                vg_step = make_tape_vg(tables, cfg, rpx, rpy, tgt,
                                       spp=spp)

                @jax.jit
                def upd(grads, opt_state, params):
                    updates, opt_state = optimizer.update(
                        grads, opt_state, params)
                    return optax.apply_updates(params, updates), opt_state

                history = []
                for k_ in range(steps):
                    s0 = float(k_ * spp if resample else 0)
                    loss, grads = vg_step(params, s0)
                    params, opt_state = upd(grads, opt_state, params)
                    history.append(float(loss))
                return {k: jax.tree_util.tree_map(np.asarray, v)
                        for k, v in params.items()}, history

            loss_fn = make_tape_loss_fn(tables, cfg, spp, px=rpx, py=rpy,
                                        target=tgt, n_valid=n_pix)
        else:
            from rt_tpu.diff.replay import make_replay_loss_fn

            loss_fn = make_replay_loss_fn(
                tables, cfg, spp, px=rpx, py=rpy,
                target=tgt, geom_spec=geom_spec, bwd_depth=bwd_depth,
                n_valid=n_pix)

        @jax.jit
        def step(params, opt_state, s0):
            loss, grads = jax.value_and_grad(loss_fn)(params, s0)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        history = []
        for k_ in range(steps):
            # resample=True rotates the sample window every step (true
            # SGD over fresh Monte-Carlo samples); with a fixed window
            # the optimizer eventually fits the FIXED sample noise (the
            # cover-scene mass recovery plateaus at ~0.10 median albedo
            # error fixed vs converging rotated — BASELINE.md)
            s0 = jnp.float32(k_ * spp if resample else 0)
            params, opt_state, loss = step(params, opt_state, s0)
            history.append(float(loss))
        return {k: jax.tree_util.tree_map(np.asarray, v)
                for k, v in params.items()}, history

    n_shards = int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
    px, py, n_pix = _padded_pixel_list(cfg.width, cfg.height, n_shards)
    flat_target = np.asarray(target_image, np.float32).reshape(-1, 3)
    pad = px.shape[0] - n_pix
    if pad:
        flat_target = np.concatenate(
            [flat_target, np.broadcast_to(flat_target[:1], (pad, 3))])

    px_j, py_j = jnp.asarray(px), jnp.asarray(py)
    tgt_j = jnp.asarray(flat_target)
    if mesh is not None:
        sh = pixel_sharding(mesh)
        px_j, py_j, tgt_j = (jax.device_put(x, sh)
                             for x in (px_j, py_j, tgt_j))

    step = make_train_step(tables, cfg, spp, optimizer, mesh,
                           n_valid=n_pix)
    history = []
    for k_ in range(steps):
        s0 = jnp.float32(k_ * spp if resample else 0)
        params, opt_state, loss = step(params, opt_state, px_j, py_j,
                                       tgt_j, s0)
        history.append(float(loss))
    return {k: jax.tree_util.tree_map(np.asarray, v)
            for k, v in params.items()}, history


def fit_fd(
    tables: SceneTables,
    cfg: RenderConfig,
    target_image: np.ndarray,
    fd_params,
    spp: int = 8,
    steps: int = 60,
    learning_rate: float = 2e-2,
    eps: float = 2e-2,
):
    """Geometry recovery via central differences with COMMON RANDOM
    NUMBERS + Adam.

    Detached-sampling reverse-mode cannot see the silhouette term of
    geometry parameters (moving a sphere mostly changes WHICH pixels it
    covers — a boundary integral with no interior gradient), so pure AD
    fails to recover positions. Central differences capture it, and
    because every sample is a pure function of (pixel, sample, bounce)
    coordinates (ops/rng.py), the +eps and -eps probes consume IDENTICAL
    random streams: the Monte-Carlo noise cancels exactly in the
    difference and the estimate is clean at low spp. This is the
    classic common-random-numbers estimator, practical here only
    because the RNG is counter-based.

    fd_params: {field: [component_index, ...]} — e.g.
    {"sph_center": [(0, 0), (0, 2)]} optimizes sphere 0's x and z.

    All 2K probe renders of a step run batched on-device through ONE
    dispatch (`lax.map` over a stacked probe pytree — one compile of the
    render reused by every probe), and the FD gradient + Adam update are
    computed on-device too: the whole step is a single jit call with a
    single scalar readback, vs the round-1 form's 2K+1 sequential
    renders each followed by a host sync (the VERDICT r1 #7 fix; ~10x
    wall-clock on the tunnel at K=3).

    Returns (params dict with optimized arrays, loss history)."""
    import optax

    tables = _device_tables(tables)
    n_pix = cfg.width * cfg.height
    pix = np.arange(n_pix, dtype=np.int32)
    px = jnp.asarray(pix % cfg.width)
    py = jnp.asarray(pix // cfg.width)
    tgt = jnp.asarray(np.asarray(target_image, np.float32).reshape(-1, 3))

    params = {f: jnp.asarray(getattr(tables, f), jnp.float32)
              for f in fd_params}
    flat_idx = _flatten_fd_components(fd_params)
    k = len(flat_idx)

    def loss_of(pp):
        tbl = apply_params(tables, pp)
        acc = render_block(tbl, cfg, px, py, jnp.uint32(0), spp,
                           jnp.uint32(cfg.seed), cfg.width, cfg.height)
        return jnp.mean((acc / jnp.float32(spp) - tgt) ** 2)

    optimizer = optax.adam(learning_rate)

    @jax.jit
    def step(params, opt_state):
        # [2K+1] losses: rows 2j/2j+1 per component, last = base row
        losses = jax.lax.map(
            loss_of, _stack_fd_probes(params, flat_idx, eps,
                                      base_row=True))
        grads = {f: jnp.zeros_like(v) for f, v in params.items()}
        for j, (f, idx) in enumerate(flat_idx):
            fd = (losses[2 * j] - losses[2 * j + 1]) / (2 * eps)
            grads[f] = grads[f].at[idx].set(fd)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, losses[-1]

    opt_state = optimizer.init(params)
    history = []
    for _ in range(steps):
        params, opt_state, base = step(params, opt_state)
        history.append(float(base))
    return {k2: np.asarray(v) for k2, v in params.items()}, history


def fit_camera(
    tables: SceneTables,
    cfg: RenderConfig,
    target_image: np.ndarray,
    init: Dict[str, object],
    recover: Sequence[str] = ("lookfrom",),
    spp: int = 8,
    steps: int = 120,
    learning_rate: float = 4e-3,
    eps=None,
):
    """CAMERA POSE recovery via common-random-numbers finite
    differences + Adam: find the thin-lens camera that produced a
    target image.

    The camera frame is differentiable end-to-end (CameraDef leaves are
    f32; `ops.camera.make_camera_jnp` chains raw pose into it, and the
    tape estimator's gradients through it equal scan-AD — test_tape).
    But pose recovery by interior gradients alone fails the same way
    sphere positions do: translating the camera translates the IMAGE,
    and a photometric shift loss is dominated by edge (winner-flip)
    terms that detached estimators drop. CRN central differences see
    them; with the counter RNG the +-eps probes consume identical
    sample streams, so the estimate is clean at low spp, and all
    2K+1 probes render batched in one `lax.map` (forward-only — any
    engine, megakernel included).

    init: the starting raw camera: {"lookfrom": [3], "lookat": [3],
    "vup": [3], "vfov_deg": float, "aperture": float, optional
    "focus_dist"}. `recover` lists which of lookfrom/lookat/vfov_deg/
    aperture to optimize (the rest stay at init). NOTE lookfrom-z and
    vfov are a near-gauge pair (dolly-zoom): recovering both from one
    view needs strong depth parallax in the scene.

    Returns (recovered init dict, loss history). The reference has no
    gradients and no pose estimation of any kind."""
    import optax

    from rt_tpu.ops.camera import make_camera_jnp

    tables = _device_tables(tables)
    n_pix = cfg.width * cfg.height
    pix = np.arange(n_pix, dtype=np.int32)
    px = jnp.asarray(pix % cfg.width)
    py = jnp.asarray(pix // cfg.width)
    tgt = jnp.asarray(np.asarray(target_image, np.float32).reshape(-1, 3))
    aspect = cfg.width / cfg.height

    spec = {"lookfrom": 3, "lookat": 3, "vfov_deg": 1, "aperture": 1}
    bad = set(recover) - set(spec)
    if bad:
        raise ValueError(f"recover must be among {sorted(spec)}; "
                         f"got {sorted(bad)}")
    slots = []  # (name, offset into raw vector)
    raw0 = []
    for name in recover:
        v = np.atleast_1d(np.asarray(init[name], np.float32))
        slots.append((name, len(raw0), v.size))
        raw0.extend(v.tolist())
    k = len(raw0)
    raw0 = jnp.asarray(raw0, jnp.float32)
    if eps is None:
        # degrees move the image ~50x less per unit than scene units
        eps = jnp.asarray(
            [2e-2 if n == "vfov_deg" else 2e-3
             for n, off, sz in slots for _ in range(sz)], jnp.float32)
    else:
        eps = jnp.broadcast_to(jnp.asarray(eps, jnp.float32), (k,))

    def camera_of(raw):
        vals = {n: jnp.asarray(init[n], jnp.float32)
                for n in ("lookfrom", "lookat", "vup", "vfov_deg",
                          "aperture")}
        for name, off, sz in slots:
            vals[name] = (raw[off] if sz == 1
                          else jax.lax.dynamic_slice(raw, (off,), (sz,)))
        return make_camera_jnp(vals["lookfrom"], vals["lookat"],
                               vals["vup"], vals["vfov_deg"], aspect,
                               vals["aperture"],
                               focus_dist=init.get("focus_dist"))

    def loss_of(raw):
        tbl = dataclasses.replace(tables, camera=camera_of(raw))
        acc = render_block(tbl, cfg, px, py, jnp.uint32(0), spp,
                           jnp.uint32(cfg.seed), cfg.width, cfg.height)
        return jnp.mean((acc / jnp.float32(spp) - tgt) ** 2)

    optimizer = optax.adam(learning_rate)

    @jax.jit
    def step(raw, opt_state):
        probes = jnp.broadcast_to(raw, (2 * k + 1, k))
        for j in range(k):
            probes = (probes.at[2 * j, j].add(eps[j])
                      .at[2 * j + 1, j].add(-eps[j]))
        losses = jax.lax.map(loss_of, probes)
        g = (losses[0:2 * k:2] - losses[1:2 * k:2]) / (2.0 * eps)
        updates, opt_state = optimizer.update(g, opt_state, raw)
        return optax.apply_updates(raw, updates), opt_state, losses[-1]

    opt_state = optimizer.init(raw0)
    raw, history = raw0, []
    for _ in range(steps):
        raw, opt_state, base = step(raw, opt_state)
        history.append(float(base))

    out = dict(init)
    raw_np = np.asarray(raw)
    for name, off, sz in slots:
        out[name] = (float(raw_np[off]) if sz == 1
                     else raw_np[off:off + sz].copy())
    return out, history


def fit_hybrid(
    tables: SceneTables,
    cfg: RenderConfig,
    target_image: np.ndarray,
    replay_fields: Sequence[str] = ("tex_color",),
    fd_params=None,
    spp: int = 4,
    fd_spp: Optional[int] = None,
    steps: int = 60,
    learning_rate: float = 3e-2,
    eps: float = 2e-2,
    bwd_depth: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    resample: bool = False,
) -> Tuple[Dict[str, np.ndarray], list]:
    """Joint radiometric + geometry recovery in ONE Adam loop
    (BASELINE.json config #5: "recover albedo + sphere positions from
    target image").

    Two estimators, one step, both O(B) memory:
      - `replay_fields` (albedo/emission/background) get the path-replay
        custom VJP (diff/replay.py) — analytic suffix adjoint, forward
        on cfg.engine (megakernel on TPU).
      - `fd_params` geometry components ({field: [component_idx, ...]},
        e.g. {"sph_center": [(0, 0), (0, 1)]}) get common-random-numbers
        central differences: detached-sampling AD drops the silhouette
        boundary term that DOMINATES position sensitivity (see fit_fd),
        so positions need FD; all 2K probes render batched on-device
        under one `lax.map`, noise cancelling exactly because the
        counter RNG gives +eps/-eps probes identical sample streams.

    The geometry fields ride the replay forward via a zero-direction
    geom_spec (their gradient rows come back zero and are overwritten by
    the FD estimates), so both estimators always see the SAME current
    parameter vector. One jit per step, one scalar readback.

    With a mesh, the pixel batch (and target rows) are sharded over all
    devices exactly like fit(method="replay"): GSPMD propagates the
    sharding through the replay loops AND the lax.map'd FD probes, and
    inserts the parameter-gradient / loss all-reduces (DP over ICI).

    The reference has no gradients of any kind; this subsystem is the
    capability BASELINE.json's north star adds on top of parity."""
    from rt_tpu.diff.replay import make_replay_loss_fn

    fd_params = dict(fd_params or {})
    fd_spp = spp if fd_spp is None else fd_spp
    tables = _device_tables(tables)
    optimizer = optax.adam(learning_rate)

    flat_tgt = np.asarray(target_image, np.float32).reshape(-1, 3)
    if mesh is None:
        n_pix = cfg.width * cfg.height
        pix = np.arange(n_pix, dtype=np.int32)
        px = jnp.asarray(pix % cfg.width)
        py = jnp.asarray(pix // cfg.width)
        tgt = jnp.asarray(flat_tgt)
    else:
        n_shards = int(np.prod(list(mesh.shape.values())))
        px_, py_, n_pix = _padded_pixel_list(cfg.width, cfg.height,
                                             n_shards)
        pad = px_.shape[0] - n_pix
        if pad:
            flat_tgt = np.concatenate(
                [flat_tgt, np.broadcast_to(flat_tgt[:1], (pad, 3))])
        sh = pixel_sharding(mesh)
        px, py, tgt = (jax.device_put(jnp.asarray(x), sh)
                       for x in (px_, py_, flat_tgt))

    params = extract_params(tables, tuple(replay_fields)
                            + tuple(fd_params))
    params = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
    opt_state = optimizer.init(params)

    replay_loss = make_replay_loss_fn(
        tables, cfg, spp, px=px, py=py, target=tgt,
        geom_spec={f: [] for f in fd_params}, bwd_depth=bwd_depth,
        n_valid=n_pix)

    flat_idx = _flatten_fd_components(fd_params)
    k = len(flat_idx)

    def fd_loss(pp, s0):
        tbl = apply_params(tables, pp)
        acc = render_block(tbl, cfg, px, py, s0.astype(jnp.uint32),
                           fd_spp,
                           jnp.uint32(cfg.seed), cfg.width, cfg.height)
        se = (acc / jnp.float32(fd_spp) - tgt) ** 2
        if n_pix == px.shape[0]:
            return jnp.mean(se)
        keep = (jnp.arange(se.shape[0]) < n_pix)[:, None]
        return jnp.sum(jnp.where(keep, se, 0.0)) / jnp.float32(3 * n_pix)

    @jax.jit
    def step(params, opt_state, s0):
        loss, grads = jax.value_and_grad(replay_loss)(params, s0)
        if k:
            losses = jax.lax.map(
                lambda pp: fd_loss(pp, s0),
                _stack_fd_probes(params, flat_idx, eps, base_row=False))
            for j, (f, idx) in enumerate(flat_idx):
                fd = (losses[2 * j] - losses[2 * j + 1]) / (2 * eps)
                grads[f] = grads[f].at[idx].set(fd)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    for k_ in range(steps):
        # rotate the sample window when resample=True (fresh Monte-
        # Carlo samples each step — see fit); CRN cancellation in the
        # FD probes is per-step, so rotation costs nothing there
        s0 = jnp.float32(k_ * max(spp, fd_spp) if resample else 0)
        params, opt_state, loss = step(params, opt_state, s0)
        history.append(float(loss))
    return {k2: np.asarray(v) for k2, v in params.items()}, history
