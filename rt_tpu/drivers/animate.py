"""Animation / video-synthesis drivers.

Reference equivalents:
  - "blue": mutate a base scene JSON, advancing every cylinder's rotation
    angle by N degrees per frame (gpu-version/blue.py:14-22 does +1°/frame
    for 360 frames, blue2.py +2° for 180).
  - "dna": regenerate the procedural rotating-ring scene per frame
    (gpu-version/dna.py:16-102).
  - "points": per-frame point-cloud mesh animation
    (taichi-version/main.py:152-216: reload asset/points/{i+1}.txt,
    rebuild the world, render).

The reference farms frames across 8 GPUs as independent processes
(blue.py:24-32). Here each frame is itself rendered data-parallel over
the whole device mesh (parallel/sharded.py), so frames run serially with
full utilization; multi-host animation jobs can still partition frame
ranges per host (--start/--frames) exactly like the reference's farm —
idempotent per-frame outputs make crashed batches resumable from the
last written frame (the reference's only recovery story, SURVEY.md §5.3).

Each frame's scene JSON is written next to its PNG before rendering, like
blue.py:20-22 — the on-disk scene is the checkpoint.
"""

from __future__ import annotations

import copy
import json
import os
import time


def _frame_cfg(args, cfg):
    cfg = cfg.replace(width=args.width, height=args.height,
                      samples_per_pixel=args.spp, max_depth=args.max_depth,
                      engine=getattr(args, "engine", "queue"),
                      # production launch width (bench.py's): the
                      # config default 1<<17 would split a 1080p
                      # spp-1000 frame into 16,000 launches — per-launch
                      # fixed costs (and the queue engine's per-launch
                      # pool drain + record sort) dwarf the render
                      rays_per_batch=max(cfg.rays_per_batch, 1 << 25))
    if cfg.max_depth >= 16:
        # deep traces: tapered live-ray compaction (BASELINE.md round 2)
        cfg = cfg.replace(compact_schedule=(2, 3, 5, 10), compact_group=16)
    return cfg


def _host_slice(args):
    """This host's contiguous frame slice of the farm
    (parallel/distributed.frame_range)."""
    from rt_tpu.parallel.distributed import frame_range

    n_hosts = getattr(args, "num_hosts", 1)
    h_idx = getattr(args, "host_index", 0)
    return frame_range(args.frames, n_hosts, h_idx, start=args.start)


def _with_retries(args, fn, frame_idx):
    """Per-frame retry (frames are idempotent: scene JSON + PNG outputs,
    SURVEY.md §5.3 — the reference's whole recovery story is re-running
    a frame)."""
    retries = getattr(args, "retries", 1)
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception:
            if attempt >= retries:
                raise
            print(f"frame {frame_idx}: retry {attempt + 1}", flush=True)


class FramePipeline:
    """Overlap frame i's image download + PNG encode with frame i+1's
    device compute (single-device path).

    `submit` dispatches the next frame's render asynchronously
    (`render(..., device_out=True)` — all launches enqueue without a
    host sync) and only THEN downloads/writes the previous frame, so
    the D2H transfer and PNG encode hide behind the new frame's
    compute. This matters doubly in this environment, where D2H runs at
    4-16 MB/s (BASELINE.md "tunnel artifact"); on a production host it
    still hides the PNG encode. If a frame's download/compute fails,
    `flush` re-renders it synchronously once (frames are idempotent —
    the reference's recovery model, SURVEY.md §5.3); if that also
    fails, the frame stays pending and the error propagates, so a
    persistently failing frame is retried (by the next submit/flush)
    until the driver's retry budget is spent — never silently dropped.

    The wall-clock a frame spends from submit to its PNG landing is
    reported by flush as (path, seconds); drivers log that rather than
    timing submit (which measures the PREVIOUS frame's residual
    compute + download, not the submitted frame's)."""

    def __init__(self):
        self._pending = None

    def submit(self, tables, cfg, path):
        from rt_tpu.render.renderer import render

        img = render(tables, cfg, device_out=True)  # async dispatch
        # flush AFTER dispatching so the previous frame's download
        # overlaps this frame's compute. If flush raises, the old frame
        # stays pending (retried by the next flush) and this dispatch
        # is discarded — frames are idempotent, the driver's retry
        # re-submits it.
        prev = self.flush()
        self._pending = (img, tables, cfg, path, time.time())
        return prev

    def flush(self):
        """Download + write the in-flight frame, if any. Returns
        (path, in_flight_seconds) or None. On failure the frame stays
        pending (a later flush retries it) and the error propagates."""
        if self._pending is None:
            return None
        import numpy as np

        from rt_tpu.render import film
        from rt_tpu.io.image import write_image

        img, tables, cfg, path, t0 = self._pending
        try:
            host = np.asarray(img)
        except Exception:
            from rt_tpu.render.renderer import render
            host = render(tables, cfg)  # sync retry
        write_image(path, film.finalize(host, cfg.samples_per_pixel,
                                        gamma=True))
        self._pending = None
        return path, time.time() - t0


def _log_done(done):
    """Print a completed pipelined frame's wall-clock (submit -> PNG)."""
    if done is not None:
        print(f"wrote {os.path.basename(done[0])}: {done[1]:.2f}s "
              "in flight", flush=True)


def _render_frame(tables, cfg, path, progress=False, pipeline=None,
                  t0=None):
    import jax

    from rt_tpu.render import film
    from rt_tpu.io.image import write_image

    spp = cfg.samples_per_pixel
    if len(jax.devices()) > 1:
        from rt_tpu.parallel.sharded import render_sharded_ex
        # normalize by the spp actually rendered (rounded up to the
        # sample-axis size), not the requested one
        img, spp = render_sharded_ex(tables, cfg)
    elif pipeline is not None:
        # async: the line printed here is the PREVIOUS frame completing
        # (timing this call would measure the wrong frame's work)
        _log_done(pipeline.submit(tables, cfg, path))
        return
    else:
        from rt_tpu.render.renderer import render
        img = render(tables, cfg, progress=progress)
    write_image(path, film.finalize(img, spp, gamma=True))
    if t0 is not None:
        print(f"wrote {os.path.basename(path)}: "
              f"{time.time() - t0:.2f}s", flush=True)


def run_blue(args) -> int:
    """Per-frame JSON mutation: cylinders' rotate.angle += deg_per_frame
    (gpu-version/blue.py:17-19)."""
    from rt_tpu.scene.parser import parse_scene_dict
    from rt_tpu.scene.types import build_tables

    if args.scene is None:
        raise SystemExit("--scene required for blue mode")
    with open(args.scene) as f:
        base = json.load(f)
    os.makedirs(args.outdir, exist_ok=True)

    lo, hi = _host_slice(args)
    pipe = FramePipeline()
    for i in range(lo, hi):
        data = copy.deepcopy(base)
        objs = data.get("object", {})
        rows = objs.get("data", objs if isinstance(objs, list) else [])
        for obj in rows:
            if obj.get("type") == "cylinder" and "rotate" in obj:
                obj["rotate"]["angle"] = (
                    obj["rotate"].get("angle", 0.0)
                    + args.deg_per_frame * i)
        out_path = os.path.join(args.outdir, f"frame_{i:04d}.{_ext(args)}")
        if os.path.exists(out_path):
            continue  # idempotent resume: rerun the same command after
            # a crash and finished frames are skipped (SURVEY.md 5.3)
        scene_path = os.path.join(args.outdir, f"scene_{i:04d}.json")
        with open(scene_path, "w") as f:
            json.dump(data, f)
        sdef, cfg = parse_scene_dict(
            data, base_dir=os.path.dirname(args.scene) or ".")
        cfg = _frame_cfg(args, cfg)
        # the frame config overrides the parsed scene's dimensions:
        # re-derive the camera for the new aspect (SceneDef.resize)
        sdef.resize(args.width, args.height)
        _with_retries(args, lambda: _render_frame(
            build_tables(sdef), cfg, out_path,
            pipeline=pipe, t0=time.time()), i)
    _log_done(pipe.flush())
    return 0


def run_dna(args) -> int:
    """Procedural ring scene, one render per frame angle
    (gpu-version/dna.py:103-113 renders frames serially and times them)."""
    from rt_tpu.scene.builders import dna_scene
    from rt_tpu.scene.types import build_tables

    os.makedirs(args.outdir, exist_ok=True)
    t_all = time.time()
    lo, hi = _host_slice(args)
    pipe = FramePipeline()
    for i in range(lo, hi):
        sdef, cfg = dna_scene(angle_deg=args.deg_per_frame * i,
                              width=args.width, height=args.height,
                              spp=args.spp, max_depth=args.max_depth)
        cfg = _frame_cfg(args, cfg)
        _with_retries(args, lambda: _render_frame(
            build_tables(sdef), cfg,
            os.path.join(args.outdir, f"frame_{i:04d}.{_ext(args)}"),
            pipeline=pipe, t0=time.time()), i)
    _log_done(pipe.flush())
    print(f"total: {time.time() - t_all:.2f}s")
    return 0


def run_points(args) -> int:
    """Taichi dynamic-mesh animation: frame i loads {points_dir}/{i+1}.txt
    as the mesh vertex positions (taichi-version/main.py:205-216)."""
    from rt_tpu.scene.assets import readdynamic
    from rt_tpu.scene.builders import mesh_scene
    from rt_tpu.scene.types import build_tables

    if args.obj is None or args.points_dir is None:
        raise SystemExit("--obj and --points-dir required for points mode")
    os.makedirs(args.outdir, exist_ok=True)
    lo, hi = _host_slice(args)
    pipe = FramePipeline()
    for i in range(lo, hi):
        out_path = os.path.join(args.outdir, f"out{i}.{_ext(args)}")
        if os.path.exists(out_path):
            continue  # idempotent resume
        pts = readdynamic(os.path.join(args.points_dir, f"{i + 1}.txt"))
        sdef, cfg = mesh_scene(args.obj, width=args.width,
                               height=args.height, spp=args.spp,
                               max_depth=args.max_depth, points=pts,
                               texture_path=getattr(args, "texture", None))
        if getattr(args, "taichi_uv", False):
            sdef.taichi_tri_uv = True  # pixel-comparable vs taichi output/
        cfg = _frame_cfg(args, cfg)
        _render_frame(build_tables(sdef), cfg, out_path,
                      pipeline=pipe, t0=time.time())
    _log_done(pipe.flush())
    return 0


def run_dolly(args) -> int:
    """Camera-dolly animation: the naive tracer moves its camera along a
    parabola z -> (x, -0.2 + 0.0375*(z-4)^2, z) between progressive
    renders (朴素光线追踪/4_0_path_tracing.py:135-150). Per frame the
    camera is rebuilt and the cornell-spheres scene re-rendered."""
    from rt_tpu.scene.builders import cornell_spheres_scene
    from rt_tpu.scene.types import build_tables

    os.makedirs(args.outdir, exist_ok=True)
    lo, hi = _host_slice(args)
    pipe = FramePipeline()
    for i in range(lo, hi):
        z = -5.0 + 0.5 * i * args.deg_per_frame
        y = -0.2 + 0.0375 * (z - 4.0) ** 2
        sdef, cfg = cornell_spheres_scene(width=args.width,
                                          height=args.height,
                                          spp=args.spp,
                                          max_depth=args.max_depth)
        sdef.set_camera(lookfrom=(0, y, z), lookat=(0, 0.6, 0),
                        vup=(0, 1, 0), vfov_deg=60.0, aperture=0.0)
        cfg = _frame_cfg(args, cfg)
        _with_retries(args, lambda: _render_frame(
            build_tables(sdef), cfg,
            os.path.join(args.outdir, f"dolly_{i:04d}.{_ext(args)}"),
            pipeline=pipe, t0=time.time()), i)
    _log_done(pipe.flush())
    return 0


def _ext(args) -> str:
    """Frame file extension. Default PNG; --format jpg gives the Taichi
    reference's frame format (ti.imwrite out{i}.jpg, main.py:216)."""
    return getattr(args, "format", "png") or "png"


_FRAME_GLOBS = {"blue": "frame_*.{ext}", "dna": "frame_*.{ext}",
                "points": "out*.{ext}", "dolly": "dolly_*.{ext}"}


def _farm(args) -> int:
    """One-command local process farm: spawn N worker processes, each
    rendering a contiguous slice of the frame range, and `wait` on all of
    them — the blue.py pipeline (gpu-version/blue.py:24-35: 8 concurrent
    renderer processes, batched shell `wait`, abort on nonzero exit).
    Workers default to the CPU backend: frames are embarrassingly
    parallel across processes, and the TPU tunnel admits one process at
    a time (a multi-chip host would instead shard devices per worker
    like CUDA_VISIBLE_DEVICES)."""
    import subprocess
    import sys

    n = args.farm
    cmd_base = [sys.executable, "-m", "rt_tpu", "animate",
                "--kind", args.kind, "--frames", str(args.frames),
                "--start", str(args.start),
                "--deg-per-frame", str(args.deg_per_frame),
                "--outdir", args.outdir, "-w", str(args.width),
                "--height", str(args.height), "-spp", str(args.spp),
                "-d", str(args.max_depth), "--engine", args.engine,
                "--retries", str(args.retries), "--num-hosts", str(n)]
    for opt in ("scene", "points_dir", "obj", "texture"):
        v = getattr(args, opt, None)
        if v:
            cmd_base += [f"--{opt.replace('_', '-')}", v]
    if getattr(args, "taichi_uv", False):
        cmd_base.append("--taichi-uv")
    if _ext(args) != "png":
        cmd_base += ["--format", _ext(args)]
    env = dict(os.environ)
    if getattr(args, "farm_platform", "cpu") == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        env["RT_TPU_FORCE_CPU"] = "1"
    procs = [subprocess.Popen(cmd_base + ["--host-index", str(i)], env=env)
             for i in range(n)]
    rc = 0
    for i, p in enumerate(procs):
        code = p.wait()
        if code != 0:  # blue.py:33-35 aborts the batch on nonzero exit
            print(f"worker {i} failed with exit code {code}", flush=True)
            rc = code
    return rc


def run_animation(args) -> int:
    if getattr(args, "farm", 0) and getattr(args, "host_index", 0) == 0 \
            and getattr(args, "num_hosts", 1) == 1:
        rc = _farm(args)
    else:
        rc = {"blue": run_blue, "dna": run_dna, "points": run_points,
              "dolly": run_dolly}[args.kind](args)
    if rc == 0 and getattr(args, "video", None):
        # assemble the frame sequence into a playable video ("video
        # synthesis", README.md:16 — the goal the reference's drivers
        # stop one step short of)
        import glob

        from rt_tpu.io.video import assemble_video

        frames = glob.glob(os.path.join(
            args.outdir, _FRAME_GLOBS[args.kind].format(ext=_ext(args))))
        written = assemble_video(frames, args.video,
                                 fps=getattr(args, "fps", 30))
        print(f"wrote {written} ({len(frames)} frames)", flush=True)
    return rc
