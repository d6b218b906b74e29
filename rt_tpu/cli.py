"""Command-line interface.

Covers both reference CLI surfaces:
  - the CUDA renderer's `-f <scene.json>` (gpu-version/main.cu:454-460),
  - the CPU renderers' `-w -h -d -spp` overrides
    (cpu-version/cpu-version/main.cpp:47-60).

plus subcommands for the coded scenes (gpu-version/main.cu `oldmain`) and
the animation drivers (blue.py / dna.py equivalents live in
rt_tpu.drivers and are also reachable from here).

Output: PNG (no gamma — matching write_image, gpu-version/color.cuh:15-35)
and/or PPM (sqrt gamma — matching write_color, color.cuh:43-95), chosen
by extension; `--view-gamma` applies sqrt to the PNG for direct viewing.
Timing is appended to rt_tpu-time.log, the analogue of the reference's
per-version .log regression files (SURVEY.md §5.1).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_render_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-f", "--scene", default=None,
                   help="scene JSON (reference schema); default: the coded "
                        "5-sphere scene like oldmain")
    p.add_argument("--coded", default=None,
                   choices=["three_sphere", "cover", "cover_lights",
                            "cornell", "dna"],
                   help="render a built-in coded scene instead of a JSON")
    p.add_argument("-w", "--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("-spp", "--spp", type=int, default=None)
    p.add_argument("-d", "--max-depth", type=int, default=None)
    p.add_argument("-o", "--output", default=None,
                   help="output path (.png or .ppm); default: scene's "
                        "output_file or main.png")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--view-gamma", action="store_true",
                   help="apply sqrt gamma to PNG output (the reference PNG "
                        "writer doesn't; PPM always does)")
    p.add_argument("--both-formats", action="store_true",
                   help="write BOTH .ppm and .png like the reference "
                        "jsonmain (gpu-version/main.cu:510-517)")
    p.add_argument("--sharded", action="store_true",
                   help="render over all local devices (mesh over pixel "
                        "tiles) instead of single-device tiling")
    p.add_argument("--progress", action="store_true")
    p.add_argument("--log", default="rt_tpu-time.log")
    p.add_argument("--engine", default="queue",
                   choices=["xla", "pallas", "mega", "queue"],
                   help="compute engine (default queue: persistent "
                        "ray-queue megakernel — occupancy never decays; "
                        "mega: segmented megakernel; both fall back to "
                        "the hybrid engine for unsupported scenes)")
    p.add_argument("--compact-every", type=int, default=None,
                   help="megakernel live-ray compaction segment length "
                        "(-1 auto schedule, 0 off; default: 4 for deep "
                        "renders, 0 for max_depth < 16)")
    p.add_argument("--cull", action="store_true", default=True,
                   help="megakernel spatial chunk culling (Morton-sorted "
                        "sphere chunks + per-tile AABB skip; default on)")
    p.add_argument("--no-cull", dest="cull", action="store_false")
    p.add_argument("--sampler", default="rng", choices=("rng", "qmc"),
                   help="sample sequence: counter-based pseudo-random "
                        "(rng, reference-equivalent default) or "
                        "Owen-scrambled Sobol' (qmc: lower error at "
                        "equal spp; runs in-kernel on every engine)")
    p.add_argument("--adaptive", action="store_true",
                   help="adaptive sampling: spend the spp budget on the "
                        "noisiest pixels (two-stage variance-driven "
                        "allocation; beyond-reference extension)")
    p.add_argument("--nee", action="store_true",
                   help="next-event estimation: area-sample one emissive "
                        "primitive per diffuse bounce + shadow ray "
                        "(variance reduction on light-driven scenes; an "
                        "opt-in extension beyond the reference's "
                        "semantics — runs in-kernel on every engine and "
                        "every light family)")
    p.add_argument("--mis", action="store_true",
                   help="balance-heuristic multiple importance sampling "
                        "over NEE + BSDF sampling (implies --nee): "
                        "variance stays bounded on large/near lights "
                        "where single-technique NEE loses; runs "
                        "in-kernel on every engine")
    p.add_argument("--nee-glossy", action="store_true",
                   help="extend NEE/MIS to fuzzy-metal bounces (their "
                        "own fuzz-ball density about the mirror "
                        "direction; implies --nee, pairs best with "
                        "--mis; in-kernel on every engine)")
    p.add_argument("--bvh", action="store_true",
                   help="build + traverse a BVH for every primitive "
                        "family (spheres/rects/cylinders/triangles)")
    p.add_argument("--taichi-uv", action="store_true",
                   help="replicate the Taichi reference's swapped "
                        "triangle-UV barycentrics (hittable.py:57-60,233) "
                        "for pixel-comparable textured-mesh renders")
    p.add_argument("--checkpoint", default=None,
                   help="progressive checkpoint file (.npz); resumes "
                        "exactly if it exists")
    p.add_argument("--checkpoint-every", type=int, default=32,
                   help="samples between checkpoint writes")


def _load(args):
    from rt_tpu.config import RenderConfig
    from rt_tpu.scene.parser import parse_scene
    from rt_tpu.scene import builders
    from rt_tpu.scene.types import build_tables

    if args.scene:
        sdef, cfg = parse_scene(args.scene)
        out = sdef.output_file
    else:
        name = args.coded or "three_sphere"
        mk = {
            "three_sphere": builders.three_sphere_scene,
            "cover": builders.cover_scene,
            "cover_lights": lambda **kw: builders.cover_scene(lights=True, **kw),
            "cornell": builders.cornell_spheres_scene,
            "dna": builders.dna_scene,
        }[name]
        sdef, cfg = mk()
        out = "main.png"

    if getattr(args, "taichi_uv", False):
        sdef.taichi_tri_uv = True

    updates = {}
    if args.width:
        updates["width"] = args.width
    if args.height:
        updates["height"] = args.height
    if args.spp:
        updates["samples_per_pixel"] = args.spp
    if args.max_depth:
        updates["max_depth"] = args.max_depth
    if args.seed:
        updates["seed"] = args.seed
    if updates:
        cfg = cfg.replace(**updates)
        for k, v in updates.items():
            if hasattr(sdef, k):
                setattr(sdef, k, v)
        if "width" in updates or "height" in updates:
            # re-derive the camera frame for the new aspect ratio the way
            # the JSON parser would (parser.hpp:113-141); see
            # SceneDef.resize for the deliberate deviation from the
            # reference CLI's fixed-16:9 camera quirk
            sdef.resize()
    return sdef, cfg, (args.output or out)


def _write_outputs(img, spp, out_path, both=False, view_gamma=False):
    """Write the image by extension; with both=True write BOTH the PPM
    and the PNG for one render, exactly like jsonmain
    (gpu-version/main.cu:510-517 calls output_image(...ppm) then
    write_image(...png))."""
    from rt_tpu.render import film
    from rt_tpu.io.image import write_image

    base = (out_path[:-4] if out_path.endswith((".png", ".ppm", ".jpg"))
            else out_path)
    paths = ([base + ".ppm", base + ".png"] if both else [out_path])
    for p in paths:
        if p.endswith(".ppm"):
            with open(p, "w") as f:
                f.write(film.to_ppm(img, spp))
        else:
            # PNG or (via Pillow) JPEG by extension
            write_image(p, film.finalize(img, spp, gamma=view_gamma))
    return paths


def cmd_render(args) -> int:
    from rt_tpu.render import film
    from rt_tpu.scene.types import build_tables

    sdef, cfg, out_path = _load(args)
    if args.engine:
        cfg = cfg.replace(engine=args.engine)
    ce = args.compact_every
    if ce is None and cfg.max_depth >= 16:
        # deep traces leave mostly-dead kernel tiles alive; the tapered
        # compaction schedule measured ~2x on depth-50 production shapes
        # (BASELINE.md round 2) and costs only extra compiles
        cfg = cfg.replace(compact_schedule=(2, 3, 5, 10),
                          compact_group=16)
    elif ce is not None:
        cfg = cfg.replace(compact_every=ce)
    cfg = cfg.replace(cull_chunks=args.cull)
    if getattr(args, "sampler", "rng") != "rng":
        cfg = cfg.replace(sampler=args.sampler)
    if getattr(args, "nee", False):
        cfg = cfg.replace(nee=True)
    if getattr(args, "mis", False):
        cfg = cfg.replace(nee=True, mis=True)
    if getattr(args, "nee_glossy", False):
        cfg = cfg.replace(nee=True, nee_glossy=True)
    tables = build_tables(
        sdef, bvh_types=("sphere", "rect", "cylinder", "triangle")
        if args.bvh else ())
    if args.bvh:
        cfg = cfg.replace(traversal="bvh")

    t0 = time.time()
    if args.checkpoint:
        from rt_tpu.render.progressive import render_progressive
        img, _ = render_progressive(
            tables, cfg, checkpoint_path=args.checkpoint,
            checkpoint_every=args.checkpoint_every,
            progress=args.progress)
    elif args.sharded:
        from rt_tpu.parallel.sharded import render_sharded_ex
        # the sharded renderer may round spp UP to the sample-axis size;
        # normalize by the spp actually rendered, not the requested one
        img, spp_actual = render_sharded_ex(tables, cfg,
                                            progress=args.progress)
        cfg = cfg.replace(samples_per_pixel=spp_actual)
    elif getattr(args, "adaptive", False):
        from rt_tpu.render.adaptive import adaptive_mean, render_adaptive
        acc, n = render_adaptive(tables, cfg, progress=args.progress)
        # per-pixel counts: hand the writers a mean scaled back to a
        # uniform-spp-sum shape so the 1/spp "write_color" scaling stays
        img = adaptive_mean(acc, n) * cfg.samples_per_pixel
    else:
        from rt_tpu.render.renderer import render
        img = render(tables, cfg, progress=args.progress)
    dt = time.time() - t0

    neg = film.negative_pixels(img)
    if neg:
        print(f"warning: {neg} pixels with negative radiance",
              file=sys.stderr)

    spp = cfg.samples_per_pixel
    _write_outputs(img, spp, out_path, both=args.both_formats,
                   view_gamma=args.view_gamma)

    # append-only timing log (the reference's *.log regression surface,
    # e.g. gpu-version/main.cu:338-345)
    with open(args.log, "a") as f:
        f.write(
            f"rt_tpu render, width {cfg.width} height {cfg.height} "
            f"spp {spp} depth {cfg.max_depth} "
            f"paths/s {cfg.width * cfg.height * spp / dt:.0f} "
            f"time: {dt:.3f} s\n")
    print(f"wrote {out_path} ({cfg.width}x{cfg.height} @ {spp}spp, "
          f"{dt:.2f}s)")
    return 0


def _parse_component(spec: str):
    """'sph_center:0,1' -> ('sph_center', (0, 1))."""
    field, _, idx = spec.partition(":")
    if not idx:
        raise SystemExit(f"--fd/--geom needs field:i[,j] — got {spec!r}")
    return field, tuple(int(i) for i in idx.split(","))


def cmd_fit(args) -> int:
    """Inverse rendering from the CLI: recover scene parameters so the
    render of --scene matches --target. The scene JSON is the INITIAL
    GUESS; the target fixes the resolution. The capability the whole
    reference family lacks (BASELINE.json north star)."""
    import os

    import numpy as np

    from rt_tpu.io.image import read_png
    from rt_tpu.render import film
    from rt_tpu.render.renderer import render
    from rt_tpu.scene.parser import parse_scene
    from rt_tpu.scene.types import build_tables
    from rt_tpu.io.image import write_png

    if args.target.endswith(".npz"):
        target = np.load(args.target)["img"].astype(np.float32)
    else:
        u8 = read_png(args.target).astype(np.float32) / 255.0
        target = u8[::-1]  # PNG is top-down; render rows start at bottom
        if not args.target_linear:
            target = target * target  # invert the sqrt view gamma
    h, w = target.shape[:2]

    sdef, cfg = parse_scene(args.scene)
    sdef.width, sdef.height = w, h
    sdef.resize()  # re-derive the camera for the target's aspect
    cfg = cfg.replace(width=w, height=h, loop="while")
    if getattr(args, "nee", False):
        cfg = cfg.replace(nee=True)
    if args.gradient_sky:
        cfg = cfg.replace(background_mode="gradient")
    if args.max_depth:
        cfg = cfg.replace(max_depth=args.max_depth)
    if args.engine:
        cfg = cfg.replace(engine=args.engine)
    else:
        import jax

        cfg = cfg.replace(
            engine="mega" if jax.default_backend() == "tpu" else "xla")

    mesh = None
    if args.sharded:
        from rt_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    tables = build_tables(sdef)
    replay_fields = tuple(f for f in args.fields.split(",") if f)
    fd_params: dict = {}
    for spec in args.fd:
        f, idx = _parse_component(spec)
        fd_params.setdefault(f, []).append(idx)
    geom_spec: dict = {}
    for spec in args.geom:
        f, idx = _parse_component(spec)
        geom_spec.setdefault(f, []).append(idx)
    if fd_params and geom_spec:
        raise SystemExit("--fd and --geom are mutually exclusive "
                         "(CRN-FD vs tangent-replay geometry)")

    if args.camera:
        # camera-pose recovery (fit_camera): the scene JSON's camera is
        # the initial guess; recovered pose re-derives the frame for the
        # after image. The reference family has no pose estimation.
        if fd_params or geom_spec:
            raise SystemExit("--camera is exclusive with --fd/--geom")
        from rt_tpu.diff.inverse import fit_camera

        p = sdef.camera_params
        init = {"lookfrom": p["lookfrom"], "lookat": p["lookat"],
                "vup": p["vup"], "vfov_deg": p["vfov"],
                "aperture": p["aperture"]}
        if "focus_dist" in p:
            init["focus_dist"] = p["focus_dist"]
        t0 = time.time()
        rec, hist = fit_camera(
            tables, cfg, target, init, recover=tuple(dict.fromkeys(
                args.camera)), spp=args.spp, steps=args.steps,
            learning_rate=args.lr)
        dt = time.time() - t0

        os.makedirs(args.out, exist_ok=True)
        np.savez_compressed(
            os.path.join(args.out, "recovered.npz"),
            **{k: np.asarray(v) for k, v in rec.items()})
        sdef.set_camera(rec["lookfrom"], rec["lookat"], rec["vup"],
                        rec["vfov_deg"], rec["aperture"],
                        rec.get("focus_dist"))
        after = render(build_tables(sdef), cfg) / cfg.samples_per_pixel
        write_png(os.path.join(args.out, "after.png"),
                  film.finalize(np.asarray(after), 1, gamma=True))
        print(f"loss: {hist[0]:.6f} -> {hist[-1]:.7f} "
              f"({args.steps} steps, {dt:.1f}s, {dt / args.steps:.2f}s/step)")
        for name in dict.fromkeys(args.camera):
            print(f"  {name}: {np.round(np.asarray(rec[name]), 5).tolist()}")
        print(f"wrote {args.out}/recovered.npz and {args.out}/after.png")
        return 0 if hist[-1] < hist[0] else 1

    t0 = time.time()
    if fd_params:
        from rt_tpu.diff.inverse import fit_hybrid

        rec, hist = fit_hybrid(
            tables, cfg, target, replay_fields=replay_fields,
            fd_params=fd_params, spp=args.spp, steps=args.steps,
            learning_rate=args.lr, eps=args.eps,
            bwd_depth=args.bwd_depth, mesh=mesh)
    else:
        from rt_tpu.diff.inverse import fit

        if args.method == "tape" and geom_spec:
            raise SystemExit(
                "--geom is a replay-method option; with --method tape "
                "list geometry tables directly in --fields "
                "(e.g. --fields sph_center,mat_albedo)")
        rec, hist = fit(
            tables, cfg, target, fields=replay_fields, spp=args.spp,
            steps=args.steps, learning_rate=args.lr, method=args.method,
            geom_spec=geom_spec or None, bwd_depth=args.bwd_depth,
            mesh=mesh)
    dt = time.time() - t0

    os.makedirs(args.out, exist_ok=True)
    np.savez_compressed(os.path.join(args.out, "recovered.npz"), **rec)
    from rt_tpu.diff.inverse import apply_params

    import jax.numpy as jnp

    fitted = apply_params(
        build_tables(sdef),
        {k: jnp.asarray(v, jnp.float32) for k, v in rec.items()})
    after = render(fitted, cfg) / cfg.samples_per_pixel
    write_png(os.path.join(args.out, "after.png"),
              film.finalize(np.asarray(after), 1, gamma=True))

    print(f"loss: {hist[0]:.6f} -> {hist[-1]:.7f} "
          f"({args.steps} steps, {dt:.1f}s, {dt / args.steps:.2f}s/step)")
    for f in sorted(rec):
        v = np.asarray(rec[f])
        flat = np.round(v.reshape(-1)[:6], 4)
        print(f"  {f}: shape {v.shape}, first values {flat.tolist()}")
    print(f"wrote {args.out}/recovered.npz and {args.out}/after.png")
    return 0 if hist[-1] < hist[0] else 1


def cmd_parse(args) -> int:
    """Parser smoke test — the reference's second CMake target, a binary
    that only runs parse_scene (gpu-version/parser.cu:1-4)."""
    from rt_tpu.scene.parser import parse_scene, scene_to_dict

    sdef, cfg = parse_scene(args.scene)
    print(json.dumps({
        "width": sdef.width, "height": sdef.height,
        "samples_per_pixel": sdef.samples_per_pixel,
        "max_depth": sdef.max_depth,
        "objects": len(sdef.objects), "materials": len(sdef.materials),
        "textures": len(sdef.textures), "output_file": sdef.output_file,
    }, indent=2))
    return 0


def cmd_animate(args) -> int:
    from rt_tpu.drivers.animate import run_animation
    return run_animation(args)


def main(argv=None) -> int:
    import os

    if os.environ.get("RT_TPU_FORCE_CPU"):
        # farmed worker processes run on CPU: the JAX_PLATFORMS env var
        # is ignored by the axon TPU plugin, so set the config knob
        # before any jax use (same trick as tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser(
        prog="rt_tpu", description="TPU-native path tracer")
    sub = ap.add_subparsers(dest="cmd", required=True)

    rp = sub.add_parser("render", help="render one frame")
    _add_render_args(rp)
    rp.set_defaults(fn=cmd_render)

    pp = sub.add_parser("parse", help="parse a scene JSON and summarize")
    pp.add_argument("scene")
    pp.set_defaults(fn=cmd_parse)

    fp = sub.add_parser(
        "fit", help="inverse rendering: recover scene parameters from a "
                    "target image (the scene JSON is the initial guess)")
    fp.add_argument("-f", "--scene", required=True)
    fp.add_argument("--target", required=True,
                    help="target image: .png (assumed sqrt view-gamma; "
                         "pass --target-linear for raw) or .npz with "
                         "'img' = mean radiance [H,W,3], row 0 = bottom")
    fp.add_argument("--target-linear", action="store_true")
    fp.add_argument("--fields", default="tex_color",
                    help="comma-separated radiometric fields for the "
                         "path-replay VJP (tex_color, mat_albedo, "
                         "tex_color2, background)")
    fp.add_argument("--fd", action="append", default=[],
                    help="geometry component for CRN finite differences "
                         "(sees silhouettes), field:i[,j] — repeatable, "
                         "e.g. --fd sph_center:0,0 --fd sph_center:0,2")
    fp.add_argument("--camera", action="append", default=[],
                    choices=["lookfrom", "lookat", "vfov_deg", "aperture"],
                    help="recover the named CAMERA POSE parameter via "
                         "CRN finite differences (fit_camera; repeatable; "
                         "the scene JSON's camera is the initial guess). "
                         "Exclusive with --fd/--geom/--fields")
    fp.add_argument("--geom", action="append", default=[],
                    help="geometry component for the forward-mode "
                         "tangent replay (interior chain only), same "
                         "syntax — e.g. --geom mat_ior:1")
    fp.add_argument("--method", default="replay",
                    choices=["replay", "tape", "ad"],
                    help="gradient estimator: 'replay' (path-replay "
                         "VJP — radiometric fields, O(B) memory, "
                         "fastest backward), 'tape' (winner-tape "
                         "reverse mode — EVERY continuous field incl. "
                         "whole geometry tables in one backward pass; "
                         "use for --fields sph_center etc.), 'ad' "
                         "(plain reverse-mode through the scan loop; "
                         "debug baseline)")
    fp.add_argument("-spp", "--spp", type=int, default=4)
    fp.add_argument("--steps", type=int, default=60)
    fp.add_argument("--lr", type=float, default=3e-2)
    fp.add_argument("--eps", type=float, default=2e-2,
                    help="CRN-FD probe half-step")
    fp.add_argument("--bwd-depth", type=int, default=None,
                    help="truncate the replay backward at this bounce "
                         "(~proportional speedup, ~0.4%% bias at 12/50)")
    fp.add_argument("-d", "--max-depth", type=int, default=None)
    fp.add_argument("--nee", action="store_true",
                    help="fit with next-event estimation on (both the "
                         "forward render and the gradient replays — "
                         "the adjoint megakernel and the winner tape "
                         "replay the direct term exactly)")
    fp.add_argument("--gradient-sky", action="store_true",
                    help="render with the gradient-sky background "
                         "(cover-scene family). NB: under a CONSTANT "
                         "background, direction-only parameters (fuzz, "
                         "ior) have zero interior-chain gradient — "
                         "every escaping path sees the same color")
    fp.add_argument("--engine", default=None,
                    choices=["xla", "pallas", "mega", "queue"],
                    help="forward engine for the loss render (the "
                         "replay/tape backward picks its own "
                         "intersector); default: mega on TPU, xla "
                         "elsewhere. queue = persistent ray-queue "
                         "megakernel (2x mega forward at the bench "
                         "shape)")
    fp.add_argument("--sharded", action="store_true",
                    help="shard the pixel batch over all local devices")
    fp.add_argument("--out", default="fit_out",
                    help="output dir (recovered.npz + after.png)")
    fp.set_defaults(fn=cmd_fit)

    anp = sub.add_parser("animate", help="render a frame sequence "
                         "(blue.py/dna.py-style video synthesis)")
    anp.add_argument("--kind", choices=["blue", "dna", "points", "dolly"],
                     default="dna")
    anp.add_argument("--frames", type=int, default=3)
    anp.add_argument("--start", type=int, default=0)
    anp.add_argument("--num-hosts", type=int, default=1,
                     help="frame-farm size: partition the frame range "
                          "across hosts (blue.py's per-GPU split)")
    anp.add_argument("--host-index", type=int, default=0)
    anp.add_argument("--retries", type=int, default=1,
                     help="per-frame retry count (frames are idempotent)")
    anp.add_argument("--engine", default="queue",
                     choices=["xla", "pallas", "mega", "queue"])
    anp.add_argument("--deg-per-frame", type=float, default=1.0)
    anp.add_argument("--outdir", default="frames")
    anp.add_argument("-w", "--width", type=int, default=400)
    anp.add_argument("--height", type=int, default=225)
    anp.add_argument("-spp", "--spp", type=int, default=16)
    anp.add_argument("-d", "--max-depth", type=int, default=16)
    anp.add_argument("--scene", default=None,
                     help="base scene JSON to mutate per frame (blue mode)")
    anp.add_argument("--points-dir", default=None,
                     help="per-frame point cloud dir (taichi points mode)")
    anp.add_argument("--obj", default=None, help="OBJ mesh (points mode)")
    anp.add_argument("--texture", default=None,
                     help="PNG image texture for the mesh (points mode; "
                          "e.g. the reference's asset/tex/bricks2.png)")
    anp.add_argument("--taichi-uv", action="store_true",
                     help="swapped-weight triangle UVs "
                          "(taichi-version/hittable.py:57-60,233) for "
                          "pixel-comparable frames vs the reference's "
                          "checked-in taichi-version/output/ JPGs")
    anp.add_argument("--farm", type=int, default=0,
                     help="one-command local process farm: spawn N "
                          "workers over the frame range and wait "
                          "(gpu-version/blue.py:24-35)")
    anp.add_argument("--farm-platform", default="cpu",
                     choices=["cpu", "inherit"],
                     help="backend for farmed workers (cpu default: the "
                          "TPU tunnel is single-process)")
    anp.add_argument("--format", default="png", choices=["png", "jpg"],
                     help="frame file format (jpg = the Taichi "
                          "reference's ti.imwrite frames, main.py:216)")
    anp.add_argument("--video", default=None,
                     help="assemble frames into a video after rendering "
                          "(.mp4 via ffmpeg when available, else MJPEG "
                          ".avi or .gif)")
    anp.add_argument("--fps", type=int, default=30)
    anp.set_defaults(fn=cmd_animate)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
