"""CLI + animation driver coverage (the reference's argv surfaces and
blue.py/dna.py pipelines, SURVEY.md G19/G25/L9)."""

import json
import os

import numpy as np
import pytest

from rt_tpu.cli import main
from rt_tpu.io.image import read_png


def test_render_coded_scene_png(tmp_path):
    out = str(tmp_path / "o.png")
    log = str(tmp_path / "t.log")
    rc = main(["render", "--coded", "three_sphere", "-w", "32", "--height",
               "18", "-spp", "2", "-d", "3", "-o", out, "--view-gamma",
               "--log", log])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (18, 32, 3)
    assert "paths/s" in open(log).read()


def test_render_scene_json_ppm(tmp_path):
    out = str(tmp_path / "o.ppm")
    rc = main(["render", "-f", "scenes/demo_scene.json", "-w", "32",
               "--height", "18", "-spp", "1", "-d", "2", "-o", out,
               "--log", str(tmp_path / "t.log")])
    assert rc == 0
    head = open(out).read(20).split()
    assert head[0] == "P3" and head[1] == "32" and head[2] == "18"


def test_render_with_checkpoint(tmp_path):
    out = str(tmp_path / "o.png")
    ck = str(tmp_path / "ck.npz")
    rc = main(["render", "--coded", "three_sphere", "-w", "24", "--height",
               "12", "-spp", "4", "-d", "3", "-o", out,
               "--checkpoint", ck, "--checkpoint-every", "2",
               "--log", str(tmp_path / "t.log")])
    assert rc == 0
    assert os.path.exists(ck)


def test_parse_subcommand(capsys):
    rc = main(["parse", "scenes/demo_scene.json"])
    assert rc == 0
    data = json.loads(capsys.readouterr().out)
    assert data["objects"] == 7


def test_animate_dna(tmp_path):
    outdir = str(tmp_path / "frames")
    rc = main(["animate", "--kind", "dna", "--frames", "2",
               "--deg-per-frame", "5", "--outdir", outdir,
               "-w", "24", "--height", "12", "-spp", "1", "-d", "2"])
    assert rc == 0
    assert os.path.exists(os.path.join(outdir, "frame_0000.png"))
    assert os.path.exists(os.path.join(outdir, "frame_0001.png"))


def test_animate_blue_mutates_cylinders(tmp_path):
    outdir = str(tmp_path / "frames")
    rc = main(["animate", "--kind", "blue", "--scene",
               "scenes/demo_scene.json", "--frames", "2", "--start", "1",
               "--deg-per-frame", "3", "--outdir", outdir,
               "-w", "24", "--height", "12", "-spp", "1", "-d", "2"])
    assert rc == 0
    s1 = json.load(open(os.path.join(outdir, "scene_0001.json")))
    s2 = json.load(open(os.path.join(outdir, "scene_0002.json")))

    def angle(s):
        for o in s["object"]["data"]:
            if o["type"] == "cylinder":
                return o["rotate"]["angle"]

    assert angle(s2) - angle(s1) == pytest.approx(3.0)
    assert os.path.exists(os.path.join(outdir, "frame_0002.png"))


def test_width_override_rebuilds_camera():
    """-w/--height overrides must re-derive the camera for the new
    aspect (SceneDef.resize) instead of stretching the original frame.
    (Deliberate deviation from the reference CPU CLI's fixed-16:9 camera,
    cmake-cpu-version/main.cpp:64,94 — see ADVICE round 1.)"""
    from rt_tpu.scene.builders import three_sphere_scene

    sdef, _ = three_sphere_scene(width=32, height=18, spp=1, max_depth=2)

    def frame_aspect(s):
        h = np.linalg.norm(np.asarray(s.camera.horizontal))
        v = np.linalg.norm(np.asarray(s.camera.vertical))
        return h / v

    assert frame_aspect(sdef) == pytest.approx(32 / 18, rel=1e-5)
    sdef.resize(width=64, height=16)
    assert frame_aspect(sdef) == pytest.approx(64 / 16, rel=1e-5)


def test_resize_preserves_explicit_focus_dist():
    """Explicit focus_dist must survive resize + JSON round trips (the
    schema derives |lookfrom-lookat| only when absent)."""
    from rt_tpu.scene.parser import parse_scene_dict, scene_to_dict
    from rt_tpu.scene.types import SceneDef

    s = SceneDef(width=32, height=18)
    s.set_camera((13, 2, 3), (0, 0, 0), (0, 1, 0), 20.0, 0.1,
                 focus_dist=10.0)
    frame0 = np.linalg.norm(np.asarray(s.camera.horizontal))
    d = scene_to_dict(s)
    assert d["camera"]["focus_dist"] == pytest.approx(10.0)
    s2, _ = parse_scene_dict(d)
    np.testing.assert_allclose(np.asarray(s2.camera.horizontal),
                               np.asarray(s.camera.horizontal), rtol=1e-6)
    s.resize(width=64, height=36)  # same aspect: frame scale unchanged
    assert np.linalg.norm(np.asarray(s.camera.horizontal)) == pytest.approx(
        frame0, rel=1e-5)


def test_both_formats_writes_ppm_and_png(tmp_path):
    out = str(tmp_path / "o.png")
    rc = main(["render", "--coded", "three_sphere", "-w", "24", "--height",
               "12", "-spp", "1", "-d", "2", "-o", out, "--both-formats",
               "--engine", "xla", "--log", str(tmp_path / "t.log")])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "o.png"))
    assert os.path.exists(str(tmp_path / "o.ppm"))
    head = open(str(tmp_path / "o.ppm")).read(20).split()
    assert head[0] == "P3" and head[1] == "24"


def test_cli_golden_image(tmp_path):
    """Regression-pin the WHOLE CLI path (parse -> render -> film ->
    gamma -> PNG codec) against a checked-in golden render. Catches
    film/gamma/codec regressions the unit tests can't (VERDICT r1 #9)."""
    golden_path = os.path.join(os.path.dirname(__file__), "golden",
                               "cli_three_sphere_32x18.npz")
    out = str(tmp_path / "o.png")
    rc = main(["render", "--coded", "three_sphere", "-w", "32", "--height",
               "18", "-spp", "4", "-d", "4", "-o", out, "--view-gamma",
               "--engine", "xla", "--log", str(tmp_path / "t.log")])
    assert rc == 0
    img = read_png(out).astype(np.int32)
    if not os.path.exists(golden_path):  # first run: record the golden
        os.makedirs(os.path.dirname(golden_path), exist_ok=True)
        np.savez_compressed(golden_path, img=img.astype(np.uint8))
        pytest.skip("golden recorded")
    golden = np.load(golden_path)["img"].astype(np.int32)
    # allow +-2/255 per channel for benign float reassociation
    assert np.abs(img - golden).max() <= 2


def test_animate_farm_and_video(tmp_path):
    """One-command process farm (blue.py:24-35 analogue) + video
    synthesis: 2 workers render disjoint frame slices, then the parent
    assembles a playable MJPEG AVI (no ffmpeg in this image)."""
    outdir = str(tmp_path / "frames")
    video = str(tmp_path / "anim.avi")
    rc = main(["animate", "--kind", "dna", "--frames", "2",
               "--deg-per-frame", "10", "--outdir", outdir,
               "-w", "24", "--height", "12", "-spp", "1", "-d", "2",
               "--engine", "xla", "--farm", "2", "--video", video])
    assert rc == 0
    assert os.path.exists(os.path.join(outdir, "frame_0000.png"))
    assert os.path.exists(os.path.join(outdir, "frame_0001.png"))
    with open(video, "rb") as f:
        head = f.read(12)
    assert head[:4] == b"RIFF" and head[8:12] == b"AVI "
    # the index must reference both frames
    data = open(video, "rb").read()
    assert data.count(b"00dc") >= 4  # 2 movi chunks + 2 idx1 entries


def test_mjpeg_avi_writer_structure(tmp_path):
    from rt_tpu.io.video import write_mjpeg_avi

    out = str(tmp_path / "t.avi")
    fake_jpeg = b"\xff\xd8\xff\xe0" + b"x" * 33 + b"\xff\xd9"  # odd length
    write_mjpeg_avi(out, [fake_jpeg, fake_jpeg], 8, 6, fps=10)
    data = open(out, "rb").read()
    assert data[:4] == b"RIFF"
    # RIFF size must match the file exactly (even-padding handled)
    import struct
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert b"MJPG" in data and b"idx1" in data


def test_frame_pipeline_matches_sync(tmp_path):
    """FramePipeline (async download overlap, drivers/animate.py) writes
    byte-identical PNGs to the synchronous path, including the final
    flush()ed frame."""
    from rt_tpu.drivers.animate import FramePipeline
    from rt_tpu.render import film
    from rt_tpu.render.renderer import render
    from rt_tpu.io.image import write_png
    from rt_tpu.scene.builders import three_sphere_scene
    from rt_tpu.scene.types import build_tables

    pipe = FramePipeline()
    paths = []
    for i in range(3):
        sdef, cfg = three_sphere_scene(width=24, height=16, spp=2,
                                       max_depth=3)
        cfg = cfg.replace(seed=i)
        tables = build_tables(sdef)
        p = tmp_path / f"pipe_{i}.png"
        prev = pipe.submit(tables, cfg, str(p))
        if i == 0:
            assert prev is None
        else:
            assert prev[0].endswith(f"pipe_{i-1}.png") and prev[1] >= 0.0
        sync = film.finalize(render(tables, cfg), cfg.samples_per_pixel,
                             gamma=True)
        write_png(str(tmp_path / f"sync_{i}.png"), sync)
        paths.append(p)
    assert pipe.flush()[0].endswith("pipe_2.png")
    assert pipe.flush() is None
    for i, p in enumerate(paths):
        a = read_png(str(p))
        b = read_png(str(tmp_path / f"sync_{i}.png"))
        np.testing.assert_array_equal(a, b)


def test_frame_pipeline_failure_keeps_frame_pending(tmp_path, monkeypatch):
    """A frame whose download AND sync re-render both fail stays
    pending (error propagates, frame is NOT silently dropped); once the
    fault clears, the next flush writes it."""
    from rt_tpu.drivers import animate
    from rt_tpu.drivers.animate import FramePipeline
    from rt_tpu.scene.builders import three_sphere_scene
    from rt_tpu.scene.types import build_tables
    import rt_tpu.render.renderer as renderer_mod

    sdef, cfg = three_sphere_scene(width=24, height=16, spp=2, max_depth=3)
    tables = build_tables(sdef)
    pipe = FramePipeline()
    p = tmp_path / "f0.png"
    assert pipe.submit(tables, cfg, str(p)) is None

    class Poison:
        def __array__(self, *a, **k):
            raise RuntimeError("download failed")

    good_img, *rest = pipe._pending
    pipe._pending = (Poison(), *rest)
    real_render = renderer_mod.render

    def broken_render(*a, **k):
        raise RuntimeError("device failed")

    monkeypatch.setattr(renderer_mod, "render", broken_render)
    with pytest.raises(RuntimeError):
        pipe.flush()
    assert pipe._pending is not None  # frame retained, not dropped
    monkeypatch.setattr(renderer_mod, "render", real_render)
    done = pipe.flush()  # sync re-render path succeeds now
    assert done[0].endswith("f0.png") and p.exists()
    assert pipe.flush() is None


def test_cli_fit_recovers_albedo(tmp_path):
    """`rt_tpu fit`: the inverse-rendering surface from the CLI. Target
    rendered from a true scene, the perturbed-albedo scene JSON is the
    initial guess; the replay-VJP fit must pull the loss down and move
    the albedo toward truth, writing recovered.npz + after.png."""
    from rt_tpu.config import RenderConfig
    from rt_tpu.render.renderer import render
    from rt_tpu.scene.parser import scene_to_dict
    from rt_tpu.scene.types import SceneDef, build_tables

    def make(albedo):
        s = SceneDef(width=32, height=18, samples_per_pixel=4, max_depth=3,
                     background=(0.7, 0.8, 1.0))
        s.add_sphere((0, 0, -1), 0.5, s.add_lambertian_color(albedo))
        s.add_sphere((0, -100.5, -1), 100,
                     s.add_lambertian_color((0.6, 0.6, 0.6)))
        s.set_camera((0, 0.2, 1), (0, 0, -1), (0, 1, 0), 50, 0.0)
        return s

    true_albedo = (0.7, 0.2, 0.2)
    cfg = RenderConfig(width=32, height=18, samples_per_pixel=8,
                       max_depth=3, loop="while")
    target = np.asarray(render(build_tables(make(true_albedo)), cfg)) / 8.0
    tgt_path = str(tmp_path / "target.npz")
    np.savez_compressed(tgt_path, img=target.astype(np.float32))

    scene_path = str(tmp_path / "wrong.json")
    d = scene_to_dict(make((0.3, 0.5, 0.4)))
    with open(scene_path, "w") as f:
        json.dump(d, f)

    outdir = str(tmp_path / "fit_out")
    rc = main(["fit", "-f", scene_path, "--target", tgt_path,
               "--fields", "tex_color", "-spp", "8", "--steps", "25",
               "--lr", "5e-2", "--engine", "xla", "--out", outdir])
    assert rc == 0
    rec = np.load(os.path.join(outdir, "recovered.npz"))
    assert os.path.exists(os.path.join(outdir, "after.png"))
    assert np.abs(rec["tex_color"][0] - np.asarray(true_albedo)).max() < 0.12


def test_cli_fit_hybrid_position(tmp_path):
    """`rt_tpu fit --fd`: the CLI's hybrid path (replay VJP albedo +
    CRN-FD geometry) parses component specs and recovers a shifted
    sphere from an .npz target."""
    from rt_tpu.config import RenderConfig
    from rt_tpu.render.renderer import render
    from rt_tpu.scene.parser import scene_to_dict
    from rt_tpu.scene.types import SceneDef, build_tables

    def make(cx):
        s = SceneDef(width=48, height=27, samples_per_pixel=8, max_depth=3,
                     background=(0.7, 0.8, 1.0))
        s.add_sphere((cx, 0, -1), 0.5,
                     s.add_lambertian_color((0.7, 0.2, 0.2)))
        s.add_sphere((0, -100.5, -1), 100,
                     s.add_lambertian_color((0.6, 0.6, 0.6)))
        s.set_camera((0, 0.3, 1), (0, 0, -1), (0, 1, 0), 50, 0.0)
        return s

    cfg = RenderConfig(width=48, height=27, samples_per_pixel=8,
                       max_depth=3, loop="while")
    target = np.asarray(render(build_tables(make(0.15)), cfg)) / 8.0
    tgt_path = str(tmp_path / "t.npz")
    np.savez_compressed(tgt_path, img=target.astype(np.float32))
    scene_path = str(tmp_path / "w.json")
    with open(scene_path, "w") as f:
        json.dump(scene_to_dict(make(-0.1)), f)

    outdir = str(tmp_path / "out")
    rc = main(["fit", "-f", scene_path, "--target", tgt_path,
               "--fields", "tex_color", "--fd", "sph_center:0,0",
               "-spp", "8", "--steps", "40", "--lr", "3e-2",
               "--engine", "xla", "--out", outdir])
    assert rc == 0
    rec = np.load(os.path.join(outdir, "recovered.npz"))
    assert abs(rec["sph_center"][0, 0] - 0.15) < 0.05


def test_cli_fit_camera_pose(tmp_path):
    """`rt_tpu fit --camera lookfrom`: CLI camera-pose recovery. The
    scene JSON's camera is the initial (wrong) guess; CRN-FD pulls
    lookfrom back toward the pose that rendered the target."""
    from rt_tpu.config import RenderConfig
    from rt_tpu.render.renderer import render
    from rt_tpu.scene.parser import scene_to_dict
    from rt_tpu.scene.types import SceneDef, build_tables

    def make(lookfrom):
        s = SceneDef(width=48, height=27, samples_per_pixel=8, max_depth=3,
                     background=(0.7, 0.8, 1.0))
        s.add_sphere((0, 0, -1), 0.5, s.add_lambertian_color((0.7, 0.2, 0.2)))
        s.add_sphere((0, -100.5, -1), 100,
                     s.add_lambertian_color((0.6, 0.6, 0.6)))
        s.set_camera(lookfrom, (0, 0, -1), (0, 1, 0), 50, 0.0)
        return s

    true_from = (0.0, 0.2, 1.0)
    cfg = RenderConfig(width=48, height=27, samples_per_pixel=8,
                       max_depth=3, loop="while")
    target = np.asarray(render(build_tables(make(true_from)), cfg)) / 8.0
    tgt_path = str(tmp_path / "t.npz")
    np.savez_compressed(tgt_path, img=target.astype(np.float32))
    scene_path = str(tmp_path / "w.json")
    with open(scene_path, "w") as f:
        json.dump(scene_to_dict(make((0.06, 0.26, 1.0))), f)

    outdir = str(tmp_path / "out")
    rc = main(["fit", "-f", scene_path, "--target", tgt_path,
               "--camera", "lookfrom", "-spp", "8", "--steps", "60",
               "--lr", "4e-3", "--engine", "xla", "--out", outdir])
    assert rc == 0
    rec = np.load(os.path.join(outdir, "recovered.npz"))
    err = np.abs(rec["lookfrom"] - np.asarray(true_from)).max()
    assert err < 0.04, err  # initial offset was 0.06
    assert os.path.exists(os.path.join(outdir, "after.png"))


def test_cli_fit_method_tape(tmp_path):
    """`rt_tpu fit --method tape`: the winner-tape estimator from the
    CLI — recovers material INTERIOR-CHAIN parameters (metal fuzz +
    dielectric IOR) that the replay method can only reach via per-
    component geom_spec enumeration, in one backward pass (VERDICT r3
    #6: the round-3 flagship estimator was library-only)."""
    from rt_tpu.config import RenderConfig
    from rt_tpu.render.renderer import render
    from rt_tpu.scene.parser import scene_to_dict
    from rt_tpu.scene.types import SceneDef, build_tables

    def make(fuzz, ior):
        s = SceneDef(width=48, height=27, samples_per_pixel=4, max_depth=6,
                     background=(0.7, 0.8, 1.0))
        s.add_sphere((-0.9, 0, -2), 0.8, s.add_dielectric(ior))
        s.add_sphere((0.9, 0, -2), 0.8,
                     s.add_metal((0.8, 0.7, 0.6), fuzz))
        s.set_camera((0, 0, 1), (0, 0, -2), (0, 1, 0), 50, 0.0)
        return s

    cfg = RenderConfig(width=48, height=27, samples_per_pixel=4,
                       max_depth=6, loop="while",
                       background_mode="gradient")
    target = np.asarray(render(build_tables(make(0.15, 1.5)), cfg)) / 4.0
    tgt_path = str(tmp_path / "target.npz")
    np.savez_compressed(tgt_path, img=target.astype(np.float32))

    scene_path = str(tmp_path / "wrong.json")
    d = scene_to_dict(make(0.4, 1.1))
    with open(scene_path, "w") as f:
        json.dump(d, f)

    outdir = str(tmp_path / "fit_tape")
    rc = main(["fit", "-f", scene_path, "--target", tgt_path,
               "--method", "tape", "--fields", "mat_fuzz,mat_ior",
               "-spp", "4", "--steps", "80", "--lr", "3e-2",
               "--gradient-sky", "--engine", "xla", "--out", outdir])
    assert rc == 0
    rec = np.load(os.path.join(outdir, "recovered.npz"))
    fuzz = rec["mat_fuzz"]
    # the metal's fuzz moved toward 0.15 from 0.4
    assert float(np.abs(fuzz - 0.15).min()) < 0.12
    assert os.path.exists(os.path.join(outdir, "after.png"))


def test_cli_fit_method_ad_smoke(tmp_path):
    """`rt_tpu fit --method ad`: the plain reverse-mode baseline stays
    reachable for debugging."""
    from rt_tpu.config import RenderConfig
    from rt_tpu.render.renderer import render
    from rt_tpu.scene.parser import scene_to_dict
    from rt_tpu.scene.types import SceneDef, build_tables

    def make(albedo):
        s = SceneDef(width=24, height=12, samples_per_pixel=2, max_depth=2,
                     background=(0.7, 0.8, 1.0))
        s.add_sphere((0, 0, -1), 0.5, s.add_lambertian_color(albedo))
        s.set_camera((0, 0.2, 1), (0, 0, -1), (0, 1, 0), 50, 0.0)
        return s

    cfg = RenderConfig(width=24, height=12, samples_per_pixel=2,
                       max_depth=2, loop="while")
    target = np.asarray(render(build_tables(make((0.7, 0.2, 0.2))),
                               cfg)) / 2.0
    tgt_path = str(tmp_path / "t.npz")
    np.savez_compressed(tgt_path, img=target.astype(np.float32))
    scene_path = str(tmp_path / "s.json")
    with open(scene_path, "w") as f:
        json.dump(scene_to_dict(make((0.4, 0.4, 0.4))), f)
    rc = main(["fit", "-f", scene_path, "--target", tgt_path,
               "--method", "ad", "--fields", "tex_color",
               "-spp", "2", "--steps", "3", "--lr", "1e-2",
               "--engine", "xla", "--out", str(tmp_path / "o")])
    assert rc == 0


def test_cli_fit_nee_tape_emission(tmp_path):
    """`rt_tpu fit --nee --method tape`: NEE rides the gradient path
    end-to-end from the CLI — the tape replay re-adds the direct term,
    so a light's emission recovers from an NEE-rendered target."""
    from rt_tpu.config import RenderConfig
    from rt_tpu.render.renderer import render
    from rt_tpu.scene.parser import scene_to_dict
    from rt_tpu.scene.types import SceneDef, build_tables

    def make(emit):
        s = SceneDef(width=32, height=24, samples_per_pixel=4,
                     max_depth=5, background=(0.05, 0.05, 0.08))
        s.add_sphere((0, 0, -1.5), 0.5,
                     s.add_lambertian_color((0.7, 0.2, 0.2)))
        s.add_sphere((0, -100.5, -1.5), 100,
                     s.add_lambertian_color((0.4, 0.4, 0.4)))
        s.add_sphere((0.9, 0.8, -1.0), 0.3,
                     s.add_diffuse_light_color(emit))
        s.set_camera((0, 0.3, 1.2), (0, 0, -1.5), (0, 1, 0), 55, 0.0)
        return s

    cfg = RenderConfig(width=32, height=24, samples_per_pixel=4,
                       max_depth=5, loop="while", nee=True)
    target = np.asarray(render(build_tables(make((5.0, 4.0, 3.0))),
                               cfg)) / 4.0
    tgt_path = str(tmp_path / "target.npz")
    np.savez_compressed(tgt_path, img=target.astype(np.float32))
    scene_path = str(tmp_path / "dim.json")
    with open(scene_path, "w") as f:
        json.dump(scene_to_dict(make((2.0, 2.0, 2.0))), f)

    outdir = str(tmp_path / "fit_nee")
    rc = main(["fit", "-f", scene_path, "--target", tgt_path, "--nee",
               "--method", "tape", "--fields", "tex_color",
               "-spp", "4", "--steps", "40", "--lr", "5e-2",
               "--engine", "xla", "--out", outdir])
    assert rc == 0
    rec = np.load(os.path.join(outdir, "recovered.npz"))
    light = rec["tex_color"][np.abs(rec["tex_color"]).sum(axis=1).argmax()]
    # emission moved decisively from (2,2,2) toward (5,4,3)
    assert light[0] > 3.0


def test_animate_points_cloth(tmp_path):
    """The Taichi 300-frame cloth animation surface: frame i loads
    points/{i+1}.txt into the reconstructed 21x21 cloth grid
    (scenes/plane441.obj — the reference's plane.obj is MISSING from
    its own repo; scripts/gen_plane_obj_r4.py rebuilds the topology
    from the flat frame-1 rest pose, bijectivity-checked)."""
    rc = main(["animate", "--kind", "points",
               "--obj", "scenes/plane441.obj",
               "--points-dir", "/root/reference/taichi-version/asset/points",
               "--texture",
               "/root/reference/taichi-version/asset/tex/bricks2.png",
               "--taichi-uv", "--frames", "1", "-w", "48", "--height", "27",
               "-spp", "2", "-d", "4", "--engine", "xla",
               "--format", "jpg", "--outdir", str(tmp_path)])
    assert rc == 0
    assert os.path.exists(os.path.join(str(tmp_path), "out0.jpg"))
