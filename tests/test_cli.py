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
