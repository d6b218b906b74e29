"""True multi-PROCESS distributed rendering test: two OS processes join
one jax.distributed runtime (4 virtual CPU devices each = 8 global),
render one frame tile-sharded over the global mesh, and must match the
single-process render bit-for-bit-in-tolerance.

This is the pod-behavior-without-a-pod test SURVEY.md §4 calls for: the
reference's only multi-device story was processes that never talk
(blue.py); here the two processes cooperate in one SPMD program."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from rt_tpu.render.renderer import render
from rt_tpu.scene.builders import three_sphere_scene
from rt_tpu.scene.types import build_tables


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_render_matches_single(tmp_path):
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "distributed_worker.py")
    coord = f"127.0.0.1:{_free_port()}"

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = []
    outs = []
    for pid in range(2):
        out = str(tmp_path / f"out_{pid}.npz")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]

    sdef, cfg = three_sphere_scene(width=64, height=36, spp=4, max_depth=4)
    ref = render(build_tables(sdef), cfg)
    for out in outs:
        with np.load(out) as z:
            np.testing.assert_allclose(z["img"], ref, rtol=1e-5, atol=1e-5)
            assert int(z["spp"]) == 4
