"""Worker for the 2-process distributed render test (run by
tests/test_multiprocess.py via subprocess, never by pytest directly).

Usage: python distributed_worker.py <coordinator> <num_procs> <proc_id>
       <out.npz>

Joins the multi-process JAX runtime with 4 virtual CPU devices per
process (8 global), renders the shared test scene tile-sharded over the
GLOBAL mesh, and (every process) writes the allgathered image."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    coord, n_procs, pid, out_path = (sys.argv[1], int(sys.argv[2]),
                                     int(sys.argv[3]), sys.argv[4])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=n_procs, process_id=pid)
    assert jax.device_count() == 4 * n_procs
    assert jax.process_count() == n_procs

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from rt_tpu.scene.builders import three_sphere_scene
    from rt_tpu.scene.types import build_tables
    from rt_tpu.parallel.mesh import make_mesh
    from rt_tpu.parallel.sharded import render_sharded_ex

    sdef, cfg = three_sphere_scene(width=64, height=36, spp=4, max_depth=4)
    tables = build_tables(sdef)
    mesh = make_mesh((jax.device_count(), 1), jax.devices())
    img, spp = render_sharded_ex(tables, cfg, mesh)
    np.savez(out_path, img=img, spp=spp)
    print(f"proc {pid}: image {img.shape} mean {img.mean():.5f}", flush=True)


if __name__ == "__main__":
    main()
