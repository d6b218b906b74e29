from rt_tpu.parallel.mesh import make_mesh, default_mesh  # noqa: F401
from rt_tpu.parallel.sharded import render_sharded, render_block  # noqa: F401
