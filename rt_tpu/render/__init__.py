from rt_tpu.render.renderer import render, render_pixels  # noqa: F401
