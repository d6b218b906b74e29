from rt_tpu.io.image import write_ppm, write_png  # noqa: F401
