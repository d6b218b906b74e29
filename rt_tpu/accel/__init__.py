from rt_tpu.accel.bvh import build_bvh, BVH  # noqa: F401
