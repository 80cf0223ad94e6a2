from raytracing_c_tpu.utils import color, vecmath  # noqa: F401
