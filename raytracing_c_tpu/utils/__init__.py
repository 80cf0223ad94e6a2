from raytracing_c_tpu.utils import color, vec3  # noqa: F401
