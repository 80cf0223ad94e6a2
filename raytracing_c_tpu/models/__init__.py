from raytracing_c_tpu.models.scene import (  # noqa: F401
    BVH,
    Background,
    Camera,
    MaterialTable,
    Scene,
    Spheres,
    TextureAtlas,
    Triangles,
)
