"""Model file dispatch + scene assembly.

load_model_file (driver.c:685-728): extension dispatch .obj/.glb/.gltf; the
glTF camera (if present) overrides the default camera; the environment map
`background.png` is loaded from the working directory when present
(driver.c:759) and otherwise degrades to a neutral constant sky (the
reference snapshot is missing that asset — SURVEY header note).
"""

from __future__ import annotations

import os

from raytracing_c_tpu.io.gltf_loader import load_gltf
from raytracing_c_tpu.io.materials import build_material_table
from raytracing_c_tpu.io.obj_loader import load_obj
from raytracing_c_tpu.io.image_io import load_image_rgb_u8
from raytracing_c_tpu.models.scene import Background, Camera, build_scene

#: fallback sky when no env map is available (linear RGB)
DEFAULT_SKY = (0.5, 0.62, 0.78)


def load_model(path: str, warn=print):
    """Load a model file into host-side staging.

    Returns (mesh, materials, atlas, camera | None).
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        mesh, mats, atlas = load_obj(path, warn=warn)
        return mesh, mats, atlas, None
    if ext in (".glb", ".gltf"):
        return load_gltf(path, warn=warn)
    raise ValueError(f"Unrecognized file type: '{path}'")


def load_scene(
    path: str,
    background_path: str | None = "background.png",
    warn=print,
):
    """Full scene assembly mirroring main() (driver.c:730-788): default
    camera, env map, model load (camera override), BVH build."""
    mesh, mats, atlas, camera = load_model(path, warn=warn)

    background = Background.constant(DEFAULT_SKY)
    if background_path:
        if os.path.exists(background_path):
            img = load_image_rgb_u8(background_path)
            tid = atlas.add(img, key=os.path.normpath(background_path))
            background = Background.equirect(tid)
        else:
            warn(
                f"env map '{background_path}' not found, using constant sky "
                f"{DEFAULT_SKY}"
            )

    if camera is None:
        camera = Camera.default()

    scene = build_scene(
        mesh,
        materials=build_material_table(mats),
        atlas=atlas.build(),
        background=background,
        camera=camera,
    )
    return scene
