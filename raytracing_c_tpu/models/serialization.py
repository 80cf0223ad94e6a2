"""Scene cache: versioned binary save/load.

Capability parity with scene_save_writer / scene_load_bytes (scene.c:13-76):
a versioned header {version, n_nodes, n_triangles, bvh_depth, camera} plus
the raw node and triangle arrays. The container is npz (a golden layout with
named arrays instead of the reference's zero-copy pointer fixup — device
arrays get re-uploaded on load anyway, so mmap aliasing buys nothing here).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from raytracing_c_tpu.models.scene import (
    BVH,
    Background,
    Camera,
    MaterialTable,
    Scene,
    Spheres,
    TextureAtlas,
    Triangles,
)

FORMAT_VERSION = 1

_TRI_FIELDS = (
    "v0", "v1", "v2", "e1", "e2", "n0", "n1", "n2", "ng",
    "tangent", "bitangent", "uv0", "uv1", "uv2", "mat_id",
)
_MAT_FIELDS = (
    "base_color", "emission", "roughness", "metalness", "normal_strength",
    "sheen", "sheen_tint", "anisotropic", "tex_albedo", "tex_normal",
    "tex_mr", "tex_emission", "shader_kind",
)
_ATLAS_FIELDS = ("texels", "offset", "width", "height")
_SPHERE_FIELDS = ("center", "radius", "mat_id")


def save_scene_cache(path: str, scene: Scene) -> None:
    data = {
        "header": np.array(
            [
                FORMAT_VERSION,
                scene.bvh.n_internal,
                scene.n_triangles,
                scene.bvh.depth,
                scene.bvh.last_row_offset,
                scene.background.kind,
                scene.background.tex_id,
            ],
            np.int64,
        ),
        "camera_view": np.asarray(scene.camera.view_matrix),
        "camera_fov": np.asarray(scene.camera.fov),
        "camera_focal": np.asarray(scene.camera.focal_length),
        "bvh_mins": np.asarray(scene.bvh.mins),
        "bvh_maxs": np.asarray(scene.bvh.maxs),
        "bg_color": np.asarray(scene.background.color),
    }
    for f in _TRI_FIELDS:
        data[f"tri_{f}"] = np.asarray(getattr(scene.triangles, f))
    for f in _MAT_FIELDS:
        data[f"mat_{f}"] = np.asarray(getattr(scene.materials, f))
    for f in _ATLAS_FIELDS:
        data[f"atlas_{f}"] = np.asarray(getattr(scene.atlas, f))
    for f in _SPHERE_FIELDS:
        data[f"sph_{f}"] = np.asarray(getattr(scene.spheres, f))
    np.savez_compressed(path, **data)


def load_scene_cache(path: str) -> Scene:
    z = np.load(path)
    header = z["header"]
    version = int(header[0])
    if version != FORMAT_VERSION:
        raise ValueError(f"scene cache version {version} != {FORMAT_VERSION}")
    (_, n_nodes, n_triangles, depth, last_row_offset, bg_kind, bg_tex) = (
        int(x) for x in header
    )

    bvh = BVH(
        mins=jnp.asarray(z["bvh_mins"]),
        maxs=jnp.asarray(z["bvh_maxs"]),
        depth=depth,
        last_row_offset=last_row_offset,
    )
    assert bvh.n_internal == n_nodes

    tris = Triangles(**{f: jnp.asarray(z[f"tri_{f}"]) for f in _TRI_FIELDS})
    mats = MaterialTable(**{f: jnp.asarray(z[f"mat_{f}"]) for f in _MAT_FIELDS})
    atlas = TextureAtlas(**{f: jnp.asarray(z[f"atlas_{f}"]) for f in _ATLAS_FIELDS})
    spheres = Spheres(**{f: jnp.asarray(z[f"sph_{f}"]) for f in _SPHERE_FIELDS})
    camera = Camera(
        view_matrix=jnp.asarray(z["camera_view"]),
        fov=jnp.asarray(z["camera_fov"]),
        focal_length=jnp.asarray(z["camera_focal"]),
    )
    background = Background(
        kind=bg_kind, color=jnp.asarray(z["bg_color"]), tex_id=bg_tex
    )
    return Scene(
        triangles=tris,
        bvh=bvh,
        materials=mats,
        atlas=atlas,
        spheres=spheres,
        background=background,
        camera=camera,
        n_triangles=n_triangles,
    )
