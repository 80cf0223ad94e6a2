"""Loader tests against the reference's own assets (SURVEY §4 scene table)."""

import numpy as np
import pytest

from raytracing_c_tpu.io.loader import load_model
from raytracing_c_tpu.io.obj_loader import load_obj
from raytracing_c_tpu.io.gltf_loader import load_gltf

MODELS = "/root/reference/models"


def _quiet(*a, **k):
    pass


def test_quad_obj():
    mesh, mats, atlas = load_obj(f"{MODELS}/quad.obj", warn=_quiet)
    assert len(mesh.positions) == 2
    # all vertices in the x=0 plane, normal +x
    assert np.allclose(mesh.positions[..., 0], 0.0)
    assert np.allclose(mesh.normals[..., 0], 1.0)
    assert mesh.uvs.min() >= 0.0 and mesh.uvs.max() <= 1.0
    # quad.mtl has no PBR fields -> defaults (Kd 0.8, roughness 0.5)
    assert np.allclose(mats[0].base_color, (0.8, 0.8, 0.8))
    assert mats[0].roughness == 0.5


def test_fov_test_obj():
    mesh, mats, _ = load_obj(f"{MODELS}/fov_test.obj", warn=_quiet)
    assert len(mesh.positions) == 72


def test_tower_obj_missing_mtl():
    # tower.obj references tower.mtl which is absent from the snapshot;
    # the loader must degrade to the default material
    mesh, mats, _ = load_obj(f"{MODELS}/tower.obj", warn=_quiet)
    assert len(mesh.positions) == 4320
    assert len(mats) >= 1


def test_helmet_obj_pbr_mtl():
    mesh, mats, _ = load_obj(f"{MODELS}/helmet.obj", warn=_quiet)
    assert len(mesh.positions) == 15452
    m = mats[0]
    assert m.extra.get("is_pbr")
    assert np.isclose(m.roughness, 0.2)
    assert np.isclose(m.metalness, 0.0)
    assert np.allclose(m.base_color, (0.8, 0.4, 0.4))


def test_helmet_glb():
    mesh, mats, atlas, cam = load_gltf(f"{MODELS}/helmet.glb", warn=_quiet)
    assert len(mesh.positions) == 15452
    assert cam is not None
    assert np.isclose(float(cam.fov), 1.2217306, atol=1e-5)
    assert np.isclose(float(cam.focal_length), 1.0 / np.tan(1.2217306 / 2), atol=1e-5)
    # camera node: rotation about y + translation (1, -0.2, 1.732...)
    vm = np.asarray(cam.view_matrix)
    assert np.allclose(vm[:3, 3], [1.0, -0.2, 1.7320508], atol=1e-4)

    m = mats[0]
    # all four texture slots wired (driver.c:640-658)
    assert m.tex_albedo > 0 and m.tex_normal > 0
    assert m.tex_mr > 0 and m.tex_emission > 0
    assert m.tex_mr != m.tex_albedo
    assert np.allclose(m.emission, (1.0, 1.0, 1.0))
    # glTF spec defaults: metallic/roughness factor 1.0 (texture-modulated)
    assert m.metalness == 1.0 and m.roughness == 1.0
    # helmet mesh node is rotated ~+90deg about x -> y/z extents swap
    # relative to the raw accessor data; just sanity-check finite bounds
    assert np.isfinite(mesh.positions).all()


def test_spheres_glb():
    mesh, mats, _, cam = load_gltf(f"{MODELS}/spheres.glb", warn=_quiet)
    assert len(mesh.positions) == 4800
    assert len(mats) == 5
    assert cam is not None
    # Material.011 omits metallicFactor -> spec default 1.0
    by_name = {m.name: m for m in mats}
    assert by_name["Material.011"].metalness == 1.0
    assert np.isclose(by_name["Material.010"].metalness, 0.0)
    assert np.isclose(by_name["Material.010"].roughness, 0.2559055, atol=1e-5)


def test_sheen_glb():
    mesh, mats, _, cam = load_gltf(f"{MODELS}/sheen.glb", warn=_quiet)
    assert len(mesh.positions) == 1920
    assert cam is not None


def test_dispatch_unknown_extension():
    with pytest.raises(ValueError):
        load_model("model.fbx")
