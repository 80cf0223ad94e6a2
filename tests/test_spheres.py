"""Sphere primitive through the full scene path (SURVEY §2.8c: capability
present in the reference API even though its driver never populates it)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_c_tpu.models.scene import Spheres
from raytracing_c_tpu.ops import traverse
from raytracing_c_tpu.render import integrator

from helpers import quad_mesh, simple_scene, vec3_of


def _scene_with_sphere():
    spheres = Spheres.make([[0.0, 0.0, 1.5]], [0.5], [0])
    return simple_scene(quad_mesh(), bg=(0.3, 0.3, 0.3), spheres=spheres)


def test_sphere_closer_than_triangle_wins():
    scene = _scene_with_sphere()
    o = vec3_of([[0.0, 0.0, 3.0]])
    d = vec3_of([[0.0, 0.0, -1.0]])
    hit = traverse.intersect_scene(scene, o, d, method="brute")
    # sphere surface at z=2 -> t=1; quad behind at t=3
    assert np.isclose(float(hit["t"][0]), 1.0, atol=1e-5)
    assert int(hit["sph"][0]) == 0
    assert int(hit["tri"][0]) == -1


def test_triangle_wins_when_ray_misses_sphere():
    scene = _scene_with_sphere()
    o = vec3_of([[0.9, 0.9, 3.0]])
    d = vec3_of([[0.0, 0.0, -1.0]])
    hit = traverse.intersect_scene(scene, o, d, method="brute")
    assert np.isclose(float(hit["t"][0]), 3.0, atol=1e-4)
    assert int(hit["sph"][0]) == -1
    assert int(hit["tri"][0]) >= 0


def test_sphere_shading_normal():
    scene = _scene_with_sphere()
    o = vec3_of([[0.0, 0.0, 3.0]])
    d = vec3_of([[0.0, 0.0, -1.0]])
    uni = jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 1))

    from raytracing_c_tpu.models.scene import SHADER_DEBUG_NORMAL

    scene = scene.replace(
        materials=scene.materials.replace(
            shader_kind=jnp.asarray([SHADER_DEBUG_NORMAL], jnp.int32)
        ).with_rows()
    )
    rad, _ = integrator.trace(
        scene, o, d, uni, 2, method="brute"
    )
    # front of the sphere: normal (0,0,1) -> color (0.5, 0.5, 1.0)
    np.testing.assert_allclose(
        np.asarray(rad.to_array())[0], [0.5, 0.5, 1.0], atol=1e-4
    )
