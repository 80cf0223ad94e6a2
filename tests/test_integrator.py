"""Integrator semantics (reference cast_ray, raytracer.c:505-558)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_c_tpu.models.scene import SHADER_DEBUG_NORMAL
from raytracing_c_tpu.render import integrator

from helpers import quad_mesh, simple_scene, vec3_of

BG = (0.25, 0.5, 0.75)


def _trace(scene, origins, dirs, bounces=4, seed=0, method="brute"):
    r = len(origins)
    uni = jax.random.uniform(jax.random.PRNGKey(seed), (bounces, 4, r))
    rad, rays = integrator.trace(
        scene, vec3_of(origins), vec3_of(dirs), uni, bounces, method=method,
    )
    return np.asarray(rad.to_array()), float(rays)


def test_miss_returns_background():
    scene = simple_scene(quad_mesh(), bg=BG)
    rad, rays = _trace(scene, [[5, 5, 5]], [[0, 0, 1]])
    np.testing.assert_allclose(rad[0], BG, rtol=1e-5)
    assert rays == 1.0  # one primary ray, then inactive


def test_emissive_hit_accumulates_emission():
    scene = simple_scene(quad_mesh(), bg=BG)
    from raytracing_c_tpu.utils.vec3 import Vec3

    scene = scene.replace(
        materials=scene.materials.replace(
            emission=Vec3(
                x=jnp.asarray([1.0]), y=jnp.asarray([2.0]), z=jnp.asarray([3.0])
            )
        ).with_rows()
    )
    rad, _ = _trace(scene, [[0, 0, 3]], [[0, 0, -1]], bounces=1)
    # single bounce: radiance = emission (throughput 1); no background since
    # the bounce budget is exhausted afterwards
    np.testing.assert_allclose(rad[0], [1, 2, 3], rtol=1e-4)


def test_backface_hit_skips_through():
    # ray approaches the quad from behind (normal +z, ray travels +z):
    # dot(ng, dir) > 0 -> skip, re-cast from epsilon-advanced origin,
    # eventually missing to the background (raytracer.c:516-521)
    scene = simple_scene(quad_mesh(), bg=BG)
    rad, rays = _trace(scene, [[0, 0, -3]], [[0, 0, 1]], bounces=4)
    np.testing.assert_allclose(rad[0], BG, rtol=1e-5)
    assert rays == 2.0  # backface recast consumed one extra intersection


def test_backface_exhausts_bounces_returns_emission_only():
    scene = simple_scene(quad_mesh(), bg=BG)
    rad, _ = _trace(scene, [[0, 0, -3]], [[0, 0, 1]], bounces=1)
    np.testing.assert_allclose(rad[0], [0, 0, 0], atol=1e-7)


def test_debug_shader_renders_normals():
    scene = simple_scene(quad_mesh(), bg=BG)
    scene = scene.replace(
        materials=scene.materials.replace(
            shader_kind=jnp.asarray([SHADER_DEBUG_NORMAL], jnp.int32)
        ).with_rows()
    )
    rad, _ = _trace(scene, [[0, 0, 3]], [[0, 0, -1]], bounces=4)
    # quad normal +z -> color (0.5, 0.5, 1.0); terminate stops the path
    np.testing.assert_allclose(rad[0], [0.5, 0.5, 1.0], atol=1e-5)


def test_diffuse_bounce_collects_tinted_background():
    scene = simple_scene(quad_mesh(), bg=(1.0, 1.0, 1.0))
    n = 512
    o = np.tile([[0.0, 0.0, 3.0]], (n, 1))
    d = np.tile([[0.0, 0.0, -1.0]], (n, 1))
    rad = []
    for s in range(4):
        r, _ = _trace(scene, o, d, bounces=8, seed=s)
        rad.append(r)
    mean = np.concatenate(rad).mean(axis=0)
    # white furnace-ish: grey 0.8 lambertian under uniform white sky; Monte
    # Carlo mean should be near albedo * sky with loose tolerance
    assert 0.5 < mean[0] < 0.95
    # grey material: channels equal
    np.testing.assert_allclose(mean, mean[0], rtol=0.02)


def test_rays_traced_counts_bounces():
    scene = simple_scene(quad_mesh(), bg=BG)
    # most paths continue past the primary hit (a few terminate when the
    # sampled lobe lands below the horizon, pdf <= 0 -> terminate, which is
    # reference behavior, driver.c:309/328)
    n = 64
    o = np.tile([[0.0, 0.0, 3.0]], (n, 1))
    d = np.tile([[0.0, 0.0, -1.0]], (n, 1))
    _, rays = _trace(scene, o, d, bounces=8)
    assert rays > 1.5 * n
