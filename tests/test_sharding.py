"""Multi-device sharding: 8-way CPU mesh must reproduce single-device output
(SURVEY §2.11: chunks -> shards; scene replicated)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracing_c_tpu.parallel import mesh as mesh_mod
from raytracing_c_tpu.render.renderer import render, render_batch

from helpers import random_mesh, simple_scene


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    return simple_scene(random_mesh(200, rng))


def test_mesh_has_8_devices():
    m = mesh_mod.make_mesh()
    assert int(np.prod(list(m.shape.values()))) == 8


def test_sharded_batch_matches_single(scene):
    m = mesh_mod.make_mesh()
    px = jnp.arange(256, dtype=jnp.int32) % 16
    py = jnp.arange(256, dtype=jnp.int32) // 16
    key = jax.random.PRNGKey(3)

    kwargs = dict(width=16, height=16, spp=2, max_bounces=3)
    rgb_single, rays_single = render_batch(scene, px, py, key, **kwargs)

    scene_r = mesh_mod.shard_scene(scene, m)
    px_s = mesh_mod.shard_rays(px, m)
    py_s = mesh_mod.shard_rays(py, m)
    rgb_sharded, rays_sharded = render_batch(scene_r, px_s, py_s, key, **kwargs)

    np.testing.assert_allclose(
        np.asarray(rgb_single), np.asarray(rgb_sharded), rtol=1e-5, atol=1e-6
    )
    assert float(rays_single) == float(rays_sharded)


def test_render_with_mesh(scene):
    m = mesh_mod.make_mesh()
    # dense loop: the sharded render consumes the same GLOBAL RNG stream
    # (draws happen outside shard_map), so it is bit-identical per shard
    img_m, stats_m = render(
        scene, 24, 16, spp=2, max_bounces=3, seed=5, mesh=m, compact=False
    )
    img_s, stats_s = render(
        scene, 24, 16, spp=2, max_bounces=3, seed=5, compact=False
    )
    assert img_m.shape == (16, 24, 3)
    np.testing.assert_array_equal(img_m, img_s)


def test_render_with_mesh_compacted(scene):
    """compact=True under a mesh: per-shard bucket sorts permute the RNG
    assignment, so agreement is statistical, not bit-wise."""
    m = mesh_mod.make_mesh()
    img_m, _ = render(scene, 32, 32, spp=8, max_bounces=4, seed=5, mesh=m)
    img_s, _ = render(scene, 32, 32, spp=8, max_bounces=4, seed=5)
    a = img_m.astype(np.float64).mean()
    b = img_s.astype(np.float64).mean()
    np.testing.assert_allclose(a, b, rtol=0.02)
