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


def test_render_with_mesh_forest_pallas(scene):
    """ForestTables under shard_map (VERDICT r3 #4): the re-rooted Pallas
    traversal (interpret mode on the CPU mesh) must shard like any other
    method — scene + subtree tables replicated, rays split — and the dense
    loop stays bit-identical to single-device."""
    from raytracing_c_tpu.ops import traverse_pallas as tp

    forest = tp.build_forest_host(
        np.asarray(scene.bvh.nodes),
        np.asarray(scene.triangles.leaf_rows),
        scene.bvh.depth,
        np.asarray(scene.triangles.attr_rows),
        root_level=1,
    )
    scene_f = scene.replace(ptables=forest)
    assert isinstance(scene_f.ptables, tp.ForestTables)
    m = mesh_mod.make_mesh()
    kw = dict(spp=1, max_bounces=2, seed=3, compact=False,
              method="pallas_fused")
    img_m, _ = render(scene_f, 16, 16, mesh=m, **kw)
    img_s, _ = render(scene_f, 16, 16, **kw)
    np.testing.assert_array_equal(img_m, img_s)
    assert img_m.std() > 0


def test_render_with_mesh_nee(scene):
    """NEE under shard_map: shadow rays + MIS weights ride the per-shard
    trace; the dense loop slices the GLOBAL nee_uniforms stream, so the
    sharded image is bit-identical to single-device."""
    m = mesh_mod.make_mesh()
    kw = dict(spp=2, max_bounces=3, seed=5, compact=False, nee=True)
    img_m, stats_m = render(scene, 24, 16, mesh=m, **kw)
    img_s, stats_s = render(scene, 24, 16, **kw)
    np.testing.assert_array_equal(img_m, img_s)
    # NEE's shadow rays are counted on every shard, summed by the psum
    assert stats_m.rays_traced == stats_s.rays_traced
    assert stats_m.rays_traced > 24 * 16 * 2  # shadow rays present
