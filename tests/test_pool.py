"""Compacting pool renderer vs the fused renderer (render/pool.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracing_c_tpu.models.scene import SHADER_DEBUG_NORMAL
from raytracing_c_tpu.render.pool import render_batch_pool
from raytracing_c_tpu.render.renderer import render, render_batch

from helpers import quad_mesh, random_mesh, simple_scene


def _grid(p, w):
    ids = np.arange(p, dtype=np.int32)
    return jnp.asarray(ids % w), jnp.asarray(ids // w)


def test_pool_deterministic_case_matches_fused():
    """Debug shader terminates at the first hit, so RNG reordering can't
    matter: pool and fused must agree exactly."""
    scene = simple_scene(quad_mesh(), bg=(0.25, 0.5, 0.75))
    scene = scene.replace(
        materials=scene.materials.replace(
            shader_kind=jnp.asarray([SHADER_DEBUG_NORMAL], jnp.int32)
        ).with_rows()
    )
    px, py = _grid(256, 16)
    key = jax.random.PRNGKey(5)
    kw = dict(width=16, height=16, spp=2, max_bounces=4, method="brute")
    want, rays_f = render_batch(scene, px, py, key, **kw)  # u8-encoded
    got, rays_p = render_batch_pool(scene, px, py, key, **kw)  # linear f32
    from raytracing_c_tpu.utils import color

    got_u8 = np.asarray(color.encode_u8(got))
    np.testing.assert_array_equal(got_u8, np.asarray(want))


def test_pool_statistical_agreement(rng):
    """Diffuse GI: different RNG->ray mapping, so compare image means."""
    scene = simple_scene(random_mesh(300, rng), bg=(1.0, 0.9, 0.8))
    px, py = _grid(1024, 32)
    kw = dict(width=32, height=32, spp=8, max_bounces=6)
    a, rays_a = render_batch(scene, px, py, jax.random.PRNGKey(0), **kw)
    b, rays_b = render_batch_pool(scene, px, py, jax.random.PRNGKey(0), **kw)
    from raytracing_c_tpu.utils import color

    ma = np.asarray(a).astype(np.float64).mean(axis=0)  # u8-encoded
    mb = np.asarray(color.encode_u8(b)).astype(np.float64).mean(axis=0)
    np.testing.assert_allclose(ma, mb, rtol=0.05, atol=2.6)
    # traced-ray accounting within a few percent (pool counts pre-bounce
    # alive, fused counts the same quantity)
    assert abs(float(rays_a) - float(rays_b)) / float(rays_a) < 0.05


def test_render_engine_pool(rng):
    scene = simple_scene(random_mesh(100, rng))
    img_f, _ = render(scene, 24, 16, spp=2, max_bounces=3, seed=3)
    img_p, _ = render(scene, 24, 16, spp=2, max_bounces=3, seed=3,
                      engine="pool")
    assert img_p.shape == (16, 24, 3)
    # same scene/seed, different sampler mapping: images close in mean
    assert abs(img_f.astype(float).mean() - img_p.astype(float).mean()) < 4.0
